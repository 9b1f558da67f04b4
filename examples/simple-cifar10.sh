#!/bin/bash
# Train the simple CIFAR10 convnet (reference examples/simple-cifar10.sh
# recipe on the denet_tpu CLI).  Usage: simple-cifar10.sh TRAIN_DIR VAL_DIR
TRAIN_DIR=$1
VAL_DIR=$2
OUTPUT_DIR=./simple-cifar10-model
MODEL_DESC="B[3] C[128,3] BN A C[96,2] BN A C[64,1] BN A P.A[2] D[0.2] C[256,3] BN A C[192,2] BN A C[128,1] BN A P.A[2] D[0.2] C[512,3] BN A C[384,2] BN A C[256,1] BN A D[0.2] R.C[6]"
SCRIPT_DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
BIN=$SCRIPT_DIR/../bin/model-train

if [ ! -d "$TRAIN_DIR" ] || [ ! -d "$VAL_DIR" ]; then
    echo "Usage: simple-cifar10.sh TRAIN_DIR VAL_DIR (png class dirs)"
    exit 1
fi
mkdir -p $OUTPUT_DIR && cd $OUTPUT_DIR

$BIN --seed 0 --distort-mode o4 --solver sgd --border-mode same \
     --augment-mirror --activation relu --epochs 90 --batch-size 32 \
     --train "$TRAIN_DIR" --test "$VAL_DIR" --extension png \
     --learn-rate 0.1 --learn-momentum 0.9 --learn-anneal 0.5 \
     --learn-anneal-epochs 15 30 45 60 75 --learn-decay 0.0005 \
     --model-desc $MODEL_DESC > train.out 2> train.err
echo "Done"
