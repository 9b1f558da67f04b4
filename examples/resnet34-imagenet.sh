#!/bin/bash
# Train ResNet-34(B) on ImageNet over the device mesh (reference
# examples/resnet34-imagenet.sh recipe; the mesh replaces --gpus).
TRAIN_DIR=$1
VAL_DIR=$2
OUTPUT_DIR=./resnet34-imagenet-model
MODEL_DESC="C.B[64,7,2] BN A P[3,2,1] nRSN.O[3,64,3] nRSN.O[4,128,3,2] nRSN.O[6,256,3,2] nRSN.O[3,512,3,2] P.A[7] R.TB"
IMAGE_LOADER="images_per_subset=12800,scale=256,crop=224,crop_mode=lenet,scale_mode=small,augment_color,augment_photo"
SCRIPT_DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
BIN=$SCRIPT_DIR/../bin/model-train-multi

if [ ! -d "$TRAIN_DIR" ] || [ ! -d "$VAL_DIR" ]; then
    echo "Usage: resnet34-imagenet.sh TRAIN_DIR VAL_DIR"
    exit 1
fi
mkdir -p $OUTPUT_DIR && cd $OUTPUT_DIR

$BIN --solver torch --thread-num 4 --seed 1 --epochs 90 \
     --batch-size 256 --train "$TRAIN_DIR" --test "$VAL_DIR" \
     --extension imagenet,$IMAGE_LOADER --learn-rate 0.1 \
     --learn-momentum 0.9 --learn-anneal 0.1 --learn-anneal-epochs 30 60 \
     --learn-decay 0.0001 --model-desc $MODEL_DESC > train.out 2> train.err
echo "Done"
