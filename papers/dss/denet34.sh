#!/bin/bash
# DeNet-34 std/skip/wide detector on Pascal VOC or MSCOCO (DSS paper,
# arXiv:1703.10295) — denet_tpu recipe.  Unlike the reference (which
# surgically extends a pretrained Theano trunk via model-modify), the full
# detection graph builds from the DSL; to start from a pretrained trunk,
# save it as .mdl.gz and use model-modify --layer-remove / --layer-append
# with the same head desc (denet_tpu/models/zoo.py _denet_head).
MODEL_VAR=${1:?variant: std|skip|wide}
DATASET=${2:?dataset: voc2007|voc2012|mscoco}
INPUT_DIR=${3:?dataset root dir}

SCRIPT_DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" && pwd )"
DENET_DIR=$SCRIPT_DIR/../..
OUTPUT_DIR=./denet34-$DATASET-$MODEL_VAR
IMAGE_LOADER="images_per_subset=1280,scale=512,crop=512,augment_photo,crop_mode=denet,scale_mode=large"
TRAIN_PARAM="--solver nesterov --epochs 90 --batch-size 32 --learn-rate 0.1 --learn-momentum 0.9 --learn-anneal 0.1 --learn-anneal-epochs 30 60 --learn-decay 0.0001"

MODEL_DESC=$(python3 - "$MODEL_VAR" "$DENET_DIR" <<'PY'
import sys
sys.path.insert(0, sys.argv[2])
from denet_tpu.models import zoo
print(" ".join(zoo.denet34(sys.argv[1])))
PY
)

case $DATASET in
  voc2007) DATA_TYPE=voc; TRAIN_DATA=2007-trainval,2012-trainval; TEST_DATA=2007-test;;
  voc2012) DATA_TYPE=voc; TRAIN_DATA=2007-trainvaltest,2012-trainval; TEST_DATA=2012-test;;
  mscoco)  DATA_TYPE=mscoco; TRAIN_DATA=2014-train,2014-val; TEST_DATA=2015-test;;
esac

mkdir -p $OUTPUT_DIR && cd $OUTPUT_DIR

echo "Training DeNet-34 ($MODEL_VAR) on $DATASET over the device mesh..."
$DENET_DIR/bin/model-train-multi $TRAIN_PARAM --thread-num 4 --seed 1 \
    --train "$INPUT_DIR" --extension $DATA_TYPE,$TRAIN_DATA,$IMAGE_LOADER \
    --model-desc $MODEL_DESC > train.out 2> train.err

mkdir -p predict && cd predict
echo "Merging split layers for inference..."
$DENET_DIR/bin/model-modify --input ../model_epoch089_final.mdl.gz \
    --output merged.mdl.gz --merge > merge.out 2> merge.err

echo "Running prediction..."
$DENET_DIR/bin/model-predict --predict-mode detect,$DATA_TYPE --batch-size 8 \
    --thread-num 4 --model ./merged.mdl.gz --input "$INPUT_DIR" \
    --extension $DATA_TYPE,$TEST_DATA,$IMAGE_LOADER > predict.out 2> predict.err
echo "Done"
