#!/bin/bash
# Multi-flag wrapper for scripts/train_one_stage.py (reference scripts/train.sh).
# Usage: scripts/train.sh --scene hotdog --stage material_light_from_scratch_resample [...]

set -e

SCENE=""
STAGE=""
TAKE_STAGE=""
USE_TAKE_STAGE=0
SUFFIX=""
USE_SUFFIX=0
SAMPLE_FACTOR=8
SAMPLE_RENDER_FACTOR=8
SAMPLE_RENDER_FACTOR_SET=0
NUM_RESAMPLE=1
BATCH_SIZE=8192
RENDER_CHUNK_SIZE=8192
TRAIN_LENGTH_FACTOR=1
LR_FACTOR=1.0
GRAD_ACCUM_STEPS=1
SECONDARY_GRAD_ACCUM_STEPS=1
EARLY_EXIT_STEPS=200000
NO_VIS=0

for arg in "$@"; do
  if [[ $arg == "--stage" ]]; then
    nextArgIsStage=1
  elif [[ $nextArgIsStage == 1 ]]; then
    STAGE=$arg
    nextArgIsStage=0
    if [[ $STAGE == *"material"* && $STAGE != *"from_scratch"* ]]; then
      TAKE_STAGE="cache"
      USE_TAKE_STAGE=1
    fi
  fi
done

while (( "$#" )); do
  case "$1" in
    --no_vis_secondary) NO_VIS=1; shift ;;
    --scene) SCENE=$2; shift 2 ;;
    --stage) STAGE=$2; shift 2 ;;
    --suffix) USE_SUFFIX=1; SUFFIX=$2; shift 2 ;;
    --early_exit_steps) EARLY_EXIT_STEPS=$2; shift 2 ;;
    --take_stage) USE_TAKE_STAGE=1; TAKE_STAGE=$2; shift 2 ;;
    --num_resample) NUM_RESAMPLE=$2; shift 2 ;;
    --sample_factor) SAMPLE_FACTOR=$2; shift 2 ;;
    --sample_render_factor) SAMPLE_RENDER_FACTOR=$2; SAMPLE_RENDER_FACTOR_SET=1; shift 2 ;;
    --batch_size) BATCH_SIZE=$2; shift 2 ;;
    --render_chunk_size) RENDER_CHUNK_SIZE=$2; shift 2 ;;
    --train_length_factor) TRAIN_LENGTH_FACTOR=$2; shift 2 ;;
    --lr_factor) LR_FACTOR=$2; shift 2 ;;
    --grad_accum_steps) GRAD_ACCUM_STEPS=$2; shift 2 ;;
    --secondary_grad_accum_steps) SECONDARY_GRAD_ACCUM_STEPS=$2; shift 2 ;;
    *) echo "Error: Invalid argument: $1"; exit 1 ;;
  esac
done

if [ $SAMPLE_RENDER_FACTOR_SET -eq 0 ]; then
  SAMPLE_RENDER_FACTOR=$SAMPLE_FACTOR
fi

CMD="python scripts/train_one_stage.py --scene $SCENE --stage $STAGE --early_exit_steps $EARLY_EXIT_STEPS"
CMD="$CMD --batch_size $BATCH_SIZE --render_chunk_size $RENDER_CHUNK_SIZE --train_length_factor $TRAIN_LENGTH_FACTOR --lr_factor $LR_FACTOR --grad_accum_steps $GRAD_ACCUM_STEPS --secondary_grad_accum_steps $SECONDARY_GRAD_ACCUM_STEPS"
CMD="$CMD --sample_factor $SAMPLE_FACTOR --resample_render --sample_render_factor $SAMPLE_RENDER_FACTOR --num_resample $NUM_RESAMPLE"

if [ $USE_SUFFIX -eq 1 ]; then CMD="$CMD --suffix $SUFFIX"; fi
if [ $USE_TAKE_STAGE -eq 1 ]; then CMD="$CMD --take_stage $TAKE_STAGE"; fi
if [ $NO_VIS -eq 0 ]; then CMD="$CMD --vis_secondary --vis_surface_light_field --vis_light_sampler"; fi

exec $CMD
