#!/bin/bash
# Evaluation wrapper (reference scripts/eval.sh): runs the trainer in
# vis-only mode over the test set, optionally relighting / albedo passes.
# Usage: scripts/eval.sh --scene hotdog --stage material_light_from_scratch_resample [flags]

set -e

SCENE=""
STAGE=""
TAKE_STAGE=""
USE_TAKE_STAGE=0
SUFFIX=""
USE_SUFFIX=0
ALBEDO=0
VIS_RENDER_PATH=0
FIXED_LIGHT=0
FIXED_CAMERA=0
VIS_RESTART=0
VIS_START=0
VIS_END=200
SAMPLE_FACTOR=8
RENDER_REPEATS=1
RENDER_CHUNK_SIZE=4096
NUM_RESAMPLE=1
RELIGHT=0
SL_RELIGHT=0
ENV_MAP_NAME="sunset"
EVAL_TRAIN=0
EVAL_PATH=0

while (( "$#" )); do
  case "$1" in
    --scene) SCENE=$2; shift 2 ;;
    --stage) STAGE=$2; shift 2 ;;
    --take_stage) USE_TAKE_STAGE=1; TAKE_STAGE=$2; shift 2 ;;
    --suffix) USE_SUFFIX=1; SUFFIX=$2; shift 2 ;;
    --albedo) ALBEDO=1; shift ;;
    --relight) RELIGHT=1; shift ;;
    --sl_relight) SL_RELIGHT=1; shift ;;
    --env_map_name) ENV_MAP_NAME=$2; shift 2 ;;
    --vis_render_path) VIS_RENDER_PATH=1; shift ;;
    --fixed_light) FIXED_LIGHT=1; shift ;;
    --fixed_camera) FIXED_CAMERA=1; shift ;;
    --vis_restart) VIS_RESTART=1; shift ;;
    --vis_start) VIS_START=$2; shift 2 ;;
    --vis_end) VIS_END=$2; shift 2 ;;
    --eval_train) EVAL_TRAIN=1; shift ;;
    --eval_path) EVAL_PATH=1; shift ;;
    --sample_factor) SAMPLE_FACTOR=$2; shift 2 ;;
    --render_repeats) RENDER_REPEATS=$2; shift 2 ;;
    --render_chunk_size) RENDER_CHUNK_SIZE=$2; shift 2 ;;
    --num_resample) NUM_RESAMPLE=$2; shift 2 ;;
    *) echo "Error: Invalid argument: $1"; exit 1 ;;
  esac
done

CMD="python scripts/train_one_stage.py --scene $SCENE --stage $STAGE --vis_only"
CMD="$CMD --render_chunk_size $RENDER_CHUNK_SIZE --sample_factor $SAMPLE_FACTOR"
CMD="$CMD --render_repeats $RENDER_REPEATS --num_resample $NUM_RESAMPLE --resample_render"
CMD="$CMD --vis_start $VIS_START --vis_end $VIS_END"

if [ $USE_SUFFIX -eq 1 ]; then CMD="$CMD --suffix $SUFFIX"; fi
if [ $USE_TAKE_STAGE -eq 1 ]; then CMD="$CMD --take_stage $TAKE_STAGE"; fi
if [ $RELIGHT -eq 1 ]; then CMD="$CMD --relight --env_map_name $ENV_MAP_NAME"; fi
if [ $SL_RELIGHT -eq 1 ]; then CMD="$CMD --sl_relight"; fi
if [ $EVAL_TRAIN -eq 1 ]; then CMD="$CMD --eval_train"; fi
if [ $EVAL_PATH -eq 1 ]; then CMD="$CMD --eval_path"; fi
if [ $ALBEDO -eq 1 ]; then CMD="$CMD --suffix _albedo"; fi

exec $CMD
