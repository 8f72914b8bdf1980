#!/bin/bash
# POPE driver (capability parity: reference experiments/scripts/pope/run_llava.sh
# and experiments/run.sh — positional-default parameterization of seed/α/β/
# dataset/split, answers-file naming).
#
# usage: run_llava.sh [seed] [dataset] [split] [model_path] [cd_alpha] [cd_beta] [extra flags...]
set -e

seed=${1:-55}
dataset_name=${2:-coco}        # coco | aokvqa | gqa
type=${3:-adversarial}         # random | popular | adversarial
model_path=${4:-/ckpt/llava-v1.5-7b}
cd_alpha=${5:-1}
cd_beta=${6:-0.2}
shift $(( $# > 6 ? 6 : $# )) || true

image_folder=${IMAGE_FOLDER:-/data/${dataset_name}}
question_file=${QUESTION_FILE:-data/POPE/${dataset_name}/${dataset_name}_pope_${type}.json}
out_dir=${OUT_DIR:-output/pope}
mkdir -p "${out_dir}"

python -m llava_align_tpu.runners.pope \
    --model-path "${model_path}" \
    --question-file "${question_file}" \
    --image-folder "${image_folder}" \
    --answers-file "${out_dir}/llava15_${dataset_name}_pope_${type}_seed${seed}_both.jsonl" \
    --use_dd --use_dd_unk --calibrate \
    --cd_alpha "${cd_alpha}" --cd_beta "${cd_beta}" \
    --seed "${seed}" "$@"
