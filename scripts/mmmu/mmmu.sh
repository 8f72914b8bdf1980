#!/bin/bash
# MMMU qwen driver (capability parity: reference experiments/eval/MMMU/
# mmmu.sh — naive, vcd, and dd-both qwen runs over the MMMU val samples,
# then calibrated scoring via the runner's scoring path).
#
# usage: mmmu.sh [model_path] [cd_alpha] [cd_beta] [noise_step] [extra flags...]
set -e
cd "$(dirname "$0")/../.."

model_path=${1:-Qwen/Qwen-VL}
cd_alpha=${2:-1}
cd_beta=${3:-0.2}
noise_step=${4:-500}
shift $(( $# > 4 ? 4 : $# )) || true

question_file=${QUESTION_FILE:-data/MMMU/mmmu_val.jsonl}
image_folder=${IMAGE_FOLDER:-/data/MMMU}
out_dir=${OUT_DIR:-output/calibrate/llava_mmmu}
mkdir -p "${out_dir}"

common=(--model-path "${model_path}" --model-family qwen
        --question-file "${question_file}" --image-folder "${image_folder}"
        --noise_step "${noise_step}")

python -m llava_align_tpu.runners.mmmu "${common[@]}" \
    --answers-file "${out_dir}/qwen_naive.jsonl" "$@"

python -m llava_align_tpu.runners.mmmu "${common[@]}" \
    --answers-file "${out_dir}/qwen_cd.jsonl" \
    --use_cd --cd_alpha "${cd_alpha}" --cd_beta "${cd_beta}" "$@"

python -m llava_align_tpu.runners.mmmu "${common[@]}" \
    --answers-file "${out_dir}/qwen_dd_both.jsonl" \
    --use_dd --use_dd_unk --cd_alpha "${cd_alpha}" --cd_beta "${cd_beta}" "$@"
