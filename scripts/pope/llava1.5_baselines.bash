#!/bin/bash
# LLaVA-1.5 baseline runs (capability parity: reference
# experiments/scripts/pope/llava1.5_baselines.bash — a naive run and a VCD
# run through llava_naive.py, then the plain POPE scorer).
#
# usage: llava1.5_baselines.bash [seed] [dataset] [split] [model_path] [cd_alpha] [cd_beta] [noise_step] [extra flags...]
set -e

seed=${1:-53}
dataset_name=${2:-coco}
type=${3:-random}
model_path=${4:-/ckpt/llava-v1.5-7b}
cd_alpha=${5:-1}
cd_beta=${6:-0.2}
noise_step=${7:-500}
shift $(( $# > 7 ? 7 : $# )) || true

if [[ "${dataset_name}" == "coco" || "${dataset_name}" == "aokvqa" ]]; then
  image_folder=${IMAGE_FOLDER:-/data/coco/val2014}
else
  image_folder=${IMAGE_FOLDER:-/data/gqa/images}
fi
data_root=${DATA_ROOT:-data}
question_file=${QUESTION_FILE:-${data_root}/POPE/${dataset_name}/${dataset_name}_pope_${type}.json}
out_dir=${OUT_DIR:-output/pope_baselines}
mkdir -p "${out_dir}"

# naive (no contrastive branches)
python -m llava_align_tpu.runners.pope \
    --model-path "${model_path}" \
    --question-file "${question_file}" \
    --image-folder "${image_folder}" \
    --answers-file "${out_dir}/llava15_${dataset_name}_pope_${type}_7b_seed${seed}.jsonl" \
    --noise_step "${noise_step}" \
    --seed "${seed}" "$@"

# vcd (diffusion-noised contrast branch)
python -m llava_align_tpu.runners.pope \
    --model-path "${model_path}" \
    --question-file "${question_file}" \
    --image-folder "${image_folder}" \
    --answers-file "${out_dir}/llava15_${dataset_name}_pope_${type}_7b_seed${seed}_vcd.jsonl" \
    --noise_step "${noise_step}" \
    --use_cd --cd_alpha "${cd_alpha}" --cd_beta "${cd_beta}" \
    --seed "${seed}" "$@"

bash "$(dirname "$0")/score.sh" "${question_file}" \
    "${out_dir}/llava15_${dataset_name}_pope_${type}_7b_seed${seed}.jsonl"
bash "$(dirname "$0")/score.sh" "${question_file}" \
    "${out_dir}/llava15_${dataset_name}_pope_${type}_7b_seed${seed}_vcd.jsonl"
