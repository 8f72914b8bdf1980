#!/bin/bash
# Qwen-VL POPE driver (capability parity: reference
# experiments/scripts/pope/run_qwen.sh — positional dataset/save_dir/temp/
# model/alpha/beta/noise_step defaults, then one calibrate run per split
# adversarial → popular → random with --use_dd --use_dd_unk).
#
# usage: run_qwen.sh [dataset] [save_dir] [temp] [model_path] [cd_alpha] [cd_beta] [noise_step] [extra flags...]
set -e

seed=${SEED:-55}
dataset_name=${1:-aokvqa}      # coco | aokvqa | gqa
save_dir=${2:-default}
temp=${3:-0.2}
model_path=${4:-Qwen/Qwen-VL-Chat}
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
out_dir=${OUT_DIR:-output/calibrate_best_sample}/${save_dir}
mkdir -p "${out_dir}"

for type in adversarial popular random; do
  python -m llava_align_tpu.runners.qwen_pope \
      --model-path "${model_path}" \
      --question-file "${QUESTION_FILE:-${data_root}/POPE/${dataset_name}/${dataset_name}_pope_${type}.json}" \
      --image-folder "${image_folder}" \
      --answers-file "${out_dir}/qwen_${dataset_name}_pope_${type}_seed${seed}_both.jsonl" \
      --noise_step "${noise_step}" \
      --temperature "${temp}" --seed "${seed}" \
      --cd_alpha "${cd_alpha}" --cd_beta "${cd_beta}" \
      --use_dd --use_dd_unk --calibrate "$@"
  # single-split mode for tiny live checks (QUESTION_FILE pins one file).
  # NOT `[[ ... ]] && break`: a failed test as the loop's last command
  # would leak exit status 1 from a fully successful run.
  if [[ -n "${QUESTION_FILE}" ]]; then break; fi
done
