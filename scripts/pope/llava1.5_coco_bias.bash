#!/bin/bash
# COCO bias probe (capability parity: reference
# experiments/scripts/pope/llava1.5_coco_bias.bash → test_samples_llava.py:
# identities/shapes/colors probe questions answered under none/noise/zero/one
# meaningless inputs, dumped per-probe to answer files).
#
# usage: llava1.5_coco_bias.bash [seed] [dataset] [split] [model_path] [noise_step] [extra flags...]
set -e

seed=${1:-55}
dataset_name=${2:-coco}
type=${3:-adversarial}
model_path=${4:-/ckpt/llava-v1.5-7b}
noise_step=${5:-500}
shift $(( $# > 5 ? 5 : $# )) || true

if [[ "${dataset_name}" == "coco" || "${dataset_name}" == "aokvqa" ]]; then
  image_folder=${IMAGE_FOLDER:-/data/coco/val2014}
else
  image_folder=${IMAGE_FOLDER:-/data/gqa/images}
fi
data_root=${DATA_ROOT:-data}
out_dir=${OUT_DIR:-output}
mkdir -p "${out_dir}"

python -m llava_align_tpu.runners.bias_probe \
    --model-path "${model_path}" \
    --question-file "${QUESTION_FILE:-${data_root}/POPE/${dataset_name}/${dataset_name}_pope_${type}.json}" \
    --image-folder "${image_folder}" \
    --answers-file "${out_dir}/all_${dataset_name}_bias_probe_seed${seed}.jsonl" \
    --noise_step "${noise_step}" \
    --seed "${seed}" "$@"
