#!/bin/bash
# Sampling-sweep driver (capability parity: reference
# experiments/eval/sampling/run.sh — launches the qwen and instructblip
# decoding-config sweeps over a POPE split. The reference fans each out on
# its own CUDA device with nohup; here PARALLEL=1 opts into backgrounded
# fan-out and the default is serial. Eval-set sharding is available through
# --num-chunks/--chunk-idx (or --dist auto under multi-process jax).
#
# usage: run.sh [seed] [dataset] [split] [extra flags...]
set -e
cd "$(dirname "$0")/../.."

seed=${1:-55}
dataset_name=${2:-coco}
type=${3:-random}
shift $(( $# > 3 ? 3 : $# )) || true

if [[ "${dataset_name}" == "coco" || "${dataset_name}" == "aokvqa" ]]; then
  image_folder=${IMAGE_FOLDER:-/data/coco/val2014}
else
  image_folder=${IMAGE_FOLDER:-/data/gqa/images}
fi
data_root=${DATA_ROOT:-data}
question_file=${QUESTION_FILE:-${data_root}/POPE/${dataset_name}/${dataset_name}_pope_${type}.json}
out_dir=${OUT_DIR:-output/sampling}
mkdir -p "${out_dir}/qwen" "${out_dir}/blip"
pids=()

run_family() {  # run_family <family> <model_path>
  local family=$1 model_path=$2; shift 2
  local cmd=(python -m llava_align_tpu.runners.sampling
      --model-family "${family}"
      --model-path "${model_path}"
      --question-file "${question_file}"
      --image-folder "${image_folder}"
      --answers-file "${out_dir}/${family}/${family}_${dataset_name}_pope_${type}_answers_seed${seed}_setting.jsonl"
      --seed "${seed}" "$@")
  if [[ "${PARALLEL:-0}" == "1" ]]; then
    "${cmd[@]}" > "${out_dir}/${family}_${dataset_name}_${type}_seed${seed}.log" 2>&1 &
    pids+=($!)
  else
    "${cmd[@]}"
  fi
}

run_family qwen "${QWEN_MODEL_PATH:-Qwen/Qwen-VL}" "$@"
run_family blip "${BLIP_MODEL_PATH:-/ckpt/instructblip-vicuna-7b}" "$@"

if ((${#pids[@]})); then
  wait "${pids[@]}"
fi
