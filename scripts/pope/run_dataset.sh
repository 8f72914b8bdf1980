#!/bin/bash
# All-dataset POPE dispatcher (capability parity: reference
# experiments/scripts/pope/run_dataset.sh — loops datasets, launching the
# llava and qwen POPE drivers per dataset; the reference fans out one nohup'd
# process per CUDA device, here PARALLEL=1 opts into backgrounded fan-out and
# the default is serial — on TPU the DP mesh, not process fan-out, is the
# scale axis).
#
# usage: run_dataset.sh [temp] [models...]   (models default: llava qwen)
set -e
cd "$(dirname "$0")/../.."

temp=${1:-1.0}
shift $(( $# > 1 ? 1 : $# )) || true
models=("${@:-llava qwen}")
[[ "${models[0]}" == "llava qwen" ]] && models=(llava qwen)

read -r -a datasets <<< "${DATASETS:-aokvqa gqa coco}"
read -r -a extra <<< "${EXTRA_FLAGS:-}"
log_dir=${LOG_DIR:-output/pope_dataset_logs}
mkdir -p "${log_dir}"
pids=()

for dataset in "${datasets[@]}"; do
  for model_name in "${models[@]}"; do
    save_dir="${model_name}_temp${temp}"
    if [[ "${model_name}" == llava* ]]; then
      cmd=(bash scripts/pope/run_llava.sh "${SEED:-55}" "${dataset}" adversarial
           "${MODEL_PATH:-/ckpt/llava-v1.5-7b}" 1 0.2 --temperature "${temp}"
           "${extra[@]}")
    else
      cmd=(bash scripts/pope/run_qwen.sh "${dataset}" "${save_dir}" "${temp}"
           "${QWEN_MODEL_PATH:-Qwen/Qwen-VL-Chat}" 1 0.2 500 "${extra[@]}")
    fi
    echo "Running: ${cmd[*]}"
    if [[ "${PARALLEL:-0}" == "1" ]]; then
      "${cmd[@]}" > "${log_dir}/${save_dir}_${dataset}.log" 2>&1 &
      pids+=($!)
    else
      "${cmd[@]}" 2>&1 | tee "${log_dir}/${save_dir}_${dataset}.log"
    fi
  done
done

if ((${#pids[@]})); then
  wait "${pids[@]}"
fi
