#!/bin/bash
# Qwen MME driver (capability parity: reference experiments/scripts/mme/
# run_qwen.sh — three setting runs over llava_mme.jsonl: dd-both, vcd,
# naive. The reference backgrounds each on its own CUDA device; here
# PARALLEL=1 opts into that fan-out and the default is serial — DP over the
# TPU mesh, not process fan-out, is the scale axis).
#
# usage: run_qwen.sh [model_path] [extra flags...]
set -e

model_path=${1:-Qwen/Qwen-VL}
shift $(( $# > 1 ? 1 : $# )) || true
size=${SIZE:-VL}

question_file=${QUESTION_FILE:-data/MME/llava_mme.jsonl}
image_folder=${IMAGE_FOLDER:-/data/MME_Benchmark}
out_dir=${OUT_DIR:-output/mme/answers}
mkdir -p "${out_dir}"
pids=()

run_one() {  # run_one <answers-suffix> [setting flags...]
  local suffix=$1; shift
  local cmd=(python -m llava_align_tpu.runners.mme
      --model-path "${model_path}" --model-family qwen
      --question-file "${question_file}"
      --image-folder "${image_folder}"
      --mme-data-root "${image_folder}"
      --answers-file "${out_dir}/${size}-${suffix}.jsonl"
      "$@")
  if [[ "${PARALLEL:-0}" == "1" ]]; then
    "${cmd[@]}" > "${out_dir}/${size}-${suffix}.log" 2>&1 &
    pids+=($!)
  else
    "${cmd[@]}"
  fi
}

run_one use-dd-both-setting --use_dd --use_dd_unk "$@"
run_one use-cd-setting --use_cd "$@"
run_one naive-setting "$@"

if ((${#pids[@]})); then
  wait "${pids[@]}"
fi
