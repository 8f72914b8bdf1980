#!/bin/bash
# MME driver (capability parity: reference experiments/scripts/mme/run_llava.sh).
# usage: run_llava.sh [seed] [model_path] [extra flags...]
set -e
seed=${1:-42}
model_path=${2:-/ckpt/llava-v1.5-7b}
shift $(( $# > 2 ? 2 : $# )) || true

out_dir=${OUT_DIR:-output/mme}
mkdir -p "${out_dir}"
python -m llava_align_tpu.runners.mme \
    --model-path "${model_path}" \
    --question-file "${QUESTION_FILE:-data/MME/llava_mme.jsonl}" \
    --image-folder "${IMAGE_FOLDER:-/data/MME_Benchmark}" \
    --mme-data-root "${IMAGE_FOLDER:-/data/MME_Benchmark}" \
    --answers-file "${out_dir}/llava_mme_seed${seed}.jsonl" \
    --seed "${seed}" "$@"
