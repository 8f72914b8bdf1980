#!/bin/bash
# Full POPE driver matrix (capability parity: the reference sweeps seeds
# {42,53,55} x 3 datasets x 3 splits through scripts/pope/run_llava.sh,
# experiments/run.sh:1-10). Drives run_llava.sh + score.sh for every
# (dataset, split) at each seed, against the reference question files.
#
# usage: run_matrix.sh [model_path] [max_questions] [seeds...]
#   MODEL_PATH=random:tiny MAX_Q=0 (full splits) by default.
set -e
cd "$(dirname "$0")/../.."

model_path=${1:-random:tiny}
max_q=${2:-0}
shift $(( $# > 2 ? 2 : $# )) || true
seeds=("${@:-55}")

DATA_ROOT=${DATA_ROOT:-/root/reference/experiments/data}
OUT_DIR=${OUT_DIR:-output/pope_matrix}
mkdir -p "${OUT_DIR}"

extra=(--synthetic-images --batch-size 6 --max_new_tokens 8)
if [[ "${max_q}" != "0" ]]; then
  extra+=(--max-questions "${max_q}")
fi

for seed in "${seeds[@]}"; do
  for dataset in coco aokvqa gqa; do
    for split in random popular adversarial; do
      qf="${DATA_ROOT}/POPE/${dataset}/${dataset}_pope_${split}.json"
      echo "=== seed=${seed} dataset=${dataset} split=${split}"
      QUESTION_FILE="${qf}" OUT_DIR="${OUT_DIR}" \
        bash scripts/pope/run_llava.sh "${seed}" "${dataset}" "${split}" \
          "${model_path}" 1 0.2 "${extra[@]}"
      bash scripts/pope/score.sh "${qf}" \
        "${OUT_DIR}/llava15_${dataset}_pope_${split}_seed${seed}_both.jsonl"
    done
  done
done
echo "matrix done: $(ls ${OUT_DIR} | wc -l) answer files in ${OUT_DIR}"
