#!/bin/bash
# LLaVA-Bench driver (capability parity: reference experiments/scripts/
# llava_bench/llava_bench.bash — seeded answer generation over the 90
# qa90 questions, then GPT-4 pairwise judging).
# usage: llava_bench.bash [seed] [model_path] [extra flags...]
set -e
seed=${1:-53}
model_path=${2:-/ckpt/llava-v1.5-7b}
shift $(( $# > 2 ? 2 : $# )) || true

out_dir=${OUT_DIR:-output/llava_bench}
mkdir -p "${out_dir}"
answers="${out_dir}/llava_bench_seed${seed}.jsonl"

python -m llava_align_tpu.runners.pope \
    --model-path "${model_path}" \
    --question-file "${QUESTION_FILE:-data/qa90_questions.jsonl}" \
    --image-folder "${IMAGE_FOLDER:-/data/coco/val2014}" \
    --answers-file "${answers}" \
    --max_new_tokens 1024 \
    --seed "${seed}" "$@"

# judging (requires OPENAI_API_KEY; rule/context files as in the reference)
python - "${answers}" <<'PY'
import json, os, sys
from llava_align_tpu.evals.gpt_review import openai_judge, run_review, summarize_reviews
if not os.environ.get("OPENAI_API_KEY"):
    print("OPENAI_API_KEY not set; skipping GPT judging"); sys.exit(0)
root = os.environ.get("DATA_ROOT", "data")
load = lambda p: [json.loads(l) for l in open(p)]
questions = load(f"{root}/qa90_questions.jsonl")
ans1 = load(f"{root}/qa90_gpt4_answer.jsonl")
ans2 = load(sys.argv[1])
contexts = load(f"{root}/caps_boxes_coco2014_val_80.jsonl")
rules = json.load(open(f"{root}/rule.json"))
reviews = run_review(questions, ans1, ans2, contexts, rules, openai_judge(),
                     sys.argv[1].replace(".jsonl", "_review.jsonl"))
print(json.dumps(summarize_reviews(reviews), indent=2))
PY
