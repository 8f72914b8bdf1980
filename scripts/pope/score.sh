#!/bin/bash
# Score POPE answers: plain + calibrated (reference eval_pope.py /
# eval_pope_calibrate.py invocation pattern).
# usage: score.sh <gt_file> <gen_file>
set -e
python - "$1" "$2" <<'PY'
import sys
from llava_align_tpu.evals.pope import (
    format_calibrated_report, load_jsonl, score_pope, score_pope_calibrated)
gt, gen = load_jsonl(sys.argv[1]), load_jsonl(sys.argv[2])
try:
    m = score_pope(gt, gen, gt_name=sys.argv[1], gen_name=sys.argv[2])
    print(f"Precision: {m['precision']}\nRecall: {m['recall']}\nF1: {m['f1']}\n"
          f"Accuracy: {m['accuracy']}\nyes: {m['yes_ratio']}\nunknow: {m['unknown_ratio']}")
    if gen and all(("none" in r and "unk" in r) for r in gen):
        print(format_calibrated_report(score_pope_calibrated(
            gt, gen, gt_name=sys.argv[1], gen_name=sys.argv[2])))
except ValueError as e:
    print(f"score.sh: {e}", file=sys.stderr)
    sys.exit(1)
PY
