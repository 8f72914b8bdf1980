#!/bin/bash
# One-command real-checkpoint numerics parity (VERDICT next-step 7).
#
# Takes a local llava-v1.5 checkpoint dir (config.json + safetensors/bin +
# tokenizer), converts it to JAX pytrees, runs one forward on a real prompt
# (and optional image) on this machine's accelerator, re-runs the same
# forward through HF torch on CPU, and prints per-position logit diffs +
# top-k agreement (utils/parity_check.py).
#
#   usage: parity_real.sh <checkpoint_dir> [prompt] [image_path]
#
# This environment has no network egress and no cached checkpoints, so this
# script documents the flow rather than having been run against real 7B
# weights here; the converter schema is pinned offline by
# tests/test_real_config_schema.py (real config.json contents + HF key-name
# manifest at reduced width) and every submodule by the torch-oracle parity
# suite (tests/test_*_parity.py).
set -e
MODEL_PATH="${1:?usage: parity_real.sh <checkpoint_dir> [prompt] [image]}"
PROMPT="${2:-Is there a dog in the image?}"
IMAGE="${3:-}"

ARGS=(--model-path "$MODEL_PATH" --prompt "$PROMPT" --dtype float32)
if [ -n "$IMAGE" ]; then ARGS+=(--image "$IMAGE"); fi
python -m llava_align_tpu.utils.parity_check "${ARGS[@]}"
