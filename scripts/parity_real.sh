#!/bin/bash
# One-command real-checkpoint numerics parity (VERDICT next-step 7).
#
# Takes a local llava-v1.5 checkpoint dir (config.json + safetensors/bin +
# tokenizer), converts it to JAX pytrees, and compares per tower against a
# torch oracle assembled from the checkpoint's OWN state dict
# (utils/parity_check.py):
#   - language tower: last-position logits vs a plain LlamaForCausalLM
#     carrying the model.*/lm_head.* keys (the liuhaotian format IS the
#     LLaMA key layout — AutoModelForCausalLM would silently mis-load it);
#   - with an image: vision tower + projector features vs torch
#     CLIPVisionModel + the mm_projector weights.
# Composed splice parity is pinned by tests/test_llava_arch_oracle.py.
# Exits nonzero when any deviation exceeds --tol.
#
#   usage: parity_real.sh <checkpoint_dir> [prompt] [image_path]
#
# This environment has no network egress and no cached checkpoints, so no
# real-7B run exists here yet — but the flow itself is EXECUTED by
# tests/test_parity_check_cli.py on a synthetic reduced-width checkpoint dir
# with the real on-disk format (HF key names, config.json schema, wordpiece
# tokenizer), including the corrupted-conversion failure path.
set -e
MODEL_PATH="${1:?usage: parity_real.sh <checkpoint_dir> [prompt] [image]}"
PROMPT="${2:-Is there a dog in the image?}"
IMAGE="${3:-}"

ARGS=(--model-path "$MODEL_PATH" --prompt "$PROMPT" --dtype float32 --tol 2e-3)
if [ -n "$IMAGE" ]; then ARGS+=(--image "$IMAGE"); fi
python -m llava_align_tpu.utils.parity_check "${ARGS[@]}"
