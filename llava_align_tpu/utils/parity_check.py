"""Numerics-parity checker: JAX vs HF-torch logits on a real checkpoint.

SURVEY §5 calls for "a numerics-parity checker (JAX vs reference logits)" as
the SPMD-world replacement for race detection. The test suite runs this on
tiny random models; this CLI runs it on a real checkpoint + prompt.

    python -m llava_align_tpu.utils.parity_check \
        --model-path /ckpt/llava-v1.5-7b --prompt "Is there a dog?" \
        [--image /path/img.jpg] [--dtype float32]
"""

from __future__ import annotations

import argparse

import numpy as np


def compare_logits(ours: np.ndarray, theirs: np.ndarray, top_k: int = 10) -> dict:
    diff = np.abs(ours - theirs)
    ours_top = np.argsort(-ours)[:top_k]
    theirs_top = np.argsort(-theirs)[:top_k]
    return {
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "top1_match": bool(ours_top[0] == theirs_top[0]),
        f"top{top_k}_overlap": int(len(set(ours_top.tolist()) & set(theirs_top.tolist()))),
        "ours_top1": int(ours_top[0]),
        "theirs_top1": int(theirs_top[0]),
    }


def main() -> None:
    import jax.numpy as jnp
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--prompt", default="Is there a dog in the image?")
    ap.add_argument("--image", default=None)
    ap.add_argument("--conv-mode", default="llava_v1")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from llava_align_tpu.models import llava as jl
    from llava_align_tpu.runners.common import build_prompt, load_image_tensor
    from llava_align_tpu.tokenization import tokenizer_image_token
    from llava_align_tpu.utils.hf_convert import load_llava_checkpoint

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    params, cfg = load_llava_checkpoint(args.model_path, dtype)
    tokenizer = AutoTokenizer.from_pretrained(args.model_path, use_fast=False)

    with_image = args.image is not None
    prompt, _ = build_prompt(args.prompt, args.conv_mode, with_image=with_image, one_word=True)
    ids = tokenizer_image_token(prompt, tokenizer)
    image = None
    if with_image:
        image = load_image_tensor(
            "", args.image, image_size=cfg.vision.image_size, transfer="float32"
        )
        image = jnp.asarray(image)[None]
    pad = -(-(len(ids) + (cfg.num_image_tokens if with_image else 0)) // 64) * 64
    logits, length = jl.forward_multimodal(params, cfg, ids, image, pad_to=pad)
    ours = np.asarray(logits[length - 1])

    # HF reference forward (torch CPU)
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(
        args.model_path, torch_dtype=torch.float32, trust_remote_code=True
    ).eval()
    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor([ids])).logits[0, -1].numpy()

    print(compare_logits(ours, theirs))


if __name__ == "__main__":
    main()
