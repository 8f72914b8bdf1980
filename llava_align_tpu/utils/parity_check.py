"""Numerics-parity checker: JAX vs HF-torch logits on a real checkpoint.

SURVEY §5 calls for "a numerics-parity checker (JAX vs reference logits)" as
the SPMD-world replacement for race detection. The test suite runs this on
tiny random models; this CLI runs it on a real checkpoint + prompt
(scripts/parity_real.sh is the one-command wrapper).

    python -m llava_align_tpu.utils.parity_check \
        --model-path /ckpt/llava-v1.5-7b --prompt "Is there a dog?" \
        [--image /path/img.jpg] [--dtype float32] [--tol 1e-3]

The torch oracle is assembled from the checkpoint's OWN state dict:

- **language tower**: a plain `transformers.LlamaForCausalLM` built from
  config.json dims, loading the `model.*`/`lm_head.*` keys directly. The
  liuhaotian llava-v1.5 format shares the LLaMA key layout (the reference's
  `llava_llama.py` subclasses LlamaForCausalLM), so this is exact.
  `AutoModelForCausalLM` can NOT be used here: modern transformers maps
  `model_type: "llava"` to `LlavaForConditionalGeneration`, whose
  `language_model.*` key layout silently mismatches the checkpoint — it
  would "load" randomly initialized weights and compare noise.
- **vision tower + projector** (with --image): `transformers.CLIPVisionModel`
  fed the `model.vision_tower.vision_tower.*` keys, select_layer /
  select_feature applied as in the reference `clip_encoder.py:31-39`, then
  the mm_projector weights applied in torch — compared against our
  `llava.encode_images` on the same preprocessed pixels.

Composed splice parity (image features interleaved into the LM input) is
pinned separately by tests/test_llava_arch_oracle.py against the reference's
own `prepare_inputs_labels_for_multimodal`; this CLI verifies that a SPECIFIC
converted checkpoint matches torch per tower, which is the per-checkpoint
question scripts/parity_real.sh answers.
"""

from __future__ import annotations

import argparse
import sys

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


def _t(arr, torch):
    return torch.tensor(np.asarray(arr), dtype=torch.float32)


def torch_language_oracle(sd: dict, hf_cfg: dict):
    """LlamaForCausalLM carrying the checkpoint's language weights."""
    import torch
    from transformers import LlamaConfig as TLlamaConfig
    from transformers import LlamaForCausalLM

    tcfg = TLlamaConfig(
        vocab_size=hf_cfg["vocab_size"],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_hidden_layers=hf_cfg["num_hidden_layers"],
        num_attention_heads=hf_cfg["num_attention_heads"],
        num_key_value_heads=hf_cfg.get(
            "num_key_value_heads", hf_cfg["num_attention_heads"]
        ),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        rope_theta=hf_cfg.get("rope_theta", 10000.0),
        max_position_embeddings=hf_cfg.get("max_position_embeddings", 4096),
    )
    model = LlamaForCausalLM(tcfg).eval().float()
    lang = {
        k: _t(v, torch)
        for k, v in sd.items()
        if (
            k.startswith("model.")
            and not k.startswith("model.vision_tower.")
            and not k.startswith("model.mm_projector.")
        )
        or k.startswith("lm_head.")
    }
    missing, unexpected = model.load_state_dict(lang, strict=False)
    # rotary inv_freq is a generated (often non-persistent) buffer
    missing = [k for k in missing if "rotary_emb.inv_freq" not in k]
    if missing:
        raise KeyError(f"language tower keys missing from checkpoint: {missing[:8]}")
    if unexpected:
        print(f"note: {len(unexpected)} non-LLaMA keys ignored "
              f"(e.g. {sorted(unexpected)[:3]})", file=sys.stderr)
    return model


def torch_vision_projector_feats(sd: dict, cfg, pixels: np.ndarray) -> np.ndarray:
    """CLIPVisionModel + mm_projector on [B,3,H,W] float32 pixels → features
    (the torch analog of llava.encode_images)."""
    import torch
    from transformers import CLIPVisionConfig as TClipCfg
    from transformers import CLIPVisionModel

    from llava_align_tpu.models.projector import num_layers

    v = cfg.vision
    tcfg = TClipCfg(
        hidden_size=v.hidden_size,
        intermediate_size=v.intermediate_size,
        num_hidden_layers=v.num_layers,
        num_attention_heads=v.num_heads,
        image_size=v.image_size,
        patch_size=v.patch_size,
    )
    model = CLIPVisionModel(tcfg).eval().float()
    prefix = "model.vision_tower.vision_tower."
    vsd = {k[len(prefix):]: _t(val, torch) for k, val in sd.items() if k.startswith(prefix)}
    missing, _ = model.load_state_dict(vsd, strict=False)
    missing = [k for k in missing if "position_ids" not in k]
    if missing:
        raise KeyError(f"vision tower keys missing from checkpoint: {missing[:8]}")

    with torch.no_grad():
        out = model(torch.tensor(pixels, dtype=torch.float32), output_hidden_states=True)
        feats = out.hidden_states[v.select_layer]
        if v.select_feature == "patch":
            feats = feats[:, 1:]
        x = feats
        n = num_layers(cfg.mm_projector_type)
        for i in range(n):
            if i > 0:
                x = torch.nn.functional.gelu(x)  # exact erf, nn.GELU default
            key_w = f"model.mm_projector.{2 * i}.weight"
            if key_w not in sd and n == 1:
                key_w = "model.mm_projector.weight"  # bare Linear projector
            w = _t(sd[key_w], torch)
            b = _t(sd[key_w.replace("weight", "bias")], torch)
            x = x @ w.T + b
    return x.numpy()


def main(argv=None) -> int:
    import jax.numpy as jnp
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--prompt", default="Is there a dog in the image?")
    ap.add_argument("--image", default=None)
    ap.add_argument("--conv-mode", default="llava_v1")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--tol", type=float, default=None,
                    help="exit nonzero when the text max_abs_diff (logits are "
                         "O(10)-scaled) or the vision rel_max_diff (features "
                         "are scale-free) exceeds this")
    args = ap.parse_args(argv)

    import json
    import os

    from transformers import AutoTokenizer

    from llava_align_tpu.models import llava as jl
    from llava_align_tpu.runners.common import build_prompt, load_image_tensor
    from llava_align_tpu.tokenization import tokenizer_image_token
    from llava_align_tpu.utils.hf_convert import load_llava_checkpoint, load_state_dict

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    model_path = os.path.expanduser(args.model_path)
    params, cfg = load_llava_checkpoint(model_path, dtype)
    with open(os.path.join(model_path, "config.json")) as f:
        hf_cfg = json.load(f)
    sd = load_state_dict(model_path)
    try:  # slow (sentencepiece) tokenizer when available, fast otherwise
        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=False)
    except Exception:
        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=True)

    report = {}

    # language tower: text-only last-position logits, ours vs torch LLaMA
    prompt, _ = build_prompt(args.prompt, args.conv_mode, with_image=False, one_word=True)
    ids = tokenizer_image_token(prompt, tokenizer)
    pad = -(-len(ids) // 64) * 64
    logits, length = jl.forward_multimodal(params, cfg, ids, None, pad_to=pad)
    ours = np.asarray(logits[length - 1])
    hf = torch_language_oracle(sd, hf_cfg)
    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor([ids])).logits[0, -1].numpy()
    report["text_logits"] = compare_logits(ours, theirs)

    # vision tower + projector on the provided image
    if args.image is not None:
        pixels = np.asarray(
            load_image_tensor(
                "", args.image, image_size=cfg.vision.image_size, transfer="float32"
            ),
            np.float32,
        )[None]
        ours_f = np.asarray(jl.encode_images(params, cfg, jnp.asarray(pixels)))
        theirs_f = torch_vision_projector_feats(sd, cfg, pixels)
        fd = np.abs(ours_f.astype(np.float64) - theirs_f.astype(np.float64))
        rms = float(np.sqrt((theirs_f.astype(np.float64) ** 2).mean()))
        report["vision_projector_feats"] = {
            "max_abs_diff": float(fd.max()),
            "mean_abs_diff": float(fd.mean()),
            "feat_rms": rms,
            # features are scale-free (the projector output feeds layernormed
            # residuals), so the gated quantity is relative to feature RMS
            "rel_max_diff": float(fd.max() / max(rms, 1e-12)),
            "shape": list(ours_f.shape),
        }
        report["note"] = (
            "composed splice parity is pinned by tests/test_llava_arch_oracle.py "
            "against the reference prepare_inputs_labels_for_multimodal"
        )

    print(json.dumps(report))
    if args.tol is not None:
        worst = max(
            v.get("rel_max_diff", v["max_abs_diff"])
            for v in report.values()
            if isinstance(v, dict)
        )
        if worst > args.tol:
            print(f"FAIL: deviation {worst} > tol {args.tol}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
