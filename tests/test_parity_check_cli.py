"""Execute the real-checkpoint parity flow (scripts/parity_real.sh →
utils/parity_check.main) end-to-end on a synthetic reduced-width llava-v1.5
checkpoint DIRECTORY — real HF key names + config.json schema + a wordpiece
tokenizer on disk (tests/ckpt_fixture.py). Real weights don't exist in this
environment (VERDICT standing ask), so this pins the tool ITSELF: the day
checkpoints appear, the harness must run, not just be documented.

Also pins the two defects the round-4 rewrite fixed:
- the torch language oracle is built from the checkpoint's own state dict as
  a plain LlamaForCausalLM (AutoModelForCausalLM maps model_type 'llava' to
  LlavaForConditionalGeneration, whose language_model.* key layout silently
  mismatches the liuhaotian format — it would compare randomly initialized
  weights);
- --image compares the vision tower + projector against torch CLIP instead
  of feeding the -200 image sentinel into a text-only torch forward.
"""

import json

import numpy as np
import pytest

pytest.importorskip("safetensors.numpy")

from ckpt_fixture import build_tiny_llava_checkpoint, small_vision_config


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("llava_ckpt")
    # 4 vision layers / 112px keep the torch+jax CLIP towers fast; the full
    # 24-layer/336px layout is pinned by test_real_config_schema.py
    build_tiny_llava_checkpoint(d, vision_layers=4, image_size=112, with_tokenizer=True)
    return d


def test_text_logits_match_torch_oracle(ckpt_dir, capsys):
    from llava_align_tpu.utils.parity_check import main

    with small_vision_config(vision_layers=4, image_size=112):
        rc = main([
            "--model-path", str(ckpt_dir),
            "--prompt", "Is there a dog in the image?",
            "--dtype", "float32",
            "--tol", "1e-3",
        ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t = report["text_logits"]
    assert t["max_abs_diff"] < 1e-3
    assert t["top1_match"]
    assert t["top10_overlap"] >= 9


def test_image_path_compares_vision_tower(ckpt_dir, tmp_path, capsys):
    from PIL import Image

    from llava_align_tpu.utils.parity_check import main

    img = tmp_path / "img.png"
    rng = np.random.default_rng(7)
    Image.fromarray(rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)).save(img)

    with small_vision_config(vision_layers=4, image_size=112):
        rc = main([
            "--model-path", str(ckpt_dir),
            "--prompt", "Is there a dog in the image?",
            "--image", str(img),
            "--dtype", "float32",
            "--tol", "1e-3",
        ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    v = report["vision_projector_feats"]
    # fp32 vs fp32 on identical weights: agreement well inside feature scale
    # (random N(0,1) fixture weights blow the feature RMS up to ~3e3, so the
    # meaningful quantity is relative — measured ~6e-6 here)
    assert v["rel_max_diff"] < 1e-4
    # 112/14 = 8 → 64 patch features, projected to text width
    assert v["shape"][:2] == [1, 64]


def test_tol_gate_fails_on_conversion_bug(ckpt_dir, capsys, monkeypatch):
    """--tol must catch a conversion bug. A corrupted TENSOR on disk would
    reach both sides identically (the torch oracle reads the same file), so
    model the failure where it would actually occur — the converter:
    perturb one JAX-side weight post-load and the text comparison has to
    exceed tolerance and exit nonzero."""
    import jax.numpy as jnp

    from llava_align_tpu.utils import hf_convert
    from llava_align_tpu.utils.parity_check import main

    orig_load = hf_convert.load_llava_checkpoint

    def corrupting_load(path, dtype=jnp.bfloat16):
        params, cfg = orig_load(path, dtype)
        q = np.array(params["llama"]["layers"]["q"], np.float32)  # writable copy
        q[0] = q[0] + 0.5
        params["llama"]["layers"]["q"] = jnp.asarray(q, params["llama"]["layers"]["q"].dtype)
        return params, cfg

    # main() does `from ...hf_convert import load_llava_checkpoint` at call
    # time, so patching the hf_convert module attribute is seen
    monkeypatch.setattr(hf_convert, "load_llava_checkpoint", corrupting_load)
    with small_vision_config(vision_layers=4, image_size=112):
        rc = main([
            "--model-path", str(ckpt_dir),
            "--prompt", "Is there a dog in the image?",
            "--dtype", "float32",
            "--tol", "1e-3",
        ])
    assert rc == 1
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["text_logits"]["max_abs_diff"] > 1e-3
