"""BLIP-diffusion components: ctx-CLIP parity vs the reference
modeling_ctx_clip.py torch oracle, DDPM/DDIM schedule math, training loss,
and the CFG generate loop with a stub UNet.
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llava_align_tpu.models import blip_diffusion as bd
from llava_align_tpu.models.blip_diffusion import BlipDiffusionConfig

V = 64


@pytest.fixture(scope="module")
def ref_ctx_clip():
    # newer transformers dropped the private _expand_mask helper the vendored
    # module imports — reinstate it (additive mask expansion)
    import transformers.models.clip.modeling_clip as mc

    if not hasattr(mc, "_expand_mask"):
        def _expand_mask(mask, dtype, tgt_len=None):
            bsz, src_len = mask.size()
            tgt_len = tgt_len if tgt_len is not None else src_len
            expanded = mask[:, None, None, :].expand(bsz, 1, tgt_len, src_len).to(dtype)
            inverted = 1.0 - expanded
            return inverted.masked_fill(
                inverted.to(torch.bool), torch.finfo(dtype).min
            )

        mc._expand_mask = _expand_mask

    # the vendored module passes return_dict= to CLIPEncoder, which modern
    # transformers no longer accepts — strip it
    if not getattr(mc.CLIPEncoder.forward, "_strips_return_dict", False):
        orig_fwd = mc.CLIPEncoder.forward

        def fwd(self, *args, **kw):
            kw.pop("return_dict", None)
            return orig_fwd(self, *args, **kw)

        fwd._strips_return_dict = True
        mc.CLIPEncoder.forward = fwd

    spec = importlib.util.spec_from_file_location(
        "ref_ctx_clip",
        "/root/reference/experiments/lavis/models/blip_diffusion_models/modeling_ctx_clip.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_ctx_clip"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ctx_clip_matches_reference(ref_ctx_clip):
    from transformers.models.clip.configuration_clip import CLIPTextConfig
    from llava_align_tpu.utils.hf_convert import convert_clip_full

    cfg = BlipDiffusionConfig.tiny(V)
    t = cfg.text.text
    hf_cfg = CLIPTextConfig(
        vocab_size=V, hidden_size=t.width, num_hidden_layers=t.num_layers,
        num_attention_heads=t.num_heads, intermediate_size=4 * t.width,
        max_position_embeddings=t.context_length, hidden_act="quick_gelu",
        attention_dropout=0.0, layer_norm_eps=1e-5, eos_token_id=V - 1,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = ref_ctx_clip.CtxCLIPTextModel(hf_cfg).eval()

    # map into our clip params via the HF-CLIPModel converter layout
    sd = {f"text_model.{k.split('text_model.', 1)[1]}": v.detach()
          for k, v in hf.state_dict().items() if "text_model." in k}
    D = t.width
    sd["visual_projection.weight"] = torch.zeros(cfg.text.embed_dim, cfg.text.vision.hidden_size if hasattr(cfg.text, "vision") else D)
    # minimal extra keys for convert_clip_full's vision branch: use zeros
    from transformers import CLIPVisionConfig as HfVis, CLIPVisionModel

    vis = CLIPVisionModel(HfVis(
        image_size=cfg.text.vision.image_size, patch_size=cfg.text.vision.patch_size,
        hidden_size=cfg.text.vision.hidden_size,
        num_hidden_layers=cfg.text.vision.num_layers,
        num_attention_heads=cfg.text.vision.num_heads,
        intermediate_size=cfg.text.vision.intermediate_size,
        hidden_act="quick_gelu", layer_norm_eps=1e-5,
    ))
    for k, v in vis.state_dict().items():
        sd[k] = v.detach()
    sd["visual_projection.weight"] = torch.zeros(cfg.text.embed_dim, cfg.text.vision.hidden_size)
    sd["text_projection.weight"] = torch.zeros(cfg.text.embed_dim, D)
    sd["logit_scale"] = torch.zeros(())
    text_params = convert_clip_full(sd, cfg.text)

    params = bd.init(jax.random.PRNGKey(0), cfg)
    params["text"] = text_params

    rng = np.random.default_rng(1)
    b, s, q = 2, 6, 3
    ids = rng.integers(1, V - 1, (b, s))
    ctx = rng.normal(size=(b, q, D)).astype(np.float32) * 0.3
    cbp = 2

    with torch.no_grad():
        want = hf(
            ctx_embeddings=torch.tensor(ctx), ctx_begin_pos=[cbp] * b,
            input_ids=torch.tensor(ids),
        )[0].numpy()
    got = np.asarray(bd.encode_prompt_ctx(
        params, cfg, jnp.asarray(ids), jnp.asarray(ctx), ctx_begin_pos=cbp
    ))
    assert got.shape == want.shape == (b, s + q, D)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    # no-ctx path == plain CLIP text hidden
    with torch.no_grad():
        want0 = hf(
            ctx_embeddings=None, ctx_begin_pos=None, input_ids=torch.tensor(ids)
        )[0].numpy()
    got0 = np.asarray(bd.encode_prompt_ctx(params, cfg, jnp.asarray(ids), None))
    np.testing.assert_allclose(got0, want0, atol=3e-5, rtol=1e-4)


def test_scheduler_and_add_noise():
    cfg = BlipDiffusionConfig.tiny(V)
    acp = cfg.scheduler.alphas_cumprod()
    assert acp.shape == (50,)
    assert (np.diff(acp) < 0).all() and 0 < acp[-1] < acp[0] < 1
    x = jnp.ones((2, 4, 8, 8))
    noise = jnp.full((2, 4, 8, 8), 2.0)
    t = jnp.asarray([0, 49])
    noisy = bd.add_noise(cfg, x, noise, t)
    want0 = np.sqrt(acp[0]) * 1.0 + np.sqrt(1 - acp[0]) * 2.0
    want1 = np.sqrt(acp[49]) * 1.0 + np.sqrt(1 - acp[49]) * 2.0
    np.testing.assert_allclose(float(noisy[0, 0, 0, 0]), want0, rtol=1e-5)
    np.testing.assert_allclose(float(noisy[1, 0, 0, 0]), want1, rtol=1e-5)


def test_ddim_timesteps_match_sd15_scheduler_config():
    """The reference samples with DDIMScheduler.from_config('runwayml/
    stable-diffusion-v1-5'): steps_offset=1 shifts 50 steps to t=981..1
    (not 980..0), and set_alpha_to_one=False makes the final denoise target
    ᾱ[0], not 1.0."""
    import dataclasses

    from llava_align_tpu.models.blip_diffusion import SchedulerConfig

    # the tiny() test config shrinks the schedule to 50 train steps; this
    # parity check needs the real SD-v1.5 1000-step schedule
    cfg = dataclasses.replace(
        BlipDiffusionConfig.tiny(V), scheduler=SchedulerConfig()
    )
    ts = bd.ddim_timesteps(cfg, 50)
    assert ts[0] == 981 and ts[-1] == 1
    ts10 = bd.ddim_timesteps(cfg, 10)
    assert ts10[0] == 901 and ts10[-1] == 1

    acp = cfg.scheduler.alphas_cumprod()
    # final step: x_prev = sqrt(acp[0])·x0 + sqrt(1-acp[0])·eps
    x = jnp.ones((1, 4, 2, 2))
    eps = jnp.full((1, 4, 2, 2), 0.5)
    out = bd.ddim_step(cfg, x, eps, int(ts10[-1]), -1)
    a_t, a_prev = float(acp[1]), float(acp[0])
    x0 = (np.asarray(x) - (1 - a_t) ** 0.5 * np.asarray(eps)) / a_t**0.5
    want = a_prev**0.5 * x0 + (1 - a_prev) ** 0.5 * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_ddim_recovers_x0_with_oracle_unet():
    """If the 'UNet' predicts the exact ε for the current latent, DDIM (η=0)
    preserves that ε's direction exactly: every step lands on
    √ᾱ_t·x₀ + √(1−ᾱ_t)·ε, ending at √ᾱ₀·x₀ + √(1−ᾱ₀)·ε (the SD-v1.5
    set_alpha_to_one=False terminal, NOT bare x₀)."""
    cfg = BlipDiffusionConfig.tiny(V)
    acp = cfg.scheduler.alphas_cumprod()
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))

    def oracle_unet(latents, t, cond):
        a = acp[int(t[0])]
        return (latents - np.sqrt(a) * x0) / np.sqrt(1 - a)

    params = bd.init(jax.random.PRNGKey(0), cfg)
    b, s = 1, 5
    prompt = jnp.asarray(rng.integers(1, V - 1, (b, s)))
    subj_px = jnp.asarray(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    subj_ids = jnp.asarray(rng.integers(1, 100, (b, 4)))
    subj_mask = jnp.ones((b, 4), jnp.int32)

    t0 = int(bd.ddim_timesteps(cfg, 10)[0])
    eps0 = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    start = bd.add_noise(cfg, x0, eps0, jnp.asarray([t0]))
    out = bd.generate(
        params, cfg, jax.random.PRNGKey(1), prompt, prompt,
        subj_px, subj_ids, subj_mask, oracle_unet,
        guidance_scale=1.0, num_inference_steps=10, latents=start,
    )
    a0 = float(acp[0])
    want = a0**0.5 * np.asarray(x0) + (1 - a0) ** 0.5 * np.asarray(eps0)
    np.testing.assert_allclose(
        np.asarray(out) * cfg.latent_scale, want, atol=1e-4, rtol=1e-4
    )


def test_train_loss_and_grads():
    cfg = BlipDiffusionConfig.tiny(V)
    params = bd.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    b = 2
    latents = jnp.asarray(rng.normal(size=(b, 4, 8, 8)).astype(np.float32))
    prompt = jnp.asarray(rng.integers(1, V - 1, (b, 6)))
    subj_px = jnp.asarray(rng.normal(size=(b, 3, 32, 32)).astype(np.float32))
    subj_ids = jnp.asarray(rng.integers(1, 100, (b, 4)))
    subj_mask = jnp.ones((b, 4), jnp.int32)

    def linear_unet(noisy, t, cond):
        # toy conditioning: scale by the mean of the text condition
        return noisy * 0.1 + cond.mean() * 0.01

    loss = bd.train_loss(
        params, cfg, jax.random.PRNGKey(2), latents, prompt,
        subj_px, subj_ids, subj_mask, linear_unet,
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: bd.train_loss(
            p, cfg, jax.random.PRNGKey(2), latents, prompt,
            subj_px, subj_ids, subj_mask, linear_unet,
        )
    )(params)
    gn = float(sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g)))
    assert np.isfinite(gn) and gn > 0


def test_build_prompt_matches_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_ctx_clip2",
        "/root/reference/experiments/lavis/models/blip_diffusion_models/modeling_ctx_clip.py",
    )
    # _build_prompt lives on BlipDiffusion which needs diffusers — replicate
    # the reference string behavior directly (blip_diffusion.py:291-298)
    prompts = ["swimming in a pool", " wearing a hat "]
    subjects = ["dog", "cat"]
    got = bd.build_prompt(prompts, subjects, prompt_strength=0.5, prompt_reps=4)
    want = [
        ", ".join(["a dog swimming in a pool"] * 2),
        ", ".join(["a cat wearing a hat"] * 2),
    ]
    assert got == want


def test_zoo_registers_blip_diffusion():
    import llava_align_tpu  # noqa: F401
    from llava_align_tpu.framework.registry import registry

    assert registry.get_model_class("blip_diffusion") is not None
