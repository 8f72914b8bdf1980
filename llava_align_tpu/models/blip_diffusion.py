"""BLIP-diffusion: subject-driven text-to-image generation components.

Capability parity: the reference's vendored LAVIS BlipDiffusion
(lavis/models/blip_diffusion_models/blip_diffusion.py + modeling_ctx_clip.py).
The reference delegates the heavy generative stack to the external
`diffusers` library (UNet2DConditionModel / AutoencoderKL / DDPM-DDIM
schedulers — blip_diffusion.py:13-20,119-191); diffusers is not installed in
this environment, so even the reference cannot run its UNet here. What the
reference itself implements — and what this module provides natively — is:

  * the subject-embedding path: BLIP-2 Q-Former multimodal features of the
    (subject image, subject text) pair through ProjLayer
    (forward_ctx_embeddings :878-915, ProjLayer :38-56);
  * CtxCLIPTextModel: a CLIP text encoder whose token-embedding sequence has
    the ctx embeddings spliced in at ctx_begin_pos before the causal stack
    (modeling_ctx_clip.py:181-240);
  * the DDPM training objective: noise the VAE latents at a random timestep
    with the Stable-Diffusion scaled-linear schedule and regress the noise
    (forward :224-264, MSE);
  * the DDIM sampling loop with classifier-free guidance (generate
    :473-560, _denoise_latent_step), against a caller-provided jittable
    `unet_apply(latents, t, text_embeddings) -> noise_pred` and
    `vae_decode(latents) -> images` — the pluggable seam standing in for
    diffusers' networks;
  * prompt amplification (_build_prompt :291-298).

The prompt-to-prompt attention controllers (ptp_utils.py) live in
models/ptp.py: AttentionStore + word-swap/refinement/reweight edit
controllers as hooks (`ptp.make_attn_hook`) the caller threads into its
unet_apply's attention sites — the same delegation seam as the UNet itself.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llava_align_tpu.models import clip as clip_mod
from llava_align_tpu.models import clip_vit, qformer
from llava_align_tpu.models.clip import ClipConfig
from llava_align_tpu.models.qformer import QFormerConfig
from llava_align_tpu.config import ClipVisionConfig
from llava_align_tpu.ops.layers import layer_norm, linear_bias as _proj, quick_gelu

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Stable-Diffusion DDPM schedule (scaled-linear betas)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    # SD-v1.5 scheduler config values (the reference's DDIMScheduler
    # .from_config('runwayml/stable-diffusion-v1-5')): inference timesteps
    # are shifted +1 and the last denoise targets ᾱ[0], not 1.0
    steps_offset: int = 1
    set_alpha_to_one: bool = False

    def alphas_cumprod(self) -> np.ndarray:
        betas = (
            np.linspace(
                self.beta_start**0.5, self.beta_end**0.5,
                self.num_train_timesteps, dtype=np.float64,
            )
            ** 2
        )
        return np.cumprod(1.0 - betas).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class BlipDiffusionConfig:
    vision: ClipVisionConfig = dataclasses.field(
        default_factory=lambda: ClipVisionConfig(
            image_size=224, patch_size=14, hidden_size=1024,
            intermediate_size=4096, num_layers=24, num_heads=16,
            select_layer=-1, select_feature="cls_patch", dtype=jnp.float32,
        )
    )
    qformer: QFormerConfig = dataclasses.field(
        default_factory=lambda: QFormerConfig(
            encoder_width=1024, cross_attention_freq=1, query_length=16,
            dtype=jnp.float32,
        )
    )
    text: ClipConfig = dataclasses.field(
        default_factory=lambda: ClipConfig(
            text=clip_mod.ClipTextConfig(width=768, num_heads=12, num_layers=12),
            embed_dim=768,
        )
    )
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    proj_hidden: int = 3072
    ctx_begin_pos: int = 2          # blip_diffusion.py _CTX_BEGIN_POS
    latent_scale: float = 0.18215   # SD VAE scaling (forward :226)

    @staticmethod
    def tiny(vocab_size: int = 64) -> "BlipDiffusionConfig":
        return BlipDiffusionConfig(
            vision=ClipVisionConfig(
                image_size=32, patch_size=16, hidden_size=32,
                intermediate_size=64, num_layers=2, num_heads=4,
                select_layer=-1, select_feature="cls_patch", dtype=jnp.float32,
            ),
            # ProjLayer is residual — qformer width must equal text width
            qformer=QFormerConfig(
                vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=64,
                encoder_width=32, cross_attention_freq=1, query_length=4,
                dtype=jnp.float32,
            ),
            text=ClipConfig.tiny(vocab_size),
            scheduler=SchedulerConfig(num_train_timesteps=50),
            proj_hidden=64,
        )


def init(rng: jax.Array, cfg: BlipDiffusionConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qd = cfg.qformer.hidden_size
    td = cfg.text.text.width
    ks = iter(jax.random.split(k4, 6))

    def w(o, i):
        return jax.random.normal(next(ks), (o, i), jnp.float32) / i**0.5

    return {
        "visual": clip_vit.init(k1, cfg.vision),
        "qformer": qformer.init(k2, cfg.qformer),
        "query_tokens": jax.random.normal(
            next(ks), (1, cfg.qformer.query_length, qd), jnp.float32
        ) * 0.02,
        "text": clip_mod.init(k3, cfg.text),
        # ProjLayer: LN → dense1 → QuickGELU → dense2 → +residual (:38-56)
        "proj": {
            "ln": {"scale": jnp.ones((qd,)), "bias": jnp.zeros((qd,))},
            "fc1": {"w": w(cfg.proj_hidden, qd), "b": jnp.zeros((cfg.proj_hidden,))},
            "fc2": {"w": w(td, cfg.proj_hidden), "b": jnp.zeros((td,))},
        },
    }


def proj_layer(params_proj: Params, x: jax.Array) -> jax.Array:
    """LN → dense1 → QuickGELU → dense2 → dropout(0) → +residual (:50-56)."""
    h = layer_norm(x, params_proj["ln"]["scale"], params_proj["ln"]["bias"], 1e-12)
    h = _proj(quick_gelu(_proj(h, params_proj["fc1"])), params_proj["fc2"])
    return h + x


def ctx_embeddings(
    params: Params, cfg: BlipDiffusionConfig,
    subject_pixels: jax.Array,     # [B, 3, H, W]
    subject_ids: jax.Array,        # [B, T] tokenized subject text (BERT)
    subject_mask: jax.Array,
) -> jax.Array:
    """Q-Former multimodal features of the subject pair → ProjLayer
    (forward_ctx_embeddings :878-886) → [B, Q, text_width]."""
    img = clip_vit.forward_features(params["visual"], cfg.vision, subject_pixels)
    B = img.shape[0]
    queries = jnp.broadcast_to(
        params["query_tokens"],
        (B,) + params["query_tokens"].shape[1:],
    )
    out = qformer.forward(
        params["qformer"], cfg.qformer, queries, img,
        text_ids=subject_ids, text_mask=subject_mask,
    )
    q = out[:, : cfg.qformer.query_length]
    return proj_layer(params["proj"], q)


def encode_prompt_ctx(
    params: Params, cfg: BlipDiffusionConfig,
    prompt_ids: jax.Array,                   # [B, S] CLIP-BPE ids
    ctx: Optional[jax.Array] = None,         # [B, Q, D] or None (uncond)
    *,
    ctx_begin_pos: Optional[int] = None,
) -> jax.Array:
    """CtxCLIPTextModel: splice ctx embeddings into the token sequence at
    ctx_begin_pos, positions run over the extended length, then the causal
    CLIP stack (modeling_ctx_clip.py:196-240) → last hidden [B, S(+Q), D]."""
    p = params["text"]
    cbp = cfg.ctx_begin_pos if ctx_begin_pos is None else ctx_begin_pos
    tok = p["token_embedding"][prompt_ids]
    if ctx is not None:
        tok = jnp.concatenate(
            [tok[:, :cbp], ctx.astype(tok.dtype), tok[:, cbp:]], axis=1
        )
    S = tok.shape[1]
    emb = tok + p["positional_embedding"][:S]
    return clip_mod.text_transformer(p, cfg.text, emb)


def add_noise(
    cfg: BlipDiffusionConfig,
    latents: jax.Array, noise: jax.Array, timesteps: jax.Array,
) -> jax.Array:
    """DDPM q(x_t | x_0) with the SD scaled-linear schedule:
    √ᾱ_t·x + √(1-ᾱ_t)·ε (the same closed form as ops/noise.py's VCD
    noising, different β schedule)."""
    acp = jnp.asarray(cfg.scheduler.alphas_cumprod())[timesteps]
    while acp.ndim < latents.ndim:
        acp = acp[..., None]
    return jnp.sqrt(acp) * latents + jnp.sqrt(1.0 - acp) * noise


def train_loss(
    params: Params, cfg: BlipDiffusionConfig,
    rng: jax.Array,
    latents: jax.Array,            # [B, C, h, w] VAE latents (pre-scaled by caller's VAE)
    prompt_ids: jax.Array,
    subject_pixels: jax.Array, subject_ids: jax.Array, subject_mask: jax.Array,
    unet_apply: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
) -> jax.Array:
    """The reference forward (:224-264): scale latents, noise at a uniform
    random timestep, condition the UNet on the ctx-CLIP prompt embedding,
    MSE on the noise residual."""
    k1, k2 = jax.random.split(rng)
    x0 = latents * cfg.latent_scale
    noise = jax.random.normal(k1, x0.shape, x0.dtype)
    t = jax.random.randint(
        k2, (x0.shape[0],), 0, cfg.scheduler.num_train_timesteps
    )
    noisy = add_noise(cfg, x0, noise, t)
    ctx = ctx_embeddings(params, cfg, subject_pixels, subject_ids, subject_mask)
    cond = encode_prompt_ctx(params, cfg, prompt_ids, ctx)
    pred = unet_apply(noisy, t, cond)
    return jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)


def ddim_timesteps(cfg: BlipDiffusionConfig, num_inference_steps: int) -> np.ndarray:
    """The reference samples with DDIMScheduler.from_config('runwayml/
    stable-diffusion-v1-5') (blip_diffusion.py:186-191) whose config carries
    steps_offset=1: 50 steps visit t=981..1, NOT 980..0."""
    T = cfg.scheduler.num_train_timesteps
    step = T // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int64)
    return ts + cfg.scheduler.steps_offset


def ddim_step(
    cfg: BlipDiffusionConfig,
    latents: jax.Array, noise_pred: jax.Array,
    t: int, t_prev: int,
) -> jax.Array:
    """Deterministic DDIM (η=0): x₀ = (x_t − √(1−ᾱ_t)ε)/√ᾱ_t;
    x_{t-1} = √ᾱ_prev·x₀ + √(1−ᾱ_prev)·ε. The final step (t_prev < 0) uses
    ᾱ[0] ≈ 0.99915, not 1.0 — the SD-v1.5 DDIM config is
    set_alpha_to_one=False (diffusers final_alpha_cumprod)."""
    acp = cfg.scheduler.alphas_cumprod()
    if t_prev >= 0:
        a_prev = float(acp[t_prev])
    else:
        a_prev = 1.0 if cfg.scheduler.set_alpha_to_one else float(acp[0])
    a_t = float(acp[t])
    x0 = (latents - (1.0 - a_t) ** 0.5 * noise_pred) / a_t**0.5
    return a_prev**0.5 * x0 + (1.0 - a_prev) ** 0.5 * noise_pred


def generate(
    params: Params, cfg: BlipDiffusionConfig,
    rng: jax.Array,
    prompt_ids: jax.Array,          # [1, S] amplified prompt (CLIP BPE)
    neg_prompt_ids: jax.Array,      # [1, S'] unconditional prompt
    subject_pixels: jax.Array, subject_ids: jax.Array, subject_mask: jax.Array,
    unet_apply: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    *,
    latent_shape: Tuple[int, ...] = (1, 4, 64, 64),
    guidance_scale: float = 7.5,
    num_inference_steps: int = 50,
    latents: Optional[jax.Array] = None,
    vae_decode: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> jax.Array:
    """The reference generate (:473-560): ctx-conditioned prompt embedding,
    unconditional embedding without ctx, classifier-free guidance, DDIM
    denoising; returns decoded images when `vae_decode` is given, else the
    final latents (pre-unscaled)."""
    ctx = ctx_embeddings(params, cfg, subject_pixels, subject_ids, subject_mask)
    cond = encode_prompt_ctx(params, cfg, prompt_ids, ctx)
    do_cfg = guidance_scale > 1.0
    if do_cfg:
        uncond = encode_prompt_ctx(params, cfg, neg_prompt_ids, None)
    if latents is None:
        latents = jax.random.normal(rng, latent_shape, jnp.float32)
    ts = ddim_timesteps(cfg, num_inference_steps)
    for i, t in enumerate(ts):
        t_arr = jnp.full((latents.shape[0],), int(t), jnp.int32)
        noise_c = unet_apply(latents, t_arr, cond)
        if do_cfg:
            noise_u = unet_apply(latents, t_arr, uncond)
            noise = noise_u + guidance_scale * (noise_c - noise_u)
        else:
            noise = noise_c
        t_prev = int(ts[i + 1]) if i + 1 < len(ts) else -1
        latents = ddim_step(cfg, latents, noise, int(t), t_prev)
    latents = latents / cfg.latent_scale
    return vae_decode(latents) if vae_decode is not None else latents


def build_prompt(
    prompts: Sequence[str], tgt_subjects: Sequence[str],
    *,
    prompt_strength: float = 1.0, prompt_reps: int = 20,
) -> List[str]:
    """Prompt amplification (:291-298): 'a {subject} {prompt}' repeated
    prompt_strength·prompt_reps times, comma-joined."""
    out = []
    for prompt, subject in zip(prompts, tgt_subjects):
        p = f"a {subject} {prompt.strip()}"
        out.append(", ".join([p] * int(prompt_strength * prompt_reps)))
    return out
