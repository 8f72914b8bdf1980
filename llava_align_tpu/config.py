"""Configuration dataclasses.

One typed config tree replaces the reference's per-script argparse knob set
(reference experiments/eval/calibrate/llava_calibrate.py:224-246) and the
HF model configs. Public knob names (`use_cd`, `use_dd`, `use_dd_unk`,
`cd_alpha`, `cd_beta`, `noise_step`, `temperature`, `top_p`, `top_k`,
`conv_mode`, `seed`) are preserved verbatim — BASELINE.json requires them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """LLaMA-family decoder config (the LLaVA language backbone)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32  # GQA-ready; LLaMA-1/2 7B/13B use MHA
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    # ---- presets ----

    @staticmethod
    def llava_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llava_13b() -> "LlamaConfig":
        return LlamaConfig(
            hidden_size=5120,
            intermediate_size=13824,
            num_layers=40,
            num_heads=40,
            num_kv_heads=40,
        )

    @staticmethod
    def tiny(vocab_size: int = 256) -> "LlamaConfig":
        """Small config for CPU tests."""
        return LlamaConfig(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            max_position_embeddings=512,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    """CLIP ViT vision tower config (reference uses openai/clip-vit-large-
    patch14-336; wrapper at experiments/llava/model/multimodal_encoder/
    clip_encoder.py)."""

    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5
    # Which hidden state to tap and which tokens to keep
    # (reference clip_encoder.py:29-37; llava-v1.5 uses -2 / 'patch').
    select_layer: int = -2
    select_feature: str = "patch"
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        # reference clip_encoder.py:76-78
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def clip_vit_l_336() -> "ClipVisionConfig":
        return ClipVisionConfig()

    @staticmethod
    def tiny() -> "ClipVisionConfig":
        return ClipVisionConfig(
            image_size=28,
            patch_size=14,
            hidden_size=32,
            intermediate_size=64,
            num_layers=3,
            num_heads=2,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    """Full LLaVA model: vision tower + projector + LLaMA decoder."""

    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision: ClipVisionConfig = dataclasses.field(default_factory=ClipVisionConfig)
    # 'linear' | 'mlp{N}x_gelu' | 'identity'
    # (reference multimodal_projector/builder.py:33-51; llava-v1.5: mlp2x_gelu)
    mm_projector_type: str = "mlp2x_gelu"
    # 'pad' (expand2square) | 'anyres' | None (plain processor)
    # (reference mm_utils.py:166-182)
    image_aspect_ratio: Optional[str] = "pad"
    # anyres grid resolutions (reference mm_utils.py:99-145)
    image_grid_pinpoints: Optional[str] = None
    mm_use_im_start_end: bool = False
    mm_use_im_patch_token: bool = False

    @property
    def num_image_tokens(self) -> int:
        return self.vision.num_patches

    @staticmethod
    def llava_v15_7b() -> "LlavaConfig":
        return LlavaConfig()

    @staticmethod
    def llava_v15_13b() -> "LlavaConfig":
        return LlavaConfig(text=LlamaConfig.llava_13b())

    @staticmethod
    def tiny(vocab_size: int = 256) -> "LlavaConfig":
        return LlavaConfig(
            text=LlamaConfig.tiny(vocab_size),
            vision=ClipVisionConfig.tiny(),
            mm_projector_type="mlp2x_gelu",
        )


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Decode-time knobs.

    Defaults mirror the reference sampler's internal fallbacks
    (vcd_utils/vcd_sample.py:188-189: cd_alpha=0.5, cd_beta=0.1); eval
    scripts typically pass cd_alpha=1, cd_beta=0.1-0.2
    (llava_calibrate.py:243-244).
    """

    max_new_tokens: int = 64
    do_sample: bool = True
    temperature: float = 1.0
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    seed: int = 42

    # VDD / VCD branch switches (reference vcd_sample.py:122-124)
    use_cd: bool = False       # VCD: contrast against diffusion-noised image
    use_dd: bool = False       # VDD 'none': image tokens physically removed
    use_dd_unk: bool = False   # VDD 'unk' : image token ids replaced with 0
    cd_alpha: float = 0.5
    cd_beta: float = 0.1
    noise_step: int = 500      # forward-diffusion step for VCD (999 = pure noise)

    eos_token_id: int = 2
    pad_token_id: int = 0

    @property
    def num_branches(self) -> int:
        """Rows in the packed branch axis — MUST mirror
        decoding.engine.branch_kinds (reference vcd_sample.py:147-177):
        ONE primary contrast branch by priority cd > unk > none (the flags
        are not additive), plus the secondary 'none' row iff
        use_dd AND use_dd_unk."""
        primary = int(self.use_cd or self.use_dd_unk or self.use_dd)
        return 1 + primary + int(self.use_dd and self.use_dd_unk)

    @property
    def contrastive(self) -> bool:
        return self.use_cd or self.use_dd or self.use_dd_unk
