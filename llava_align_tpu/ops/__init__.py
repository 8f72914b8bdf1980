from llava_align_tpu.ops.noise import add_diffusion_noise, diffusion_schedule  # noqa: F401
from llava_align_tpu.ops.image import (  # noqa: F401
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    clip_normalize,
    clip_preprocess_jax,
    clip_preprocess_pil,
    expand2square,
)
