"""llava_align_tpu — a TPU-native (JAX/XLA/Pallas/pjit) debiased-decoding framework
for vision-language models.

Capability target: yfzhang114/LLaVA-Align (arXiv 2403.05262) — training-free
debiasing of VLMs via (1) Post-Hoc affine calibration of output probabilities and
(2) Visual Debias / Visual Contrastive Decoding (VDD/VCD) that contrasts the
logits of the full visual input against degraded-visual-input branches.

Design (TPU-first, not a port):
  * The reference's 2-3 *sequential* HF forwards per decoded token (one per
    contrast branch, each with its own python-side KV cache;
    reference vcd_utils/vcd_sample.py:109-185) become ONE jitted forward over a
    packed branch axis with a single on-device KV cache.
  * The reference's monkey-patch of transformers' GenerationMixin.sample
    (vcd_utils/vcd_sample.py:325-326) becomes a first-class, composable, fully
    on-device decode loop (lax.while_loop) with the VDD/VCD logit fusion,
    plausibility cutoff, and HF-order logit warpers fused into the step.
  * Parallelism is jax.sharding over a device mesh (data/model axes) instead of
    CUDA_VISIBLE_DEVICES fan-out / device_map="auto".
"""

__version__ = "0.1.0"

from llava_align_tpu import constants  # noqa: F401
from llava_align_tpu.config import (  # noqa: F401
    ClipVisionConfig,
    GenerationConfig,
    LlamaConfig,
    LlavaConfig,
)


def __getattr__(name):
    # lazy: importing the package should not pull in jax-heavy modules
    if name == "DecodeEngine":
        from llava_align_tpu.decoding.engine import DecodeEngine

        return DecodeEngine
    if name == "conv_templates":
        from llava_align_tpu.conversation import conv_templates

        return conv_templates
    raise AttributeError(name)
