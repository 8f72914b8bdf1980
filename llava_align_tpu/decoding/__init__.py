from llava_align_tpu.decoding.engine import DecodeEngine, GenerationOutput  # noqa: F401
from llava_align_tpu.decoding.sampler import fuse_contrastive_logits, warp_logits  # noqa: F401
