from llava_align_tpu.framework.registry import registry  # noqa: F401
