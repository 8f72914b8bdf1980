from llava_align_tpu.models import clip_vit, llama, llava, projector  # noqa: F401
