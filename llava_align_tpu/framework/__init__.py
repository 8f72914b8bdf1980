from llava_align_tpu.framework.registry import registry  # noqa: F401

# Importing the package registers the built-in tasks (the reference's
# lavis/__init__.py does the same for its registries): a user reaching tasks
# only through `registry.get_task_class(...)` must not get None.
from llava_align_tpu.framework import tasks as _tasks  # noqa: E402,F401
from llava_align_tpu.framework import model_zoo as _model_zoo  # noqa: E402,F401
from llava_align_tpu.framework import datasets as _datasets  # noqa: E402,F401
