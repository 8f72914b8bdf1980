from llava_align_tpu.parallel.mesh import make_mesh  # noqa: F401
from llava_align_tpu.parallel.sharding import (  # noqa: F401
    cache_shardings,
    llava_param_shardings,
    shard_params,
)
