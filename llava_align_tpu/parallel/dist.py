"""Multi-process (multi-host) runtime helpers.

Capability parity: reference lavis/common/dist_utils.py —
init_distributed_mode (:57-92, NCCL env-rank init → jax.distributed),
get_world_size/get_rank/is_main_process (:41-55), main_process decorator
(:107). Under SPMD there is no process-group plumbing: jax.distributed wires
the hosts and GSPMD handles all collectives.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax


def init_distributed_mode(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES/JAX_PROCESS_ID, or standard TPU pod env). Returns True
    if a multi-process runtime is active.

    Unlike the reference's env-sniffing (dist_utils.py:57-92, which prints
    'Not using distributed mode' and continues), a real init failure here
    RAISES — only the already-initialized case is absorbed."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif os.environ.get("TPU_WORKER_HOSTNAMES"):
        jax.distributed.initialize()
    return jax.process_count() > 1


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def main_process(func: Callable) -> Callable:
    """Run only on process 0 (reference dist_utils.py:107-115)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return func(*args, **kwargs)
        return None

    return wrapper


def shard_questions(questions, num_chunks: Optional[int] = None, chunk_idx: Optional[int] = None):
    """Shard an eval set across processes (replaces the reference's
    --num-chunks / CUDA_VISIBLE_DEVICES fan-out, eval/sampling/run.sh:17-25)."""
    n = num_chunks if num_chunks is not None else get_world_size()
    k = chunk_idx if chunk_idx is not None else get_rank()
    from llava_align_tpu.runners.common import get_chunk

    # rank-derived indices: a rank past the ceil-chunk count legitimately
    # holds an empty shard (it still writes its part file for the merge)
    return (
        list(get_chunk(questions, n, k, allow_out_of_range=True))
        if n > 1 else list(questions)
    )
