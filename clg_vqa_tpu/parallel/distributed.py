"""Multi-host (multi-process) initialization.

Replaces the reference's NCCL bootstrap (``torch.distributed
.init_process_group(backend="nccl")`` + ``--local_rank``,
train_task.py:148-159) with ``jax.distributed.initialize``: each host joins
the global runtime, sees its local devices, and the (dp, mp) mesh in
parallel/mesh.py spans all hosts automatically (collectives ride ICI within
a slice and DCN across slices — at CLG-VQA's scale a single slice suffices,
SURVEY.md §2.2).

Input sharding across hosts: pass ``host_id()``/``num_hosts()`` into
``TrainPipeline`` (the DistributedSampler equivalent).
"""
from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """No-op on single-process; on multi-host pass the coordinator (or rely
    on cloud TPU auto-detection)."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def host_id() -> int:
    return jax.process_index()


def num_hosts() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """rank-0 gating (the reference's ``default_gpu`` flag)."""
    return jax.process_index() == 0
