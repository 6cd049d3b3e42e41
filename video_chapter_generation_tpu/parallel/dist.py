"""Thin distributed layer: initialization + host-level collectives.

TPU-native replacement for the reference's `torch.distributed` surface
(`train_video_segment_ddp.py:40-95`): no TCP store / backend plumbing —
`jax.distributed.initialize()` handles multi-host; gradient reductions are
implicit in pjit-sharded steps; host-object gathers (per-rank metric lists,
`all_gather_object` at ddp.py:278) map to `multihost_utils`.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax


def initialize(coordinator_address: Optional[str] = None, **kw) -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Safe no-op for single-process runs (the common single-slice case).
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kw)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """rank-0 analogue: the process that writes checkpoints/logs."""
    return jax.process_index() == 0


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (torch.distributed.all_gather_object analogue)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a host object from the root process."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj, is_source=jax.process_index() == root)


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
