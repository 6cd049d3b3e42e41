"""Thin distributed layer: initialization + host-level collectives.

TPU-native replacement for the reference's `torch.distributed` surface
(`train_video_segment_ddp.py:40-95`): no TCP store / backend plumbing —
`jax.distributed.initialize()` handles multi-host; gradient reductions are
implicit in pjit-sharded steps; host-object gathers (per-rank metric lists,
`all_gather_object` at ddp.py:278) and object broadcast (resume metadata,
ddp.py:204) are pickled to uint8 arrays and moved with `multihost_utils`
(whose primitives are array-only).

Exercised for real in tests/test_dist_multiprocess.py: two spawned
processes on the CPU backend initialize a coordinator, gather per-rank
objects, broadcast from rank 0, and psum over the global mesh.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def _already_initialized() -> bool:
    """True when jax.distributed.initialize has run (or a launcher did it).
    Inspects the client handle only — must NOT touch the backend (device
    queries lock in single-process mode before initialize can run)."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kw) -> None:
    """Initialize multi-host JAX.

    Call BEFORE any jax device query (setup_ddp analogue,
    train_video_segment_ddp.py:40-89). With no coordinator_address this is
    a no-op: single-process runs need nothing, and TPU-pod launchers set
    the cluster env vars so `jax.distributed.initialize()` is automatic.
    Safe to call twice (second call is ignored).
    """
    if _already_initialized():
        return
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kw,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """rank-0 analogue: the process that writes checkpoints/logs."""
    return jax.process_index() == 0


def _pickle_u8(obj: Any) -> np.ndarray:
    return np.frombuffer(pickle.dumps(obj), np.uint8)


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process, ordered by
    process index (torch.distributed.all_gather_object analogue).

    multihost_utils.process_allgather is an ARRAY api, so: pickle ->
    uint8 -> allgather lengths -> pad to the max -> allgather payloads ->
    unpickle per rank.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    buf = _pickle_u8(obj)
    lens = np.asarray(
        multihost_utils.process_allgather(np.asarray(buf.size, np.int64))
    )  # [P]
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[: buf.size] = buf
    rows = np.asarray(
        multihost_utils.process_allgather(padded, tiled=False)
    )  # [P, max_len]
    return [
        pickle.loads(rows[p, : int(lens[p])].tobytes())
        for p in range(rows.shape[0])
    ]


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a host object from the root process
    (torch.distributed.broadcast_object_list analogue). Non-root callers
    may pass anything (ignored); two rounds: length, then padded payload."""
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    is_src = jax.process_index() == root
    buf = _pickle_u8(obj) if is_src else np.zeros(0, np.uint8)
    n = int(
        multihost_utils.broadcast_one_to_all(
            np.asarray(buf.size, np.int64), is_source=is_src
        )
    )
    padded = np.zeros(n, np.uint8)
    if is_src:
        padded[:] = buf
    out = np.asarray(
        multihost_utils.broadcast_one_to_all(padded, is_source=is_src)
    )
    return pickle.loads(out.tobytes())


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
