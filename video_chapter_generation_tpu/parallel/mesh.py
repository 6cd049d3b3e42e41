"""Device mesh + sharding helpers.

One named mesh ('data', 'model') replaces the reference's DDP/DeepSpeed/
Accelerate/DataParallel zoo (SURVEY §2.6): the data axis carries batch
sharding (DDP analogue) and optimizer-state sharding (ZeRO analogue); the
model axis is reserved for tensor parallelism. Collectives ride ICI via
XLA — no explicit NCCL-style calls.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
    axis_names=(DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D logical mesh. data=-1 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch dim sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def shard_params_zero(mesh: Mesh, tree, min_size: int = 2**14):
    """ZeRO-like sharding spec for optimizer state / replicated params:
    shard the largest axis divisible by the data-axis size; replicate small
    leaves. Returns a pytree of NamedShardings (same structure as `tree`).
    """
    ndata = mesh.shape[DATA_AXIS]

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest shardable axis
        order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
        for ax in order:
            if x.shape[ax] % ndata == 0:
                spec = [None] * x.ndim
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


def shard_params_tp(mesh: Mesh, tree, min_size: int = 2**12):
    """Tensor-parallel sharding spec over the 'model' axis: shard the last
    axis of every large-enough matrix/stack (Megatron column-parallel for
    [in, out] kernels; XLA/GSPMD inserts the matching collectives and
    row-parallel reshards on its own). Falls back to the first shardable
    axis, then to replication. Returns a pytree of NamedShardings.
    """
    nmodel = mesh.shape[MODEL_AXIS]

    def spec_for(x):
        if (not hasattr(x, "shape") or x.ndim < 2 or x.size < min_size
                or nmodel == 1):
            return NamedSharding(mesh, P())
        for ax in (x.ndim - 1, *range(x.ndim - 1)):
            if x.shape[ax] % nmodel == 0 and x.shape[ax] >= 2 * nmodel:
                spec = [None] * x.ndim
                spec[ax] = MODEL_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


@contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    ndata = mesh.shape[DATA_AXIS]
    assert global_batch % ndata == 0, (
        f"global batch {global_batch} not divisible by data axis {ndata}"
    )
    return global_batch // ndata
