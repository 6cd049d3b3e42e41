"""Mesh/sharding tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from video_chapter_generation_tpu.parallel import (
    DATA_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    shard_batch,
    shard_params_zero,
)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(model=2)
    assert mesh2.shape[DATA_AXIS] == 4 and mesh2.shape["model"] == 2


def test_shard_batch_and_psum():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding == batch_sharding(mesh)

    @jax.jit
    def total(b):
        return jnp.sum(b["x"])

    assert float(total(sharded)) == float(np.sum(batch["x"]))


def test_shard_params_zero_specs():
    mesh = make_mesh()
    tree = {
        "big": np.zeros((1024, 64), np.float32),   # shardable on axis 0
        "small": np.zeros((4,), np.float32),       # replicated (too small)
        "odd": np.zeros((999, 333), np.float32),   # no axis divisible by 8
    }
    specs = shard_params_zero(mesh, tree, min_size=100)
    assert specs["big"].spec == P(DATA_AXIS, None)
    assert specs["small"].spec == P()
    assert specs["odd"].spec == P()


def test_local_batch_size():
    mesh = make_mesh()
    assert local_batch_size(32, mesh) == 4
