"""Pallas DMA probe: copy-kernel bandwidth vs XLA, across block shapes.
Chained fori_loop (y = copy(y)), scalar fetch.

RESOLVED (PERF.md round 2): the apparent 150-400 GB/s "pallas DMA
ceiling" this probe measures is an artifact of the chained harness —
custom calls pay ~3 ms/iteration inside fori_loops while XLA fusions do
not. A single pallas copy profiled per-HLO streams at 658 GB/s, matching
XLA. Kept as the reproducer of that pitfall.

Usage: python tools/bench_copy.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # L2-like tensor: [512, 28, 28, 512] bf16 = 411 MB
    shape = (512, 28, 28, 512)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(shape) * 0.1 + 1.0, jnp.bfloat16)
    gb = 2 * x0.size * 2 / 1e9  # read + write
    iters = 20

    def timed(name, fn):
        @jax.jit
        def run(x):
            y = jax.lax.fori_loop(0, iters, lambda k, y: fn(y), x)
            return jnp.sum(y.astype(jnp.float32))

        float(run(x0))
        t0 = time.perf_counter()
        float(run(x0))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3),
                          "GBps": round(gb / dt, 1)}), flush=True)

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * jnp.asarray(1.0, x_ref.dtype)

    def pallas_copy(block, grid, name, dimsem=None, flat=None):
        n_ops = len(grid)

        def fn(x):
            xin = x if flat is None else x.reshape(flat)
            idx = {
                1: lambda i: (i,) + (0,) * (len(block) - 1),
                2: lambda i, j: (i, j) + (0,) * (len(block) - 2),
            }[n_ops]
            out = pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct(xin.shape, x.dtype),
                grid=grid,
                in_specs=[pl.BlockSpec(block, idx,
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(block, idx,
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                    dimension_semantics=dimsem,
                ),
            )(xin)
            return out.reshape(x.shape)

        timed(name, fn)

    timed("xla_mul", lambda y: y * jnp.asarray(1.0000001, y.dtype))

    b, h, w, c = shape
    # whole-sample blocks (12.8 MB), 512-step grid
    pallas_copy((1, h, w, c), (b,), "sample_12.8MB")
    pallas_copy((1, h, w, c), (b,), "sample_12.8MB_par",
                dimsem=("parallel",))
    # 4-sample blocks (51 MB)
    pallas_copy((4, h, w, c), (b // 4,), "4sample_51MB")
    # row tiles (1.8 MB), 2-D grid
    pallas_copy((1, 4, w, c), (b, h // 4), "rows4_1.8MB")
    pallas_copy((1, 4, w, c), (b, h // 4), "rows4_1.8MB_par",
                dimsem=("parallel", "parallel"))
    # flat 2-D view, 1 MB blocks
    m = b * h * w
    pallas_copy((2048, c), (m // 2048,), "flat_2MB", flat=(m, c))
    pallas_copy((8192, c), (m // 8192,), "flat_8.4MB", flat=(m, c))
    pallas_copy((16384, c), (m // 16384,), "flat_16.8MB", flat=(m, c))
    pallas_copy((32768, c), (m // 32768,), "flat_33MB", flat=(m, c))


if __name__ == "__main__":
    main()
