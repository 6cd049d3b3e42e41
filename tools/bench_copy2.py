"""Manual-DMA probe: concurrent explicit HBM->HBM copies from one kernel.

One grid step; x and o stay in HBM (ANY); the kernel issues K async copies
over row slices and waits for all. K=1 measures a single DMA stream's
bandwidth; K>1 measures aggregate across engines.

RESOLVED (PERF.md round 2): all K measure ~205 GB/s here because the
chained fori_loop harness adds ~3 ms/iteration to custom calls; a single
pallas copy profiled per-HLO streams at 658 GB/s. Kept as a reproducer.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = 512 * 28 * 28, 512
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((m, c)) * 0.1 + 1.0, jnp.bfloat16)
    gb = 2 * x0.size * 2 / 1e9
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

    def make_fn(k_streams):
        s = m // k_streams

        def kernel(x_ref, o_ref):
            def body(sems):
                copies = [
                    pltpu.make_async_copy(
                        x_ref.at[pl.ds(k * s, s)],
                        o_ref.at[pl.ds(k * s, s)],
                        sems.at[k],
                    )
                    for k in range(k_streams)
                ]
                for cp in copies:
                    cp.start()
                for cp in copies:
                    cp.wait()

            pl.run_scoped(body, sems=pltpu.SemaphoreType.DMA((k_streams,)))

        def fn(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(x)

        return fn

    for k in (1, 2, 4, 8, 16):
        timed(f"hbm2hbm_dma_x{k}", make_fn(k))


if __name__ == "__main__":
    main()
