"""Profiler-based single-block sweep: per-variant device time from HLO
events (trustworthy), not chained fori_loops (which add ~3ms/iteration of
overhead to custom calls and buried real differences — see PERF.md).

Each variant gets its own jitted call applying the block to NREP distinct
inputs and its own trace capture; the summed device durations of its
compute events are averaged over NREP.

Usage:
  python tools/profile_blocks.py --layer 2 --variants "plain;fused;fused:rows=14"
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_blocks import build_block_params, make_fn  # noqa: E402
import tools.profile_model as pm  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", type=int, default=2)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--nrep", type=int, default=4)
    ap.add_argument("--variants", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    c = 256 * 2 ** (args.layer - 1)
    hw = 56 // 2 ** (args.layer - 1)
    f = c // 4
    rng = np.random.default_rng(0)
    p = build_block_params(rng, c, f, jnp.bfloat16)
    xs = jnp.asarray(
        rng.standard_normal((args.nrep, args.b * args.t, hw, hw, c)) * 0.5,
        jnp.bfloat16)
    gb = 2 * xs[0].size * 2 / 1e9

    for variant in args.variants.split(";"):
        fn = make_fn(variant, p, args.t)

        @jax.jit
        def run(xs):
            total = 0.0
            for i in range(args.nrep):
                total += jnp.sum(fn(xs[i]).astype(jnp.float32))
            return total

        td = tempfile.mkdtemp(prefix="profblk_")
        pm.capture(lambda v: run(v), (xs,), td)
        evs = pm.load_device_events(td)
        ms = sum(
            e["dur"] / 1e3 for e in evs
            if e["args"]["hlo_category"] in (
                "convolution fusion", "custom-call", "data formatting",
                "loop fusion", "output fusion", "non-fusion elementwise")
            and "reduce" not in e["name"]
        ) / args.nrep
        print(json.dumps({
            "layer": args.layer, "variant": variant,
            "ms_per_call": round(ms, 3),
            "GBps_min_traffic": round(gb / (ms / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
