"""Device-true micro-sweep of TSM bottleneck implementations on real TPU.

Chains ITERS applications of one bottleneck block (output fed back as the
next input, so no iteration can be elided) inside an on-device fori_loop,
and fetches a scalar reduction.

CAVEAT (PERF.md round 2): chained fori_loops add ~3 ms/iteration of
overhead to PALLAS CUSTOM CALLS specifically (XLA fusions are
unaffected), so pallas-vs-XLA comparisons here are heavily biased and
even pallas-vs-pallas deltas are compressed. Use
tools/profile_model.py's per-HLO device timings for kernel decisions;
this harness remains only for quick XLA-only comparisons.

Usage:
  python tools/bench_blocks.py --layer 1 --variants plain,fused:fpad=1
  python tools/bench_blocks.py --layer 2 --variants fused,fused:dimsem=,\
fused:conv1=fold

Variant grammar: name[:k=v,...] where name in {plain, xlashift, fused}.
Keys for fused: rows (int), fpad (0/1), conv1 (pair/fold/masked),
dimsem (parallel/empty). Prints one JSON line per variant.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_block_params(rng, c, f, dtype):
    import jax.numpy as jnp

    mk = lambda *s: jnp.asarray(
        rng.standard_normal(s) * (s[-2] if len(s) > 1 else 1) ** -0.5, dtype
    )
    aff = lambda n: (jnp.full((n,), 1.0, jnp.float32),
                     jnp.full((n,), 0.01, jnp.float32))
    return {
        "w1": mk(c, f), "w2": mk(3, 3, f, f) * 0.33, "w3": mk(f, c),
        "a1": aff(f), "a2": aff(f), "a3": aff(c),
    }


def make_fn(variant: str, p, t: int):
    import jax
    import jax.numpy as jnp

    from video_chapter_generation_tpu.ops.tsm_block_pallas import (
        tsm_bottleneck_pallas, tsm_bottleneck_reference)

    name, _, opts = variant.partition(":")
    kv = dict(s.split("=", 1) for s in opts.split(",") if s)
    args_tail = (p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"], t)

    if name == "plain":
        conv = lambda y, k: jax.lax.conv_general_dilated(
            y, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        c, f = p["w1"].shape

        def fn(x):
            y = conv(x, p["w1"].reshape(1, 1, c, f))
            y = jnp.maximum(y * p["a1"][0] + p["a1"][1], 0).astype(x.dtype)
            y = conv(y, p["w2"])
            y = jnp.maximum(y * p["a2"][0] + p["a2"][1], 0).astype(x.dtype)
            y = conv(y, p["w3"].reshape(1, 1, f, c))
            y = y * p["a3"][0] + p["a3"][1]
            return jnp.maximum(y + x, 0).astype(x.dtype)

        return fn
    if name == "xlashift":
        return lambda x: tsm_bottleneck_reference(x, *args_tail)
    if name == "fused":
        tuning = {}
        if "rows" in kv:
            tuning["rows"] = int(kv["rows"])
        if "fpad" in kv:
            tuning["fpad"] = bool(int(kv["fpad"]))
        if "conv1" in kv:
            tuning["conv1_mode"] = kv["conv1"]
        if "dimsem" in kv:
            tuning["dimsem"] = kv["dimsem"] or None
        return lambda x: tsm_bottleneck_pallas(x, *args_tail, tuning=tuning)
    raise SystemExit(f"unknown variant {name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", type=int, default=1)
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    c = 256 * 2 ** (args.layer - 1)
    hw = 56 // 2 ** (args.layer - 1)
    f = c // 4
    rng = np.random.default_rng(0)
    p = build_block_params(rng, c, f, jnp.bfloat16)
    x0 = jnp.asarray(
        rng.standard_normal((args.b * args.t, hw, hw, c)) * 0.5 + 0.5,
        jnp.bfloat16,
    )
    gb = 2 * x0.size * 2 / 1e9  # read + write, bf16

    for variant in args.variants.split(";"):
        fn = make_fn(variant, p, args.t)

        @jax.jit
        def run(x):
            y = jax.lax.fori_loop(0, args.iters, lambda k, y: fn(y), x)
            return jnp.sum(y.astype(jnp.float32))

        float(run(x0))  # compile + warm
        t0 = time.perf_counter()
        float(run(x0))
        dt = time.perf_counter() - t0
        ms = dt / args.iters * 1e3
        print(json.dumps({
            "layer": args.layer, "variant": variant, "ms_per_iter":
            round(ms, 3), "eff_GBps_minimal_traffic": round(gb / (ms / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
