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

import tools.profile_model as pm  # noqa: E402


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
    """Variant grammar: name[:k=v,...], name in {plain, xlashift, fused};
    fused keys: rows (int), fpad (0/1), conv1 (pair/fold/masked), dimsem
    (parallel/empty)."""
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
        if "nstack" in kv:
            tuning["nstack"] = bool(int(kv["nstack"]))
        if "gblk" in kv:
            tuning["gblk"] = int(kv["gblk"])
        return lambda x: tsm_bottleneck_pallas(x, *args_tail, tuning=tuning)
    raise SystemExit(f"unknown variant {name!r}")


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
