"""Per-HLO device-time profile of the vision-embed hot path on real TPU.

Captures a jax.profiler trace of ONE jitted model apply (the same model
bench.py measures), parses the Chrome-trace export (trace.json.gz), and
prints per-op device time aggregated by HLO category and by op name. The
device_duration fields are measured on-chip and are trustworthy even
through the axon tunnel (validated: an 8192^3 bf16 matmul profiles at
187 TFLOP/s ~= v5e peak).

Usage: python tools/profile_model.py [--b 32] [--t 16] [--impl auto] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(fn, args, trace_dir):
    import jax

    fn(*args)  # ensure compiled
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        # force execution inside the trace window (block_until_ready is a
        # no-op through the tunnel; a host fetch synchronizes)
        import jax.numpy as jnp
        float(jnp.sum(out.astype(jnp.float32)))


def load_device_events(trace_dir):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    data = json.load(gzip.open(paths[-1]))
    evs = data["traceEvents"]
    device_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    # tid==2 carries the module-level envelope event; tid>=3 carry per-HLO
    # events. Keep only per-HLO rows (they have hlo_category args).
    out = []
    for e in evs:
        if (e.get("ph") == "X" and e["pid"] in device_pids
                and "hlo_category" in e.get("args", {})):
            out.append(e)
    return out


def summarize(evs, top=40):
    by_cat = collections.Counter()
    by_op = collections.defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in evs:
        dur = e["dur"] / 1e3  # us -> ms
        total += dur
        a = e["args"]
        by_cat[a["hlo_category"]] += dur
        # group repeated loop iterations of the same op together
        name = e["name"].split(".")[0]
        src = a.get("source", "")
        rec = by_op[(name, a["hlo_category"], src)]
        rec[0] += dur
        rec[1] += 1
    print(f"TOTAL device time: {total:.3f} ms")
    print("\n== by HLO category ==")
    for cat, ms in by_cat.most_common():
        print(f"  {ms:9.3f} ms  {100*ms/total:5.1f}%  {cat}")
    print(f"\n== top {top} ops ==")
    rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top]
    for (name, cat, src), (ms, n, _) in rows:
        print(f"  {ms:9.3f} ms  x{n:<4d} {100*ms/total:5.1f}%  "
              f"[{cat}] {name}  ({src})")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--s2d", action="store_true",
                    help="feed raw-u8 space-to-depth frames (hot path)")
    ap.add_argument("--chain", action="store_true",
                    help="enable multi-block chain kernels (A/B; measured "
                         "slower on v5e, PERF.md round 3)")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 quantized trunk (layers 2-4 plain blocks; "
                         "calibrated on the benchmark frames)")
    ap.add_argument("--nochain", action="store_true",
                    help=argparse.SUPPRESS)  # legacy no-op (off is default)
    ap.add_argument("--keep", action="store_true",
                    help="keep the trace dir and print its path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_chapter_generation_tpu.models.resnet import ResNet
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames

    impl = args.impl
    if impl not in ("auto",):
        try:
            impl = json.loads(impl)  # e.g. '["fusedblk","pallas",...]'
        except json.JSONDecodeError:
            pass
    model = ResNet(depth=50, n_segment=args.t, dtype=jnp.bfloat16,
                   tsm_impl=impl, chain_blocks=args.chain,
                   quantize=args.int8,
                   stem_input="s2d" if args.s2d else "frames")
    rng = np.random.default_rng(0)
    u8np = rng.integers(
        0, 256, size=(args.b * args.t, args.hw, args.hw, 3), dtype=np.uint8)
    if args.s2d:
        n4 = args.hw // 4
        u8 = jnp.asarray(
            u8np.reshape(-1, n4, 4, n4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
            .reshape(-1, n4, n4, 48))
    else:
        u8 = jnp.asarray(u8np)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           u8 if args.s2d else normalize_frames(
                               u8, out_dtype=jnp.bfloat16),
                           train=False))()
    if args.int8:
        # calibrate on the same (random) frames: scales are realistic for
        # THIS input distribution, which is all a perf profile needs
        from video_chapter_generation_tpu.ops.quantize import (
            calibrate_resnet_quant,
        )

        base = model.clone(quantize=False)
        x = (u8 if args.s2d
             else normalize_frames(u8, out_dtype=jnp.bfloat16))
        scales = calibrate_resnet_quant(
            base, {k: v for k, v in variables.items() if k != "quant"}, x)
        variables = {**variables, "quant": scales}

    @jax.jit
    def run(v, u8):
        # note: XLA insists on a batch-minor layout for the u8 input and
        # pays a ~1.3ms copy into the pallas stem's default layout; a flat
        # 2-D param does not avoid it (layout assignment re-copies)
        x = (u8 if args.s2d
             else normalize_frames(u8, out_dtype=jnp.bfloat16))
        return model.apply(v, x, train=False)

    trace_dir = tempfile.mkdtemp(prefix="vcgprof_")
    capture(lambda v, u: run(v, u), (variables, u8), trace_dir)
    evs = load_device_events(trace_dir)
    total = summarize(evs, args.top)
    frames = args.b * args.t
    print(f"\n{frames} frames -> {1e3 * frames / total:.0f} frames/s "
          f"(device-time bound)")
    if args.keep:
        print("trace:", trace_dir)


if __name__ == "__main__":
    main()
