"""Long-context scaling: block-sparse vs full encoder attention on TPU.

Measures DEVICE time (per-HLO trace — the only trustworthy timing through
the axon tunnel, tools/profile_model.py) of a Pegasus-large-shaped
encoder forward (d=1024, 16 layers, 16 heads, ffn 4096, bf16) at
1k/2k/4k tokens, full vs block-sparse (HF BigBirdPegasus ITC layout,
block 64, 3 rand blocks) — the reason models/sparse_attention.py exists
(reference: model/lang/pegasus_bigbird.py:19 swaps to BigBird for long
chapters).

Vocab is shrunk to 2048: the embedding gather is seq-len-linear and
identical across modes, and a 96k-row table only slows init.

Usage: python tools/bench_sparse.py [--lens 1024,2048,4096] [--b 1]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.profile_model import capture, load_device_events, summarize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lens", default="1024,2048,4096")
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--modes", default="full,block_sparse")
    ap.add_argument("--block", type=int, default=64,
                    help="sparse block size (128 doubles the per-block "
                    "matmul M and halves grid steps — MXU utilization)")
    ap.add_argument("--top", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from video_chapter_generation_tpu.models.seq2seq import (
        Seq2Seq,
        Seq2SeqConfig,
    )

    rng = np.random.default_rng(0)
    base = dataclasses.replace(
        Seq2SeqConfig.bigbird_pegasus_large(),
        vocab_size=2048, decoder_layers=1, block_size=args.block,
    )
    results = {}
    for mode in args.modes.split(","):
        # sparse_gather / sparse_kernel select the block-sparse impl
        # (XLA gathered einsums vs the fused flash-style Pallas kernel,
        # ops/sparse_attention_pallas.py)
        if mode.startswith("sparse_"):
            cfg = dataclasses.replace(
                base, encoder_attention="block_sparse",
                sparse_impl=mode.split("_", 1)[1])
        else:
            cfg = dataclasses.replace(base, encoder_attention=mode)
        model = Seq2Seq(cfg, dtype=jnp.bfloat16)
        for L in (int(x) for x in args.lens.split(",")):
            ids = jnp.asarray(
                rng.integers(3, cfg.vocab_size, (args.b, L)), jnp.int32)
            mask = jnp.ones_like(ids)
            variables = jax.jit(
                lambda ids=ids, mask=mask: model.init(
                    jax.random.PRNGKey(0), ids, mask, ids[:, :4]))()

            @jax.jit
            def fn(v, ids, mask, model=model):
                return model.apply(
                    v, ids, mask, method=model.encode
                ).astype(jnp.float32).sum()

            trace_dir = tempfile.mkdtemp(prefix=f"sparse_{mode}_{L}_")
            capture(fn, (variables, ids, mask), trace_dir)
            total = summarize(load_device_events(trace_dir), top=args.top)
            results[(mode, L)] = total
            print(f"{mode:14s} L={L:5d}: {total:8.2f} ms device")

    print("\n| seq len | full (ms) | block_sparse (ms) | speedup |")
    print("|---|---|---|---|")
    for L in (int(x) for x in args.lens.split(",")):
        f = results.get(("full", L))
        s = results.get(("block_sparse", L))
        if f and s:
            print(f"| {L} | {f:.2f} | {s:.2f} | {f / s:.2f}x |")


if __name__ == "__main__":
    main()
