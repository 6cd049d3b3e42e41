"""Probe: does XLA TPU stream int8 weights (inline convert fused into the
matmul) for decode-shaped matmuls? Compares a 16-layer FFN-like chain at
batch 8 (Pegasus-large decode shape) with bf16 weights vs int8 weights
(+per-output-channel bf16 scales). If the i8 variant's device time ~halves,
weight-only int8 decode is worth shipping without a custom kernel.

Run: python tools/probe_int8_text.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.profile_model import capture, load_device_events, summarize  # noqa: E402


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="decode",
                    choices=["decode", "bert"],
                    help="decode: Pegasus decode (8 tokens/step, "
                    "weight-streaming-bound). bert: the boundary "
                    "scorer's BERT-base encode shape (batch 16 x 100 "
                    "tokens = M 1600, D 768, F 3072, 12 layers) — "
                    "compute-bound, so int8 weights are NOT expected "
                    "to win; this run documents the measurement.")
    args = ap.parse_args()

    if args.shape == "bert":
        L, D, F, B = 12, 768, 3072, 1600
    else:
        L, D, F, B = 16, 1024, 4096, 8
    rng = np.random.default_rng(0)
    w1 = [jnp.asarray(rng.standard_normal((D, F)), jnp.bfloat16)
          for _ in range(L)]
    w2 = [jnp.asarray(rng.standard_normal((F, D)), jnp.bfloat16)
          for _ in range(L)]
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)

    STEPS = 30

    @jax.jit
    def chain_bf16(x, w1, w2):
        def body(i, x):
            for a, b in zip(w1, w2):
                x = jnp.dot(jnp.dot(x, a), b) / 64.0
            return x
        return jax.lax.fori_loop(0, STEPS, body, x).astype(jnp.float32)

    def quant(w):
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                     ).astype(jnp.int8)
        return q, s.astype(jnp.bfloat16)

    q1 = [quant(w) for w in w1]
    q2 = [quant(w) for w in w2]

    @jax.jit
    def chain_i8(x, q1, q2):
        def body(i, x):
            for (qa, sa), (qb, sb) in zip(q1, q2):
                x = jnp.dot(x, qa.astype(jnp.bfloat16)) * sa
                x = (jnp.dot(x.astype(jnp.bfloat16),
                             qb.astype(jnp.bfloat16)) * sb) / 64.0
            return x
        return jax.lax.fori_loop(0, STEPS, body, x).astype(jnp.float32)

    for name, fn, args in [("bf16", chain_bf16, (x, w1, w2)),
                           ("i8-weights", chain_i8, (x, q1, q2))]:
        d = tempfile.mkdtemp(prefix=f"probe_{name}_")
        capture(fn, args, d)
        evs = load_device_events(d)
        print(f"\n===== {name} =====")
        total = summarize(evs, top=8)
        print(f"per step: {total/30:.4f} ms")
    flops = 2 * L * (2 * B * D * F)  # 2 matmuls/layer, B*D*F MACs, 2 flops/MAC
    print(f"\nMXU floor at 197 TFLOPs bf16: {flops/197e12*1e3:.3f} ms/step")
    print(f"weights/step: bf16 {2*L*D*F*2/1e6:.0f} MB, "
          f"i8 {2*L*D*F/1e6:.0f} MB; HBM floor at 819GB/s: "
          f"{2*L*D*F*2/819e9*1e3:.3f} / {2*L*D*F/819e9*1e3:.3f} ms")


if __name__ == "__main__":
    main()
