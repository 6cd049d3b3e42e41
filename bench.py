"""Headline benchmark: vision-embedding extraction throughput.

Measures the convert2vision_emb.py-equivalent hot path on one TPU chip:
uint8 frames -> fused normalize -> ResNet50-TSM -> [B, T, 2048] embeddings,
bf16 compute, inference BN folded into the Pallas TSM-conv kernel.
Baseline target: 10_000 frames/sec/chip (BASELINE.json north-star).
Prints ONE JSON line.

Methodology: the measured region is an ON-DEVICE lax.fori_loop over ITERS
model applications (inputs alternate between two real frame batches), and
completion is forced by fetching the scalar result — through the tunneled
TPU runtime used here, block_until_ready is a no-op and only host fetches
synchronize (see PERF.md), so naive timing loops report fiction.
"""

import json
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from video_chapter_generation_tpu.models.resnet import ResNet
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        B, T, HW, ITERS = 32, 16, 224, 10
    else:  # smoke mode off-TPU
        B, T, HW, ITERS = 1, 4, 64, 2

    # tsm_impl="auto" (default) = the round-2 sweep's best inference mix:
    # whole-bottleneck fused kernels where activations dominate traffic
    # (layers 1-2), the per-conv1 pallas kernel elsewhere (PERF.md)
    model = ResNet(depth=50, n_segment=T, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    stack = jnp.asarray(
        rng.integers(0, 256, size=(2, B * T, HW, HW, 3), dtype=np.uint8)
    )

    x0 = normalize_frames(stack[0], out_dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    )()

    @jax.jit
    def run(v, stack):
        def body(k, acc):
            u8 = jax.lax.dynamic_index_in_dim(stack, k % 2, 0,
                                              keepdims=False)
            x = normalize_frames(u8, out_dtype=jnp.bfloat16)
            out = model.apply(v, x, train=False)
            # data-dependent accumulation so no iteration can be elided
            return acc + jnp.sum(out) * (1.0 + 1e-6 * k)
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    float(run(variables, stack))  # compile + warm (fetch forces execution)

    t0 = time.perf_counter()
    _ = float(run(variables, stack))
    dt = time.perf_counter() - t0

    frames_per_sec = B * T * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "vision_embed_throughput",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
