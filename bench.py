"""Headline benchmark: vision-embedding extraction throughput.

Measures the convert2vision_emb.py-equivalent hot path on one TPU chip:
uint8 frames -> fused normalize -> ResNet50-TSM -> [B, T, 2048] embeddings,
bf16 compute. Baseline target: 10_000 frames/sec/chip (BASELINE.json
north-star). Prints ONE JSON line.
"""

import json
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from video_chapter_generation_tpu.models.resnet import Resnet50TSM
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames

    on_tpu = jax.default_backend() == "tpu"
    # clip batch x 16 frames @ 224x224 (the system's frame contract)
    if on_tpu:
        B, T, HW = 16, 16, 224
        iters, warmup = 20, 3
    else:  # smoke mode off-TPU
        B, T, HW = 1, 4, 64
        iters, warmup = 2, 1

    model = Resnet50TSM(segments_size=T, shift_div=8, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # cycle distinct inputs so no execution-caching layer can cheat
    inputs = [
        jnp.asarray(rng.integers(0, 256, size=(B, T, HW, HW, 3),
                                 dtype=np.uint8))
        for _ in range(2)
    ]

    init_frames = normalize_frames(inputs[0], out_dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), init_frames, train=False)
    )()

    @jax.jit
    def embed(frames_u8):
        x = normalize_frames(frames_u8, out_dtype=jnp.bfloat16)
        return model.apply(variables, x, train=False)

    # warmup / compile
    for i in range(warmup):
        jax.block_until_ready(embed(inputs[i % 2]))

    t0 = time.perf_counter()
    for i in range(iters):
        out = embed(inputs[i % 2])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames_per_sec = B * T * iters / dt
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
