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

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        B, T, HW, ITERS = 64, 16, 224, 10
    else:  # smoke mode off-TPU
        B, T, HW, ITERS = 1, 4, 64, 2

    # tsm_impl="auto" (default) = all-pallas trunk (whole-block fused
    # kernels everywhere, fused stem); frames arrive as RAW uint8 in 4x4
    # space-to-depth order — the order the host decoder emits for free —
    # and the stem kernel normalizes in VMEM (PERF.md round 2)
    # chain_blocks stays at the default False: measured slower on v5e
    # (PERF.md round 3 — 11.3k vs 13.0k frames/s; halo recompute loses)
    model = ResNet(depth=50, n_segment=T, dtype=jnp.bfloat16,
                   stem_input="s2d")
    rng = np.random.default_rng(0)
    n4 = HW // 4
    u8 = rng.integers(0, 256, size=(2, B * T, HW, HW, 3), dtype=np.uint8)
    s2d = (u8.reshape(2, B * T, n4, 4, n4, 4, 3)
           .transpose(0, 1, 2, 4, 3, 5, 6)
           .reshape(2, B * T, n4, n4, 48))
    stack = jnp.asarray(s2d)

    def make_run(model):
        @jax.jit
        def run(v, stack):
            def body(k, acc):
                x = jax.lax.dynamic_index_in_dim(stack, k % 2, 0,
                                                 keepdims=False)
                out = model.apply(v, x, train=False)
                # data-dependent accumulation so no iteration can be
                # elided
                return acc + jnp.sum(out) * (1.0 + 1e-6 * k)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        return run

    def init_and_warm(model):
        # param tree is chain-agnostic (_FusedBlockParams shares the
        # per-block variable paths), but init ALSO runs the forward, so
        # both steps sit behind the compile guard
        v = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), stack[0],
                               train=False)
        )()
        run = make_run(model)
        float(run(v, stack))  # compile + warm (fetch forces execution)
        return v, run

    variables, run = init_and_warm(model)

    t0 = time.perf_counter()
    _ = float(run(variables, stack))
    dt = time.perf_counter() - t0

    frames_per_sec = B * T * ITERS / dt

    # secondary: the OPT-IN W8A8 quantized trunk (PERF.md round 3) —
    # reported alongside, never as the headline (the vs_baseline number
    # stays the full-precision production default)
    int8_fps = None
    if on_tpu:
        try:
            from video_chapter_generation_tpu.ops.quantize import (
                calibrate_resnet_quant,
            )

            scales = calibrate_resnet_quant(model, variables, stack[0])
            qmodel = model.clone(quantize=True)
            qvars = {**variables, "quant": scales}
            qrun = make_run(qmodel)
            float(qrun(qvars, stack))  # compile + warm
            t0 = time.perf_counter()
            _ = float(qrun(qvars, stack))
            int8_fps = round(B * T * ITERS / (time.perf_counter() - t0), 1)
        except Exception as e:  # never let the opt-in path break the bench
            import sys

            print(f"int8 secondary bench failed: {e!r}", file=sys.stderr)
            int8_fps = None

    # analytic MFU (utils/flops.py: conv MACs x2 over the chip's spec
    # peak; elementwise/BN excluded — standard convention)
    from video_chapter_generation_tpu.utils.flops import (
        PEAK_BF16,
        PEAK_INT8,
        resnet_macs_per_frame,
    )

    flops_per_frame = 2 * resnet_macs_per_frame(HW)
    result = {
        "metric": "vision_embed_throughput",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
        "mfu": round(frames_per_sec * flops_per_frame / PEAK_BF16, 4),
    }
    if int8_fps:
        result["int8_frames_per_sec"] = int8_fps
        result["int8_mfu"] = round(
            int8_fps * flops_per_frame / PEAK_INT8, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
