"""Training-throughput benchmark: flagship TwoStreamWindow train step.

Measures the full training step (BERT-base + ResNet50-TSM + window
attention forward, cross-entropy, backward, AdamW update, BatchNorm stat
update) on one TPU chip — the number the reference never publishes
(SURVEY §6). Prints ONE JSON line: steps/s and frames/s.

Methodology: the measured region is an on-device lax.fori_loop chaining
ITERS train steps (the state threads through; inputs alternate between two
real batches), and completion is forced by fetching the final loss —
block_until_ready is a no-op through the tunneled runtime (PERF.md).
"""

import json
import sys
import time

import numpy as np


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            return cast(argv[i + 1])
        return default

    import jax
    import jax.numpy as jnp
    import optax

    from video_chapter_generation_tpu.core.config import Config
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames
    from video_chapter_generation_tpu.train.loop import create_train_state
    from video_chapter_generation_tpu.train.objectives import (
        clip_classification_loss,
    )
    from video_chapter_generation_tpu.train.optim import make_optimizer
    from video_chapter_generation_tpu.train.tasks import SegmentWindowTask

    on_tpu = jax.default_backend() == "tpu"
    task_name = opt("--task", "segment", str)
    if task_name == "title":
        return bench_title(argv, on_tpu)
    if on_tpu:
        B, ITERS, tiny, hw = opt("--b", 4, int), 4, False, 224
    else:  # smoke mode off-TPU
        B, ITERS, tiny, hw = 1, 2, True, 32

    cfg = Config()
    overrides = []
    if tiny:
        overrides += ["data.clip_frame_num=4", "data.max_text_len=16"]
    impl = opt("--impl", None, str)   # tap3 | xla(split) | pallas
    if impl:
        overrides.append(f"model.tsm_impl={impl}")
    if "--no-trunk" in sys.argv:  # A/B: per-block fusedtrain kernels
        import video_chapter_generation_tpu.models.resnet as _rn

        _rn.TRUNK_TRAIN = False
    dtype = opt("--dtype", None, str)  # override model.compute_dtype
    if dtype:
        overrides.append(f"model.compute_dtype={dtype}")
    # production frame contract: loaders emit the uint8 4x4 space-to-depth
    # pack (native decoder / data.datasets s2d=True) and the fused training
    # stem normalizes in VMEM — no on-device transpose + normalize passes.
    # --no-s2d A/Bs the legacy [.., H, W, 3] float feed.
    s2d = on_tpu and "--no-s2d" not in argv
    if s2d:
        overrides.append("model.stem_input=s2d")
    if overrides:
        cfg = cfg.apply_overrides(overrides)
    task = SegmentWindowTask(cfg, tiny=tiny, hw=hw)
    W = 2 * cfg.data.window_size + 1
    seg = cfg.data.clip_frame_num
    L = cfg.data.max_text_len

    variables = jax.jit(task.init_variables)()
    tx = make_optimizer(cfg.optim, variables["params"])
    state = create_train_state(variables, tx)

    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(
        0, 256, (2, B, W, seg, hw, hw, 3), dtype=np.uint8)
    if s2d:
        from video_chapter_generation_tpu.data.native_loader import (
            space_to_depth4,
        )

        frames_u8 = space_to_depth4(frames_u8)
    batches = {
        "img_clips": jnp.asarray(frames_u8),
        # keep ids inside the tiny-mode vocab (128); out-of-range ids
        # gather NaN via jnp.take's fill mode and poison the smoke loss
        "text_ids": jnp.asarray(rng.integers(
            0, 128, (2, B, W, L), dtype=np.int64).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, (2, B), dtype=np.int64)
                             .astype(np.int32)),
    }

    def loss_fn(params, batch_stats, batch, key):
        img = (batch["img_clips"] if s2d
               else normalize_frames(batch["img_clips"]))
        (logits, _), mutated = task.model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, batch["text_ids"], jnp.ones_like(batch["text_ids"]),
            deterministic=False, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        loss, metrics = clip_classification_loss(logits, batch["label"])
        return loss, (metrics, mutated["batch_stats"])

    @jax.jit
    def run(state, batches, key):
        def body(k, carry):
            state, acc = carry
            batch = {name: jax.lax.dynamic_index_in_dim(v, k % 2, 0, False)
                     for name, v in batches.items()}
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (_, bs)), grads = grad_fn(
                state.params, state.batch_stats, batch,
                jax.random.fold_in(key, k),
            )
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=bs, opt_state=opt_state)
            return state, acc + loss
        state, acc = jax.lax.fori_loop(0, ITERS, body,
                                       (state, jnp.float32(0)))
        return state, acc

    key = jax.random.PRNGKey(0)
    state, acc = run(state, batches, key)
    float(acc)  # compile + warm (fetch forces execution)

    t0 = time.perf_counter()
    state, acc = run(state, batches, key)
    final_loss = float(acc) / ITERS
    dt = time.perf_counter() - t0

    steps_per_sec = ITERS / dt
    frames_per_sec = B * W * seg * ITERS / dt
    out = {
        "metric": "train_step_throughput",
        "value": round(steps_per_sec, 3),
        "unit": "steps/sec/chip",
        "frames_per_sec": round(frames_per_sec, 1),
        "batch": B, "window": W, "segment": seg,
        "loss": round(final_loss, 4),
    }
    if on_tpu:
        # analytic MFU: fwd = vision trunk per frame + BERT-base per
        # window text; fwd+bwd = 3x fwd (utils/flops.py conventions)
        from video_chapter_generation_tpu.utils.flops import (
            PEAK_BF16,
            bert_encode_macs,
            resnet_macs_per_frame,
        )

        fwd = 2 * (W * seg * resnet_macs_per_frame(hw)
                   + W * bert_encode_macs(L))
        out["mfu"] = round(
            steps_per_sec * B * 3 * fwd / PEAK_BF16, 4)
    print(json.dumps(out))


def bench_title(argv, on_tpu):
    """Title-model (Pegasus-large) train-step throughput — the
    reference's longest job (train_chapter_title_gen.py:158-169: 440
    epochs, batch 16, encoder 512 / decoder 30, masked CE + AdamW).

    Flags: --b BATCH (default 16), --dtype bf16|f32, --remat,
    --accum N, --enc-len L, --dec-len L, --tiny-vocab (8k instead of
    the real 96103 — isolates the vocab-CE cost), --pack N (sequence
    packing probe: N chapters per row — B/N rows of N*enc x N*dec; a
    SHAPE-equivalent throughput measurement of the packed-matmul
    structure — the additive block masks a production packed impl would
    add cost nothing, so ex/s here is the packed impl's ceiling.
    Attacks the decoder M=480-rows / hd=64 structural MXU loss,
    PERF.md round 4).
    Same fori_loop + final-loss-fetch methodology as the segment bench.
    """

    def opt(flag, default, cast):
        if flag in argv:
            i = argv.index(flag)
            return cast(argv[i + 1])
        return default

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from video_chapter_generation_tpu.core.config import Config
    from video_chapter_generation_tpu.models.seq2seq import (
        Seq2Seq,
        Seq2SeqConfig,
    )
    from video_chapter_generation_tpu.train.loop import create_train_state
    from video_chapter_generation_tpu.train.objectives import (
        seq2seq_title_loss,
    )
    from video_chapter_generation_tpu.train.optim import make_optimizer

    if on_tpu:
        B, ITERS = opt("--b", 16, int), 4
        enc_len = opt("--enc-len", 512, int)
        dec_len = opt("--dec-len", 30, int)
        s2s_cfg = Seq2SeqConfig.pegasus_large()
    else:  # smoke
        B, ITERS, enc_len, dec_len = 2, 2, 32, 8
        s2s_cfg = Seq2SeqConfig.tiny()
    if "--tiny-vocab" in argv:
        s2s_cfg = dataclasses.replace(s2s_cfg, vocab_size=8192)
    if "--remat" in argv:
        s2s_cfg = dataclasses.replace(s2s_cfg, remat=True)
    dtype = opt("--dtype", "bf16", str)
    accum = opt("--accum", 1, int)
    pack = opt("--pack", 1, int)
    assert B % pack == 0, (B, pack)
    rows, enc_row, dec_row = B // pack, enc_len * pack, dec_len * pack
    dt = jnp.bfloat16 if dtype in ("bf16", "bfloat16") else jnp.float32

    model = Seq2Seq(s2s_cfg, dtype=dt)
    cfg = Config()
    enc0 = jnp.ones((1, 8), jnp.int32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), enc0, jnp.ones_like(enc0), enc0[:, :4]))()
    ocfg = dataclasses.replace(
        cfg.optim, gradient_accumulation_steps=accum)
    tx = make_optimizer(ocfg, variables["params"])
    state = create_train_state(variables, tx)

    rng = np.random.default_rng(0)
    batches = {
        "text_ids": jnp.asarray(rng.integers(
            3, s2s_cfg.vocab_size, (2, rows, enc_row)).astype(np.int32)),
        "dec_in": jnp.asarray(rng.integers(
            3, s2s_cfg.vocab_size, (2, rows, dec_row)).astype(np.int32)),
        "dec_tgt": jnp.asarray(rng.integers(
            3, s2s_cfg.vocab_size, (2, rows, dec_row)).astype(np.int32)),
    }

    def loss_fn(params, batch, key):
        logits = model.apply(
            {"params": params}, batch["text_ids"],
            jnp.ones_like(batch["text_ids"]), batch["dec_in"],
            jnp.ones_like(batch["dec_in"]),
            deterministic=False, rngs={"dropout": key},
        )
        loss, _ = seq2seq_title_loss(
            logits, batch["dec_tgt"], jnp.ones_like(batch["dec_in"]))
        return loss

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, batches, key):
        def body(k, carry):
            state, acc = carry
            batch = {name: jax.lax.dynamic_index_in_dim(v, k % 2, 0, False)
                     for name, v in batches.items()}
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, jax.random.fold_in(key, k))
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
            return state, acc + loss
        state, acc = jax.lax.fori_loop(0, ITERS * accum, body,
                                       (state, jnp.float32(0)))
        return state, acc

    key = jax.random.PRNGKey(0)
    state, acc = run(state, batches, key)
    float(acc)  # compile + warm

    t0 = time.perf_counter()
    state, acc = run(state, batches, key)
    final_loss = float(acc)  # host fetch INSIDE the timed window
    dt_s = time.perf_counter() - t0
    micro = ITERS * accum
    out = {
        "metric": "title_train_step_throughput",
        "value": round(micro / dt_s, 3),
        "unit": "microbatch_steps/sec/chip",
        "examples_per_sec": round(B * micro / dt_s, 1),
        "tokens_per_sec": round(B * (enc_len + dec_len) * micro / dt_s, 1),
        "batch": B, "enc_len": enc_len, "dec_len": dec_len,
        "dtype": dtype, "remat": s2s_cfg.remat, "accum": accum,
        "pack": pack, "vocab": s2s_cfg.vocab_size,
        "loss": round(final_loss / micro, 4),
    }
    if on_tpu:
        from video_chapter_generation_tpu.utils.flops import (
            PEAK_BF16,
            seq2seq_macs,
        )

        # per-ROW flops at the packed lengths, over B/pack rows
        fwd = 2 * seq2seq_macs(
            enc_row, dec_row, s2s_cfg.encoder_layers,
            s2s_cfg.decoder_layers, s2s_cfg.d_model, s2s_cfg.ffn_dim,
            s2s_cfg.vocab_size) / pack
        # remat recomputes the fwd in bwd: 4x fwd instead of 3x
        mult = 4 if s2s_cfg.remat else 3
        out["mfu"] = round(
            (B * micro / dt_s) * mult * fwd / PEAK_BF16, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
