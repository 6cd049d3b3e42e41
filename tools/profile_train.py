"""Per-HLO device-time profile of ONE full training step on real TPU.

Same trace machinery as profile_model.py (device_duration events are
trustworthy through the axon tunnel), but the traced region is the
flagship TwoStreamWindow train step exactly as bench_train.py runs it:
forward (BERT-base + ResNet50-TSM + window attention), cross-entropy,
backward, grad clip + AdamW, BatchNorm batch-stat update.

Usage: python tools/profile_train.py [--b 4] [--top 40]
       [--dtype f32|bf16] [--impl tap3|...]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from profile_model import load_device_events, summarize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--impl", default=None,
                    help="tsm_impl override (default: model 'auto')")
    ap.add_argument("--no-trunk", action="store_true",
                    help="A/B: per-block fusedtrain kernels instead of "
                         "the cross-block trunk custom VJP")
    ap.add_argument("--no-s2d", action="store_true",
                    help="A/B: legacy float-frames feed (on-device "
                         "normalize + space-to-depth) instead of the "
                         "uint8 s2d production contract")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--task", default="segment",
                    choices=["segment", "title"])
    ap.add_argument("--remat", action="store_true",
                    help="title task: rematerialized encoder/decoder "
                         "layers (Seq2SeqConfig.remat)")
    ap.add_argument("--tiny-vocab", action="store_true",
                    help="title task: 8k vocab instead of 96103 — "
                         "isolates the vocab-CE cost")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    if args.task == "title":
        return profile_title(args)

    if args.no_trunk:
        import video_chapter_generation_tpu.models.resnet as _rn

        _rn.TRUNK_TRAIN = False

    from video_chapter_generation_tpu.core.config import Config
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames
    from video_chapter_generation_tpu.train.loop import create_train_state
    from video_chapter_generation_tpu.train.objectives import (
        clip_classification_loss,
    )
    from video_chapter_generation_tpu.train.optim import make_optimizer
    from video_chapter_generation_tpu.train.tasks import SegmentWindowTask

    cfg = Config()
    overrides = []
    # the config field is model.compute_dtype (default bfloat16); map
    # the flag both ways so the printed dtype matches what actually ran
    overrides.append("model.compute_dtype="
                     + ("bfloat16" if args.dtype == "bf16" else "float32"))
    if args.impl:
        overrides.append(f"model.tsm_impl={args.impl}")
    # production frame contract (see bench_train.py): uint8 s2d feed with
    # in-kernel normalize; --no-s2d A/Bs the legacy float-frames feed
    s2d = not args.no_s2d
    if s2d:
        overrides.append("model.stem_input=s2d")
    if overrides:
        cfg = cfg.apply_overrides(overrides)
    task = SegmentWindowTask(cfg, tiny=False, hw=224)
    W = 2 * cfg.data.window_size + 1
    seg = cfg.data.clip_frame_num
    L = cfg.data.max_text_len
    B = args.b

    variables = jax.jit(task.init_variables)()
    tx = make_optimizer(cfg.optim, variables["params"])
    state = create_train_state(variables, tx)

    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 256, (B, W, seg, 224, 224, 3),
                             dtype=np.uint8)
    if s2d:
        from video_chapter_generation_tpu.data.native_loader import (
            space_to_depth4,
        )

        frames_u8 = space_to_depth4(frames_u8)
    batch = {
        "img_clips": jnp.asarray(frames_u8),
        "text_ids": jnp.asarray(rng.integers(
            0, 1000, (B, W, L), dtype=np.int64).astype(np.int32)),
        "label": jnp.asarray(rng.integers(0, 2, (B,), dtype=np.int64)
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
    def step(state, batch, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (_, bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              batch_stats=bs, opt_state=opt_state)
        return state, loss

    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)
    float(loss)  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="vcgtrain_")
    with jax.profiler.trace(trace_dir):
        state, loss = step(state, batch, key)
        float(loss)  # host fetch forces completion inside the window
    evs = load_device_events(trace_dir)
    total = summarize(evs, args.top)
    frames = B * W * seg
    print(f"\n{frames} frames/step -> {1e3 * frames / total:.0f} frames/s "
          f"(device-time bound, dtype={args.dtype})")
    if args.keep:
        print("trace:", trace_dir)


def profile_title(args):
    """Per-HLO profile of ONE Pegasus-large title train step exactly as
    bench_train.py --task title runs it (masked CE + AdamW, bf16)."""
    import dataclasses
    import tempfile

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

    B, enc_len, dec_len = args.b, 512, 30
    s2s_cfg = Seq2SeqConfig.pegasus_large()
    if args.tiny_vocab:
        s2s_cfg = dataclasses.replace(s2s_cfg, vocab_size=8192)
    if args.remat:
        s2s_cfg = dataclasses.replace(s2s_cfg, remat=True)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = Seq2Seq(s2s_cfg, dtype=dt)
    enc0 = jnp.ones((1, 8), jnp.int32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), enc0, jnp.ones_like(enc0), enc0[:, :4]))()
    tx = make_optimizer(Config().optim, variables["params"])
    state = create_train_state(variables, tx)

    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.asarray(rng.integers(
            3, s2s_cfg.vocab_size, (B, enc_len)).astype(np.int32)),
        "dec_in": jnp.asarray(rng.integers(
            3, s2s_cfg.vocab_size, (B, dec_len)).astype(np.int32)),
        "dec_tgt": jnp.asarray(rng.integers(
            3, s2s_cfg.vocab_size, (B, dec_len)).astype(np.int32)),
    }

    def loss_fn(params, batch, key):
        logits = model.apply(
            {"params": params}, batch["text_ids"],
            jnp.ones_like(batch["text_ids"]), batch["dec_in"],
            jnp.ones_like(batch["dec_in"]),
            deterministic=False, rngs={"dropout": key},
        )
        return seq2seq_title_loss(
            logits, batch["dec_tgt"], jnp.ones_like(batch["dec_in"]))[0]

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    key = jax.random.PRNGKey(0)
    state, loss = step(state, batch, key)
    float(loss)  # compile + warm

    trace_dir = tempfile.mkdtemp(prefix="vcgtitle_")
    with jax.profiler.trace(trace_dir):
        state, loss = step(state, batch, key)
        float(loss)
    evs = load_device_events(trace_dir)
    total = summarize(evs, args.top)
    print(f"\nB={B} enc={enc_len} dec={dec_len} vocab={s2s_cfg.vocab_size} "
          f"remat={s2s_cfg.remat} -> {1e3 * B / total:.1f} examples/s "
          f"(device-time bound, dtype={args.dtype})")
    if args.keep:
        print("trace:", trace_dir)


if __name__ == "__main__":
    main()
