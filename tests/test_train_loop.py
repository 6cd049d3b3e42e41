"""End-to-end training vertical on the 8-device CPU mesh: a tiny text-only
BERT chapter classifier learns a synthetic separable task, checkpoints, and
resumes — the minimum slice of SURVEY §7 step 4."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.core import Config
from video_chapter_generation_tpu.models.bert import BertConfig, BertForChapter
from video_chapter_generation_tpu.train import (
    Trainer,
    clip_classification_loss,
    lr_multiplier,
    make_optimizer,
    no_decay_mask,
)


class TextTask:
    """Text-only boundary classification: label = (first token id < vocab/2)."""

    def __init__(self, cfg):
        self.model = BertForChapter(BertConfig.tiny(vocab_size=64),
                                    pretrain_stage=False)
        self.cfg = cfg

    def init_variables(self):
        ids = jnp.zeros((2, 8), jnp.int32)
        mask = jnp.ones((2, 8), jnp.int32)
        return self.model.init(jax.random.PRNGKey(0), ids, mask)

    def loss_fn(self, params, batch_stats, batch, rng):
        logits, _ = self.model.apply(
            {"params": params}, batch["text_ids"], batch["attention_mask"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = clip_classification_loss(logits, batch["label"])
        return loss, (metrics, batch_stats)

    def eval_fn(self, state, loader):
        correct = total = 0
        for batch in loader:
            logits, _ = self.model.apply(
                {"params": state.params}, jnp.asarray(batch["text_ids"]),
                jnp.asarray(batch["attention_mask"]),
            )
            correct += int((jnp.argmax(logits, -1) == jnp.asarray(batch["label"])).sum())
            total += len(batch["label"])
        acc = correct / total
        return acc, {"acc": acc}


def synthetic_batches(epoch, n_batches=4, batch=16, seed=0):
    rng = np.random.default_rng((seed, epoch))
    for _ in range(n_batches):
        ids = rng.integers(0, 64, size=(batch, 8)).astype(np.int32)
        label = (ids[:, 0] < 32).astype(np.int32)
        yield {
            "text_ids": ids,
            "attention_mask": np.ones((batch, 8), np.int32),
            "label": label,
        }


@pytest.fixture
def cfg(tmp_path):
    c = Config()
    c = c.apply_overrides(
        [
            "train.max_epochs=5",
            "train.eval_every_epochs=1",
            f'train.ckpt_dir="{tmp_path}/ckpt"',
            f'train.log_dir="{tmp_path}/logs"',
            "optim.learning_rate=0.005",
            "optim.lr_decay=false",
            "optim.gradient_accumulation_steps=2",
        ]
    )
    return c


@pytest.mark.slow
def test_trainer_learns_and_checkpoints(cfg, tmp_path):
    task = TextTask(cfg)
    trainer = Trainer(
        cfg=cfg, task=task,
        train_loader=lambda e: synthetic_batches(e, n_batches=8),
        eval_loader=lambda e: synthetic_batches(1000 + e, n_batches=2),
    )
    metrics = trainer.train()
    assert metrics["loss"] < 0.65  # learning happened
    assert trainer.best_result > 0.6

    # scalars written
    assert os.path.exists(os.path.join(str(tmp_path), "logs", "scalars.jsonl"))

    # resume: a fresh trainer picks up at epoch 5
    trainer2 = Trainer(
        cfg=cfg.apply_overrides(["train.max_epochs=6"]), task=task,
        train_loader=lambda e: synthetic_batches(e),
    )
    assert trainer2.start_epoch == 5
    assert int(trainer2.state.step) == int(trainer.state.step)
    trainer2.train()
    assert int(trainer2.state.step) > int(trainer.state.step)
    trainer2.ckpt.close()
    trainer.ckpt.close()


def test_lr_schedule_reference_semantics():
    from video_chapter_generation_tpu.core.config import OptimConfig

    cfg = OptimConfig(lr_decay=True, lr_decay_type="cosine", warmup_epochs=10,
                      final_epochs=100)
    assert lr_multiplier(0, cfg) == 1e-2  # max(0/10, 1e-2)
    assert lr_multiplier(5, cfg) == 0.5
    assert abs(lr_multiplier(50, cfg) - 0.5) < 1e-9  # cos(pi/2)
    assert lr_multiplier(100, cfg) == 0.001
    assert lr_multiplier(1000, cfg) == 0.001

    e = OptimConfig(lr_decay=True, lr_decay_type="exp", warmup_epochs=0,
                    final_epochs=100)
    assert lr_multiplier(10, e) == 1.0
    assert lr_multiplier(30, e) == 0.1
    assert lr_multiplier(50, e) == 0.01
    assert lr_multiplier(90, e) == 0.001


def test_no_decay_mask_rules():
    params = {
        "layer0": {"attention": {"query": {"kernel": np.zeros((2, 2)),
                                           "bias": np.zeros(2)}},
                   "output_ln": {"scale": np.zeros(2), "bias": np.zeros(2)}},
        "word_embeddings": {"embedding": np.zeros((4, 2))},
        "bn1": {"scale": np.zeros(2), "bias": np.zeros(2)},
        "head": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
    }
    mask = no_decay_mask(params)
    assert mask["layer0"]["attention"]["query"]["kernel"] is True
    assert mask["layer0"]["attention"]["query"]["bias"] is False
    assert mask["layer0"]["output_ln"]["scale"] is False
    assert mask["word_embeddings"]["embedding"] is False
    assert mask["bn1"]["scale"] is False
    assert mask["head"]["kernel"] is True


@pytest.mark.slow
def test_segment_window_task_s2d_feed_matches_frames():
    """stem_input='s2d' (raw uint8 space-to-depth feed) computes the same
    training loss as the legacy float-frames feed: the s2d fallback path
    un-s2ds and applies the same ImageNet affine normalize_frames uses."""
    from video_chapter_generation_tpu.data.native_loader import space_to_depth4
    from video_chapter_generation_tpu.train.tasks import SegmentWindowTask

    rng = np.random.default_rng(0)
    B, W, T, hw = 1, 3, 4, 16
    frames = rng.integers(0, 256, (B, W, T, hw, hw, 3), dtype=np.uint8)
    base = dict(text_ids=jnp.asarray(
        rng.integers(1, 100, (B, W, 12)), jnp.int32))
    base["attention_mask"] = jnp.ones_like(base["text_ids"])
    base["label"] = jnp.zeros((B,), jnp.int32)

    cfg = Config().apply_overrides([
        "data.clip_frame_num=4", "data.window_size=1",
        "model.compute_dtype=float32",
    ])
    losses = {}
    for mode in ("frames", "s2d"):
        c = cfg.apply_overrides([f"model.stem_input={mode}"])
        task = SegmentWindowTask(c, tiny=True, hw=hw, text_len=12)
        variables = task.init_variables()
        batch = dict(base)
        batch["img_clips"] = jnp.asarray(
            space_to_depth4(frames) if mode == "s2d" else frames)
        loss, _ = task.loss_fn(variables["params"],
                               variables["batch_stats"], batch,
                               jax.random.PRNGKey(1))
        losses[mode] = float(loss)
    # not bit-exact: XLA may FMA-contract the normalize affine differently
    # in the two graph contexts (~1 ULP on the inputs)
    assert np.isclose(losses["s2d"], losses["frames"], rtol=1e-4), losses


def test_sharded_checkpoint_lifecycle(cfg, tmp_path):
    """Save a ZeRO-sharded opt_state from a ('data' 4, 'model' 2) mesh and
    restore it into a FRESH sharded Trainer: the restore goes through a
    sharding-ANNOTATED abstract state (never host-replicated), the restored
    state is bitwise equal, opt_state leaves keep their 'data'-axis shards,
    and training continues (reference resume semantics,
    train_video_segment_ddp.py:176-207, on the multi-chip layout)."""
    import chex
    from jax.sharding import PartitionSpec as P

    cfg = cfg.apply_overrides([
        "mesh.data_axis=4", "mesh.model_axis=2", "mesh.shard_opt_state=true",
        "train.max_epochs=2",
    ])
    task = TextTask(cfg)
    # embedding big enough to cross the ZeRO min_size threshold (2^14)
    # so the opt_state actually shards over 'data'
    task.model = BertForChapter(BertConfig.tiny(vocab_size=1024),
                                pretrain_stage=False)
    trainer = Trainer(
        cfg=cfg, task=task,
        train_loader=lambda e: synthetic_batches(e, n_batches=4),
    )
    # at least one big opt_state leaf actually sharded over 'data'
    sharded_leaves = [
        x for x in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(x, "sharding") and x.sharding.spec != P()
    ]
    assert sharded_leaves, "ZeRO sharding produced no sharded leaves"
    trainer.train()
    trainer.ckpt.wait()

    trainer2 = Trainer(
        cfg=cfg.apply_overrides(["train.max_epochs=3"]), task=task,
        train_loader=lambda e: synthetic_batches(e, n_batches=4),
    )
    assert trainer2.start_epoch == 2
    # bitwise state equality (params + opt_state + step)
    chex.assert_trees_all_equal(
        jax.device_get(trainer2.state.params),
        jax.device_get(trainer.state.params))
    chex.assert_trees_all_equal(
        jax.device_get(trainer2.state.opt_state),
        jax.device_get(trainer.state.opt_state))
    assert int(trainer2.state.step) == int(trainer.state.step)
    # restored leaves carry the SAME shard layout (restored as shards)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.opt_state),
                    jax.tree_util.tree_leaves(trainer2.state.opt_state)):
        if hasattr(a, "sharding"):
            assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    # training continues from the restored sharded state
    trainer2.train()
    assert int(trainer2.state.step) > int(trainer.state.step)
    trainer2.ckpt.close()
    trainer.ckpt.close()
