"""Task definitions plugging models + objectives into the generic Trainer.

Each task mirrors one reference training driver (SURVEY §2.5):
- SegmentWindowTask -> train_video_segment_ddp.py / *_deepspeed.py
- SegmentTask       -> train_video_segment_point.py (base two-stream)
- SegmentTextTask   -> text-only variant (data_mode="text")
- TitleGenTask      -> train_chapter_title_gen.py
- TitleGenVisionTask-> train_chapter_title_gen_vision_emb.py
- LangPretrainTask  -> pretrain_lang_model_hugface.py (MLM / next-token)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models.bert import BertConfig, BertForChapter, BertModel
from ..models.fusion import TwoStream, TwoStreamWindow
from ..models.resnet import ResNet
from ..models.seq2seq import Seq2Seq, Seq2SeqConfig, Seq2SeqVisionEmb
from ..ops.preprocess import normalize_frames
from .objectives import (
    clip_classification_loss,
    masked_token_loss,
    seq2seq_title_loss,
)


def _bert_cfg(cfg: Config, tiny: bool) -> BertConfig:
    return BertConfig.tiny() if tiny else BertConfig()


def _dtype(cfg: Config):
    """Compute dtype from model.compute_dtype: bf16 keeps parameters,
    BatchNorm statistics and the CE reduction in f32 (flax param_dtype
    and _at_least_f32 in objectives) — the mixed-precision recipe the
    reference ran through fp16 Accelerate/DeepSpeed."""
    if cfg.model.compute_dtype in ("bfloat16", "bf16"):
        return jnp.bfloat16
    return jnp.float32


def _vision(cfg: Config, tiny: bool, n_segment: int, dtype) -> ResNet:
    # "auto" resolves per mode inside ResNet: the fused training TRUNK
    # (memory-budgeted, else tap3) for training, the all-pallas fused
    # kernels for inference (PERF.md rounds 2-3)
    if tiny:
        return ResNet(stage_sizes=(1, 1, 1, 1), n_segment=n_segment,
                      tsm_impl=cfg.model.tsm_impl,
                      stem_input=cfg.model.stem_input,
                      remat=cfg.model.remat_vision, dtype=dtype)
    return ResNet(depth=50, n_segment=n_segment,
                  tsm_impl=cfg.model.tsm_impl,
                  stem_input=cfg.model.stem_input,
                  remat=cfg.model.remat_vision, dtype=dtype)


def _prep_frames(cfg: Config, x, dtype):
    """Device-side frame prep matched to the stem contract: with
    stem_input='s2d' the raw uint8 space-to-depth pack goes straight to
    the model (the fused stems normalize in VMEM; the off-TPU fallback
    un-s2ds + normalizes inside ResNet), otherwise the fused uint8
    normalize (ops/preprocess.py)."""
    if cfg.model.stem_input == "s2d":
        return x
    return normalize_frames(x, out_dtype=dtype)


class _TaskBase:
    #: checkpoint-carried config contract (core/contract.py): persisted by
    #: the Trainer with every save, asserted by eval/infer CLIs at load
    contract: dict = {}

    def init_variables(self):
        raise NotImplementedError

    def _make_contract(self, **extra):
        from ..core.contract import build_contract

        self.contract = build_contract(**extra)


class SegmentWindowTask(_TaskBase):
    """Flagship: TwoStreamWindow, binary clip CE, AUC/mAP eval."""

    def __init__(self, cfg: Config, tiny: bool = False, hw: int = 224,
                 text_len: Optional[int] = None):
        self.cfg = cfg
        self.hw = hw
        self.text_len = text_len or cfg.data.max_text_len
        seg = cfg.data.clip_frame_num
        dt = _dtype(cfg)
        self.dtype = dt
        self.model = TwoStreamWindow(
            lang_model=BertModel(_bert_cfg(cfg, tiny), dtype=dt),
            vision_model=_vision(cfg, tiny, seg, dt),
            window_size=cfg.data.window_size,
            segment_size=seg,
            hidden_size=cfg.model.hidden_size,
            head_type=cfg.model.head_type,
            dtype=dt,
        )
        self._make_contract(
            model_kind="two_stream_window", head_type=cfg.model.head_type,
            clip_frame_num=seg, window_size=cfg.data.window_size,
            max_text_len=self.text_len, frame_hw=hw,
            data_mode=cfg.model.data_mode,
        )

    def _example(self):
        W = 2 * self.cfg.data.window_size + 1
        seg = self.cfg.data.clip_frame_num
        if self.cfg.model.stem_input == "s2d":
            q = self.hw // 4
            img = jnp.zeros((1, W, seg, q, q, 48), jnp.uint8)
        else:
            img = jnp.zeros((1, W, seg, self.hw, self.hw, 3))
        ids = jnp.ones((1, W, self.text_len), jnp.int32)
        return img, ids, jnp.ones_like(ids)

    def init_variables(self):
        img, ids, mask = self._example()
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed),
                               img, ids, mask)

    def loss_fn(self, params, batch_stats, batch, rng):
        img = _prep_frames(self.cfg, batch["img_clips"], self.dtype)
        (logits, _), mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, batch["text_ids"], batch["attention_mask"],
            deterministic=False, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss, metrics = clip_classification_loss(logits, batch["label"])
        return loss, (metrics, mutated["batch_stats"])

    def eval_fn(self, state, loader):
        from ..evalkit.metrics import average_precision_score, roc_auc_score

        @jax.jit
        def score(params, batch_stats, img_u8, ids, mask):
            img = _prep_frames(self.cfg, img_u8, self.dtype)
            _, prob = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                img, ids, mask,
            )
            return prob[:, 1]

        scores, labels = [], []
        for batch in loader:
            s = score(state.params, state.batch_stats, batch["img_clips"],
                      batch["text_ids"], batch["attention_mask"])
            scores.append(np.asarray(s))
            labels.append(np.asarray(batch["label"]))
        y = np.concatenate(labels)
        s = np.concatenate(scores)
        if 0 < y.sum() < len(y):
            auc = roc_auc_score(y, s)
            m_ap = average_precision_score(y, s)
        else:
            auc = m_ap = 0.0
        return m_ap, {"auc": auc, "m_ap": m_ap}


class SegmentTask(_TaskBase):
    """Base (non-window) two-stream clip classifier."""

    def __init__(self, cfg: Config, tiny: bool = False, hw: int = 224):
        self.cfg = cfg
        self.hw = hw
        seg = cfg.data.clip_frame_num
        dt = _dtype(cfg)
        self.dtype = dt
        self.model = TwoStream(
            lang_model=BertModel(_bert_cfg(cfg, tiny), dtype=dt),
            vision_model=_vision(cfg, tiny, seg, dt),
            segment_size=seg,
            hidden_size=cfg.model.hidden_size,
            head_type=cfg.model.head_type if cfg.model.head_type in
            ("mlp", "attn") else "mlp",
            dtype=dt,
        )
        self._make_contract(
            model_kind="two_stream", head_type=cfg.model.head_type,
            clip_frame_num=seg, max_text_len=cfg.data.max_text_len,
            frame_hw=hw, data_mode=cfg.model.data_mode,
        )

    def init_variables(self):
        seg = self.cfg.data.clip_frame_num
        if self.cfg.model.stem_input == "s2d":
            q = self.hw // 4
            img = jnp.zeros((1, seg, q, q, 48), jnp.uint8)
        else:
            img = jnp.zeros((1, seg, self.hw, self.hw, 3))
        ids = jnp.ones((1, self.cfg.data.max_text_len), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed),
                               img, ids, jnp.ones_like(ids))

    def loss_fn(self, params, batch_stats, batch, rng):
        img = _prep_frames(self.cfg, batch["img_clip"], self.dtype)
        (logits, _), mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            img, batch["text_ids"], batch["attention_mask"],
            deterministic=False, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss, metrics = clip_classification_loss(logits, batch["label"])
        return loss, (metrics, mutated["batch_stats"])


class SegmentTextTask(_TaskBase):
    """Subtitle-only boundary classifier (CPU-runnable vertical)."""

    def __init__(self, cfg: Config, tiny: bool = False,
                 vocab_size: Optional[int] = None):
        self.cfg = cfg
        bc = _bert_cfg(cfg, tiny)
        if vocab_size is not None:
            import dataclasses

            bc = dataclasses.replace(bc, vocab_size=vocab_size)
        self.model = BertForChapter(bc, pretrain_stage=False)
        self._make_contract(
            model_kind="text", max_text_len=cfg.data.max_text_len,
            vocab_size=bc.vocab_size,
        )

    def init_variables(self):
        ids = jnp.ones((1, self.cfg.data.max_text_len), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed),
                               ids, jnp.ones_like(ids))

    def loss_fn(self, params, batch_stats, batch, rng):
        logits, _ = self.model.apply(
            {"params": params}, batch["text_ids"], batch["attention_mask"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = clip_classification_loss(logits, batch["label"])
        return loss, (metrics, batch_stats)

    def eval_fn(self, state, loader):
        from ..evalkit.metrics import average_precision_score, roc_auc_score

        @jax.jit
        def score(params, ids, mask):
            _, prob = self.model.apply({"params": params}, ids, mask)
            return prob[:, 1]

        scores, labels = [], []
        for batch in loader:
            scores.append(np.asarray(
                score(state.params, batch["text_ids"],
                      batch["attention_mask"])
            ))
            labels.append(np.asarray(batch["label"]))
        y, s = np.concatenate(labels), np.concatenate(scores)
        if 0 < y.sum() < len(y):
            m_ap = average_precision_score(y, s)
            auc = roc_auc_score(y, s)
        else:
            m_ap = auc = 0.0
        return m_ap, {"auc": auc, "m_ap": m_ap}


class LangPretrainTask(_TaskBase):
    """BERT-MLM or next-token subtitle pretraining."""

    def __init__(self, cfg: Config, vocab_size: int, tiny: bool = False):
        import dataclasses

        self.cfg = cfg
        bc = dataclasses.replace(_bert_cfg(cfg, tiny), vocab_size=vocab_size)
        self.model = BertForChapter(bc, pretrain_stage=True)
        self._make_contract(model_kind="lang_pretrain",
                            max_text_len=cfg.data.max_text_len,
                            vocab_size=vocab_size)

    def init_variables(self):
        ids = jnp.ones((1, self.cfg.data.max_text_len), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed),
                               ids, jnp.ones_like(ids))

    def loss_fn(self, params, batch_stats, batch, rng):
        logits, _ = self.model.apply(
            {"params": params}, batch["text_ids"], batch["attention_mask"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = masked_token_loss(logits, batch["targets"])
        return loss, (metrics, batch_stats)


class GptPretrainTask(_TaskBase):
    """From-scratch GPT next-token pretraining on word-level token ids
    (train_lang/pretrain_lang_model.py use_glove_emb=False: GPTConfig
    n_head=10, n_embd=300, block_size=max_text_len)."""

    def __init__(self, cfg: Config, vocab_size: int, tiny: bool = False):
        from ..models.gpt import GPT, GPTConfig

        self.cfg = cfg
        gc = GPTConfig(
            vocab_size=vocab_size, block_size=cfg.data.max_text_len,
            n_layer=2 if tiny else 12, n_head=2 if tiny else 10,
            n_embd=64 if tiny else 300,
        )
        self.model = GPT(gc)
        self._make_contract(model_kind="gpt_pretrain",
                            max_text_len=cfg.data.max_text_len,
                            vocab_size=vocab_size)

    def init_variables(self):
        ids = jnp.zeros((1, self.cfg.data.max_text_len), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed), ids)

    def loss_fn(self, params, batch_stats, batch, rng):
        logits = self.model.apply(
            {"params": params}, batch["text_ids"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = masked_token_loss(logits, batch["targets"])
        return loss, (metrics, batch_stats)


class GptGlovePretrainTask(_TaskBase):
    """From-scratch GPT next-token pretraining on GloVe word embeddings
    (train_lang/pretrain_lang_model.py + model/lang/gpt.py:109-117):
    inputs are [B, L, 300] embedding rows, targets are vocab ids."""

    def __init__(self, cfg: Config, vocab_size: int, tiny: bool = False,
                 emb_dim: int = 300):
        import dataclasses

        from ..models.gpt import GPT, GPTConfig

        self.cfg = cfg
        gc = GPTConfig(
            vocab_size=vocab_size, block_size=cfg.data.max_text_len,
            n_layer=2 if tiny else 12, n_head=2 if tiny else 12,
            n_embd=emb_dim, using_pretrained_embed=True,
        )
        self.emb_dim = emb_dim
        self.model = GPT(gc)
        self._make_contract(model_kind="gpt_glove_pretrain",
                            max_text_len=cfg.data.max_text_len,
                            vocab_size=vocab_size, emb_dim=emb_dim)

    def init_variables(self):
        x = jnp.zeros((1, self.cfg.data.max_text_len, self.emb_dim))
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed), x)

    def loss_fn(self, params, batch_stats, batch, rng):
        logits = self.model.apply(
            {"params": params}, batch["embeddings"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = masked_token_loss(logits, batch["targets"])
        return loss, (metrics, batch_stats)


class TitleGenTask(_TaskBase):
    """Seq2seq chapter-title finetuning (Pegasus recipe)."""

    def __init__(self, cfg: Config, seq2seq_cfg: Seq2SeqConfig):
        self.cfg = cfg
        self.s2s_cfg = seq2seq_cfg
        self.model = Seq2Seq(seq2seq_cfg, dtype=_dtype(cfg))
        self._make_contract(
            model_kind="title", title_input_len=cfg.data.title_input_len,
            title_decode_len=cfg.data.title_decode_len,
            vocab_size=seq2seq_cfg.vocab_size,
            encoder_attention=seq2seq_cfg.encoder_attention,
            d_model=seq2seq_cfg.d_model,
        )

    def init_variables(self):
        ids = jnp.ones((1, 8), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed),
                               ids, jnp.ones_like(ids), ids[:, :4])

    def loss_fn(self, params, batch_stats, batch, rng):
        logits = self.model.apply(
            {"params": params},
            batch["text_ids"], batch["attention_mask"],
            batch["input_decode_ids"], batch["decode_attention_mask"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = seq2seq_title_loss(
            logits, batch["target_decode_ids"], batch["decode_attention_mask"]
        )
        return loss, (metrics, batch_stats)

    def eval_fn(self, state, loader):
        @jax.jit
        def fwd(params, batch):
            logits = self.model.apply(
                {"params": params},
                batch["text_ids"], batch["attention_mask"],
                batch["input_decode_ids"], batch["decode_attention_mask"],
            )
            return seq2seq_title_loss(
                logits, batch["target_decode_ids"],
                batch["decode_attention_mask"],
            )[1]

        losses, accs = [], []
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if hasattr(v, "shape")}
            m = fwd(state.params, batch)
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
        return -float(np.mean(losses)), {
            "loss": float(np.mean(losses)), "acc": float(np.mean(accs)),
        }


class TitleGenVisionTask(TitleGenTask):
    """Vision-conditioned title generation (PegasusVisionEmb recipe)."""

    def __init__(self, cfg: Config, seq2seq_cfg: Seq2SeqConfig,
                 fusion_type: str = "cross_attn", vision_emb_size: int = 2048):
        self.cfg = cfg
        self.s2s_cfg = seq2seq_cfg
        self.model = Seq2SeqVisionEmb(seq2seq_cfg, fusion_type=fusion_type,
                                      vision_emb_size=vision_emb_size,
                                      dtype=_dtype(cfg))
        self.vision_emb_size = vision_emb_size
        self._make_contract(
            model_kind="title_vision", fusion_type=fusion_type,
            vision_emb_size=vision_emb_size,
            title_input_len=cfg.data.title_input_len,
            title_decode_len=cfg.data.title_decode_len,
            vocab_size=seq2seq_cfg.vocab_size,
            encoder_attention=seq2seq_cfg.encoder_attention,
            d_model=seq2seq_cfg.d_model,
        )

    def init_variables(self):
        ids = jnp.ones((1, 8), jnp.int32)
        vis = jnp.zeros((1, 3, self.vision_emb_size))
        vmask = jnp.ones((1, 3), jnp.int32)
        return self.model.init(jax.random.PRNGKey(self.cfg.train.seed),
                               vis, vmask, ids, jnp.ones_like(ids),
                               ids[:, :4])

    def loss_fn(self, params, batch_stats, batch, rng):
        logits = self.model.apply(
            {"params": params},
            batch["vision_embs"], batch["vision_attention_mask"],
            batch["text_ids"], batch["attention_mask"],
            batch["input_decode_ids"], batch["decode_attention_mask"],
            deterministic=False, rngs={"dropout": rng},
        )
        loss, metrics = seq2seq_title_loss(
            logits, batch["target_decode_ids"], batch["decode_attention_mask"]
        )
        return loss, (metrics, batch_stats)
