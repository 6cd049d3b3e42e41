"""Additional fusion model variants (flax), TPU-native.

- TwoStreamDomainSpecific: per-modality window self-attention over the
  window clips, then center-clip concat -> deep MLP classifier
  (model/fusion/two_stream_domain_specific.py:9-483). Per-clip python
  loops replaced by batch folding + stacked parameters, like
  TwoStreamWindow.
- SingleBlockWindowClassifier: one pre-norm block whose attention query is
  ONLY the target (middle) clip (model/fusion/window_self_attention.py:
  10-206) — the lightweight alternative to StackedWindowAttention.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bert import BertModel
from .fusion import StackedMLP
from .resnet import ResNet


class DSWindowSelfAttention(nn.Module):
    """Domain-specific window self-attention
    (two_stream_domain_specific.py:9-134): position MLP, pre-LN, full
    [W x W] per-head bias, deep out-projection MLP."""

    hidden_size: int
    num_heads: int = 16
    window_size: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s, _ = x.shape
        h, nh = self.hidden_size, self.num_heads
        hd = h // nh
        scale = 1.0 / math.sqrt(hd)
        gain_init = nn.initializers.variance_scaling(
            scale**2, "fan_avg", "uniform"
        )
        xavier = nn.initializers.xavier_uniform()

        middle = s // 2
        rel = ((jnp.arange(s, dtype=self.dtype) - middle) / (middle + 1e-6))[:, None]
        pos = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                       name="position_encoding")(rel)
        pos = nn.LayerNorm(dtype=self.dtype, name="position_ln")(pos)
        pos = nn.Dropout(self.dropout)(pos, deterministic=deterministic)
        x = x + pos[None]

        y = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        proj = lambda name: nn.Dense(h, kernel_init=gain_init,
                                     dtype=self.dtype, name=name)
        q = proj("query_proj")(y).reshape(b, s, nh, hd)
        k = proj("key_proj")(y).reshape(b, s, nh, hd)
        v = proj("value_proj")(y).reshape(b, s, nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale

        wbias = self.param(
            "window_pos_bias", nn.initializers.normal(0.02),
            (1, nh, 2 * self.window_size + 1, 2 * self.window_size + 1),
        )
        att = att + wbias.astype(self.dtype)[:, :, :s, :s]
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, h)

        # deep out projection: [2H LN ReLU Drop] x3 -> H
        out = ctx
        for i in range(3):
            out = nn.Dense(2 * h, kernel_init=gain_init, dtype=self.dtype,
                           name=f"out{i}")(out)
            out = nn.LayerNorm(dtype=self.dtype, name=f"out_ln{i}")(out)
            out = nn.relu(out)
            out = nn.Dropout(0.1)(out, deterministic=deterministic)
        out = nn.Dense(h, kernel_init=gain_init, dtype=self.dtype,
                       name="out_final")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class DomainSpecificChapterHead(nn.Module):
    """two_stream_domain_specific.py:239-370: per-position projections,
    vision mean-pool over segment, separate lang/vision window attention,
    center concat -> deep classifier."""

    num_clips: int
    segment_size: int
    hidden_size: int
    window_size: int
    output_size: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang_embs, vision_embs, deterministic: bool = True):
        """lang_embs [B,W,lang_dim]; vision_embs [B,W,seg,vision_dim]."""
        b, w, _ = lang_embs.shape
        h = self.hidden_size
        seg = self.segment_size

        lang = StackedMLP(
            self.num_clips, (lang_embs.shape[-1] // 2, h),
            dtype=self.dtype, name="lang_proj_heads",
        )(lang_embs, deterministic)
        lang = nn.relu(lang)

        ve = vision_embs.transpose(0, 2, 1, 3).reshape(b * seg, w, -1)
        vision = StackedMLP(
            self.num_clips, (8 * h, 4 * h, h), dtype=self.dtype,
            name="vision_proj_heads",
        )(ve, deterministic)
        vision = nn.relu(vision)
        vision = vision.reshape(b, seg, w, h).mean(axis=1)  # pool segments

        lang_att = DSWindowSelfAttention(
            h, 16, self.window_size, dtype=self.dtype,
            name="lang_window_attn",
        )(lang, deterministic)
        vision_att = DSWindowSelfAttention(
            h, 16, self.window_size, dtype=self.dtype,
            name="vision_window_attn",
        )(vision, deterministic)

        center = w // 2
        fused = jnp.concatenate(
            [lang_att[:, center], vision_att[:, center]], axis=-1
        )
        y = fused
        for i, f in enumerate((2 * h, h, h // 2, h // 4)):
            y = nn.Dense(f, dtype=self.dtype, name=f"cls{i}")(y)
            y = nn.LayerNorm(dtype=self.dtype, name=f"cls_ln{i}")(y)
            y = nn.relu(y)
            y = nn.Dropout(0.1)(y, deterministic=deterministic)
        return nn.Dense(self.output_size, dtype=self.dtype,
                        name="classifier")(y)


class TwoStreamDomainSpecific(nn.Module):
    """Domain-specific window model, fully batched."""

    lang_model: BertModel
    vision_model: ResNet
    window_size: int = 1
    segment_size: int = 16
    hidden_size: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        self.num_clips = 2 * self.window_size + 1
        self.fusion_head = DomainSpecificChapterHead(
            num_clips=self.num_clips, segment_size=self.segment_size,
            hidden_size=self.hidden_size, window_size=self.window_size,
            dtype=self.dtype,
        )

    def __call__(self, img_clips, text_ids, attention_mask,
                 deterministic: bool = True, train: bool = False,
                 bn_batch_stats: bool = False):
        b, w, t = img_clips.shape[0], img_clips.shape[1], img_clips.shape[2]
        _, lang_emb = self.lang_model(
            text_ids.reshape(b * w, -1), attention_mask.reshape(b * w, -1),
            deterministic=deterministic,
        )
        lang_emb = lang_emb.reshape(b, w, -1)
        flat = img_clips.reshape(b * w * t, *img_clips.shape[3:])
        vision_emb = self.vision_model(
            flat, train=train, bn_batch_stats=bn_batch_stats
        ).reshape(b, w, t, -1)
        logits = self.fusion_head(lang_emb, vision_emb,
                                  deterministic=deterministic)
        return logits, jax.nn.softmax(logits, axis=-1)


class SingleBlockWindowClassifier(nn.Module):
    """window_self_attention.py:28-206: one pre-norm block, attention query
    = the middle clip only; FFN (Drop,H->4H,GELU,Drop.25,4H->H,Drop.15);
    classifier LN -> H/2 -> GELU -> Drop -> 2."""

    hidden_size: int
    num_heads: int = 16
    window_size: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fusion_emb, deterministic: bool = True):
        b, s, _ = fusion_emb.shape
        h, nh = self.hidden_size, self.num_heads
        hd = h // nh
        xavier = nn.initializers.xavier_uniform()
        middle = s // 2

        residual = fusion_emb[:, middle : middle + 1]
        y = nn.LayerNorm(dtype=self.dtype, name="attention_norm")(fusion_emb)

        rel = ((jnp.arange(s, dtype=self.dtype) - middle) / (middle + 1e-6))[:, None]
        pos = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                       name="position_encoding")(rel)
        y = y + pos[None]

        target = y[:, middle : middle + 1]
        dense = lambda name: nn.Dense(h, kernel_init=xavier,
                                      dtype=self.dtype, name=name)
        q = dense("query")(target).reshape(b, 1, nh, hd)
        k = dense("key")(y).reshape(b, s, nh, hd)
        v = dense("value")(y).reshape(b, s, nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        wbias = self.param(
            "window_pos_bias", nn.initializers.normal(0.02),
            (1, nh, 1, 2 * self.window_size + 1),
        )
        att = att + wbias.astype(self.dtype)[:, :, :, :s]
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, 1, h)
        ctx = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                       name="out_proj")(ctx)
        x = ctx + residual

        res2 = x
        y = nn.LayerNorm(dtype=self.dtype, name="ffn_norm")(x)
        y = nn.Dropout(0.1)(y, deterministic=deterministic)
        y = nn.Dense(4 * h, kernel_init=xavier, dtype=self.dtype,
                     name="ffn_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(0.25)(y, deterministic=deterministic)
        y = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                     name="ffn_fc2")(y)
        y = nn.Dropout(0.15)(y, deterministic=deterministic)
        x = y + res2

        y = nn.LayerNorm(dtype=self.dtype, name="cls_ln")(x[:, 0])
        y = nn.Dense(h // 2, kernel_init=xavier, dtype=self.dtype,
                     name="cls_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(0.1)(y, deterministic=deterministic)
        logits = nn.Dense(2, kernel_init=xavier, dtype=self.dtype,
                          name="cls_fc2")(y)
        return logits, jax.nn.softmax(logits, axis=-1)
