"""Two-stream fusion models (flax), TPU-native.

Re-designs of the reference fusion stack:
- base ChapterHead + TwoStream:          model/fusion/two_stream.py:8-194
- window ChapterHead variants + TwoStream: model/fusion/two_stream_window.py
  (CrossAttention :11-89, ChapterHead :134-289, TwoStream :292-445)
- StackedVideoChapterAttention:          model/fusion/stacked_window_self_attention.py

TPU-first changes vs the reference:
- The reference loops over the 2w+1 window clips in python, re-running
  BERT/ResNet serially per clip (two_stream_window.py:404-434). Here the
  window is folded into the batch dimension: one [B*W] BERT call, one
  [B*W*T] ResNet call — MXU-sized matmuls, no sequential launches.
- The reference keeps per-window-position ModuleLists. Here those are
  parameter STACKS with a leading window axis applied via einsum
  ('bwi,wio->bwo'): identical per-position weights, one fused matmul.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bert import BertModel
from .resnet import ResNet


# ---------------------------------------------------------------------------
# stacked (per-window-position) primitives
# ---------------------------------------------------------------------------


class StackedDense(nn.Module):
    """num_stacks independent Dense layers applied positionally:
    [B, W, in] -> [B, W, out] with weights [W, in, out]."""

    num_stacks: int
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        # per-position lecun_normal, matching independent nn.Linear inits
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.num_stacks, in_dim, self.features),
        )
        y = jnp.einsum("bwi,wio->bwo", x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.num_stacks, self.features)
            )
            y = y + bias.astype(self.dtype)[None]
        return y


class StackedLayerNorm(nn.Module):
    """Per-window-position LayerNorm over the last axis: scales/biases
    [W, dim]."""

    num_stacks: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (self.num_stacks, dim))
        bias = self.param("bias", nn.initializers.zeros, (self.num_stacks, dim))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale.astype(self.dtype)[None] + bias.astype(self.dtype)[None]


class StackedMLP(nn.Module):
    """Per-position [Dense -> LN -> ReLU -> Dropout]* -> Dense chain."""

    num_stacks: int
    features: tuple  # hidden sizes; last entry is the output size
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = StackedDense(self.num_stacks, f, dtype=self.dtype,
                             name=f"dense{i}")(x)
            if i < n - 1:
                x = StackedLayerNorm(self.num_stacks, dtype=self.dtype,
                                     name=f"ln{i}")(x)
                x = nn.relu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


# ---------------------------------------------------------------------------
# attention heads
# ---------------------------------------------------------------------------


class SelfAttentionHead(nn.Module):
    """Fusion-token self-attention head (two_stream.py:8-48): attend over
    [vision tokens..., lang token], project token 0."""

    n_embd: int
    n_head: int
    output_size: int
    attn_pdrop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, c = x.shape
        hd = c // self.n_head
        dense = lambda name: nn.Dense(self.n_embd, dtype=self.dtype, name=name)
        q = dense("query")(x).reshape(b, t, self.n_head, hd)
        k = dense("key")(x).reshape(b, t, self.n_head, hd)
        v = dense("value")(x).reshape(b, t, self.n_head, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_pdrop)(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, c)
        return nn.Dense(self.output_size, dtype=self.dtype, name="proj")(y[:, 0])


class CrossAttentionHead(nn.Module):
    """Lang-query -> vision-kv cross attention with frame position encoding
    (two_stream_window.py:11-89)."""

    hidden_size: int
    num_heads: int = 16
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang_emb, vision_emb, deterministic: bool = True):
        b, f, _ = vision_emb.shape
        hd = self.hidden_size // self.num_heads
        scale = 1.0 / math.sqrt(hd)
        xavier = nn.initializers.xavier_uniform()

        def proj(name, gain_scaled=True):
            init = (
                nn.initializers.variance_scaling(
                    scale**2, "fan_avg", "uniform"
                )
                if gain_scaled
                else xavier
            )
            return nn.Dense(self.hidden_size, kernel_init=init,
                            dtype=self.dtype, name=name)

        lang = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="lang_norm")(lang_emb)
        vision = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="vision_norm")(vision_emb)

        # positions normalized in FLOAT32 regardless of self.dtype — the
        # reference hard-casts with .float() (two_stream_window.py:52-53),
        # and f64 differential tests need its exact rounding
        positions = (jnp.arange(f, dtype=jnp.float32)
                     / jnp.float32(f - 1)).astype(self.dtype)[:, None]
        pos_emb = nn.Dense(self.hidden_size, kernel_init=xavier,
                           dtype=self.dtype, name="frame_pos_encoding")(positions)
        vision = vision + pos_emb[None]

        q = proj("query_proj")(lang).reshape(b, 1, self.num_heads, hd)
        k = proj("key_proj")(vision).reshape(b, f, self.num_heads, hd)
        v = proj("value_proj")(vision).reshape(b, f, self.num_heads, hd)

        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, 1, self.hidden_size)
        out = proj("out_proj")(ctx)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out[:, 0]


# ---------------------------------------------------------------------------
# base (non-window) chapter head + two-stream
# ---------------------------------------------------------------------------


class ChapterHead(nn.Module):
    """Base fusion head (two_stream.py:51-95): bias-free projections to the
    shared hidden size, relu, concat [vision tokens, lang token], mlp or
    attn classifier."""

    segment_size: int
    hidden_size: int
    output_size: int = 2
    head_type: str = "mlp"  # mlp | attn
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang_emb, vision_emb, deterministic: bool = True):
        b = lang_emb.shape[0]
        lang = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                        name="lang_proj_head")(lang_emb)[:, None]
        lang = nn.relu(lang)
        vision = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                          name="vision_proj_head")(vision_emb)
        vision = nn.relu(vision)
        fusion = jnp.concatenate([vision, lang], axis=1)  # [B, seg+1, H]
        if self.head_type == "mlp":
            return nn.Dense(self.output_size, dtype=self.dtype, name="head")(
                fusion.reshape(b, -1)
            )
        elif self.head_type == "attn":
            return SelfAttentionHead(
                self.hidden_size, 4, self.output_size, dtype=self.dtype,
                name="head",
            )(fusion, deterministic=deterministic)
        raise ValueError(f"unknown head_type {self.head_type}")


class TwoStream(nn.Module):
    """Base two-stream clip classifier (two_stream.py:99-194).

    forward: img_clips [B,T,H,W,3], text_ids [B,L], mask [B,L]
    -> (logits [B,2], probs). `return_emb=True` additionally returns the
    [B,T,2048] vision embeddings (the vision-emb dump path,
    two_stream.py:172-194)."""

    lang_model: BertModel
    vision_model: ResNet
    segment_size: int = 16
    hidden_size: int = 128
    head_type: str = "mlp"
    dtype: Any = jnp.float32

    def setup(self):
        self.fusion_head = ChapterHead(
            segment_size=self.segment_size, hidden_size=self.hidden_size,
            output_size=2, head_type=self.head_type, dtype=self.dtype,
        )

    def __call__(self, img_clips, text_ids, attention_mask,
                 deterministic: bool = True, train: bool = False,
                 bn_batch_stats: bool = False, return_emb: bool = False):
        b, t = img_clips.shape[0], img_clips.shape[1]
        _, lang_emb = self.lang_model(text_ids, attention_mask,
                                      deterministic=deterministic)
        flat = img_clips.reshape(b * t, *img_clips.shape[2:])
        vision_emb = self.vision_model(
            flat, train=train, bn_batch_stats=bn_batch_stats
        ).reshape(b, t, -1)
        logits = self.fusion_head(lang_emb, vision_emb,
                                  deterministic=deterministic)
        prob = jax.nn.softmax(logits, axis=-1)
        if return_emb:
            return logits, prob, vision_emb
        return logits, prob


# ---------------------------------------------------------------------------
# window model
# ---------------------------------------------------------------------------


class WindowChapterHead(nn.Module):
    """Window fusion head (two_stream_window.py:134-289): per-window-position
    projection MLPs (as stacks) + one of five fusion types, producing a
    [B, W, hidden] fusion embedding for all window clips at once."""

    num_clips: int
    segment_size: int
    hidden_size: int
    head_type: str = "mlp"  # mlp | bilinear | multiplication | self_attn | cross_attn
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang_emb, vision_emb, deterministic: bool = True):
        """lang_emb: [B, W, lang_dim]; vision_emb: [B, W, seg, vision_dim]
        -> fusion [B, W, hidden_size]."""
        b, w, _ = lang_emb.shape
        h = self.hidden_size
        seg = self.segment_size

        lang = StackedMLP(
            self.num_clips, (lang_emb.shape[-1] // 2, h),
            dropout=self.dropout, dtype=self.dtype, name="lang_proj_heads",
        )(lang_emb, deterministic)
        lang = nn.relu(lang)

        # vision: fold segment into the batch for the per-position MLPs
        ve = vision_emb.transpose(0, 2, 1, 3).reshape(b * seg, w, -1)
        vision = StackedMLP(
            self.num_clips, (8 * h, 4 * h, h),
            dropout=self.dropout, dtype=self.dtype, name="vision_proj_heads",
        )(ve, deterministic)
        vision = nn.relu(vision)
        vision = vision.reshape(b, seg, w, h).transpose(0, 2, 1, 3)  # [B,W,seg,H]

        if self.head_type == "mlp":
            fused = jnp.concatenate(
                [vision, lang[:, :, None, :]], axis=2
            ).reshape(b, w, (seg + 1) * h)
            return StackedMLP(
                self.num_clips, (8 * h, 4 * h, h),
                dropout=self.dropout, dtype=self.dtype, name="head",
            )(fused, deterministic)

        if self.head_type == "bilinear":
            vision_flat = vision.reshape(b, w, seg * h)
            bilinear_w = self.param(
                "bilinear_kernel",
                nn.initializers.lecun_normal(batch_axis=(0,)),
                (self.num_clips, 2 * h, h, seg * h),
            )
            bilinear_b = self.param(
                "bilinear_bias", nn.initializers.zeros, (self.num_clips, 2 * h)
            )
            fused = (
                jnp.einsum("bwi,woij,bwj->bwo", lang,
                           bilinear_w.astype(self.dtype), vision_flat)
                + bilinear_b.astype(self.dtype)[None]
            )
            fused = StackedLayerNorm(self.num_clips, dtype=self.dtype,
                                     name="head_ln_in")(fused)
            fused = nn.relu(fused)
            fused = nn.Dropout(self.dropout)(fused, deterministic=deterministic)
            return StackedMLP(
                self.num_clips, (h, h), dropout=self.dropout, dtype=self.dtype,
                name="head",
            )(fused, deterministic)

        if self.head_type == "multiplication":
            expanded = StackedMLP(
                self.num_clips, (8 * h, seg * h), dropout=self.dropout,
                dtype=self.dtype, name="lang_expand_layers",
            )(lang, deterministic)
            expanded = StackedLayerNorm(
                self.num_clips, dtype=self.dtype, name="lang_expand_ln"
            )(expanded)
            expanded = nn.relu(expanded)
            expanded = nn.Dropout(self.dropout)(expanded,
                                                deterministic=deterministic)
            mul = vision * expanded.reshape(b, w, seg, h)
            return StackedMLP(
                self.num_clips, (8 * h, 4 * h, h), dropout=self.dropout,
                dtype=self.dtype, name="head",
            )(mul.reshape(b, w, seg * h), deterministic)

        if self.head_type == "self_attn":
            fused = jnp.concatenate([vision, lang[:, :, None, :]], axis=2)
            head = SelfAttentionHead(h, 4, h, dtype=self.dtype, name="head")
            return head(
                fused.reshape(b * w, seg + 1, h), deterministic
            ).reshape(b, w, h)

        if self.head_type == "cross_attn":
            head = CrossAttentionHead(h, num_heads=16, dtype=self.dtype,
                                      name="head")
            return head(
                lang.reshape(b * w, h),
                vision.reshape(b * w, seg, h),
                deterministic,
            ).reshape(b, w, h)

        raise ValueError(f"unknown head_type {self.head_type}")


class WindowAttentionBlock(nn.Module):
    """Pre-norm transformer block over the window-of-clips sequence with
    learned scalar relative-position encoding and per-head window bias
    (stacked_window_self_attention.py:8-148)."""

    hidden_size: int
    num_heads: int
    window_size: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, s, c = x.shape
        h = self.hidden_size
        nh = self.num_heads
        hd = h // nh
        xavier = nn.initializers.xavier_uniform()

        # --- attention sublayer ---
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="attention_norm")(x)

        middle = s // 2
        rel = ((jnp.arange(s, dtype=self.dtype) - middle) / (middle + 1e-6))[:, None]
        pos = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                       name="position_encoding")(rel)
        y = y + pos[None]

        dense = lambda name: nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                                      name=name)
        q = dense("query")(y).reshape(b, s, nh, hd)
        k = dense("key")(y).reshape(b, s, nh, hd)
        v = dense("value")(y).reshape(b, s, nh, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)

        wbias = self.param(
            "window_pos_bias",
            nn.initializers.normal(0.02),
            (1, nh, 1, 2 * self.window_size + 1),
        )
        att = att + wbias.astype(self.dtype)[:, :, :, :s]
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, h)
        ctx = nn.Dense(h, kernel_init=xavier, dtype=self.dtype,
                       name="out_proj")(ctx)
        x = x + ctx

        # --- ffn sublayer (H->2H->4H->2H->H, gelu) ---
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ffn_norm")(x)
        for i, f in enumerate((2 * h, 4 * h, 2 * h, h)):
            y = nn.Dense(f, kernel_init=xavier, dtype=self.dtype,
                         name=f"ffn{i}")(y)
            if i < 3:
                y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + y


class StackedWindowAttention(nn.Module):
    """6 window-attention blocks + final LN + deep classifier on the middle
    (target) clip (stacked_window_self_attention.py:150-223)."""

    hidden_size: int
    num_heads: int = 16
    window_size: int = 1
    num_layers: int = 6
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fusion_emb, deterministic: bool = True):
        x = fusion_emb
        for i in range(self.num_layers):
            x = WindowAttentionBlock(
                self.hidden_size, self.num_heads, self.window_size,
                self.dropout, self.dtype, name=f"block{i}",
            )(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        target = x[:, x.shape[1] // 2]

        h = self.hidden_size
        xavier = nn.initializers.xavier_uniform()
        y = target
        for i, f in enumerate((h, h, h // 2, h // 4)):
            y = nn.Dense(f, kernel_init=xavier, dtype=self.dtype,
                         name=f"cls{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"cls_ln{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(0.1)(y, deterministic=deterministic)
        logits = nn.Dense(2, kernel_init=xavier, dtype=self.dtype,
                          name="classifier")(y)
        return logits, jax.nn.softmax(logits, axis=-1)


class TwoStreamWindow(nn.Module):
    """Flagship window model (two_stream_window.py:292-445), fully batched.

    forward: img_clips [B,W,T,H,Wd,3], text_ids [B,W,L], masks [B,W,L]
    -> (logits [B,2], probs [B,2]).
    """

    lang_model: BertModel
    vision_model: ResNet
    window_size: int = 1
    segment_size: int = 16
    hidden_size: int = 128
    head_type: str = "mlp"
    dtype: Any = jnp.float32

    def setup(self):
        self.num_clips = 2 * self.window_size + 1
        self.fusion_head = WindowChapterHead(
            num_clips=self.num_clips, segment_size=self.segment_size,
            hidden_size=self.hidden_size, head_type=self.head_type,
            dtype=self.dtype,
        )
        self.window_attn = StackedWindowAttention(
            hidden_size=self.hidden_size, num_heads=16,
            window_size=self.window_size, dtype=self.dtype,
        )

    def __call__(self, img_clips, text_ids, attention_mask,
                 deterministic: bool = True, train: bool = False,
                 bn_batch_stats: bool = False):
        b, w, t = img_clips.shape[0], img_clips.shape[1], img_clips.shape[2]
        assert w == self.num_clips, (w, self.num_clips)

        # language: fold window into batch -> one BERT call
        _, lang_emb = self.lang_model(
            text_ids.reshape(b * w, -1),
            attention_mask.reshape(b * w, -1),
            deterministic=deterministic,
        )
        lang_emb = lang_emb.reshape(b, w, -1)

        # vision: fold window AND time into batch -> one ResNet call.
        # TSM operates per clip: rows are (b*w) clips of t frames each.
        flat = img_clips.reshape(b * w * t, *img_clips.shape[3:])
        vision_emb = self.vision_model(
            flat, train=train, bn_batch_stats=bn_batch_stats
        ).reshape(b, w, t, -1)

        fusion = self.fusion_head(lang_emb, vision_emb,
                                  deterministic=deterministic)
        return self.window_attn(fusion, deterministic=deterministic)
