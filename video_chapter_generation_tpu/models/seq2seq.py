"""Encoder-decoder transformer family (Pegasus / BART style), TPU-native.

Re-designs the reference's title generators:
- PegasusHugface (model/lang/pegasus_hugface.py:19-146) — Pegasus-large
  wrapper whose hand-rolled `generate` re-runs the FULL encoder+decoder for
  every emitted token with no KV cache (:117-142). Here decoding is a
  jit-compiled `lax.scan` with per-layer KV caches and precomputed
  cross-attention K/V: O(1) incremental work per token, greedy-identical
  to the cacheless loop (causal decoder => same logits).
- BartHugface (model/lang/bart_hugface.py) — covered by config
  (post-norm, learned positions with offset 2, tied head).
- PegasusVisionEmb (model/lang/pegasus_vision_emb.py:19-250) — encoder
  output fused with chapter vision embeddings through a FusionHead
  (mlp-pool or cross-attention) and residual-added before decoding.
  NOTE: the reference's "mlp" branch is dead code (it compares a Module to
  a string, pegasus_vision_emb.py:96); implemented here as intended.

Pegasus facts reproduced: pre-LN + final LN, static sinusoidal positions
(fairseq layout: first half sin, second half cos), optional sqrt(d) embed
scaling, pad(0)-as-decoder-start, eos=1, tied lm_head + final_logits_bias.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int = 96103
    d_model: int = 1024
    encoder_layers: int = 16
    decoder_layers: int = 16
    num_heads: int = 16
    ffn_dim: int = 4096
    max_positions: int = 1024
    dropout: float = 0.1
    activation: str = "relu"  # pegasus-large: relu; bart: gelu
    pre_norm: bool = True  # pegasus: True (+final LN); bart: False
    learned_positions: bool = False  # bart: True
    position_offset: int = 0  # bart: 2
    scale_embedding: bool = True  # pegasus-large: True
    embed_layernorm: bool = False  # bart: LayerNorm right after embeddings
    tie_lm_head: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    # long-context option (BigBird-Pegasus analogue): block-sparse encoder
    # self-attention (models/sparse_attention.py)
    encoder_attention: str = "full"  # full | block_sparse
    # HF BigBirdPegasus builds its attention projections WITHOUT biases
    # (config.use_bias=False); Pegasus/BART use them
    attention_bias: bool = True
    block_size: int = 64
    num_rand_blocks: int = 3
    num_global_blocks: int = 1
    # block-sparse encoder impl: 'auto' = fused flash-style Pallas kernel
    # on TPU (ops/sparse_attention_pallas.py), XLA gather elsewhere;
    # 'gather'/'kernel' force one (A/B + tests)
    sparse_impl: str = "auto"
    # serving: weight-only int8 (W8A16). Dense kernels + the tied shared
    # table become int8 with per-output-channel scales (Int8Dense /
    # Int8Embed); variables come from ops.quantize.quantize_seq2seq on a
    # float checkpoint. Decode is weight-streaming-bound, so this ~halves
    # the per-token device time vs bf16 params (PERF.md round 3).
    weight_quant: bool = False
    # training: rematerialize each encoder/decoder layer (activations
    # recomputed in the backward pass — trades FLOPs for HBM; lets the
    # Pegasus-large title finetune run bigger batches, PERF.md round 4)
    remat: bool = False
    # serving: int8 cross-attention K/V cache. At real title buckets the
    # decode step is bound by re-streaming the encoder K/V every token
    # (B x 512 x d per layer pair — ~2/3 of the while-loop time at B=32,
    # PERF.md round 3); int8 halves it. Scales are per (batch, head,
    # channel), computed once per bucket in init_cache, and fold EXACTLY
    # into q (keys) and ctx (values) — no extra elementwise passes.
    kv_quant: bool = False

    @classmethod
    def pegasus_large(cls) -> "Seq2SeqConfig":
        return cls()

    @classmethod
    def bigbird_pegasus_large(cls) -> "Seq2SeqConfig":
        """google/bigbird-pegasus-large-arxiv shape: 4096-position encoder
        with block-sparse attention (pegasus_bigbird.py:19). Matches HF
        BigBirdPegasusConfig defaults: learned positions (no offset),
        gelu_new FFN, decoder_start=2."""
        return cls(
            max_positions=4096, encoder_attention="block_sparse",
            block_size=64, num_rand_blocks=3, num_global_blocks=1,
            scale_embedding=True, activation="gelu_new",
            learned_positions=True, decoder_start_token_id=2,
            attention_bias=False,
        )

    @classmethod
    def bart_large(cls) -> "Seq2SeqConfig":
        return cls(
            vocab_size=50265, encoder_layers=12, decoder_layers=12,
            activation="gelu", pre_norm=False, learned_positions=True,
            position_offset=2, scale_embedding=False, embed_layernorm=True,
            pad_token_id=1, eos_token_id=2, decoder_start_token_id=2,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 128, **kw) -> "Seq2SeqConfig":
        base = dict(
            vocab_size=vocab_size, d_model=32, encoder_layers=2,
            decoder_layers=2, num_heads=2, ffn_dim=64, max_positions=64,
        )
        base.update(kw)
        return cls(**base)


def sinusoidal_positions(n_pos: int, dim: int) -> np.ndarray:
    """Fairseq/Pegasus layout: out[:, :dim//2] = sin(pos/1e4^(2(j//2)/d)) at
    even j; out[:, dim//2:] = cos at odd j."""
    pe = np.array(
        [
            [pos / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)]
            for pos in range(n_pos)
        ]
    )
    out = np.zeros((n_pos, dim), dtype=np.float32)
    half = dim // 2
    out[:, :half] = np.sin(pe[:, 0::2])
    out[:, half:] = np.cos(pe[:, 1::2])
    return out


def _dense_cls(cfg: "Seq2SeqConfig"):
    """nn.Dense, or the weight-only-int8 serving replacement."""
    if cfg.weight_quant:
        from .quant_layers import Int8Dense

        return Int8Dense
    return nn.Dense


class MultiHeadAttention(nn.Module):
    cfg: Seq2SeqConfig
    dtype: Any = jnp.float32

    def setup(self):
        d = self.cfg.d_model
        dense = _dense_cls(self.cfg)
        ub = self.cfg.attention_bias
        self.q_proj = dense(d, dtype=self.dtype, use_bias=ub)
        self.k_proj = dense(d, dtype=self.dtype, use_bias=ub)
        self.v_proj = dense(d, dtype=self.dtype, use_bias=ub)
        self.out_proj = dense(d, dtype=self.dtype, use_bias=ub)

    def __call__(self, q_in, kv_in, bias=None, deterministic=True,
                 cached_kv: Optional[Tuple] = None):
        """bias: additive attention bias broadcastable to [B,H,Q,K].
        cached_kv: precomputed (k, v) [B,K,H,hd], or the int8 form
        (k_q, k_scale, v_q, v_scale) from project_kv (cfg.kv_quant) with
        scales [B,1,H,hd]."""
        cfg = self.cfg
        h, hd = cfg.num_heads, cfg.d_model // cfg.num_heads
        q = self.q_proj(q_in).reshape(*q_in.shape[:-1], h, hd)
        v_scale = None
        if cached_kv is None:
            k = self.k_proj(kv_in).reshape(*kv_in.shape[:-1], h, hd)
            v = self.v_proj(kv_in).reshape(*kv_in.shape[:-1], h, hd)
        elif len(cached_kv) == 4:
            # int8 cache: fold the key scales into q (exact — scores are
            # linear in k per channel), so the einsum streams int8 keys
            k, k_scale, v, v_scale = cached_kv
            q = q * k_scale.astype(q.dtype)
            k = k.astype(q.dtype)
        else:
            k, v = cached_kv

        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if bias is not None:
            att = att + bias
        att = jax.nn.softmax(att, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v.astype(att.dtype))
        if v_scale is not None:
            # value scales fold into ctx AFTER the reduction (exact)
            ctx = ctx * v_scale.astype(ctx.dtype)
        ctx = ctx.reshape(*q_in.shape[:-1], cfg.d_model)
        return self.out_proj(ctx)

    def project_kv(self, kv_in):
        """Compute (k, v) heads for caching."""
        cfg = self.cfg
        h, hd = cfg.num_heads, cfg.d_model // cfg.num_heads
        return (
            self.k_proj(kv_in).reshape(*kv_in.shape[:-1], h, hd),
            self.v_proj(kv_in).reshape(*kv_in.shape[:-1], h, hd),
        )

    def sparse_self(self, x, mask, rand_map=None):
        """Block-sparse self-attention over x [B, L, D] with mask [B, L]
        (BigBird-style; encoder only). rand_map: optional static numpy
        override of the random block pattern (HF differential)."""
        from .sparse_attention import block_sparse_attention

        cfg = self.cfg
        h, hd = cfg.num_heads, cfg.d_model // cfg.num_heads
        q = self.q_proj(x).reshape(*x.shape[:-1], h, hd)
        k = self.k_proj(x).reshape(*x.shape[:-1], h, hd)
        v = self.v_proj(x).reshape(*x.shape[:-1], h, hd)
        ctx = block_sparse_attention(
            q, k, v, mask, cfg.block_size, cfg.num_rand_blocks,
            cfg.num_global_blocks, rand_map=rand_map,
            impl=cfg.sparse_impl,
        )
        return self.out_proj(ctx.reshape(*x.shape[:-1], cfg.d_model))


class FFN(nn.Module):
    cfg: Seq2SeqConfig
    dtype: Any = jnp.float32

    def setup(self):
        dense = _dense_cls(self.cfg)
        self.fc1 = dense(self.cfg.ffn_dim, dtype=self.dtype)
        self.fc2 = dense(self.cfg.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.cfg.dropout)

    def __call__(self, x, deterministic=True):
        if self.cfg.activation == "relu":
            act = nn.relu
        elif self.cfg.activation == "gelu_new":
            # HF BigBirdPegasus: tanh-approximate gelu
            act = nn.gelu
        else:
            act = lambda y: nn.gelu(y, approximate=False)  # noqa: E731
        y = act(self.fc1(x))
        y = self.drop(y, deterministic=deterministic)
        return self.fc2(y)


class EncoderLayer(nn.Module):
    cfg: Seq2SeqConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.self_attn = MultiHeadAttention(self.cfg, self.dtype)
        self.ffn = FFN(self.cfg, self.dtype)
        self.drop = nn.Dropout(self.cfg.dropout)

    def __call__(self, x, bias, deterministic=True, mask=None,
                 rand_map=None):
        ln1, ln2 = self.self_attn_layer_norm, self.final_layer_norm
        drop = self.drop
        sparse = self.cfg.encoder_attention == "block_sparse"

        def attend(y):
            if sparse:
                return self.self_attn.sparse_self(y, mask, rand_map)
            return self.self_attn(y, y, bias, deterministic)

        if self.cfg.pre_norm:
            y = ln1(x)
            y = attend(y)
            x = x + drop(y, deterministic=deterministic)
            y = self.ffn(ln2(x), deterministic)
            x = x + drop(y, deterministic=deterministic)
        else:
            y = attend(x)
            x = ln1(x + drop(y, deterministic=deterministic))
            y = self.ffn(x, deterministic)
            x = ln2(x + drop(y, deterministic=deterministic))
        return x


class DecoderLayer(nn.Module):
    cfg: Seq2SeqConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.self_attn = MultiHeadAttention(self.cfg, self.dtype)
        self.encoder_attn = MultiHeadAttention(self.cfg, self.dtype)
        self.ffn = FFN(self.cfg, self.dtype)
        self.drop = nn.Dropout(self.cfg.dropout)

    def __call__(self, x, enc, self_bias, cross_bias, deterministic=True,
                 self_cache: Optional[Tuple] = None,
                 cross_kv: Optional[Tuple] = None,
                 position: Optional[jax.Array] = None):
        """Teacher forcing when self_cache is None; incremental step (q len 1)
        otherwise. Returns (x, new_self_cache)."""
        cfg = self.cfg
        ln1 = self.self_attn_layer_norm
        ln2 = self.encoder_attn_layer_norm
        ln3 = self.final_layer_norm
        self_attn, cross_attn = self.self_attn, self.encoder_attn
        drop = self.drop

        if self_cache is None:
            if cfg.pre_norm:
                y = ln1(x)
                y = self_attn(y, y, self_bias, deterministic)
                x = x + drop(y, deterministic=deterministic)
                y = cross_attn(ln2(x), enc, cross_bias, deterministic,
                               cached_kv=cross_kv)
                x = x + drop(y, deterministic=deterministic)
                y = self.ffn(ln3(x), deterministic)
                x = x + drop(y, deterministic=deterministic)
            else:
                y = self_attn(x, x, self_bias, deterministic)
                x = ln1(x + drop(y, deterministic=deterministic))
                y = cross_attn(x, enc, cross_bias, deterministic,
                               cached_kv=cross_kv)
                x = ln2(x + drop(y, deterministic=deterministic))
                y = self.ffn(x, deterministic)
                x = ln3(x + drop(y, deterministic=deterministic))
            return x, None

        # ---- incremental path: x is [B, 1, D], position scalar ----
        k_cache, v_cache = self_cache  # [B, T_max, H, hd]
        if cfg.pre_norm:
            y = ln1(x)
        else:
            y = x
        k_t, v_t = self_attn.project_kv(y)  # [B,1,H,hd]
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_t.astype(k_cache.dtype), (0, position, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_t.astype(v_cache.dtype), (0, position, 0, 0)
        )
        y = self_attn(y, None, self_bias, True, cached_kv=(k_cache, v_cache))
        if cfg.pre_norm:
            x = x + y
            y = cross_attn(ln2(x), enc, cross_bias, True, cached_kv=cross_kv)
            x = x + y
            y = self.ffn(ln3(x), True)
            x = x + y
        else:
            x = ln1(x + y)
            y = cross_attn(x, enc, cross_bias, True, cached_kv=cross_kv)
            x = ln2(x + y)
            y = self.ffn(x, True)
            x = ln3(x + y)
        return x, (k_cache, v_cache)


def _mask_bias(mask, dtype):
    """[B, K] 1/0 -> additive [B,1,1,K]."""
    return (1.0 - mask[:, None, None, :].astype(dtype)) * -1e9


def quantize_kv(k, v):
    """int8-quantize cached K/V heads [B, T, H, hd] with per-(batch,
    head, channel) scales (amax over the T key positions). The scales
    fold exactly into the attention math (keys: into q before the score
    einsum; values: into ctx after the value einsum), so the decode step
    streams int8 — half the cross-cache HBM traffic that dominates
    bucketed title decode (PERF.md round 3)."""

    def quant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                       keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                     -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    k_q, k_scale = quant(k)
    v_q, v_scale = quant(v)
    return k_q, k_scale, v_q, v_scale


def _causal_bias(length, dtype):
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j <= i, 0.0, -1e9).astype(dtype)[None, None]


class Seq2Seq(nn.Module):
    """Configurable encoder-decoder with tied or separate LM head."""

    cfg: Seq2SeqConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        if cfg.weight_quant:
            from .quant_layers import Int8Embed

            self.shared = Int8Embed(cfg.vocab_size, cfg.d_model,
                                    dtype=self.dtype, name="shared")
        else:
            self.shared = nn.Embed(cfg.vocab_size, cfg.d_model,
                                   dtype=self.dtype, name="shared")
        if cfg.learned_positions:
            self.enc_pos = nn.Embed(
                cfg.max_positions + cfg.position_offset, cfg.d_model,
                dtype=self.dtype, name="enc_pos")
            self.dec_pos = nn.Embed(
                cfg.max_positions + cfg.position_offset, cfg.d_model,
                dtype=self.dtype, name="dec_pos")
        else:
            self.sin_pos = jnp.asarray(
                sinusoidal_positions(cfg.max_positions, cfg.d_model)
            )
        enc_cls, dec_cls = EncoderLayer, DecoderLayer
        if cfg.remat:
            # static argnums count self as 0; 'deterministic' must stay
            # static (it selects the dropout branch)
            enc_cls = nn.remat(EncoderLayer, static_argnums=(3,))
            dec_cls = nn.remat(DecoderLayer, static_argnums=(5,))
        self.encoder_layers_mods = [
            enc_cls(cfg, self.dtype, name=f"enc_layer{i}")
            for i in range(cfg.encoder_layers)
        ]
        self.decoder_layers_mods = [
            dec_cls(cfg, self.dtype, name=f"dec_layer{i}")
            for i in range(cfg.decoder_layers)
        ]
        if cfg.pre_norm:
            self.encoder_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="encoder_ln")
            self.decoder_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_ln")
        if cfg.embed_layernorm:
            self.enc_embed_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             name="enc_embed_ln")
            self.dec_embed_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             name="dec_embed_ln")
        if not cfg.tie_lm_head:
            self.lm_head = _dense_cls(cfg)(cfg.vocab_size, use_bias=False,
                                           dtype=self.dtype, name="lm_head")
        self.final_logits_bias = self.param(
            "final_logits_bias", nn.initializers.zeros, (cfg.vocab_size,)
        )
        self.dropout_mod = nn.Dropout(cfg.dropout)

    # -- shared pieces ----------------------------------------------------
    def _embed(self, ids, positions, pos_table):
        cfg = self.cfg
        x = self.shared(ids)
        # padding_idx semantics (HF Pegasus/BART build the shared table as
        # nn.Embedding(..., padding_idx=pad_token_id)): no gradient reaches
        # the pad row; values unchanged (pad row zero-initialized). Keeps
        # f64 training trajectories aligned with torch (see
        # tests/test_train_parity.py for the BERT analogue).
        x = jnp.where((ids == cfg.pad_token_id)[..., None],
                      jax.lax.stop_gradient(x), x)
        if cfg.scale_embedding:
            x = x * math.sqrt(cfg.d_model)
        if cfg.learned_positions:
            x = x + pos_table(positions + cfg.position_offset)
        else:
            x = x + jnp.take(self.sin_pos, positions, axis=0)
        return x

    def _head(self, hidden):
        if self.cfg.tie_lm_head:
            if self.cfg.weight_quant:
                logits = self.shared.logits(hidden)
            else:
                logits = hidden @ self.shared.embedding.T.astype(self.dtype)
        else:
            logits = self.lm_head(hidden)
        # HF keeps final_logits_bias as an untrained buffer
        return logits + jax.lax.stop_gradient(self.final_logits_bias)

    # -- public api -------------------------------------------------------
    def encode(self, input_ids, attention_mask, deterministic=True,
               rand_maps=None):
        """rand_maps: optional per-layer list of static numpy random-block
        maps for block_sparse encoders (HF BigBird seeds its pattern per
        layer; the differential test injects HF's maps here)."""
        positions = jnp.arange(input_ids.shape[1])[None, :]
        x = self._embed(input_ids, positions,
                        self.enc_pos if self.cfg.learned_positions else None)
        if self.cfg.embed_layernorm:
            x = self.enc_embed_ln(x)
        x = self.dropout_mod(x, deterministic=deterministic)
        bias = _mask_bias(attention_mask, self.dtype)
        for i, layer in enumerate(self.encoder_layers_mods):
            x = layer(x, bias, deterministic, mask=attention_mask,
                      rand_map=None if rand_maps is None else rand_maps[i])
        if self.cfg.pre_norm:
            x = self.encoder_ln(x)
        return x

    def decode(self, decoder_input_ids, enc_hidden, enc_mask,
               decoder_mask=None, deterministic=True):
        """Teacher-forced decoding -> logits [B, L, V]."""
        L = decoder_input_ids.shape[1]
        positions = jnp.arange(L)[None, :]
        x = self._embed(decoder_input_ids, positions,
                        self.dec_pos if self.cfg.learned_positions else None)
        if self.cfg.embed_layernorm:
            x = self.dec_embed_ln(x)
        x = self.dropout_mod(x, deterministic=deterministic)
        self_bias = _causal_bias(L, self.dtype)
        if decoder_mask is not None:
            self_bias = self_bias + _mask_bias(decoder_mask, self.dtype)
        cross_bias = _mask_bias(enc_mask, self.dtype)
        for layer in self.decoder_layers_mods:
            x, _ = layer(x, enc_hidden, self_bias, cross_bias, deterministic)
        if self.cfg.pre_norm:
            x = self.decoder_ln(x)
        return self._head(x)

    def __call__(self, input_ids, attention_mask, decoder_input_ids,
                 decoder_attention_mask=None, deterministic=True):
        enc = self.encode(input_ids, attention_mask, deterministic)
        return self.decode(decoder_input_ids, enc, attention_mask,
                           decoder_attention_mask, deterministic)

    # -- incremental decoding --------------------------------------------
    def init_cache(self, batch: int, max_len: int, enc_hidden):
        """Per-layer KV caches + precomputed cross-attention K/V."""
        cfg = self.cfg
        h, hd = cfg.num_heads, cfg.d_model // cfg.num_heads
        self_caches = []
        cross_kvs = []
        for layer in self.decoder_layers_mods:
            self_caches.append((
                jnp.zeros((batch, max_len, h, hd), self.dtype),
                jnp.zeros((batch, max_len, h, hd), self.dtype),
            ))
            kv = layer.encoder_attn.project_kv(enc_hidden)
            if cfg.kv_quant:
                # int8 cross cache (the self cache stays bf16: it is
                # max_len positions — negligible traffic)
                kv = quantize_kv(*kv)
            cross_kvs.append(kv)
        return {"self": self_caches, "cross": cross_kvs}

    def decode_step(self, token, position, cache, enc_hidden, enc_mask,
                    max_len: int):
        """One incremental step: token [B,1], position scalar int32.
        Returns (logits [B,V], new_cache)."""
        cfg = self.cfg
        x = self._embed(token, position[None, None],
                        self.dec_pos if cfg.learned_positions else None)
        if cfg.embed_layernorm:
            x = self.dec_embed_ln(x)
        # mask future cache slots
        key_pos = jnp.arange(max_len)[None, None, None, :]
        self_bias = jnp.where(key_pos <= position, 0.0, -1e9).astype(self.dtype)
        cross_bias = _mask_bias(enc_mask, self.dtype)
        new_self = []
        for i, layer in enumerate(self.decoder_layers_mods):
            x, sc = layer(
                x, enc_hidden, self_bias, cross_bias, True,
                self_cache=cache["self"][i], cross_kv=cache["cross"][i],
                position=position,
            )
            new_self.append(sc)
        if cfg.pre_norm:
            x = self.decoder_ln(x)
        logits = self._head(x)[:, 0]
        return logits, {"self": new_self, "cross": cache["cross"]}


# ---------------------------------------------------------------------------
# generation driver
# ---------------------------------------------------------------------------


def top_k_filter(logits, k: int):
    """Keep top-k logits, set the rest to -inf
    (common_utils/language_model_utils.py:7-12)."""
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def generate(
    model: Seq2Seq,
    variables,
    input_ids,
    attention_mask,
    max_len: int = 30,
    temperature: float = 1.0,
    sample: bool = False,
    top_k: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    enc_hidden_override=None,
    return_logits: bool = True,
):
    """Batched KV-cached generation (greedy / top-k / sampling).

    Matches the reference loop semantics (pegasus_hugface.py:105-146):
    start from decoder_start_token_id, emit up to max_len tokens,
    stop at eos (here: full static loop with post-hoc masking — XLA needs
    static shapes; tokens after the first eos are replaced by eos).
    Returns (ids [B, max_len], logits [B, max_len, V]).

    return_logits=False skips stacking the per-step full-vocab logits
    (max_len x B x V — ~92 MB of HBM writes for a Pegasus-large title
    bucket that the serving path never reads) and returns (ids, None).
    """
    cfg = model.cfg

    def apply(method, *a, **kw):
        return model.apply(variables, *a, method=method, **kw)

    enc = (
        enc_hidden_override
        if enc_hidden_override is not None
        else apply(model.encode, input_ids, attention_mask)
    )
    b = input_ids.shape[0]
    cache = apply(model.init_cache, b, max_len, enc)

    start = jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, pos):
        token, cache, done, rng = carry
        logits, cache = apply(
            model.decode_step, token, pos, cache, enc, attention_mask,
            max_len=max_len,
        )
        scaled = logits / temperature
        if top_k is not None:
            scaled = top_k_filter(scaled, top_k)
        if sample:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, scaled)
        else:
            nxt = jnp.argmax(scaled, axis=-1)
        nxt = jnp.where(done, cfg.eos_token_id, nxt).astype(jnp.int32)
        done = done | (nxt == cfg.eos_token_id)
        ys = (nxt, logits) if return_logits else nxt
        return (nxt[:, None], cache, done, rng), ys

    (_, _, _, _), ys = jax.lax.scan(
        step,
        (start, cache, jnp.zeros((b,), bool), rng),
        jnp.arange(max_len),
    )
    if not return_logits:
        return ys.swapaxes(0, 1), None
    ids, logits = ys
    return ids.swapaxes(0, 1), logits.swapaxes(0, 1)


def trim_at_eos(ids, eos_token_id: int):
    """Host-side: cut a generated id row at (and including) the first EOS,
    like the reference's python loop break (pegasus_hugface.py:139-141)."""
    out = []
    for row in np.asarray(ids):
        row = list(row)
        if eos_token_id in row:
            row = row[: row.index(eos_token_id) + 1]
        out.append(row)
    return out


# ---------------------------------------------------------------------------
# vision-conditioned variant
# ---------------------------------------------------------------------------


class VisualLangCrossAttention(nn.Module):
    """pegasus_vision_emb.py:19-66: lang queries attend over vision tokens;
    multiplicative key mask (NOT additive — reference quirk :55)."""

    n_embd: int
    n_head: int
    output_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_states, key_value_states, kv_attention_mask=None):
        b, t1, c = query_states.shape
        t2 = key_value_states.shape[1]
        hd = c // self.n_head
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        q = dense(c, "query")(query_states).reshape(b, t1, self.n_head, hd)
        k = dense(c, "key")(key_value_states).reshape(b, t2, self.n_head, hd)
        v = dense(c, "value")(key_value_states).reshape(b, t2, self.n_head, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if kv_attention_mask is not None:
            att = att * kv_attention_mask[:, None, None, :].astype(att.dtype)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t1, c)
        return dense(self.output_size, "proj")(y)


class VisionFusionHead(nn.Module):
    """pegasus_vision_emb.py:68-107: project lang hidden states and chapter
    vision embeddings to a shared space, fuse, map back to lang width."""

    lang_emb_size: int
    vision_emb_size: int = 2048
    hidden_size: int = 128
    fusion_type: str = "cross_attn"  # or "mlp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lang_emb, vision_emb, vision_attention_mask=None):
        lang = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                        name="lang_proj_head")(lang_emb)
        lang = nn.relu(lang)
        vision = nn.Dense(self.hidden_size, use_bias=False, dtype=self.dtype,
                          name="vision_proj_head")(vision_emb)
        vision = nn.relu(vision)

        if self.fusion_type == "mlp":
            # as intended by the reference (its runtime branch is dead code):
            # masked mean-pool vision, broadcast over lang positions, concat
            if vision_attention_mask is None:
                pooled = vision.mean(axis=1)
            else:
                m = vision_attention_mask[..., None].astype(vision.dtype)
                pooled = (vision * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            pooled = jnp.broadcast_to(
                pooled[:, None], (*lang.shape[:-1], self.hidden_size)
            )
            fused = jnp.concatenate([pooled, lang], axis=-1)
            return nn.Dense(self.lang_emb_size, use_bias=False,
                            dtype=self.dtype, name="fusion_head")(fused)
        return VisualLangCrossAttention(
            self.hidden_size, 8, self.lang_emb_size, dtype=self.dtype,
            name="fusion_head",
        )(lang, vision, vision_attention_mask)


class Seq2SeqVisionEmb(nn.Module):
    """PegasusVisionEmb (pegasus_vision_emb.py:110-250): encoder output +
    FusionHead(vision) residual-added, then decode."""

    cfg: Seq2SeqConfig
    fusion_type: str = "cross_attn"
    vision_emb_size: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.seq2seq = Seq2Seq(self.cfg, self.dtype)
        hidden = 128 if self.fusion_type == "mlp" else self.cfg.d_model
        # reference: mlp uses hidden 128; cross_attn hidden = d_model
        self.fusion_head = VisionFusionHead(
            lang_emb_size=self.cfg.d_model,
            vision_emb_size=self.vision_emb_size,
            hidden_size=128 if self.fusion_type == "mlp" else self.cfg.d_model,
            fusion_type=self.fusion_type,
            dtype=self.dtype,
        )

    def encode_fused(self, vision_emb, vision_attention_mask, input_ids,
                     attention_mask, deterministic=True):
        enc = self.seq2seq.encode(input_ids, attention_mask, deterministic)
        fused = self.fusion_head(enc, vision_emb, vision_attention_mask)
        return fused + enc

    def __call__(self, vision_emb, vision_attention_mask, input_ids,
                 attention_mask, decoder_input_ids,
                 decoder_attention_mask=None, deterministic=True):
        enc = self.encode_fused(
            vision_emb, vision_attention_mask, input_ids, attention_mask,
            deterministic,
        )
        return self.seq2seq.decode(
            decoder_input_ids, enc, attention_mask, decoder_attention_mask,
            deterministic,
        )


# ---------------------------------------------------------------------------
# HF weight conversion (Pegasus / BART / Marian-style naming)
# ---------------------------------------------------------------------------


def convert_hf_seq2seq(state_dict: Dict[str, Any],
                       cfg: Seq2SeqConfig) -> Dict[str, Any]:
    """Convert a HuggingFace Pegasus/BART ForConditionalGeneration state
    dict into `Seq2Seq` variables. Linear weights transpose to (in, out);
    sinusoidal position tables are recomputed, learned ones copied."""

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    p: Dict[str, Any] = {}

    def put(path, leaf):
        node = p
        for x in path[:-1]:
            node = node.setdefault(x, {})
        node[path[-1]] = leaf

    def dense(hf, path):
        put((*path, "kernel"), to_np(state_dict[hf + ".weight"]).T)
        if hf + ".bias" in state_dict:
            put((*path, "bias"), to_np(state_dict[hf + ".bias"]))

    def ln(hf, path):
        put((*path, "scale"), to_np(state_dict[hf + ".weight"]))
        put((*path, "bias"), to_np(state_dict[hf + ".bias"]))

    put(("shared", "embedding"), to_np(state_dict["model.shared.weight"]))
    if cfg.learned_positions:
        put(("enc_pos", "embedding"),
            to_np(state_dict["model.encoder.embed_positions.weight"]))
        put(("dec_pos", "embedding"),
            to_np(state_dict["model.decoder.embed_positions.weight"]))

    for side, n_layers in (("encoder", cfg.encoder_layers),
                           ("decoder", cfg.decoder_layers)):
        short = "enc" if side == "encoder" else "dec"
        for i in range(n_layers):
            hf = f"model.{side}.layers.{i}"
            fl = f"{short}_layer{i}"
            if f"{hf}.self_attn.self.query.weight" in state_dict:
                # BigBirdPegasus encoder naming: self_attn.self.{query,
                # key,value} + self_attn.output (the out projection)
                for hf_n, ours in (("self.query", "q_proj"),
                                   ("self.key", "k_proj"),
                                   ("self.value", "v_proj"),
                                   ("output", "out_proj")):
                    dense(f"{hf}.self_attn.{hf_n}", (fl, "self_attn", ours))
            else:
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    dense(f"{hf}.self_attn.{proj}", (fl, "self_attn", proj))
            ln(f"{hf}.self_attn_layer_norm", (fl, "self_attn_layer_norm"))
            if side == "decoder":
                for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    dense(f"{hf}.encoder_attn.{proj}",
                          (fl, "encoder_attn", proj))
                ln(f"{hf}.encoder_attn_layer_norm",
                   (fl, "encoder_attn_layer_norm"))
            dense(f"{hf}.fc1", (fl, "ffn", "fc1"))
            dense(f"{hf}.fc2", (fl, "ffn", "fc2"))
            ln(f"{hf}.final_layer_norm", (fl, "final_layer_norm"))

    if cfg.pre_norm:
        if "model.encoder.layer_norm.weight" in state_dict:
            ln("model.encoder.layer_norm", ("encoder_ln",))
            ln("model.decoder.layer_norm", ("decoder_ln",))
        else:
            # BigBirdPegasus names its FINAL pre-norm LayerNorm
            # 'layernorm_embedding' (applied after the layer stack,
            # modeling_bigbird_pegasus.py encoder forward) — not to be
            # confused with BART's after-embedding LN of the same name
            ln("model.encoder.layernorm_embedding", ("encoder_ln",))
            ln("model.decoder.layernorm_embedding", ("decoder_ln",))
    if cfg.embed_layernorm:
        ln("model.encoder.layernorm_embedding", ("enc_embed_ln",))
        ln("model.decoder.layernorm_embedding", ("dec_embed_ln",))

    if "final_logits_bias" in state_dict:
        put(("final_logits_bias",),
            to_np(state_dict["final_logits_bias"]).reshape(-1))
    else:
        put(("final_logits_bias",), np.zeros(cfg.vocab_size, np.float32))

    if not cfg.tie_lm_head and "lm_head.weight" in state_dict:
        put(("lm_head", "kernel"), to_np(state_dict["lm_head.weight"]).T)

    return {"params": p}


def beam_search(
    model: Seq2Seq,
    variables,
    input_ids,
    attention_mask,
    num_beams: int = 4,
    max_len: int = 30,
    length_penalty: float = 1.0,
    enc_hidden_override=None,
    early_stopping=False,
):
    """Static-shape, fully jittable beam search (an upgrade over the
    reference's greedy/top-k-only decoding, pegasus_hugface.py:105-146).

    Token-for-token equivalent to HF `generate(num_beams=n,
    length_penalty=lp, early_stopping=...)` (transformers
    generation/utils.py `_beam_search`), verified by differential test
    (tests/test_seq2seq.py). The HF scheme, expressed as one lax.scan:

    - each step expands the n running beams to the top 2n candidates by
      ACCUMULATED (unnormalized) log-prob;
    - candidates that finish (EOS, or the max-length step) are banked
      into a separate finished pool of n, competing by the
      length-normalized score sum_logp / n_generated^lp frozen at bank
      time; only candidates ranked in the top n may bank;
    - the next n running beams are the best candidates with finished
      ones masked by an additive -1e9;
    - HF's loop-termination heuristics are replicated as latched gates
      on banking (a scan can't break early, but once HF would have
      stopped, the finished pool provably stops changing):
      `early_stopping=True` blocks banking once all n finished slots are
      full; False/"never" block via the best-possible-running-score
      heuristic with HF's exact hypothetical-length choice.

    Returns (ids [B, max_len], scores [B]) for the best finished beam;
    ids are EOS-padded past the end.
    """
    cfg = model.cfg
    b = input_ids.shape[0]
    n = num_beams
    n2 = 2 * n  # HF beams_to_keep = max(2, 1 + n_eos) * num_beams

    def apply(method, *a, **kw):
        return model.apply(variables, *a, method=method, **kw)

    enc = (
        enc_hidden_override
        if enc_hidden_override is not None
        else apply(model.encode, input_ids, attention_mask)
    )  # [B, L, D]
    # expand to beams: [B*n, ...]
    enc = jnp.repeat(enc, n, axis=0)
    mask = jnp.repeat(attention_mask, n, axis=0)
    cache = apply(model.init_cache, b * n, max_len, enc)

    neg_inf = jnp.asarray(-1e9, jnp.float32)
    # running pool: beam 0 active, others -1e9 so step 1 fans out from it
    run_scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (n - 1)), (b, 1))
    # static token buffers: slot 0 = start token, slot p+1 written at
    # step p; EOS fill past the end (HF fills with pad — trimmed away in
    # both cases before use)
    run_tokens = jnp.full((b, n, max_len + 1), cfg.eos_token_id, jnp.int32)
    run_tokens = run_tokens.at[:, :, 0].set(cfg.decoder_start_token_id)
    # finished pool (kept sorted descending by the merge top-k)
    fin_tokens = run_tokens
    fin_scores = jnp.full((b, n), -1e9)
    fin_done = jnp.zeros((b, n), bool)
    # latched per-batch "running beams could still improve" bit
    improving = jnp.ones((b, 1), bool)
    # only candidates ranked in the top n of the 2n may bank (HF
    # top_num_beam_mask)
    top_mask = jnp.arange(n2) < n

    def gather_beams(tree, beam_idx):
        """Reorder the [B*n, ...] cache by per-batch beam indices [B, n]."""
        flat_idx = (
            jnp.arange(b)[:, None] * n + beam_idx
        ).reshape(-1)  # [B*n]

        def g(x):
            return jnp.take(x.reshape(b * n, *x.shape[1:]), flat_idx, axis=0)

        return jax.tree_util.tree_map(g, tree)

    def step(carry, pos):
        (run_tokens, run_scores, fin_tokens, fin_scores, fin_done,
         improving, cache) = carry
        last = jax.lax.dynamic_index_in_dim(
            run_tokens, pos, axis=2, keepdims=False
        ).reshape(b * n, 1)
        logits, cache = apply(
            model.decode_step, last, pos, cache, enc, mask, max_len=max_len
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        logp = logp.reshape(b, n, -1)
        v = logp.shape[-1]

        acc = (run_scores[:, :, None] + logp).reshape(b, n * v)
        top_lp, flat_idx = jax.lax.top_k(acc, n2)  # [b, 2n]
        beam_idx = flat_idx // v
        tok = (flat_idx % v).astype(jnp.int32)
        top_seqs = jnp.take_along_axis(run_tokens, beam_idx[:, :, None],
                                       axis=1)
        top_seqs = jax.lax.dynamic_update_index_in_dim(
            top_seqs, tok[:, :, None], pos + 1, axis=2
        )
        # HF stopping criteria on each candidate: EOS last token, or the
        # sequence reaches max_length at this step
        hits = (tok == cfg.eos_token_id) | (pos == max_len - 1)

        # running beams for the next iteration: finished candidates get
        # an ADDITIVE -1e9 (HF semantics — preserves order among them)
        run_lp = top_lp + hits.astype(jnp.float32) * -1e9
        _, next_idx = jax.lax.top_k(run_lp, n)
        new_run_tokens = jnp.take_along_axis(top_seqs, next_idx[:, :, None],
                                             axis=1)
        new_run_scores = jnp.take_along_axis(run_lp, next_idx, axis=1)
        cand_beam = jnp.take_along_axis(beam_idx, next_idx, axis=1)
        cache = gather_beams(cache, cand_beam)

        # finished-pool update (HF _update_finished_beams, same order):
        # normalized score frozen at bank time; banking gated by
        # early-stopping state
        norm_lp = top_lp / ((pos + 1).astype(jnp.float32) ** length_penalty)
        full = jnp.all(fin_done, axis=-1, keepdims=True)
        if early_stopping is True:
            norm_lp = norm_lp + full.astype(jnp.float32) * -1e9
        norm_lp = norm_lp + (~improving).astype(jnp.float32) * -1e9
        just_fin = hits & top_mask[None, :]
        norm_lp = norm_lp + (~just_fin).astype(jnp.float32) * -1e9
        m_scores = jnp.concatenate([fin_scores, norm_lp], axis=1)
        m_tokens = jnp.concatenate([fin_tokens, top_seqs], axis=1)
        m_done = jnp.concatenate([fin_done, just_fin], axis=1)
        _, m_idx = jax.lax.top_k(m_scores, n)
        fin_scores = jnp.take_along_axis(m_scores, m_idx, axis=1)
        fin_tokens = jnp.take_along_axis(m_tokens, m_idx[:, :, None], axis=1)
        fin_done = jnp.take_along_axis(m_done, m_idx, axis=1)

        # early-stop heuristic AFTER the length increment (HF
        # _check_early_stop_heuristic): can the best running beam still
        # beat the worst finished one?
        if early_stopping == "never" and length_penalty > 0.0:
            best_len = jnp.float32(max_len)
        else:
            best_len = (pos + 1).astype(jnp.float32)
        best_possible = new_run_scores[:, :1] / best_len**length_penalty
        worst_fin = jnp.where(
            fin_done, jnp.min(fin_scores, axis=1, keepdims=True), neg_inf
        )
        improving = improving & jnp.any(best_possible > worst_fin, axis=-1,
                                        keepdims=True)

        return (new_run_tokens, new_run_scores,
                fin_tokens, fin_scores, fin_done, improving, cache), None

    (_, _, fin_tokens, fin_scores, _, _, _), _ = jax.lax.scan(
        step,
        (run_tokens, run_scores, fin_tokens, fin_scores, fin_done,
         improving, cache),
        jnp.arange(max_len),
    )

    # finished pool is sorted descending — slot 0 is HF's returned beam
    return fin_tokens[:, 0, 1:], fin_scores[:, 0]
