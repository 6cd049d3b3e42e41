"""Decoder-only GPT (minGPT-style), TPU-native flax.

Reimplements the reference's from-scratch GPT
(`model/lang/gpt.py:39-235`): causal self-attention blocks, learnable or
fixed interleaved-sinusoidal positions, optional external (GloVe) input
embeddings, bias-free vocab head, and masked next-token loss over targets
!= -1. A post-norm config covers the `GPTHugface` (openai-gpt) wrapper
(`model/lang/gpt_hugface.py:12-101`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 10000
    block_size: int = 128
    n_layer: int = 3
    n_head: int = 8
    n_embd: int = 256
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    learnable_pos_emb: bool = False  # reference default: sinusoidal, frozen
    using_pretrained_embed: bool = False  # True: inputs are embeddings (GloVe)
    pre_norm: bool = True  # minGPT: pre-norm; openai-gpt: post-norm

    @classmethod
    def openai_gpt(cls) -> "GPTConfig":
        return cls(vocab_size=40478, block_size=512, n_layer=12, n_head=12,
                   n_embd=768, learnable_pos_emb=True, pre_norm=False)


def interleaved_sinusoidal(length: int, d_model: int) -> np.ndarray:
    """gpt.py:130-145: pe[:, 0::2]=sin, pe[:, 1::2]=cos (interleaved —
    differs from the Pegasus half-split layout)."""
    if d_model % 2 != 0:
        raise ValueError("odd d_model")
    pe = np.zeros((length, d_model), np.float32)
    position = np.arange(length)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d_model, 2) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class CausalSelfAttention(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        b, t, c = x.shape
        hd = c // cfg.n_head
        dense = lambda name: nn.Dense(c, dtype=self.dtype, name=name)
        q = dense("query")(x).reshape(b, t, cfg.n_head, hd)
        k = dense("key")(x).reshape(b, t, cfg.n_head, hd)
        v = dense("value")(x).reshape(b, t, cfg.n_head, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        causal = jnp.tril(jnp.ones((t, t), bool))
        att = jnp.where(causal[None, None], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(cfg.attn_pdrop)(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, c)
        y = nn.Dense(c, dtype=self.dtype, name="proj")(y)
        return nn.Dropout(cfg.resid_pdrop)(y, deterministic=deterministic)


class Block(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        ln1 = nn.LayerNorm(dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        attn = CausalSelfAttention(cfg, self.dtype, name="attn")

        def mlp(y):
            y = nn.Dense(4 * cfg.n_embd, dtype=self.dtype, name="mlp_fc")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(cfg.n_embd, dtype=self.dtype, name="mlp_proj")(y)
            return nn.Dropout(cfg.resid_pdrop)(y, deterministic=deterministic)

        if cfg.pre_norm:
            x = x + attn(ln1(x), deterministic)
            x = x + mlp(ln2(x))
        else:
            x = ln1(x + attn(x, deterministic))
            x = ln2(x + mlp(x))
        return x


class GPT(nn.Module):
    cfg: GPTConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: int token ids [B,T], or embeddings [B,T,D] when
        using_pretrained_embed. Returns logits [B,T,V]."""
        cfg = self.cfg
        if cfg.using_pretrained_embed:
            tok = x.astype(self.dtype)
        else:
            tok = nn.Embed(cfg.vocab_size, cfg.n_embd,
                           embedding_init=nn.initializers.normal(0.02),
                           dtype=self.dtype, name="tok_emb")(x)
        t = tok.shape[1]
        assert t <= cfg.block_size, "block size exhausted"
        if cfg.learnable_pos_emb:
            pos = self.param("pos_emb", nn.initializers.zeros,
                             (1, cfg.block_size, cfg.n_embd))
            pos = pos[:, :t]
        else:
            pos = jnp.asarray(
                interleaved_sinusoidal(cfg.block_size, cfg.n_embd)
            )[None, :t]
        h = nn.Dropout(cfg.embd_pdrop)(tok + pos, deterministic=deterministic)
        for i in range(cfg.n_layer):
            h = Block(cfg, self.dtype, name=f"block{i}")(h, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_f")(h)
        logits = nn.Dense(cfg.vocab_size, use_bias=False,
                          kernel_init=nn.initializers.normal(0.02),
                          dtype=self.dtype, name="head")(h)
        return logits


def gpt_loss(logits, targets, ignore_index: int = -1):
    """Masked next-token CE (gpt.py:225-233)."""
    from ..train.objectives import masked_token_loss

    return masked_token_loss(logits, targets, ignore_index)


def sample_next(rng, logits, temperature: float = 1.0,
                top_k: Optional[int] = None, sample: bool = False):
    """One autoregressive sampling step
    (common_utils/language_model_utils.py:14-46)."""
    logits = logits[:, -1, :] / temperature
    if top_k is not None:
        from .seq2seq import top_k_filter

        logits = top_k_filter(logits, top_k)
    if sample:
        return jax.random.categorical(rng, logits)
    return jnp.argmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# incremental decoding
# ---------------------------------------------------------------------------


def gpt_generate(model: GPT, variables, prompt_ids, prompt_len=None,
                 max_new_tokens: int = 30, temperature: float = 1.0,
                 top_k: Optional[int] = None, sample: bool = False,
                 rng=None, eos_token_id: Optional[int] = None):
    """Autoregressive generation for the decoder-only model.

    Matches the reference sampler semantics
    (common_utils/language_model_utils.py:14-80): full-context re-forward
    per token (the reference has no cache either), but jit-compiled with a
    STATIC padded context via lax.scan — one compilation for any prompt.

    prompt_ids: [B, L] int32, left-aligned; prompt_len: [B] actual lengths
    (defaults to full L). Returns ids [B, max_new_tokens].
    """
    import jax

    b, l = prompt_ids.shape
    total = l + max_new_tokens
    assert total <= model.cfg.block_size, "block size exhausted"
    if prompt_len is None:
        prompt_len = jnp.full((b,), l, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    buf = jnp.zeros((b, total), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids, (0, 0))

    @jax.jit
    def step(carry, i):
        buf, done, rng = carry
        pos = prompt_len - 1 + i  # index of the last real token
        logits = model.apply(variables, buf)  # [B, total, V]
        last = jnp.take_along_axis(
            logits, pos[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        scaled = last / temperature
        if top_k is not None:
            from .seq2seq import top_k_filter

            scaled = top_k_filter(scaled, top_k)
        if sample:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, scaled).astype(jnp.int32)
        else:
            nxt = jnp.argmax(scaled, axis=-1).astype(jnp.int32)
        if eos_token_id is not None:
            nxt = jnp.where(done, eos_token_id, nxt)
            done = done | (nxt == eos_token_id)
        # write at position pos+1 per row
        row_idx = jnp.arange(b)
        buf = buf.at[row_idx, pos + 1].set(nxt)
        return (buf, done, rng), nxt

    (buf, _, _), out = jax.lax.scan(
        step, (buf, jnp.zeros((b,), bool), rng),
        jnp.arange(max_new_tokens),
    )
    return out.swapaxes(0, 1)
