"""BERT encoder (flax), TPU-native.

From-scratch reimplementation of the reference's language stream
(`model/lang/bert_hugface.py:13-132`): a BERT-base-uncased-architecture
encoder with pooler, plus the two heads the reference attaches —
a bias-free MLM vocab head for subtitle pretraining (:29-33, :111-114) and
a 2-way chapter head over pooler_output (:34-36, :123-127).

Weights convert from a HuggingFace `BertModel` state dict
(`convert_hf_bert`); numerics are validated differentially against
transformers in tests (random tiny config, no network).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0  # HF default; padding_idx of the word table
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1

    @classmethod
    def tiny(cls, vocab_size: int = 128) -> "BertConfig":
        return cls(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        )


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, mask, deterministic: bool):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)

        def split(x):
            return x.reshape(*x.shape[:-1], cfg.num_heads, head_dim)

        q = split(dense("query")(hidden))
        k = split(dense("key")(hidden))
        v = split(dense("value")(hidden))

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, self.dtype)
        )
        # additive mask: [B, 1, 1, K], 0 for keep, -inf-ish for pad
        bias = (1.0 - mask[:, None, None, :].astype(scores.dtype)) * -10000.0
        probs = jax.nn.softmax(scores + bias, axis=-1)
        probs = nn.Dropout(cfg.attention_dropout)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(*ctx.shape[:-2], cfg.hidden_size)

        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out")(ctx)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="out_ln")(out + hidden)
        return out


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, mask, deterministic: bool):
        cfg = self.cfg
        attn = BertSelfAttention(cfg, self.dtype, name="attention")(
            hidden, mask, deterministic
        )
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(attn)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="output_ln")(out + attn)
        return out


class BertModel(nn.Module):
    """Returns (last_hidden_state [B,L,H], pooler_output [B,H])."""

    cfg: BertConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True,
                 token_type_ids=None, input_embeds=None):
        """input_embeds: optional [B, L, H] word embeddings replacing the
        lookup of input_ids (used by saliency / integrated gradients)."""
        cfg = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        positions = jnp.arange(input_ids.shape[-1])[None, :]

        if input_embeds is not None:
            emb = input_embeds
        else:
            emb = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                           name="word_embeddings")(input_ids)
            # padding_idx semantics (HF BertEmbeddings builds
            # nn.Embedding(..., padding_idx=pad_token_id)): the pad row of
            # the table receives NO gradient from pad positions. Values are
            # unchanged (the pad row is zero-initialized), but without this
            # the pad row trains and the tables drift from the reference
            # (caught by tests/test_train_parity.py in f64).
            pad = (input_ids == cfg.pad_token_id)[..., None]
            emb = jnp.where(pad, jax.lax.stop_gradient(emb), emb)
        emb += nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                        dtype=self.dtype, name="position_embeddings")(positions)
        emb += nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="token_type_embeddings")(token_type_ids)
        emb = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="embeddings_ln")(emb)
        emb = nn.Dropout(cfg.hidden_dropout)(emb, deterministic=deterministic)

        hidden = emb
        for i in range(cfg.num_layers):
            hidden = BertLayer(cfg, self.dtype, name=f"layer{i}")(
                hidden, attention_mask, deterministic
            )

        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(
            hidden[:, 0]
        )
        pooled = jnp.tanh(pooled)
        return hidden, pooled


class BertForChapter(nn.Module):
    """The reference's BertHugface: MLM head in pretrain stage, 2-way
    chapter head over pooler_output otherwise (bert_hugface.py:105-131)."""

    cfg: BertConfig
    pretrain_stage: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.base_model = BertModel(self.cfg, self.dtype)
        if self.pretrain_stage:
            # bias-free vocab head (bert_hugface.py:29-31)
            self.head = nn.Dense(self.cfg.vocab_size, use_bias=False,
                                 dtype=self.dtype)
        else:
            self.head = nn.Dense(2, dtype=self.dtype)

    def __call__(self, text_ids, attention_mask, deterministic: bool = True,
                 input_embeds=None):
        hidden, pooled = self.base_model(text_ids, attention_mask,
                                         deterministic=deterministic,
                                         input_embeds=input_embeds)
        if self.pretrain_stage:
            logits = self.head(hidden)
        else:
            logits = self.head(pooled)
        prob = jax.nn.softmax(logits, axis=-1)
        return logits, prob

    def pooler_output(self, text_ids, attention_mask,
                      deterministic: bool = True):
        _, pooled = self.base_model(text_ids, attention_mask,
                                    deterministic=deterministic)
        return pooled


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------


def convert_hf_bert(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a HuggingFace `BertModel` state dict to `BertModel` params.

    Linear weights transpose (out,in) -> (in,out); embeddings copy as-is.
    """
    import numpy as np

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

    def dense(prefix_hf, path):
        put((*path, "kernel"), to_np(state_dict[prefix_hf + ".weight"]).T)
        put((*path, "bias"), to_np(state_dict[prefix_hf + ".bias"]))

    def ln(prefix_hf, path):
        put((*path, "scale"), to_np(state_dict[prefix_hf + ".weight"]))
        put((*path, "bias"), to_np(state_dict[prefix_hf + ".bias"]))

    put(("word_embeddings", "embedding"),
        to_np(state_dict["embeddings.word_embeddings.weight"]))
    put(("position_embeddings", "embedding"),
        to_np(state_dict["embeddings.position_embeddings.weight"]))
    put(("token_type_embeddings", "embedding"),
        to_np(state_dict["embeddings.token_type_embeddings.weight"]))
    ln("embeddings.LayerNorm", ("embeddings_ln",))

    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in state_dict:
        hf = f"encoder.layer.{i}"
        fl = f"layer{i}"
        dense(f"{hf}.attention.self.query", (fl, "attention", "query"))
        dense(f"{hf}.attention.self.key", (fl, "attention", "key"))
        dense(f"{hf}.attention.self.value", (fl, "attention", "value"))
        dense(f"{hf}.attention.output.dense", (fl, "attention", "out"))
        ln(f"{hf}.attention.output.LayerNorm", (fl, "attention", "out_ln"))
        dense(f"{hf}.intermediate.dense", (fl, "intermediate"))
        dense(f"{hf}.output.dense", (fl, "output"))
        ln(f"{hf}.output.LayerNorm", (fl, "output_ln"))
        i += 1

    if "pooler.dense.weight" in state_dict:
        dense("pooler.dense", ("pooler",))

    return {"params": p}
