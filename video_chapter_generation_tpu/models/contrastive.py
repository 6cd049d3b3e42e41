"""MoCo-style contrastive text pretraining + ListNet listwise ranking.

Functional TPU re-designs of:
- BertHugfaceConstrast (model/lang/bert_hugface_constrast.py:12-172):
  momentum key encoder, 65536-slot negatives queue, candidate selection by
  max q-similarity, InfoNCE. The torch buffers (queue, ptr) and the
  in-place momentum update become explicit members of a MoCoState pytree —
  no mutation, safe under jit/pjit.
- listnet BERT (model/lang/bert_hugface_listnet.py:18-206): slate-wise
  scoring where the positive clip's pooler embedding is dotted against
  contrast clips, ListNet softmax loss + auxiliary binary CE.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .bert import BertConfig, BertModel


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class MoCoState(flax.struct.PyTreeNode):
    params_q: Any
    params_k: Any
    queue: jax.Array  # [K, D] normalized negatives
    queue_ptr: jax.Array  # scalar int32


class MoCoTextEncoder:
    """Wrapper holding the BERT encoder used for both q and k branches."""

    def __init__(self, cfg: BertConfig, K: int = 65536, m: float = 0.999,
                 T: float = 0.07):
        self.model = BertModel(cfg)
        self.cfg = cfg
        self.K = K
        self.m = m
        self.T = T

    def init_state(self, rng) -> MoCoState:
        ids = jnp.zeros((1, 8), jnp.int32)
        mask = jnp.ones((1, 8), jnp.int32)
        rng, q_rng, queue_rng = jax.random.split(rng, 3)
        params = self.model.init(q_rng, ids, mask)["params"]
        queue = l2_normalize(
            jax.random.normal(queue_rng, (self.K, self.cfg.hidden_size))
        )
        return MoCoState(
            params_q=params,
            params_k=jax.tree_util.tree_map(jnp.copy, params),
            queue=queue,
            queue_ptr=jnp.zeros((), jnp.int32),
        )

    def encode(self, params, ids, mask):
        _, pooled = self.model.apply({"params": params}, ids, mask)
        return l2_normalize(pooled)

    def momentum_update(self, state: MoCoState) -> MoCoState:
        new_k = jax.tree_util.tree_map(
            lambda k, q: k * self.m + q * (1.0 - self.m),
            state.params_k, state.params_q,
        )
        return state.replace(params_k=new_k)

    def select_positive(self, q_emb, cand_ids, cand_mask, params_q):
        """Pick, per query, the candidate with max q-encoder similarity
        (bert_hugface_constrast.py:120-137)."""
        b, c, L = cand_ids.shape
        cand_emb = self.encode(
            params_q, cand_ids.reshape(b * c, L), cand_mask.reshape(b * c, L)
        ).reshape(b, c, -1)
        sims = jnp.einsum("bcd,bd->bc", cand_emb, q_emb)
        best = jnp.argmax(sims, axis=1)
        sel_ids = jnp.take_along_axis(cand_ids, best[:, None, None], 1)[:, 0]
        sel_mask = jnp.take_along_axis(cand_mask, best[:, None, None], 1)[:, 0]
        return sel_ids, sel_mask

    def forward(self, state: MoCoState, query_ids, query_mask,
                cand_ids, cand_mask) -> Tuple[jax.Array, jax.Array, MoCoState]:
        """Full MoCo step: returns (logits [B,1+K], labels [B], new state
        with momentum-updated key encoder and updated queue)."""
        q = self.encode(state.params_q, query_ids, query_mask)

        state = self.momentum_update(state)
        sel_ids, sel_mask = jax.lax.stop_gradient(
            self.select_positive(q, cand_ids, cand_mask, state.params_q)
        )
        k = jax.lax.stop_gradient(
            self.encode(state.params_k, sel_ids, sel_mask)
        )

        l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
        l_neg = jnp.einsum("nc,kc->nk", q, jax.lax.stop_gradient(state.queue))
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.T
        labels = jnp.zeros(q.shape[0], jnp.int32)

        state = self.dequeue_and_enqueue(state, k)
        return logits, labels, state

    def dequeue_and_enqueue(self, state: MoCoState, keys) -> MoCoState:
        b = keys.shape[0]
        assert self.K % b == 0, "queue size must be divisible by batch"
        queue = jax.lax.dynamic_update_slice(
            state.queue, keys, (state.queue_ptr, 0)
        )
        ptr = (state.queue_ptr + b) % self.K
        return state.replace(queue=queue, queue_ptr=ptr)


class ListwiseBert:
    """Slate-wise listnet scorer over a BERT encoder."""

    def __init__(self, cfg: BertConfig):
        self.model = BertModel(cfg)
        self.cfg = cfg
        import flax.linen as nn

        self.head = nn.Dense(2)

    def init_variables(self, rng):
        ids = jnp.zeros((1, 8), jnp.int32)
        mask = jnp.ones((1, 8), jnp.int32)
        r1, r2 = jax.random.split(rng)
        bert = self.model.init(r1, ids, mask)["params"]
        head = self.head.init(r2, jnp.zeros((1, self.cfg.hidden_size)))["params"]
        return {"bert": bert, "head": head}

    def train_forward(self, params, ids, mask, targets,
                      balance_idx, binary_labels) -> Dict:
        """ids/mask [B, slate, L]; targets [B, slate] relevance; slot 0 is
        the positive clip (bert_hugface_listnet.py:149-176)."""
        b, s, L = ids.shape
        _, pooled = self.model.apply(
            {"params": params["bert"]}, ids.reshape(b * s, L),
            mask.reshape(b * s, L),
        )
        emb = pooled.reshape(b, s, -1)
        pos = emb[:, :1]
        contrast = emb[:, 1:]
        scores = jnp.einsum("bod,bsd->bs", pos, contrast)  # [B, slate-1]
        log_p = jax.nn.log_softmax(scores, axis=-1)
        surrogate = -(targets[:, 1:] * log_p).sum(-1).mean()

        flat = pooled[balance_idx]
        binary_logits = self.head.apply({"params": params["head"]}, flat)
        binary_loss = optax.softmax_cross_entropy_with_integer_labels(
            binary_logits, binary_labels
        ).mean()
        return {
            "loss": surrogate + binary_loss,
            "surrogate_loss": surrogate,
            "binary_loss": binary_loss,
            "binary_logits": binary_logits,
        }

    def test_forward(self, params, ids, mask) -> jax.Array:
        _, pooled = self.model.apply({"params": params["bert"]}, ids, mask)
        return self.head.apply({"params": params["head"]}, pooled)
