"""Loss functions for every training task in the system.

- binary clip classification CE (train_video_segment_ddp.py:320)
- masked-token CE for MLM / next-token pretrain
  (pretrain_lang_model_hugface.py; youtube_subtitle_dataset.py:349-402)
- seq2seq title CE masked over decoder padding + token accuracy
  (train_chapter_title_gen.py:158-169)
- MoCo InfoNCE (bert_hugface_constrast.py) and ListNet
  (bert_hugface_listnet.py:149-176)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def _at_least_f32(logits):
    """Upcast half-precision logits to f32 for CE; keep f32/f64 as-is."""
    if jnp.finfo(logits.dtype).bits < 32:
        return logits.astype(jnp.float32)
    return logits


def clip_classification_loss(logits, labels) -> Tuple[jax.Array, Dict]:
    """logits [B,2], labels [B] int -> mean CE + accuracy.

    CE reduces in at-least-float32: under bf16 compute (mixed precision)
    the logits arrive half-precision, and softmax/log in bf16 loses the
    loss signal. Wider dtypes (f64 differential tests) pass through."""
    logits = _at_least_f32(logits)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, {"loss": loss, "acc": acc}


def masked_token_loss(logits, targets, ignore_index: int = -1):
    """CE over positions where targets != ignore_index (MLM / next-token).

    logits [B,L,V], targets [B,L] with ignore_index marking unused
    positions (the reference's Y_PAD = -1, youtube_dataset.py:20)."""
    logits = _at_least_f32(logits)  # stable CE under bf16 compute
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe_targets)
    denom = jnp.maximum(valid.sum(), 1)
    loss = jnp.where(valid, ce, 0.0).sum() / denom
    acc = jnp.where(valid, jnp.argmax(logits, -1) == safe_targets, False).sum() / denom
    return loss, {"loss": loss, "acc": acc}


def seq2seq_title_loss(logits, target_ids, decode_attention_mask):
    """Masked CE + token accuracy over real decoder positions
    (train_chapter_title_gen.py:158-169)."""
    logits = _at_least_f32(logits)  # stable CE under bf16 compute
    mask = decode_attention_mask.astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, target_ids)
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (ce * mask).sum() / denom
    correct = (jnp.argmax(logits, -1) == target_ids).astype(jnp.float32)
    acc = (correct * mask).sum() / denom
    return loss, {"loss": loss, "acc": acc}


def info_nce_loss(q, k_pos, queue, temperature: float = 0.07):
    """MoCo InfoNCE: q [B,D] vs positive keys k_pos [B,D] and a negatives
    queue [K,D]; all assumed L2-normalized."""
    l_pos = jnp.einsum("bd,bd->b", q, k_pos)[:, None]
    l_neg = jnp.einsum("bd,kd->bk", q, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    labels = jnp.zeros(q.shape[0], dtype=jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    acc = jnp.mean((jnp.argmax(logits, -1) == 0).astype(jnp.float32))
    return loss, {"loss": loss, "acc": acc}


def listnet_loss(scores, relevance, aux_logits=None, aux_labels=None,
                 aux_weight: float = 1.0):
    """ListNet top-1 cross entropy between score softmax and relevance
    softmax over the slate axis, plus optional auxiliary binary CE
    (bert_hugface_listnet.py:149-176).

    scores, relevance: [B, slate]."""
    p_pred = jax.nn.log_softmax(scores, axis=-1)
    p_true = jax.nn.softmax(relevance, axis=-1)
    loss = -(p_true * p_pred).sum(-1).mean()
    metrics = {"listnet_loss": loss}
    if aux_logits is not None:
        aux, am = clip_classification_loss(
            aux_logits.reshape(-1, aux_logits.shape[-1]), aux_labels.reshape(-1)
        )
        loss = loss + aux_weight * aux
        metrics["aux_loss"] = aux
        metrics["acc"] = am["acc"]
    metrics["loss"] = loss
    return loss, metrics
