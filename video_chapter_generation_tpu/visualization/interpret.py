"""Model interpretability: Grad-CAM for the vision stream, saliency and
integrated gradients for the language stream.

Functional JAX re-designs of the reference's visualization_lib:
- cam_visualization.py:24 (hook-based Grad-CAM) -> capture a stage
  activation on the forward pass, differentiate the class score wrt it by
  re-entering the network from that stage (ResNet.from_stage), weight
  channels by spatially-pooled gradients, ReLU.
- lang/saliency_interpreter.py:9-231 and lang/integrated_gradient.py:7-78
  -> gradients wrt injected word embeddings (BertModel input_embeds).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grad_cam_vision(
    resnet,
    variables,
    frames,
    class_index: int = 1,
    stage: int = 4,
    head_fn: Optional[Callable] = None,
):
    """Grad-CAM heatmaps for a batch of frames.

    resnet: models.resnet.ResNet; frames: [N, H, W, 3] (N = B*T under TSM).
    head_fn: pooled features [N, D] -> logits [N, num_classes]; defaults to
    sum of features (feature saliency) when no classifier is attached.
    Returns cam [N, h_s, w_s] normalized to [0, 1].
    """
    capture: Dict[str, jax.Array] = {}
    resnet.apply(variables, frames, capture=capture)
    act_key = f"stage{stage}"
    # stage INPUT = previous stage's output (stage1's input not captured,
    # so differentiate wrt the chosen stage's own output re-entered at
    # from_stage=stage)
    act = capture[act_key]

    def score(a):
        pooled = resnet.apply(variables, a, from_stage=stage)
        if head_fn is not None:
            logits = head_fn(pooled)
            return logits[:, class_index].sum()
        return pooled.sum()

    grads = jax.grad(score)(act)  # [N, h, w, C]
    weights = grads.mean(axis=(1, 2), keepdims=True)
    cam = jnp.maximum((weights * act).sum(-1), 0.0)
    denom = cam.max(axis=(1, 2), keepdims=True)
    return cam / jnp.where(denom > 0, denom, 1.0)


def _lang_logit_fn(bert_chapter, variables, text_ids, attention_mask,
                   class_index: int):
    table = variables["params"]["base_model"]["word_embeddings"]["embedding"]
    base_emb = jnp.take(table, text_ids, axis=0)

    def logit(embeds):
        logits, _ = bert_chapter.apply(
            variables, text_ids, attention_mask, input_embeds=embeds
        )
        return logits[:, class_index].sum()

    return base_emb, logit


def saliency_lang(bert_chapter, variables, text_ids, attention_mask,
                  class_index: int = 1):
    """Simple-gradient token saliency: L2 norm of d logit / d embedding,
    normalized per example (saliency_interpreter.py semantics)."""
    base_emb, logit = _lang_logit_fn(
        bert_chapter, variables, text_ids, attention_mask, class_index
    )
    grads = jax.grad(logit)(base_emb)  # [B, L, H]
    sal = jnp.linalg.norm(grads, axis=-1) * attention_mask
    denom = sal.sum(axis=-1, keepdims=True)
    return sal / jnp.where(denom > 0, denom, 1.0)


def integrated_gradients_lang(bert_chapter, variables, text_ids,
                              attention_mask, class_index: int = 1,
                              steps: int = 16):
    """IG along the straight path from the zero embedding to the input
    embedding (integrated_gradient.py:7-78): attribution per token =
    (emb - baseline) . mean_path_grad, L1-normalized."""
    base_emb, logit = _lang_logit_fn(
        bert_chapter, variables, text_ids, attention_mask, class_index
    )
    grad_fn = jax.grad(logit)

    def body(i, acc):
        alpha = (i + 1) / steps
        return acc + grad_fn(base_emb * alpha)

    total = jax.lax.fori_loop(
        0, steps, body, jnp.zeros_like(base_emb)
    )
    avg_grads = total / steps
    attr = (base_emb * avg_grads).sum(-1) * attention_mask
    attr = jnp.abs(attr)
    denom = attr.sum(axis=-1, keepdims=True)
    return attr / jnp.where(denom > 0, denom, 1.0)
