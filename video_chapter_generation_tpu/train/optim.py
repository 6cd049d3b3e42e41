"""Optimizer + LR schedule construction.

Reproduces the reference's training recipe:
- AdamW with a decay/no-decay parameter partition — biases, LayerNorm/
  BatchNorm scales and embeddings get weight_decay 0
  (bert_hugface.py:55-96, two_stream_window.py:335-380)
- epoch-based LR warmup + cosine/exponential decay
  (train_video_segment_ddp.py:345-375)
- gradient accumulation (optax.MultiSteps; ddp.py:334-342)
- global-norm clipping (ddp.py:340)
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import optax

from ..core.config import OptimConfig

_NO_DECAY_MARKERS = ("ln", "norm", "bn", "emb")


def no_decay_mask(params) -> Any:
    """True where weight decay applies. Replicates the reference's
    configure_optimizers partitions EXACTLY, quirks included:

    - biases never decay (all families).
    - The TwoStream family matches literal substrings of the torch fqn
      ("LayerNorm"/"bn"/"emb", two_stream_window.py:358-392). That rule
      exempts HF-BERT LayerNorms, torchvision bn1/2/3 and embeddings —
      but DECAYS the torchvision downsample BN weight ("downsample.1",
      our proj_bn) and every lowercase-named norm the reference authors
      wrote themselves (window-attention attention_norm/ffn_norm/
      final_layer_norm, the numeric Sequential norms inside the fusion
      heads and classifier). tests/test_train_parity.py pins this
      against the reference's own factory in f64.
    - minGPT partitions by module type (gpt.py:157-189) and Pegasus by
      "layer_norm"/"emb" (pegasus_hugface.py:55-70) — for both, plain
      norm scales and embeddings are exempt, matmul kernels decay.
    """

    def decide(path) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        leaf = str(keys[-1]).lower()
        joined = "/".join(str(k).lower() for k in keys)
        if leaf.endswith("bias"):
            return False
        if leaf == "scale":
            # torch fqn "downsample.1.weight" carries no marker -> decayed
            if "proj_bn" in joined:
                return True
            # reference-authored lowercase norms (window_attn blocks +
            # classifier, fusion-head stacks) -> decayed by its rule
            return "window_attn" in joined or "fusion_head" in joined
        if leaf != "kernel":  # embeddings, pos tables, BN mean/var...
            return False
        return not any(m in joined for m in _NO_DECAY_MARKERS)

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def lr_multiplier(epoch: int, cfg: OptimConfig) -> float:
    """Epoch-based schedule multiplier (ddp.py:345-375), applied on top of
    the base learning rate every optimizer step."""
    if not cfg.lr_decay:
        return 1.0
    if epoch < cfg.warmup_epochs:
        return max(epoch / cfg.warmup_epochs, 1e-2)
    progress = epoch / cfg.final_epochs if epoch < cfg.final_epochs else 1.0
    if cfg.lr_decay_type == "cosine":
        return max(0.001, 0.5 * (1.0 + math.cos(math.pi * progress)))
    if cfg.lr_decay_type == "exp":
        t = 1 / 5
        if progress < t:
            return 1.0
        if progress < 2 * t:
            return 0.1
        if progress < 3 * t:
            return 0.01
        return 0.001
    raise ValueError(f"unknown lr_decay_type {cfg.lr_decay_type}")


def clip_by_global_norm_ref(max_norm: float) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_ semantics: when clipping, scale by
    max_norm / (global_norm + 1e-6) — torch adds 1e-6 to the denominator
    (clip_grad.py), optax.clip_by_global_norm does not. The difference is
    O(1e-6) relative, but differential training-trajectory tests
    (tests/test_train_parity.py) compare step for step in f64, where the
    mismatch compounds visibly."""
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    """AdamW with the reference's decay partition, grad clipping, dynamic
    LR scaling (via `scale_by_lr_mult` injected state) and accumulation.

    The per-epoch multiplier is supplied at step time through
    `optax.inject_hyperparams` as `opt.update(..., lr_mult=...)`-style state:
    we expose it as the `lr_mult` hyperparameter of the returned optimizer.
    """
    mask = no_decay_mask(params)

    def base(lr_mult: float = 1.0):
        return optax.chain(
            clip_by_global_norm_ref(cfg.grad_norm_clip),
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.scale(-cfg.learning_rate),
            optax.scale(lr_mult),
        )

    tx = optax.inject_hyperparams(base)(lr_mult=1.0)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def set_lr_mult(opt_state, mult: float):
    """Update the injected lr_mult hyperparameter inside (possibly
    MultiSteps-wrapped) optimizer state."""
    import jax.numpy as jnp

    if isinstance(opt_state, optax.MultiStepsState):
        inner = set_lr_mult(opt_state.inner_opt_state, mult)
        return opt_state._replace(inner_opt_state=inner)
    # InjectStatefulHyperparamsState / InjectHyperparamsState
    hp = dict(opt_state.hyperparams)
    hp["lr_mult"] = jnp.asarray(mult, dtype=jnp.asarray(hp["lr_mult"]).dtype)
    return opt_state._replace(hyperparams=hp)


def make_grouped_optimizer(cfg: OptimConfig, params,
                           backbone_markers=("lang_model", "vision_model"),
                           head_lr_mult: float = 2.0):
    """Domain-specific recipe (two_stream_domain_specific.py:428-441):
    backbone params at base LR, everything else at head_lr_mult x, with the
    usual decay/no-decay partition inside each group."""
    import jax.tree_util as jtu

    decay_mask = no_decay_mask(params)

    def is_backbone(path) -> bool:
        joined = "/".join(
            str(getattr(p, "key", p)).lower() for p in path
        )
        return any(m in joined for m in backbone_markers)

    backbone = jtu.tree_map_with_path(lambda p, _: is_backbone(p), params)

    def base(lr_mult: float = 1.0):
        def lr_scale(tree_bool_backbone):
            # per-leaf multiplier: 1.0 backbone, head_lr_mult others
            return jtu.tree_map(
                lambda is_bb: 1.0 if is_bb else head_lr_mult,
                tree_bool_backbone,
            )

        mults = lr_scale(backbone)

        def scale_update(updates, state, params=None):
            del state, params
            return (
                jtu.tree_map(lambda u, m: u * m, updates, mults),
                optax.EmptyState(),
            )

        per_group = optax.GradientTransformation(
            lambda params: optax.EmptyState(), scale_update
        )
        return optax.chain(
            clip_by_global_norm_ref(cfg.grad_norm_clip),
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
            per_group,
            optax.scale(-cfg.learning_rate),
            optax.scale(lr_mult),
        )

    tx = optax.inject_hyperparams(base)(lr_mult=1.0)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
