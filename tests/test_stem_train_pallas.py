"""Training-mode fused stem (ops/stem_train_pallas.py) vs a pure-XLA
reference replicating the standard flax stem (7x7/2 conv + batch-stat BN
+ ReLU + 3x3/2 max pool), at f32 in interpret mode: forward, batch stats
and the full VJP (dw7/dgamma/dbeta; the stem has no dx) via jax.grad.
Covers the frames entry (XLA s2d reshape) and the raw-uint8 s2d entry
(normalize folded into the kernel), plus the ResNet integration."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy kernel/training parity — deselect via -m 'not slow'

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.ops.preprocess import _affine_consts
from video_chapter_generation_tpu.ops.stem_train_pallas import (
    stem_frames_train,
    stem_s2d_train,
)

EPS = 1e-5


def reference(x, w7, g, be):
    yc = jax.lax.conv_general_dilated(
        x, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ycf = yc.astype(jnp.float32)
    mu = jnp.mean(ycf, axis=(0, 1, 2))
    var = jnp.mean(ycf * ycf, axis=(0, 1, 2)) - mu * mu
    y = ((ycf - mu) * jax.lax.rsqrt(var + EPS) * g + be).astype(x.dtype)
    y = jnp.maximum(y, 0)
    out = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return out.astype(x.dtype), (mu, var)


def _args(rng, nt, h):
    x = jnp.asarray(rng.standard_normal((nt, h, h, 3)), jnp.float32)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) / np.sqrt(147),
                     jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(64), jnp.float32)
    be = jnp.asarray(0.1 * rng.standard_normal(64), jnp.float32)
    return x, w7, g, be


def test_frames_forward_stats_grads():
    rng = np.random.default_rng(11)
    x, w7, g, be = _args(rng, 3, 16)
    y_ref, st_ref = reference(x, w7, g, be)
    y, st = stem_frames_train(x, w7, g, be, EPS, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for k, (s, sr) in enumerate(zip(st, st_ref)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"stat{k}")

    cot = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(reference(*a)[0] * cot),
                     argnums=(1, 2, 3))(x, w7, g, be)
    g_f = jax.grad(lambda *a: jnp.sum(
        stem_frames_train(*a, EPS, jnp.float32)[0] * cot),
        argnums=(1, 2, 3))(x, w7, g, be)
    for name, gr, gf in zip(["dw7", "dgamma", "dbeta"], g_ref, g_f):
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4,
            atol=2e-4 * scale, err_msg=name)


def test_u8_s2d_entry():
    """Raw uint8 s2d input: the kernel normalizes in VMEM; parity vs the
    reference on pre-normalized frames (weights/affine grads only — the
    input is integer data)."""
    rng = np.random.default_rng(12)
    _, w7, g, be = _args(rng, 3, 16)
    u8 = rng.integers(0, 256, (3, 16, 16, 3)).astype(np.uint8)
    s4 = jnp.asarray(u8.reshape(3, 4, 4, 4, 4, 3)
                     .transpose(0, 1, 3, 2, 4, 5).reshape(3, 4, 4, 48))
    a3, b3 = _affine_consts(jnp.float32)
    xn = jnp.asarray(u8, jnp.float32) * a3 + b3
    y_ref, _ = reference(xn, w7, g, be)
    y, _ = stem_s2d_train(s4, w7, g, be, EPS, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    cot = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(reference(xn, *a)[0] * cot),
                     argnums=(0, 1, 2))(w7, g, be)
    g_f = jax.grad(lambda *a: jnp.sum(
        stem_s2d_train(s4, *a, EPS, jnp.float32)[0] * cot),
        argnums=(0, 1, 2))(w7, g, be)
    for name, gr, gf in zip(["dw7", "dgamma", "dbeta"], g_ref, g_f):
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=3e-4,
            atol=3e-4 * scale, err_msg=name)


def test_resnet_fusedtrain_stem(monkeypatch):
    """ResNet with tsm_impl='fusedtrain' routes the stem through the
    training kernel (param/batch_stats tree unchanged); output, running
    stats and grads match the tap3 stack with the standard stem."""
    import video_chapter_generation_tpu.models.resnet as rn

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((4, 2048)), jnp.float32)
    m_ref = rn.ResNet(stage_sizes=(1, 1, 1, 1), n_segment=4,
                      tsm_impl="tap3")
    m = rn.ResNet(stage_sizes=(1, 1, 1, 1), n_segment=4,
                  tsm_impl="fusedtrain")
    v = jax.jit(lambda: m_ref.init(jax.random.PRNGKey(0), x,
                                   train=True))()

    def run(model, params):
        def loss(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out * cot), upd["batch_stats"]

        (val, upd), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, upd, grads

    val_ref, upd_ref, g_ref = run(m_ref, v["params"])
    val, upd, g = run(m, v["params"])
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-4)
    assert "bn_init" in upd  # the fused stem updated its running stats
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-4 * max(float(jnp.max(jnp.abs(b))), 1e-3)),
        upd, upd_ref)
    # same noise-floor-calibrated tolerance as the block-level model test
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=2e-2 * max(float(jnp.max(jnp.abs(b))), 1e-3)),
        g, g_ref)
