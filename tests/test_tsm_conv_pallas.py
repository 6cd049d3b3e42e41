"""Fused TSM-conv kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.ops.temporal_shift import (
    temporal_shift,
    temporal_shift_conv1x1,
)
from video_chapter_generation_tpu.ops.tsm_conv_pallas import tsm_conv1x1_pallas


def reference(x, k, T, ndiv):
    y = temporal_shift(x, T, ndiv)
    return jax.lax.conv_general_dilated(
        y, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("C,F,ndiv,hw,T", [
    (32, 8, 8, 4, 4),      # masked-W strategy (fold 4)
    (256, 64, 8, 8, 4),    # masked-W (fold 32)
    (512, 128, 4, 4, 4),   # sliced strategy (fold 128)
    (64, 16, 8, 6, 3),     # stem-like, odd T
])
def test_fused_xla_and_pallas_match_reference(C, F, ndiv, hw, T):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2 * T, hw, hw, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, C, F)).astype(np.float32))
    ref = np.asarray(reference(x, k, T, ndiv))
    np.testing.assert_allclose(
        np.asarray(temporal_shift_conv1x1(x, k, T, ndiv)), ref,
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(tsm_conv1x1_pallas(x, k, T, ndiv)), ref,
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_gradients_match():
    T, ndiv = 4, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2 * T, 4, 4, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 32, 8)).astype(np.float32))

    def loss_ref(x, k):
        return (reference(x, k, T, ndiv) ** 2).sum()

    def loss_pal(x, k):
        return (tsm_conv1x1_pallas(x, k, T, ndiv) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    g_pal = jax.grad(loss_pal, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_ref[1]),
                               rtol=1e-3, atol=1e-3)


def test_resnet_fused_vs_unfused_model():
    """Whole tiny ResNet: fuse_tsm=True (XLA rewrite on CPU) equals the
    unfused shift model when sharing converted params."""
    from video_chapter_generation_tpu.models.resnet import ResNet

    x = jax.random.normal(jax.random.PRNGKey(0), (2 * 4, 32, 32, 3))
    fused = ResNet(stage_sizes=(1, 1), n_segment=4, fuse_tsm=True)
    unfused = ResNet(stage_sizes=(1, 1), n_segment=4, fuse_tsm=False)
    v = fused.init(jax.random.PRNGKey(1), x, train=False)
    out_f = fused.apply(v, x, train=False)
    out_u = unfused.apply(v, x, train=False)  # identical param layout
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-4, atol=1e-4)
