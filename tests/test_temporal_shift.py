"""TSM parity tests: XLA shift vs a numpy reference transliteration of
`ops/temporal_shift.py:33-51`, Pallas vs XLA, and gradient correctness
(the analogue of the reference's inplace-vs-copy fwd/bwd test at
temporal_shift.py:158-208)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_chapter_generation_tpu.ops import (
    temporal_pool,
    temporal_shift,
    temporal_shift_pallas,
)


def numpy_reference_shift(x, n_segment, n_div):
    """Direct transliteration of the torch reference (NCHW there, NHWC here:
    channel axis is last)."""
    nt = x.shape[0]
    n_batch = nt // n_segment
    x5 = x.reshape(n_batch, n_segment, *x.shape[1:])
    c = x5.shape[-1]
    fold = c // n_div
    out = np.zeros_like(x5)
    out[:, :-1, ..., :fold] = x5[:, 1:, ..., :fold]  # shift left
    out[:, 1:, ..., fold : 2 * fold] = x5[:, :-1, ..., fold : 2 * fold]  # right
    out[:, :, ..., 2 * fold :] = x5[:, :, ..., 2 * fold :]
    return out.reshape(nt, *x.shape[1:])


@pytest.mark.parametrize("shape,t,ndiv", [
    ((2 * 8, 6, 6, 16), 8, 8),
    ((3 * 4, 5, 5, 24), 4, 8),
    ((1 * 16, 4, 4, 8), 16, 4),
])
def test_shift_matches_reference(shape, t, ndiv):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(temporal_shift(jnp.asarray(x), t, ndiv))
    ref = numpy_reference_shift(x, t, ndiv)
    np.testing.assert_allclose(ours, ref, atol=0)


def test_shift_5d_input():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 3, 3, 8)).astype(np.float32)
    out5 = np.asarray(temporal_shift(jnp.asarray(x), 4))
    out4 = np.asarray(
        temporal_shift(jnp.asarray(x.reshape(8, 3, 3, 8)), 4)
    ).reshape(2, 4, 3, 3, 8)
    np.testing.assert_allclose(out5, out4, atol=0)


def test_pallas_matches_xla():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2 * 4, 4, 4, 16)).astype(np.float32)
    a = np.asarray(temporal_shift(jnp.asarray(x), 4, 8))
    b = np.asarray(temporal_shift_pallas(jnp.asarray(x), 4, 8))
    np.testing.assert_allclose(a, b, atol=0)


def test_shift_gradient():
    """grad of mean(shift(x)^2) equals the reference autograd behaviour:
    d/dx is the transpose shift applied to 2*shift(x)/numel."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2 * 4, 3, 3, 8)).astype(np.float32))

    def loss(x):
        return jnp.mean(temporal_shift(x, 4, 8) ** 2)

    g = jax.grad(loss)(x)
    # numeric check on a few coordinates
    eps = 1e-3
    flat = np.asarray(x).ravel()
    gflat = np.asarray(g).ravel()
    idxs = [0, 7, 100, flat.size - 1]
    for i in idxs:
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        num = (loss(jnp.asarray(xp.reshape(x.shape))) -
               loss(jnp.asarray(xm.reshape(x.shape)))) / (2 * eps)
        assert abs(float(num) - gflat[i]) < 1e-3


def test_temporal_pool_shape_and_values():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2 * 8, 3, 3, 4)).astype(np.float32)
    out = np.asarray(temporal_pool(jnp.asarray(x), 8))
    assert out.shape == (2 * 4, 3, 3, 4)
    # max_pool3d k=3 s=2 p=1 over time: out[t] = max(x[2t-1:2t+2])
    x5 = x.reshape(2, 8, 3, 3, 4)
    padded = np.concatenate(
        [np.full_like(x5[:, :1], -np.inf), x5, np.full_like(x5[:, :1], -np.inf)], axis=1
    )
    expected = np.stack(
        [padded[:, 2 * t : 2 * t + 3].max(axis=1) for t in range(4)], axis=1
    ).reshape(8, 3, 3, 4)
    np.testing.assert_allclose(out, expected, atol=0)
