"""Training-mode fused bottleneck kernels (ops/tsm_block_train_pallas.py)
vs a pure-XLA reference replicating the standard flax path (BatchNorm with
biased batch variance, f32 stats, output cast to the compute dtype before
the residual add) — forward, batch stats, and the FULL hand-written VJP
(dx and all 9 weight/affine grads) via jax.grad, at f32 in interpret mode.

Covers whole-sample grids, multi-tile halo grids (FORCE_ROWS), and ragged
sublane-padded block widths (W not a multiple of 8 — the L3/L4 regime)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy kernel/training parity — deselect via -m 'not slow'

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.ops import tsm_block_train_pallas as tbt
from video_chapter_generation_tpu.ops.temporal_shift import temporal_shift

T, NDIV, EPS = 4, 8, 1e-5


@pytest.fixture(autouse=True)
def _reset_force_rows():
    yield
    tbt.FORCE_ROWS = None


def _conv(x, w, k):
    return jax.lax.conv_general_dilated(
        x, w.reshape(k, k, w.shape[-2], w.shape[-1]), (1, 1),
        [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_train(v, g, be):
    vf = v.astype(jnp.float32)
    mu = jnp.mean(vf, axis=(0, 1, 2))
    var = jnp.mean(vf * vf, axis=(0, 1, 2)) - mu * mu
    out = ((vf - mu) * jax.lax.rsqrt(var + EPS) * g + be).astype(v.dtype)
    return out, mu, var


def reference(x, w1, w2, w3, g1, be1, g2, be2, g3, be3):
    xs = temporal_shift(x, T, NDIV)
    u = _conv(xs, w1, 1)
    a1, mu1, v1 = _bn_train(u, g1, be1)
    z = _conv(jnp.maximum(a1, 0), w2, 3)
    a2, mu2, v2 = _bn_train(z, g2, be2)
    p = _conv(jnp.maximum(a2, 0), w3, 1)
    a3, mu3, v3 = _bn_train(p, g3, be3)
    y = jnp.maximum(a3 + x, 0)
    return y, (mu1, v1, mu2, v2, mu3, v3)


def _args(rng, b, h, w, c, f):
    x = jnp.asarray(rng.standard_normal((b * T, h, w, c)) * 0.5,
                    jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, c, f)) / np.sqrt(c),
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, f, f)) / np.sqrt(9 * f),
                     jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((1, 1, f, c)) / np.sqrt(f),
                     jnp.float32)
    affines = []
    for n in (f, f, c):
        affines += [
            jnp.asarray(1.0 + 0.1 * rng.standard_normal(n), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32),
        ]
    return (x, w1, w2, w3, *affines)


CASES = [
    # (b, h, w, c, f, force_rows)
    (2, 8, 8, 32, 8, None),       # whole-sample grid
    (2, 8, 8, 32, 8, 4),          # 2 row tiles (halo paths)
    (1, 8, 8, 32, 8, 2),          # 4 row tiles
    (2, 8, 12, 32, 8, None),      # ragged width (Wp=16 > W=12)
    (1, 6, 6, 16, 8, 3),          # ragged + tiles + fold=2
]


@pytest.fixture(autouse=True)
def _reset_rows():
    yield
    tbt.FORCE_ROWS = None


@pytest.mark.parametrize("b,h,w,c,f,rows", CASES)
def test_forward_and_stats(b, h, w, c, f, rows):
    tbt.FORCE_ROWS = rows
    args = _args(np.random.default_rng(0), b, h, w, c, f)
    y_ref, stats_ref = reference(*args)
    y, stats = tbt.tsm_bottleneck_train(*args, T, NDIV, EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for s, sr in zip(stats, stats_ref):
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,h,w,c,f,rows", CASES)
def test_gradients(b, h, w, c, f, rows):
    tbt.FORCE_ROWS = rows
    rng = np.random.default_rng(1)
    args = _args(rng, b, h, w, c, f)
    cot = jnp.asarray(rng.standard_normal((b * T, h, w, c)), jnp.float32)

    def loss_ref(*a):
        y, _ = reference(*a)
        return jnp.sum(y * cot)

    def loss_fused(*a):
        y, _ = tbt.tsm_bottleneck_train(*a, T, NDIV, EPS)
        return jnp.sum(y * cot)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    names = ["dx", "dw1", "dw2", "dw3", "dg1", "dbe1", "dg2", "dbe2",
             "dg3", "dbe3"]
    for name, gr, gf in zip(names, g_ref, g_fused):
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4 * scale,
            err_msg=name)


def reference_proj(x, w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep):
    xs = temporal_shift(x, T, NDIV)
    u = _conv(xs, w1, 1)
    a1, mu1, v1 = _bn_train(u, g1, be1)
    z = _conv(jnp.maximum(a1, 0), w2, 3)
    a2, mu2, v2 = _bn_train(z, g2, be2)
    p = _conv(jnp.maximum(a2, 0), w3, 1)
    a3, mu3, v3 = _bn_train(p, g3, be3)
    pr = _conv(x, wp, 1)
    ap, mup, vp = _bn_train(pr, gp, bep)
    y = jnp.maximum(a3 + ap, 0)
    return y, (mu1, v1, mu2, v2, mu3, v3, mup, vp)


def _proj_args(rng, b, h, w, c, f):
    x, w1, w2, _, *aff = _args(rng, b, h, w, c, f)
    c_out = 4 * f
    w3 = jnp.asarray(rng.standard_normal((1, 1, f, c_out)) / np.sqrt(f),
                     jnp.float32)
    wp = jnp.asarray(rng.standard_normal((1, 1, c, c_out)) / np.sqrt(c),
                     jnp.float32)
    g3 = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c_out), jnp.float32)
    be3 = jnp.asarray(0.1 * rng.standard_normal(c_out), jnp.float32)
    gp = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c_out), jnp.float32)
    bep = jnp.asarray(0.1 * rng.standard_normal(c_out), jnp.float32)
    return (x, w1, w2, w3, wp, aff[0], aff[1], aff[2], aff[3], g3, be3,
            gp, bep)


@pytest.mark.parametrize("rows", [None, 4], ids=["whole", "tiled"])
def test_proj_forward_and_gradients(rows):
    """Stride-1 projection variant (layer1 block0): forward, stats and
    all 13 gradients vs jax.grad of the XLA reference."""
    tbt.FORCE_ROWS = rows
    rng = np.random.default_rng(5)
    b, h, w, c, f = 2, 8, 8, 16, 8  # c_out = 32 != c
    args = _proj_args(rng, b, h, w, c, f)
    y_ref, stats_ref = reference_proj(*args)
    y, stats = tbt.tsm_bottleneck_proj_train(*args, T, NDIV, EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for s, sr in zip(stats, stats_ref):
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   rtol=1e-5, atol=1e-6)

    cot = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(reference_proj(*a)[0] * cot),
                     argnums=tuple(range(13)))(*args)
    g = jax.grad(
        lambda *a: jnp.sum(
            tbt.tsm_bottleneck_proj_train(*a, T, NDIV, EPS)[0] * cot),
        argnums=tuple(range(13)))(*args)
    names = ["dx", "dw1", "dw2", "dw3", "dwp", "dg1", "dbe1", "dg2",
             "dbe2", "dg3", "dbe3", "dgp", "dbep"]
    for name, gr, gf in zip(names, g_ref, g):
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4 * scale,
            err_msg=name)


def reference_s2(x, w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep):
    xs = temporal_shift(x, T, NDIV)
    u = _conv(xs, w1, 1)
    a1, mu1, v1 = _bn_train(u, g1, be1)
    z = _conv_s(jnp.maximum(a1, 0), w2, 3, 2)
    a2, mu2, v2 = _bn_train(z, g2, be2)
    p = _conv(jnp.maximum(a2, 0), w3, 1)
    a3, mu3, v3 = _bn_train(p, g3, be3)
    pr = _conv_s(x, wp, 1, 2)
    apx, mup, vp = _bn_train(pr, gp, bep)
    y = jnp.maximum(a3 + apx, 0)
    return y, (mu1, v1, mu2, v2, mu3, v3, mup, vp)


def _conv_s(x, w, k, s):
    return jax.lax.conv_general_dilated(
        x, w.reshape(k, k, w.shape[-2], w.shape[-1]), (s, s),
        [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,rows", [(8, 8, None), (8, 8, 4),
                                      (4, 12, None), (8, 12, 2)],
                         ids=["whole", "tiled", "ragged", "ragged-tiled"])
def test_s2_forward_and_gradients(h, w, rows):
    """Stride-2 projection variant (layers 2-4 block0): forward, the 8
    batch stats (bn1 full-res count, bn2/bn3/proj half-res) and all 13
    gradients vs jax.grad of the XLA reference — incl. the planar-column
    da1/dx path and its XLA interleave."""
    tbt.FORCE_ROWS = rows
    rng = np.random.default_rng(7)
    b, c, f = 2, 16, 8
    args = _proj_args(rng, b, h, w, c, f)
    y_ref, stats_ref = reference_s2(*args)
    y, stats = tbt.tsm_bottleneck_s2_train(*args, T, NDIV, EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for k, (s, sr) in enumerate(zip(stats, stats_ref)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"stat{k}")

    cot = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(reference_s2(*a)[0] * cot),
                     argnums=tuple(range(13)))(*args)
    g = jax.grad(
        lambda *a: jnp.sum(
            tbt.tsm_bottleneck_s2_train(*a, T, NDIV, EPS)[0] * cot),
        argnums=tuple(range(13)))(*args)
    names = ["dx", "dw1", "dw2", "dw3", "dwp", "dg1", "dbe1", "dg2",
             "dbe2", "dg3", "dbe3", "dgp", "dbep"]
    for name, gr, gf in zip(names, g_ref, g):
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4 * scale,
            err_msg=name)


def test_resnet_fusedtrain_matches_tap3(monkeypatch):
    """Model-level training parity: ResNet with tsm_impl='fusedtrain'
    (stride-1 non-projection blocks on the fused train kernels, others on
    tap3) vs the all-tap3 training stack — same params, same batch:
    forward output, running-stat updates, and gradients must match."""
    import video_chapter_generation_tpu.models.resnet as rn

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((8, 2048)), jnp.float32)
    # fuse_stem_pool=False pins BOTH stacks to the standard stem so this
    # test isolates the BLOCK kernels: with the fused training stem on
    # one side only, its ~1e-7 conv rounding difference can flip a
    # near-tied max-pool branch and produce a discrete single-element
    # gradient difference (observed: 1/512 at 2x the noise floor). Stem
    # parity has its own tests (test_stem_train_pallas.py, incl. a
    # ResNet integration case).
    m_ref = rn.ResNet(stage_sizes=(2, 2, 1, 1), n_segment=4,
                      tsm_impl="tap3", fuse_stem_pool=False)
    m = rn.ResNet(stage_sizes=(2, 2, 1, 1), n_segment=4,
                  tsm_impl="fusedtrain", fuse_stem_pool=False)
    v = jax.jit(lambda: m_ref.init(jax.random.PRNGKey(0), x, train=True))()

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
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-4 * max(float(jnp.max(jnp.abs(b))), 1e-3)),
        upd, upd_ref)
    # tolerance calibrated to the measured impl-to-impl noise floor: on
    # this exact setup the two pure-XLA impls (tap3 vs 'xla') disagree
    # by up to 1.3e-2 relative-to-max per leaf (layer1_block0/conv3) and
    # fused-vs-xla stays BELOW tap3-vs-xla (8.6e-3) — the per-element
    # parity standard is the kernel-level tests, which hold 2e-4 vs the
    # direct reference
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=2e-2 * max(float(jnp.max(jnp.abs(b))), 1e-3)),
        g, g_ref)


def test_stats_do_not_backprop():
    """The stats outputs are buffers: a cotangent on them must not leak
    into the input grads (flax BatchNorm running averages are outside
    autodiff)."""
    args = _args(np.random.default_rng(2), 1, 8, 8, 32, 8)

    def loss(*a):
        _, stats = tbt.tsm_bottleneck_train(*a, T, NDIV, EPS)
        return sum(jnp.sum(s) for s in stats)

    dx = jax.grad(loss)(*args)
    assert float(jnp.max(jnp.abs(dx))) == 0.0
