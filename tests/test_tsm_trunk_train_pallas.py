"""Cross-block fused training trunk (ops/tsm_trunk_train_pallas.py) vs a
composition of the pure-XLA per-block references — forward, per-block
batch stats, dx and every block's gradients via jax.grad, at f32 in
interpret mode.

Covers every link type the ResNet50 trunk has (proj->plain,
plain->plain, plain->s2, s2->plain), multi-tile halo grids (FORCE_ROWS)
and ragged sublane-padded widths, plus the model-level ResNet
integration (param/batch_stats tree identity with the per-block path)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy kernel/training parity — deselect via -m 'not slow'

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.ops import tsm_block_train_pallas as tbt
from video_chapter_generation_tpu.ops.tsm_trunk_train_pallas import (
    tsm_trunk_train,
)

from test_tsm_block_train_pallas import (  # noqa: E402
    EPS,
    NDIV,
    T,
    reference,
    reference_proj,
    reference_s2,
)


@pytest.fixture(autouse=True)
def _reset_force_rows():
    yield
    tbt.FORCE_ROWS = None


def trunk_reference(x, blocks, kinds):
    y = x
    stats_all = []
    for bk, kind in zip(blocks, kinds):
        fn = {"plain": reference, "proj": reference_proj,
              "s2": reference_s2}[kind]
        y, st = fn(y, *bk)
        stats_all.append(st)
    return y, tuple(stats_all)


def _affine(rng, n):
    return (jnp.asarray(1.0 + 0.1 * rng.standard_normal(n), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal(n), jnp.float32))


def _mk_block(rng, c, f, proj):
    c_out = 4 * f if proj else c
    w1 = jnp.asarray(rng.standard_normal((1, 1, c, f)) / np.sqrt(c),
                     jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, f, f)) / np.sqrt(9 * f),
                     jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((1, 1, f, c_out)) / np.sqrt(f),
                     jnp.float32)
    g1, be1 = _affine(rng, f)
    g2, be2 = _affine(rng, f)
    g3, be3 = _affine(rng, c_out)
    if not proj:
        return (w1, w2, w3, g1, be1, g2, be2, g3, be3)
    wp = jnp.asarray(rng.standard_normal((1, 1, c, c_out)) / np.sqrt(c),
                     jnp.float32)
    gp, bep = _affine(rng, c_out)
    return (w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep)


def _mk_trunk(rng, c0, stage_f, blocks_per_stage):
    """Two-or-more-stage trunk: stage s has blocks_per_stage bottleneck
    blocks of width stage_f[s]; block0 is proj (stage 0) or s2."""
    blocks, kinds = [], []
    c = c0
    for s, f in enumerate(stage_f):
        for b in range(blocks_per_stage):
            proj = b == 0
            kinds.append("s2" if (proj and s > 0)
                         else "proj" if proj else "plain")
            blocks.append(_mk_block(rng, c, f, proj))
            c = 4 * f
    return tuple(blocks), tuple(kinds)


CASES = [
    # (b, h, w, c0, stage_f, rows)
    (2, 8, 8, 16, (8, 16), None),   # whole-sample grid
    (1, 8, 8, 16, (8, 16), 4),      # 2 row tiles (halo + s2 planar tiles)
    (1, 8, 12, 16, (8, 16), None),  # ragged width (Wp=16>12, stage2 W=6)
    (1, 8, 12, 16, (8, 16), 2),     # ragged + 4 row tiles
]


@pytest.mark.parametrize("b,h,w,c0,stage_f,rows", CASES)
def test_trunk_forward_and_stats(b, h, w, c0, stage_f, rows):
    tbt.FORCE_ROWS = rows
    rng = np.random.default_rng(11)
    blocks, kinds = _mk_trunk(rng, c0, stage_f, 2)
    x = jnp.asarray(rng.standard_normal((b * T, h, w, c0)) * 0.5,
                    jnp.float32)
    y_ref, stats_ref = trunk_reference(x, blocks, kinds)
    y, stats = tsm_trunk_train(x, blocks, kinds, T, NDIV, EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    for bi, (st, str_) in enumerate(zip(stats, stats_ref)):
        for k, (s, sr) in enumerate(zip(st, str_)):
            np.testing.assert_allclose(np.asarray(s), np.asarray(sr),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"block{bi} stat{k}")


@pytest.mark.parametrize("b,h,w,c0,stage_f,rows", CASES)
def test_trunk_gradients(b, h, w, c0, stage_f, rows):
    tbt.FORCE_ROWS = rows
    rng = np.random.default_rng(13)
    blocks, kinds = _mk_trunk(rng, c0, stage_f, 2)
    x = jnp.asarray(rng.standard_normal((b * T, h, w, c0)) * 0.5,
                    jnp.float32)
    y_shape = (b * T, h // 2, w // 2, 4 * stage_f[-1])
    cot = jnp.asarray(rng.standard_normal(y_shape), jnp.float32)

    def loss_ref(x, blocks):
        y, _ = trunk_reference(x, blocks, kinds)
        return jnp.sum(y * cot)

    def loss_fused(x, blocks):
        y, _ = tsm_trunk_train(x, blocks, kinds, T, NDIV, EPS)
        return jnp.sum(y * cot)

    gx_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    gx, gb = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    scale = max(float(jnp.max(jnp.abs(gx_ref))), 1e-3)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4 * scale, err_msg="dx")
    names9 = ["dw1", "dw2", "dw3", "dg1", "dbe1", "dg2", "dbe2", "dg3",
              "dbe3"]
    names12 = ["dw1", "dw2", "dw3", "dwp", "dg1", "dbe1", "dg2", "dbe2",
               "dg3", "dbe3", "dgp", "dbep"]
    for bi, (gbk, gbk_ref, kind) in enumerate(zip(gb, gb_ref, kinds)):
        names = names9 if kind == "plain" else names12
        for name, gf, gr in zip(names, gbk, gbk_ref):
            scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=2e-4,
                atol=2e-4 * scale, err_msg=f"block{bi} {name}")


def test_trunk_three_block_stage():
    """A 3-block stage exercises the plain->plain link (block1's finale
    fused into block2's FK1 and block2's BK1 feeding block1's dq)."""
    rng = np.random.default_rng(17)
    blocks, kinds = [], []
    c = 16
    for bidx in range(3):
        blocks.append(_mk_block(rng, c, 8, bidx == 0))
        kinds.append("proj" if bidx == 0 else "plain")
        c = 32
    blocks, kinds = tuple(blocks), tuple(kinds)
    x = jnp.asarray(rng.standard_normal((T, 8, 8, 16)) * 0.5, jnp.float32)
    cot = jnp.asarray(rng.standard_normal((T, 8, 8, 32)), jnp.float32)

    def loss_ref(x, blocks):
        return jnp.sum(trunk_reference(x, blocks, kinds)[0] * cot)

    def loss_fused(x, blocks):
        return jnp.sum(tsm_trunk_train(x, blocks, kinds, T, NDIV, EPS)[0]
                       * cot)

    y_ref, _ = trunk_reference(x, blocks, kinds)
    y, _ = tsm_trunk_train(x, blocks, kinds, T, NDIV, EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    g = jax.grad(loss_fused, argnums=(0, 1))(x, blocks)
    jax.tree_util.tree_map(
        lambda a, r: np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4,
            atol=2e-4 * max(float(jnp.max(jnp.abs(r))), 1e-3)),
        g, g_ref)


def test_trunk_stats_do_not_backprop():
    rng = np.random.default_rng(19)
    blocks, kinds = _mk_trunk(rng, 16, (8, 16), 2)
    x = jnp.asarray(rng.standard_normal((T, 8, 8, 16)) * 0.5, jnp.float32)

    def loss(x):
        _, stats = tsm_trunk_train(x, blocks, kinds, T, NDIV, EPS)
        return sum(jnp.sum(s) for st in stats for s in st)

    dx = jax.grad(loss)(x)
    assert float(jnp.max(jnp.abs(dx))) == 0.0


def test_auto_training_budget_gate(monkeypatch):
    """tsm_impl='auto' takes the trunk in training only while the saved
    residuals fit TRUNK_TRAIN_BUDGET; above it, auto falls back to the
    per-block tap3 path (PERF.md round 3: with p dropped from the saves,
    B=8 bf16 @224 fits and runs 1,878 frames/s; B=12 OOMs on v5e)."""
    import video_chapter_generation_tpu.models.resnet as rn

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    calls = []
    orig = rn.ResNet._fused_trunk_train
    monkeypatch.setattr(
        rn.ResNet, "_fused_trunk_train",
        lambda self, y, sizes: (calls.append(1), orig(self, y, sizes))[1])
    # calibration points of the real config (B=8 fits, B=12 does not)
    itemsize = 2
    est = rn._trunk_residual_bytes(8 * 3 * 16, 56, 56, 64, (3, 4, 6, 3),
                                   itemsize)
    assert est <= rn.TRUNK_TRAIN_BUDGET
    est12 = rn._trunk_residual_bytes(12 * 3 * 16, 56, 56, 64,
                                     (3, 4, 6, 3), itemsize)
    assert est12 > rn.TRUNK_TRAIN_BUDGET

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    m = rn.ResNet(stage_sizes=(2, 2, 2, 2), n_segment=4, tsm_impl="auto",
                  fuse_stem_pool=False)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, train=True))()
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert calls and out.shape == (4, 2048)
    # above budget: same call falls back to the per-block path
    calls.clear()
    monkeypatch.setattr(rn, "TRUNK_TRAIN_BUDGET", 0)
    out_fb, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert not calls and out_fb.shape == (4, 2048)
    assert bool(jnp.all(jnp.isfinite(out_fb)))
    # eval mode never takes the trunk regardless of budget
    monkeypatch.setattr(rn, "TRUNK_TRAIN_BUDGET", 1 << 60)
    m.apply(v, x, train=False)
    assert not calls


def test_resnet_trunk_matches_per_block(monkeypatch):
    """Model-level: ResNet tsm_impl='fusedtrain' now takes the TRUNK path
    (all stages >=2 blocks). Forward + running-stat updates vs the
    all-tap3 stack; GRADS vs the PER-BLOCK fusedtrain path (TRUNK_TRAIN
    off) — the trunk reuses its kernels, so they agree to rounding-order
    noise (measured 3e-5 rel), whereas fused-vs-tap3 carries an
    ~8e-2 rel XLA impl-to-impl noise floor at this 8-block depth (both
    trunk and per-block show the IDENTICAL tap3 delta, so that floor is
    pre-existing, not a trunk artifact)."""
    import video_chapter_generation_tpu.models.resnet as rn

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((8, 2048)), jnp.float32)
    m_ref = rn.ResNet(stage_sizes=(2, 2, 2, 2), n_segment=4,
                      tsm_impl="tap3", fuse_stem_pool=False)
    m = rn.ResNet(stage_sizes=(2, 2, 2, 2), n_segment=4,
                  tsm_impl="fusedtrain", fuse_stem_pool=False)
    v = jax.jit(lambda: m_ref.init(jax.random.PRNGKey(0), x, train=True))()
    # the trunk path must declare the SAME variable tree
    v_trunk = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), x, train=True))
    assert (jax.tree_util.tree_structure(v_trunk)
            == jax.tree_util.tree_structure(v))

    def run(model, params):
        def loss(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out * cot), upd["batch_stats"]

        (val, upd), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, upd, grads

    val_ref, upd_ref, _ = run(m_ref, v["params"])
    val, upd, g = run(m, v["params"])
    monkeypatch.setattr(rn, "TRUNK_TRAIN", False)
    val_pb, _, g_pb = run(m, v["params"])
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-4)
    np.testing.assert_allclose(float(val), float(val_pb), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3,
            atol=1e-4 * max(float(jnp.max(jnp.abs(b))), 1e-3)),
        upd, upd_ref)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=1e-3 * max(float(jnp.max(jnp.abs(b))), 1e-3)),
        g, g_pb)
