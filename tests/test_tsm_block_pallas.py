"""Whole-bottleneck fused kernel (ops/tsm_block_pallas.py) vs the pure-XLA
composition, interpret mode: whole-sample and halo-tiled grids, with and
without the residual projection. Includes the edge-row regression (SAME
padding must zero the halo in y1 space — conv1 of a zero row is relu(b1),
not zero) using positive-shifted bn biases that expose it."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy kernel/training parity — deselect via -m 'not slow'

import jax
import jax.numpy as jnp

import video_chapter_generation_tpu.ops.tsm_block_pallas as blk
from video_chapter_generation_tpu.ops.temporal_shift import temporal_shift
from video_chapter_generation_tpu.ops.tsm_block_pallas import (
    tsm_bottleneck_pallas,
    tsm_bottleneck_reference,
)

T, B, H, W = 4, 2, 8, 8


def _params(rng, c_in, f, c_out):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    # positive-shifted biases: relu(b) != 0, catches wrong edge padding
    aff = lambda n: (
        jnp.asarray(rng.standard_normal(n) * 0.2 + 1, jnp.float32),
        jnp.asarray(rng.standard_normal(n) * 0.1 + 0.3, jnp.float32),
    )
    return {
        "w1": mk(c_in, f), "w2": mk(3, 3, f, f), "w3": mk(f, c_out),
        "wp": mk(c_in, c_out),
        "a1": aff(f), "a2": aff(f), "a3": aff(c_out), "ap": aff(c_out),
    }


def _xla_proj_ref(x, p):
    conv = lambda y, k: jax.lax.conv_general_dilated(
        y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c_in, f = p["w1"].shape
    c_out = p["w3"].shape[1]
    y = temporal_shift(x, T)
    y = jnp.maximum(conv(y, p["w1"].reshape(1, 1, c_in, f))
                    * p["a1"][0] + p["a1"][1], 0)
    y = jnp.maximum(conv(y, p["w2"]) * p["a2"][0] + p["a2"][1], 0)
    y = conv(y, p["w3"].reshape(1, 1, f, c_out)) * p["a3"][0] + p["a3"][1]
    res = (conv(x, p["wp"].reshape(1, 1, c_in, c_out))
           * p["ap"][0] + p["ap"][1])
    return jnp.maximum(y + res, 0)


@pytest.mark.parametrize("width", [W, 12], ids=["w8", "w12"])
@pytest.mark.parametrize("flat", [True, False], ids=["flat", "4d"])
@pytest.mark.parametrize("conv1_mode", ["pair", "fold", "masked"])
@pytest.mark.parametrize("fpad", [False, True], ids=["nopad", "fpad"])
@pytest.mark.parametrize("rows", [None, 4], ids=["whole", "tiled"])
def test_fused_block_matches_reference(rows, fpad, conv1_mode, flat, width):
    # width=12 exercises the sublane-padded ragged-block path (wp8 > w)
    # that the real L3/L4 shapes (W=14/28) hit on TPU
    rng = np.random.default_rng(0)
    c = 32
    p = _params(rng, c, c // 4, c)
    x = jnp.asarray(rng.standard_normal((B * T, H, width, c)), jnp.float32)
    args = (x, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"], T)
    ref = tsm_bottleneck_reference(*args)
    got = tsm_bottleneck_pallas(
        *args, tuning=dict(rows=rows, fpad=fpad, conv1_mode=conv1_mode,
                           flat=flat))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nstack", [True, False], ids=["nstack", "3dot"])
def test_flat_nstack_matches_reference(nstack):
    # F=128 enables the N-stacked conv2 row-tap dot (nstack gate is
    # F % 128 == 0); compare directly against the 3-dot formulation's
    # reference at a real tile-aligned bottleneck width
    rng = np.random.default_rng(3)
    c = f = 128
    p = _params(rng, c, f, c)
    x = jnp.asarray(rng.standard_normal((2 * 2, H, W, c)) * 0.3,
                    jnp.float32)
    args = (x, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"], 2)
    ref = tsm_bottleneck_reference(*args)
    got = tsm_bottleneck_pallas(*args, tuning=dict(nstack=nstack))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nblk,chain,planar,gblk", [
    (2, None, False, None), (3, None, False, None), (3, 2, False, None),
    (3, None, True, None), (2, None, False, 2),
], ids=["chain2", "chain3", "split2", "chain3-planar", "chain2-gblk2"])
def test_flat_chain_matches_sequential(nblk, chain, planar, gblk):
    """Chain kernel (N blocks per grid step, intermediates VMEM-resident)
    vs the same blocks applied sequentially through the single-block flat
    kernel — including sub-chain splitting and the planar final store."""
    from video_chapter_generation_tpu.ops.tsm_block_pallas import (
        tsm_bottleneck_chain_pallas,
    )

    rng = np.random.default_rng(7)
    c, f, t = 32, 8, 2
    blocks = []
    for _ in range(nblk):
        p = _params(rng, c, f, c)
        blocks.append((p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"],
                       *p["a3"]))
    x = jnp.asarray(rng.standard_normal((2 * t, H, W, c)) * 0.3,
                    jnp.float32)
    ref = x
    for (w1, w2, w3, s1, b1, s2, b2, s3, b3) in blocks:
        ref = tsm_bottleneck_pallas(ref, w1, w2, w3, s1, b1, s2, b2, s3,
                                    b3, t)
    got = tsm_bottleneck_chain_pallas(x, blocks, t,
                                      tuning=dict(chain=chain, gblk=gblk),
                                      planar_out=planar)
    if planar:  # un-merge the pair-packed columns (reshape is the inverse)
        got = got.reshape(2 * t, H, W, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nblk,rows,planar", [
    (2, 4, False), (2, 2, False), (3, 4, False), (2, 4, True),
    (2, None, False),
], ids=["k2r4", "k2r2", "k3r4", "k2r4-planar", "k2-whole"])
def test_halo_chain_matches_sequential(nblk, rows, planar):
    """Row-tiled halo chain (layer1's form: K halo rows per side, per-
    block absolute-row masking) vs sequential single-block kernels."""
    from video_chapter_generation_tpu.ops.tsm_block_pallas import (
        tsm_bottleneck_halo_chain_pallas,
    )

    rng = np.random.default_rng(11)
    c, f, t = 32, 8, 2
    blocks = []
    for _ in range(nblk):
        p = _params(rng, c, f, c)
        blocks.append((p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"],
                       *p["a3"]))
    x = jnp.asarray(rng.standard_normal((2 * t, H, W, c)) * 0.3,
                    jnp.float32)
    ref = x
    for (w1, w2, w3, s1, b1, s2, b2, s3, b3) in blocks:
        ref = tsm_bottleneck_pallas(ref, w1, w2, w3, s1, b1, s2, b2, s3,
                                    b3, t)
    got = tsm_bottleneck_halo_chain_pallas(
        x, blocks, t, tuning=dict(rows=rows), planar_out=planar)
    if planar:
        got = got.reshape(2 * t, H, W, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rows", [None, 4], ids=["whole", "tiled"])
def test_fused_block_projection(rows, monkeypatch):
    if rows is not None:
        monkeypatch.setattr(blk, "_pick_rows",
                            lambda h, w, c, t, es=2: rows)
    rng = np.random.default_rng(1)
    c_in, f = 16, 8
    p = _params(rng, c_in, f, 4 * f)
    x = jnp.asarray(rng.standard_normal((B * T, H, W, c_in)), jnp.float32)
    ref = _xla_proj_ref(x, p)
    got = tsm_bottleneck_pallas(
        x, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"], T,
        wp=p["wp"], sp=p["ap"][0], bp=p["ap"][1],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _xla_s2_ref(x, p):
    """Torch-semantics stride-2 bottleneck: 3x3 stride on conv2 with
    padding (1,1); 1x1 stride-2 projection with no padding."""
    c_in, f = p["w1"].shape
    c_out = p["w3"].shape[1]
    conv = lambda y, k, s, pad: jax.lax.conv_general_dilated(
        y, k, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = temporal_shift(x, T)
    y = jnp.maximum(conv(y, p["w1"].reshape(1, 1, c_in, f), 1, "SAME")
                    * p["a1"][0] + p["a1"][1], 0)
    y = jnp.maximum(conv(y, p["w2"], 2, [(1, 1), (1, 1)])
                    * p["a2"][0] + p["a2"][1], 0)
    y = conv(y, p["w3"].reshape(1, 1, f, c_out), 1, "SAME") \
        * p["a3"][0] + p["a3"][1]
    res = (conv(x, p["wp"].reshape(1, 1, c_in, c_out), 2, "VALID")
           * p["ap"][0] + p["ap"][1])
    return jnp.maximum(y + res, 0)


@pytest.mark.parametrize("width", [W, 12], ids=["w8", "w12"])
@pytest.mark.parametrize("s2_mode", ["full", "pair"])
@pytest.mark.parametrize("conv1_mode", ["pair", "masked"])
@pytest.mark.parametrize("rows", [None, 2], ids=["whole", "tiled"])
def test_fused_block_stride2(rows, conv1_mode, s2_mode, width):
    # width=12 exercises the ragged sublane-padded block path (wp8 > w,
    # wob > wo) incl. the full-mode pad-column zeroing of y1
    from video_chapter_generation_tpu.ops.tsm_block_pallas import (
        tsm_bottleneck_s2_pallas)

    rng = np.random.default_rng(2)
    c_in, f = 16, 8
    p = _params(rng, c_in, f, 4 * f)
    x = jnp.asarray(rng.standard_normal((B * T, H, width, c_in)),
                    jnp.float32)
    ref = _xla_s2_ref(x, p)
    got = tsm_bottleneck_s2_pallas(
        x, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"],
        p["wp"], *p["ap"], T,
        tuning=dict(rows=rows, conv1_mode=conv1_mode, s2_mode=s2_mode),
    )
    assert got.shape == (B * T, H // 2, width // 2, 4 * f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("width", [W, 12], ids=["w8", "w12"])
@pytest.mark.parametrize("rows", [None, 2], ids=["whole", "tiled"])
def test_fused_block_stride2_planar(rows, width):
    """Pair-merged-column input variant: packing adjacent columns into
    lanes (the producer-side inter-block layout) must reproduce the
    full-width stride-2 bottleneck exactly. width=12 exercises the
    ragged plane blocks (whb > wh)."""
    from video_chapter_generation_tpu.ops.tsm_block_pallas import (
        tsm_bottleneck_s2_planar_pallas)

    rng = np.random.default_rng(3)
    c_in, f = 16, 8
    p = _params(rng, c_in, f, 4 * f)
    x = jnp.asarray(rng.standard_normal((B * T, H, width, c_in)),
                    jnp.float32)
    ref = _xla_s2_ref(x, p)
    xpm = x.reshape(B * T, H, width // 2, 2 * c_in)
    got = tsm_bottleneck_s2_planar_pallas(
        xpm, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"],
        p["wp"], *p["ap"], T, tuning=dict(rows=rows),
    )
    assert got.shape == (B * T, H // 2, width // 2, 4 * f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("width", [W, 12], ids=["w8", "w12"])
@pytest.mark.parametrize("flat", [True, False], ids=["flat", "4d"])
@pytest.mark.parametrize("rows", [None, 4], ids=["whole", "tiled"])
def test_fused_block_planar_out(rows, flat, width):
    """planar_out=True must equal the standard output with adjacent
    columns packed into lanes (the stride-2 consumer's input layout),
    through both the flat and the 4-D halo/whole kernels."""
    rng = np.random.default_rng(4)
    c = 16
    p = _params(rng, c, 8, c)
    x = jnp.asarray(rng.standard_normal((B * T, H, width, c)), jnp.float32)
    ref = tsm_bottleneck_reference(
        x, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"], T)
    ref_pm = ref.reshape(B * T, H, width // 2, 2 * c)
    got = tsm_bottleneck_pallas(
        x, p["w1"], p["w2"], p["w3"], *p["a1"], *p["a2"], *p["a3"], T,
        tuning=dict(rows=rows, flat=flat), planar_out=True,
    )
    assert got.shape == ref_pm.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_pm),
                               rtol=1e-5, atol=1e-5)

    # end-to-end chain: planar producer -> pair-merged stride-2 consumer
    from video_chapter_generation_tpu.ops.tsm_block_pallas import (
        tsm_bottleneck_s2_planar_pallas, tsm_bottleneck_s2_pallas)

    p2 = _params(rng, c, 8, 4 * 8)
    want = tsm_bottleneck_s2_pallas(
        ref, p2["w1"], p2["w2"], p2["w3"], *p2["a1"], *p2["a2"],
        *p2["a3"], p2["wp"], *p2["ap"], T)
    chain = tsm_bottleneck_s2_planar_pallas(
        got, p2["w1"], p2["w2"], p2["w3"], *p2["a1"], *p2["a2"],
        *p2["a3"], p2["wp"], *p2["ap"], T)
    np.testing.assert_allclose(np.asarray(chain), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stem_bn_relu_maxpool_matches_reference():
    from video_chapter_generation_tpu.ops.stem_pallas import (
        bn_relu_maxpool_pallas, bn_relu_maxpool_reference)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((6, 16, 24, 8)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(8) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    ref = bn_relu_maxpool_reference(x, s, b)
    got = bn_relu_maxpool_pallas(x, s, b)
    assert got.shape == (6, 8, 12, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_stem_conv_bn_pool_matches_reference():
    """Fused stem (s2d im2col conv + bn/relu + phase-unpacked max pool)
    vs the XLA composition the standard stem path uses."""
    from video_chapter_generation_tpu.ops.stem_pallas import (
        bn_relu_maxpool_reference, stem_conv_bn_pool_pallas)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)), jnp.float32)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.standard_normal(64) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        x, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = bn_relu_maxpool_reference(conv, s, b)
    got = stem_conv_bn_pool_pallas(x, w7, s, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stem_s2d_u8_matches_normalized_reference():
    """Raw-uint8 space-to-depth stem input: in-kernel normalize + conv +
    bn/relu + pool vs normalize_frames -> XLA stem composition."""
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames
    from video_chapter_generation_tpu.ops.stem_pallas import (
        bn_relu_maxpool_reference, stem_s2d_pallas)

    rng = np.random.default_rng(6)
    u8 = rng.integers(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.standard_normal(64) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64), jnp.float32)
    xn = normalize_frames(jnp.asarray(u8), out_dtype=jnp.float32)
    conv = jax.lax.conv_general_dilated(
        xn, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = bn_relu_maxpool_reference(conv, s, b)
    s2d = jnp.asarray(
        u8.reshape(3, 8, 4, 8, 4, 3).transpose(0, 1, 3, 2, 4, 5)
        .reshape(3, 8, 8, 48))
    got = stem_s2d_pallas(s2d, w7, s, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the 9-piece z-build is a pure lane-order-preserving rewrite
    got9 = stem_s2d_pallas(s2d, w7, s, b, out_dtype=jnp.float32,
                           zbuild="nine")
    np.testing.assert_allclose(np.asarray(got9), np.asarray(got),
                               rtol=0, atol=0)


def test_resnet_stem_s2d_matches_frames(monkeypatch):
    """Model-level: stem_input='s2d' with raw uint8 frames equals the
    standard frames path on the same pixels (both forced through the
    fused kernels off-TPU)."""
    import video_chapter_generation_tpu.models.resnet as rn
    from video_chapter_generation_tpu.ops.preprocess import normalize_frames

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    xn = normalize_frames(jnp.asarray(u8), out_dtype=jnp.float32)
    m = rn.ResNet(stage_sizes=(1, 1, 1, 1), n_segment=4, tsm_impl="fusedall")
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), xn, train=False))()
    ref = m.apply(v, xn, train=False)
    s2d = jnp.asarray(
        u8.reshape(8, 8, 4, 8, 4, 3).transpose(0, 1, 3, 2, 4, 5)
        .reshape(8, 8, 8, 48))
    m2 = rn.ResNet(stage_sizes=(1, 1, 1, 1), n_segment=4,
                   tsm_impl="fusedall", stem_input="s2d")
    got = m2.apply(v, s2d, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_resnet_fusedall_whole_blocks_match_xla(monkeypatch):
    """Force the whole-block kernels (interpret mode) through the MODEL
    wiring off-TPU: stride-1, stride-1+projection, and stride-2 blocks all
    route through _whole_block under 'fusedall' and must match XLA."""
    import video_chapter_generation_tpu.models.resnet as rn

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    m_ref = rn.ResNet(stage_sizes=(1, 2, 1, 1), n_segment=4, tsm_impl="xla")
    v = jax.jit(lambda: m_ref.init(jax.random.PRNGKey(0), x, train=False))()
    ref = m_ref.apply(v, x, train=False)
    m = rn.ResNet(stage_sizes=(1, 2, 1, 1), n_segment=4, tsm_impl="fusedall")
    got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["flat", "halo"])
def test_resnet_chain_blocks_matches_unchained(monkeypatch, mode):
    """Model-level: chaining a stage's plain blocks into one kernel
    (chain_blocks=True, the default) must equal the per-block fused
    kernels on the SAME param tree — including with a planar link into
    the next stage's block0. mode='halo' forces the row-tiled layer1-
    style chain by disabling the flat path's fit."""
    import video_chapter_generation_tpu.models.resnet as rn
    from video_chapter_generation_tpu.ops import tsm_block_pallas as tbp

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    if mode == "halo":
        monkeypatch.setattr(tbp, "DEFAULT_TUNING",
                            dict(tbp.DEFAULT_TUNING, flat=False))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    m_ref = rn.ResNet(stage_sizes=(1, 3, 2, 1), n_segment=4,
                      tsm_impl="fusedall", chain_blocks=False)
    v = jax.jit(lambda: m_ref.init(jax.random.PRNGKey(0), x,
                                   train=False))()
    ref = m_ref.apply(v, x, train=False)
    m = rn.ResNet(stage_sizes=(1, 3, 2, 1), n_segment=4,
                  tsm_impl="fusedall", chain_blocks=True)
    got = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_resnet_fusedblk_impl_matches_xla():
    """fusedblk falls back off-TPU, but the param tree must stay
    interchangeable: init under one impl, apply under all."""
    from video_chapter_generation_tpu.models.resnet import ResNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32)
    outs, v = {}, None
    for impl in ("xla", "tap3", "fusedblk", "fusedall"):
        m = ResNet(stage_sizes=(1, 2, 1, 1), n_segment=4, tsm_impl=impl)
        if v is None:
            v = jax.jit(lambda m=m: m.init(jax.random.PRNGKey(0), x,
                                           train=False))()
        outs[impl] = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(outs["tap3"]),
                               np.asarray(outs["xla"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs["fusedblk"]),
                               np.asarray(outs["xla"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs["fusedall"]),
                               np.asarray(outs["xla"]), rtol=1e-4, atol=1e-5)
