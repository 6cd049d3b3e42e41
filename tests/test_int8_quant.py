"""W8A8 quantized inference path (ops/tsm_block_int8_pallas.py +
ops/quantize.py + models/resnet.py quantize=True).

The kernel is pinned bit-for-bit against the integer spec
(int8_bottleneck_reference) in interpret mode; the model-level test
checks the full calibrate -> quantized-apply flow preserves pooled
features (cosine similarity) vs the bf16 path on a tiny ResNet."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy kernel/training parity — deselect via -m 'not slow'

import jax
import jax.numpy as jnp

from video_chapter_generation_tpu.ops.tsm_block_int8_pallas import (
    int8_bottleneck_reference,
    quantize_weight,
    tsm_bottleneck_int8_pallas,
)


def _block_inputs(seed=0, b=2, t=4, h=8, w=6, c=512, f=128):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)
    aff = lambda n: (jnp.asarray(rng.normal(size=(n,)) * 0.1 + 1.0),
                     jnp.asarray(rng.normal(size=(n,)) * 0.1))
    w1, w2, w3 = mk(c, f), mk(3, 3, f, f), mk(f, c)
    (s1, b1), (s2, b2), (s3, b3) = aff(f), aff(f), aff(c)
    scales = jnp.asarray([0.05, 0.03, 0.02, 0.05], jnp.float32)
    return (b * t, h, w, c, f), (w1, w2, w3, s1, b1, s2, b2, s3, b3,
                                 scales, t)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    wq, sw = quantize_weight(w)
    assert wq.dtype == jnp.int8
    # per-channel max maps to +-127 and dequant reconstructs within
    # half a quantization step
    err = jnp.max(jnp.abs(wq.astype(jnp.float32) * sw - w))
    assert float(err) <= float(jnp.max(sw)) * 0.5 + 1e-7
    assert int(jnp.max(jnp.abs(wq))) == 127


@pytest.mark.parametrize("mode", ["i8", "bf16", "planar"])
def test_int8_kernel_matches_integer_spec(mode):
    (nt, h, w, c, f), args = _block_inputs()
    rng = np.random.default_rng(2)
    if mode == "bf16":  # stage-entry: bf16 in, quantized in kernel
        x = jnp.asarray(rng.normal(size=(nt, h, w, c)), jnp.bfloat16)
    else:
        x = jnp.asarray(rng.integers(-127, 128, (nt, h, w, c)), jnp.int8)
    out = tsm_bottleneck_int8_pallas(x, *args[:-1], args[-1],
                                     out_mode=mode,
                                     out_dtype=jnp.float32)
    ref_f, ref_q = int8_bottleneck_reference(x, *args[:-1], args[-1])
    if mode == "i8":
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_q))
    elif mode == "planar":
        un = out.reshape(nt, h, w // 2, 2, c).reshape(nt, h, w, c)
        np.testing.assert_allclose(np.asarray(un, np.float32),
                                   np.asarray(ref_f), atol=2e-5)
    else:
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref_f), atol=2e-5)


@pytest.mark.parametrize("mode", ["i8", "bf16", "planar"])
def test_int8_halo_kernel_matches_integer_spec(mode):
    """The row-tiled halo form (layer 1) computes the same integer spec
    as the flat form — cross-tile halo rows included."""
    (nt, h, w, c, f), args = _block_inputs(seed=7, h=8, w=8)
    rng = np.random.default_rng(8)
    if mode == "bf16":
        x = jnp.asarray(rng.normal(size=(nt, h, w, c)), jnp.bfloat16)
    else:
        x = jnp.asarray(rng.integers(-127, 128, (nt, h, w, c)), jnp.int8)
    out = tsm_bottleneck_int8_pallas(x, *args[:-1], args[-1],
                                     out_mode=mode, out_dtype=jnp.float32,
                                     force_halo=True)
    ref_f, ref_q = int8_bottleneck_reference(x, *args[:-1], args[-1])
    if mode == "i8":
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_q))
    elif mode == "planar":
        un = out.reshape(nt, h, w // 2, 2, c).reshape(nt, h, w, c)
        np.testing.assert_allclose(np.asarray(un, np.float32),
                                   np.asarray(ref_f), atol=2e-5)
    else:
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref_f), atol=2e-5)


def test_int8_halo_fpad_layer1_shape():
    """F=64 (layer 1) pads to 128 lanes with bit-identical results."""
    (nt, h, w, c, f), args = _block_inputs(seed=9, h=8, w=8, c=256, f=64)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.integers(-127, 128, (nt, h, w, c)), jnp.int8)
    out = tsm_bottleneck_int8_pallas(x, *args[:-1], args[-1],
                                     out_mode="i8", force_halo=True)
    _, ref_q = int8_bottleneck_reference(x, *args[:-1], args[-1])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_q))


@pytest.mark.parametrize("sizes,expected", [
    # block0 scales are emitted for every stage (the int8 s2 kernels of
    # quantized stages use them; layer1's are unused but harmless)
    ((1, 2, 2, 2), {"layer1_block0", "layer2_block0", "layer2_block1",
                    "layer3_block0", "layer3_block1", "layer4_block0",
                    "layer4_block1"}),
    ((2, 2, 1, 1), {"layer1_block0", "layer1_block1", "layer2_block0",
                    "layer2_block1", "layer3_block0", "layer4_block0"}),
])
def test_int8_model_calibrate_and_apply(monkeypatch, sizes, expected):
    import video_chapter_generation_tpu.models.resnet as rn
    from video_chapter_generation_tpu.ops.quantize import (
        calibrate_resnet_quant,
    )

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    # exercise the full int8 graph incl. the measured-slower s2 block0s
    # + int8-planar tails (off by default on perf grounds)
    monkeypatch.setattr(rn, "INT8_S2_BLOCKS", True)
    model = rn.ResNet(stage_sizes=sizes, n_segment=2,
                      tsm_impl="fusedall", dtype=jnp.float32)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames)

    scales = calibrate_resnet_quant(model, variables, frames)
    assert set(scales) == expected
    for v in scales.values():
        s = np.asarray(v["act_scales"])
        assert s.shape == (4,) and (s > 0).all()

    ref = np.asarray(model.apply(variables, frames))
    qmodel = model.clone(quantize=True)
    out = np.asarray(qmodel.apply({**variables, "quant": scales}, frames))
    assert out.shape == ref.shape
    num = (out * ref).sum(-1)
    den = np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    cos = num / np.maximum(den, 1e-9)
    assert cos.min() > 0.98, cos
    # and it really took the quantized path: uncalibrated unit scales
    # saturate and give a different answer
    ones = jax.tree_util.tree_map(
        lambda v: np.ones_like(np.asarray(v)), scales)
    out_sat = np.asarray(
        qmodel.apply({**variables, "quant": ones}, frames))
    assert not np.allclose(out_sat, out)


def _pair_merge(x):
    nt, h, w, c = x.shape
    return x.reshape(nt, h, w // 2, 2 * c)


@pytest.mark.parametrize("xdt,mode", [
    ("i8", "i8"), ("bf16", "i8"), ("i8", "bf16")])
def test_int8_s2_planar_kernel_matches_integer_spec(xdt, mode):
    from video_chapter_generation_tpu.ops.tsm_block_int8_pallas import (
        int8_s2_bottleneck_reference,
        tsm_bottleneck_s2_planar_int8_pallas,
    )

    rng = np.random.default_rng(20)
    b, t, h, w, c, f = 2, 4, 8, 8, 256, 128
    nt = b * t
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)
    aff = lambda n: (jnp.asarray(rng.normal(size=(n,)) * 0.1 + 1.0),
                     jnp.asarray(rng.normal(size=(n,)) * 0.1))
    w1, w2, w3 = mk(c, f), mk(3, 3, f, f), mk(f, 4 * f)
    wp = mk(c, 4 * f)
    (s1, b1), (s2, b2) = aff(f), aff(f)
    (s3, b3), (sp, bp) = aff(4 * f), aff(4 * f)
    scales = jnp.asarray([0.05, 0.03, 0.02, 0.05], jnp.float32)
    if xdt == "i8":
        x = jnp.asarray(rng.integers(-127, 128, (nt, h, w, c)), jnp.int8)
    else:
        x = jnp.asarray(rng.normal(size=(nt, h, w, c)), jnp.bfloat16)
    out = tsm_bottleneck_s2_planar_int8_pallas(
        _pair_merge(x), w1, w2, w3, s1, b1, s2, b2, s3, b3, wp, sp, bp,
        scales, t, out_mode=mode, out_dtype=jnp.float32, rows=2)
    ref_f, ref_q = int8_s2_bottleneck_reference(
        x, w1, w2, w3, s1, b1, s2, b2, s3, b3, wp, sp, bp, scales, t)
    if mode == "i8":
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_q))
    else:
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref_f), atol=2e-5)


def test_int8_flat_planar_i8_out():
    """The stage tail's int8-planar emission: pair-merged int8 equal to
    the integer spec's requantized output, reordered."""
    (nt, h, w, c, f), args = _block_inputs(seed=21, w=8)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.integers(-127, 128, (nt, h, w, c)), jnp.int8)
    out = tsm_bottleneck_int8_pallas(x, *args[:-1], args[-1],
                                     out_mode="planar_i8")
    _, ref_q = int8_bottleneck_reference(x, *args[:-1], args[-1])
    un = out.reshape(nt, h, w // 2, 2, c).reshape(nt, h, w, c)
    # XLA contracts the f32 epilogue differently for the pair-merged
    # consumer shape: a handful of requant-boundary values flip by one
    # quantum (measured 20/262144) — allow +-1 on a tiny fraction
    diff = np.abs(np.asarray(un, np.int32) - np.asarray(ref_q, np.int32))
    assert diff.max() <= 1, diff.max()
    assert (diff != 0).mean() < 1e-3, (diff != 0).mean()


def test_int8_stem_matches_bf16_stem():
    """Weight-only int8 stem vs the bf16 fused stem on raw u8 s2d input:
    activations are exact, only weight rounding differs."""
    from video_chapter_generation_tpu.ops.stem_pallas import (
        stem_s2d_int8_pallas,
        stem_s2d_pallas,
    )

    rng = np.random.default_rng(11)
    nt, n = 4, 16
    s4 = jnp.asarray(rng.integers(0, 256, (nt, n, n, 48)), jnp.uint8)
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.normal(size=(64,)) * 0.1 + 1.0)
    bias = jnp.asarray(rng.normal(size=(64,)) * 0.1)
    ref = np.asarray(stem_s2d_pallas(s4, w7, scale, bias,
                                     out_dtype=jnp.float32))
    out = np.asarray(stem_s2d_int8_pallas(s4, w7, scale, bias,
                                          out_dtype=jnp.float32))
    scale_mag = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=0.01 * scale_mag)


def test_int8_training_path_unaffected(monkeypatch):
    import video_chapter_generation_tpu.models.resnet as rn

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    model = rn.ResNet(stage_sizes=(1, 2, 1, 1), n_segment=2,
                      tsm_impl="tap3", quantize=True, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames)
    base = model.clone(quantize=False)
    vb = {k: v for k, v in variables.items() if k != "quant"}
    out_q, _ = model.apply(variables, frames, train=True,
                           mutable=["batch_stats"])
    out_b, _ = base.apply(vb, frames, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_b),
                               atol=1e-6)


def test_int8_two_stream_serving(monkeypatch):
    """int8 serving of the boundary scorer: calibrate_two_stream_quant +
    the quant_scales hooks of make_{packed_,}two_stream_score_fn. The
    quantized packed and unpacked scorers must agree with each other
    (same quantized vision compute, staged vs fused), stay close to the
    bf16 scorer, and really take the quantized path."""
    import video_chapter_generation_tpu.models.resnet as rn
    from video_chapter_generation_tpu.models.bert import (
        BertConfig,
        BertModel,
    )
    from video_chapter_generation_tpu.models.fusion import TwoStream
    from video_chapter_generation_tpu.ops.quantize import (
        calibrate_two_stream_quant,
    )
    from video_chapter_generation_tpu.pipeline.boundary import (
        make_packed_two_stream_score_fn,
        make_two_stream_score_fn,
    )

    monkeypatch.setattr(rn, "FORCE_WHOLE_BLOCKS", True)
    seg, hw, tlen, b = 2, 32, 8, 2
    model = TwoStream(
        lang_model=BertModel(BertConfig.tiny()),
        vision_model=rn.ResNet(stage_sizes=(1, 2, 1, 1), n_segment=seg,
                               tsm_impl="fusedall", stem_input="s2d"),
        segment_size=seg, hidden_size=16, head_type="mlp",
    )
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (b, seg, hw // 4, hw // 4, 48), np.uint8)
    ids = rng.integers(1, 50, (b, tlen)).astype(np.int32)
    mask = np.ones((b, tlen), np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img),
                           jnp.asarray(ids), jnp.asarray(mask))

    scales = calibrate_two_stream_quant(model, variables, img)
    assert set(scales) == {"vision_model"}

    batch = {"img_clip": jnp.asarray(img), "text_ids": jnp.asarray(ids),
             "attention_mask": jnp.asarray(mask)}
    # s2d-stem models consume raw uint8 (the stem normalizes in-kernel)
    ref = np.asarray(make_two_stream_score_fn(
        model, variables, normalize=False)(batch))
    q = np.asarray(make_two_stream_score_fn(
        model, variables, normalize=False, quant_scales=scales)(batch))
    assert q.shape == ref.shape == (b,)
    np.testing.assert_allclose(q, ref, atol=0.1)

    # packed flow: unique frames as one pack + [B, T] gather indices
    pack = jnp.asarray(img.reshape(-1, hw // 4, hw // 4, 48))
    pbatch = {"text_ids": jnp.asarray(ids),
              "attention_mask": jnp.asarray(mask),
              "frame_idx": jnp.arange(b * seg).reshape(b, seg)}
    q_packed = np.asarray(make_packed_two_stream_score_fn(
        model, variables, quant_scales=scales)(pbatch, pack))
    np.testing.assert_allclose(q_packed, q, atol=1e-5)

    # saturating unit scales change the answer -> the quantized path ran
    ones = jax.tree_util.tree_map(lambda v: np.ones_like(np.asarray(v)),
                                  scales)
    q_sat = np.asarray(make_two_stream_score_fn(
        model, variables, normalize=False, quant_scales=ones)(batch))
    assert not np.allclose(q_sat, q)
