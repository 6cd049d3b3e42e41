"""Pallas TPU kernels: W8A8 (int8 weights + int8 activations) fused
inference bottleneck — the quantized serving path.

v5e's MXU runs int8 at 2x the bf16 rate (measured 255 TOPs vs 150
TFLOPs in-kernel) and int8 activations halve HBM traffic, so the
quantized plain-block kernel measured 1.58x the bf16 flat kernel at
layer-3 shapes (PERF.md round 3, probe at [32,16,14,14,1024]).

Scope: stride-1 non-projection bottlenecks of stages with F a 128-lane
multiple (ResNet50 layers 2-4 — 10 of the 16 blocks; layer 1's F=64
padding waste and the stride-2 block0s stay bf16). The surrounding
dispatch (models/resnet.py) chains them: the stage's block0 output is
quantized once by the FIRST plain block (bf16 in, int8 out), interior
blocks pass int8 activations directly, and the LAST plain block emits
bf16 (optionally planar pair-merged columns for the next stride-2
block0, exactly like tsm_bottleneck_pallas planar_out).

Quantization scheme (static, symmetric):
- weights per-OUTPUT-CHANNEL: swk[n] = amax(|wk[:, n]|)/127, computed
  from the folded bf16 weights at trace time (quantize_weight below) —
  free at run time because the dequant multiplies fold into the
  existing per-channel BN affine vectors;
- activations per-TENSOR with calibrated scales (ops/quantize.py):
  sx (block input = previous block's output scale), sz (the conv2
  input / im2col of relu(bn1 y1)), sy2 (relu(bn2 y2)), sout;
- integer kernel spec (tests pin it exactly, interpret mode vs the
  jnp reference int8_bottleneck_reference):
    acc1 = xq @ w1q + (sel(nxt,prv)q @ w1q[:2fold] - xq[:, :2fold] @
           w1q[:2fold])          (i32; the temporal-shift correction is
                                  two small i8 dots, exactly equal to
                                  conv1 on the shifted quantized input)
    y1   = relu(acc1 * A1 + B1)                         (f32)
    zcq  = clip(round(im2col_cols(y1) / sz))            (i8 [M, 3F])
    y2   = relu(rowtap_sum(zcq @ w2q * A2) * 1 + B2)    (f32; A2 folds
                                  sz * sw2[j] * s2[j mod F] per column)
    y2q  = clip(round(y2 / sy2))
    y3   = (y2q @ w3q) * A3 + B3                        (A3 = sy2*sw3*s3)
    out  = relu(y3 + dequant(x))
    store: i8 clip(round(out / sout)) | bf16 | bf16 planar pair-merged.

Reference semantics being approximated: the bf16 fused block
(ops/tsm_block_pallas.py), itself parity-tested against the reference
torch stack (two_stream_window.py / temporal_shift.py). Accuracy is a
calibration property, validated model-level by cosine similarity of
pooled features (tests/test_int8_quant.py) — this path is OPT-IN
(models/resnet.py quantize flag), never a silent default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w, axis: int = 0):
    """Per-output-channel symmetric int8: w [K, N] -> (wq i8, sw f32[N])
    with wq = clip(round(w / sw), -127, 127), sw = amax(|w|, rows)/127."""
    wf = w.astype(jnp.float32)
    sw = jnp.max(jnp.abs(wf), axis=axis) / 127.0
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _rq(v, inv_s):
    """Static requant f32 -> i8 (round half to even, saturating)."""
    return jnp.clip(jnp.round(v * inv_s), -127, 127).astype(jnp.int8)


def _kernel_flat_i8(x_ref, w1q_ref, w1h_ref, w2q_ref, w3q_ref, a1_ref,
                    b1_ref, a2_ref, b2_ref, a3_ref, b3_ref, sc_ref,
                    o_ref, *, fold: int, h: int, w: int, wt: int,
                    x_i8: bool, out_mode: str):
    """Whole-sample W8A8 stride-1 non-projection bottleneck in FLAT
    [M, C] space — the int8 twin of tsm_block_pallas._kernel_flat (same
    block/mask layout reasoning; F is a 128-lane multiple so every lane
    concat and f32 slice is tile-aligned).

    sc_ref [1, 8] f32: (sx, 1/sz, 1/sy2, 1/sout, 0...) — runtime scalars
    so recalibration never recompiles. x_i8=False is the stage-entry
    mode: x arrives bf16 and is quantized here (input HBM traffic stays
    bf16 for that one block; the dots still run int8). out_mode:
    'i8' | 'bf16' | 'planar' (bf16 pair-merged columns)."""
    g, t, c = x_ref.shape[0], x_ref.shape[1], x_ref.shape[4]
    m = g * t * h * w
    f = w1q_ref.shape[1]
    hw = h * w
    sx = sc_ref[0, 0]
    x_in = x_ref[:].reshape(m, c)
    if x_i8:
        xq = x_in
        xf32 = lambda: xq.astype(jnp.float32) * sx
    else:
        xq = _rq(x_in.astype(jnp.float32), 1.0 / sx)
        xf32 = lambda: x_in.astype(jnp.float32)

    # conv1 (int8) + temporal-shift correction: two small i8 dots whose
    # i32 difference equals conv1 on the shifted quantized input
    acc1 = jnp.dot(xq, w1q_ref[:], preferred_element_type=jnp.int32)
    x2 = xq[:, : 2 * fold]
    zf = jnp.zeros((hw, 2 * fold), jnp.int8)
    nxt = jnp.concatenate([x2[hw:], zf], axis=0)
    prv = jnp.concatenate([zf, x2[: m - hw]], axis=0)
    if g > 1:
        frame = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // hw
        nxt = jnp.where(frame % t == t - 1, 0, nxt).astype(jnp.int8)
        prv = jnp.where(frame % t == 0, 0, prv).astype(jnp.int8)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * fold), 1)
    sel = jnp.where(lane < fold, nxt, prv)
    acc1 += jnp.dot(sel, w1h_ref[:], preferred_element_type=jnp.int32)
    acc1 -= jnp.dot(x2, w1h_ref[:], preferred_element_type=jnp.int32)
    y1 = jnp.maximum(acc1.astype(jnp.float32) * a1_ref[:] + b1_ref[:], 0.0)

    # column taps in f32, ONE requant of the [M, 3F] im2col (probe:
    # faster than requanting y1 and shifting i8 — i8 sublane shifts
    # relayout), then the nstack conv2 dot in int8
    colidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w
    z1 = jnp.zeros((1, f), jnp.float32)
    left = jnp.where(colidx == 0, 0.0,
                     jnp.concatenate([z1, y1[: m - 1]], axis=0))
    right = jnp.where(colidx >= wt - 1, 0.0,
                      jnp.concatenate([y1[1:], z1], axis=0))
    zcq = _rq(jnp.concatenate([left, y1, right], axis=-1), sc_ref[0, 1])
    dd = jnp.dot(zcq, w2q_ref[:],
                 preferred_element_type=jnp.int32).astype(jnp.float32)
    dd = dd * a2_ref[:]  # per-column dequant incl. BN2 scale
    d0, d1, d2 = dd[:, :f], dd[:, f: 2 * f], dd[:, 2 * f:]
    rowidx = (jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // w) % h
    zwf = jnp.zeros((w, f), jnp.float32)
    top = jnp.where(rowidx == 0, 0.0,
                    jnp.concatenate([zwf, d0[: m - w]], axis=0))
    bot = jnp.where(rowidx == h - 1, 0.0,
                    jnp.concatenate([d2[w:], zwf], axis=0))
    y2q = _rq(jnp.maximum(d1 + top + bot + b2_ref[:], 0.0), sc_ref[0, 2])

    acc3 = jnp.dot(y2q, w3q_ref[:], preferred_element_type=jnp.int32)
    y3 = acc3.astype(jnp.float32) * a3_ref[:] + b3_ref[:]
    out = jnp.maximum(y3 + xf32(), 0.0)
    if out_mode == "i8":
        o_ref[:] = _rq(out, sc_ref[0, 3]).reshape(g, t, h, w, c)
    elif out_mode == "planar":
        v = out.astype(o_ref.dtype).reshape(g, t, h, w, c)
        o_ref[:] = v.reshape(g, t, h, w // 2, 2 * c)
    elif out_mode == "planar_i8":
        # pair-merge in f32 (the legal natural-layout direction), THEN
        # requant — the next stage's int8 stride-2 block0 consumes this
        v = out.reshape(g, t, h, w, c).reshape(g, t, h, w // 2, 2 * c)
        o_ref[:] = _rq(v, sc_ref[0, 3])
    else:
        o_ref[:] = out.astype(o_ref.dtype).reshape(g, t, h, w, c)


def _kernel_halo_i8(x_ref, top_ref, bot_ref, w1q_ref, w1h_ref, w2q_ref,
                    w3q_ref, a1_ref, b1_ref, a2_ref, b2_ref, a3_ref,
                    b3_ref, sc_ref, o_ref, *, fold: int, x_i8: bool,
                    out_mode: str):
    """Row-tiled W8A8 plain bottleneck — the int8 twin of
    tsm_block_pallas._kernel (pair-mode conv1, width-im2col + 3
    row-shifted K=3F dots). Used where the whole-sample flat form's f32
    im2col temp does not fit VMEM (layer 1). Halo rows are 1-row tiles
    above/below; their conv1 runs here and the TRUE image edges zero the
    halo in y1 space (the 3x3's SAME padding)."""
    t, r, w, c = (x_ref.shape[1], x_ref.shape[2], x_ref.shape[3],
                  x_ref.shape[4])
    f = w1q_ref.shape[1]
    m = t * r * w
    sx = sc_ref[0, 0]
    dt = o_ref.dtype

    def quant(v):
        if x_i8:
            return v
        return _rq(v.astype(jnp.float32), 1.0 / sx)

    def c1(xt):
        """conv1 + temporal-shift correction on a [T, R', W, C] tile ->
        f32 [T, R', W, F]."""
        tt, rr = xt.shape[0], xt.shape[1]
        mm = tt * rr * w
        xq = quant(xt)
        acc = jnp.dot(xq.reshape(mm, c), w1q_ref[:],
                      preferred_element_type=jnp.int32)
        x2 = xq[..., : 2 * fold]
        z2 = jnp.zeros_like(x2[:1])
        nxt = jnp.concatenate([x2[1:], z2], axis=0)
        prv = jnp.concatenate([z2, x2[: tt - 1]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * fold), 3)
        sel = jnp.where(lane < fold, nxt, prv).reshape(mm, 2 * fold)
        acc += jnp.dot(sel, w1h_ref[:], preferred_element_type=jnp.int32)
        acc -= jnp.dot(x2.reshape(mm, 2 * fold), w1h_ref[:],
                       preferred_element_type=jnp.int32)
        y = jnp.maximum(
            acc.astype(jnp.float32) * a1_ref[:] + b1_ref[:], 0.0)
        return y.reshape(tt, rr, w, f)

    j = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    top_y = (jnp.where(j == 0, 0.0, 1.0).astype(jnp.float32)
             * c1(top_ref[0]))
    bot_y = (jnp.where(j == n_tiles - 1, 0.0, 1.0).astype(jnp.float32)
             * c1(bot_ref[0]))
    y1 = jnp.concatenate([top_y, c1(x_ref[0]), bot_y], axis=1)

    # width im2col in f32, ONE requant, then 3 row-shifted int8 dots
    # (each tap dequantized separately — per-(tap, channel) scales)
    zc = jnp.zeros((t, r + 2, 1, f), jnp.float32)
    z = jnp.concatenate(
        [jnp.concatenate([zc, y1[:, :, :-1]], axis=2), y1,
         jnp.concatenate([y1[:, :, 1:], zc], axis=2)], axis=-1)
    zq = _rq(z, sc_ref[0, 1])  # [T, R+2, W, 3F] i8
    # a2_ref [3, F]: per-(row-tap, output-channel) dequant incl. BN2
    # scale — taps sum AFTER the per-channel multiply, center first
    # (matches the flat kernel / integer reference ordering)
    acc = (jnp.dot(zq[:, 1: r + 1].reshape(m, 3 * f), w2q_ref[1],
                   preferred_element_type=jnp.int32).astype(jnp.float32)
           * a2_ref[1])
    acc += (jnp.dot(zq[:, :r].reshape(m, 3 * f), w2q_ref[0],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            * a2_ref[0])
    acc += (jnp.dot(zq[:, 2: r + 2].reshape(m, 3 * f), w2q_ref[2],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            * a2_ref[2])
    y2q = _rq(jnp.maximum(acc + b2_ref[:], 0.0), sc_ref[0, 2])

    acc3 = jnp.dot(y2q, w3q_ref[:], preferred_element_type=jnp.int32)
    y3 = acc3.astype(jnp.float32) * a3_ref[:] + b3_ref[:]
    if x_i8:
        xf = x_ref[0].reshape(m, c).astype(jnp.float32) * sx
    else:
        xf = x_ref[0].reshape(m, c).astype(jnp.float32)
    out = jnp.maximum(y3 + xf, 0.0)
    if out_mode == "i8":
        o_ref[0] = _rq(out, sc_ref[0, 3]).reshape(t, r, w, c)
    elif out_mode == "planar":
        pm = out.astype(dt).reshape(t, r, w, c).reshape(
            t, r, w // 2, 2 * c)
        wpm = o_ref.shape[3]
        if wpm > w // 2:
            pm = jnp.concatenate(
                [pm, jnp.zeros((t, r, wpm - w // 2, 2 * c), dt)], axis=2)
        o_ref[0] = pm
    else:
        o_ref[0] = out.astype(o_ref.dtype).reshape(t, r, w, c)


def _kernel_s2_planar_i8(x_ref, top_ref, w1q_ref, w1h_ref, w2q_ref,
                         w3q_ref, wpq_ref, a1_ref, b1_ref, a2_ref, b2_ref,
                         a3_ref, b3_ref, ap_ref, bp_ref, sc_ref, o_ref, *,
                         fold: int, x_i8: bool, out_mode: str):
    """W8A8 stride-2 projection bottleneck on PAIR-MERGED column input —
    the int8 twin of tsm_block_pallas._kernel_s2_planar (same planar
    even/odd tap selection; see its docstring for the layout reasoning).

    x_ref [1,T,2R,Wh,2C] int8 (or bf16 at the L2 entry, quantized here);
    the projection residual reuses the SAME quantized input (no extra
    activation scale). a2_ref [3, F] per-(row-tap, channel) dequant."""
    t, r2, wh, c2 = (x_ref.shape[1], x_ref.shape[2], x_ref.shape[3],
                     x_ref.shape[4])
    c = c2 // 2
    r = r2 // 2
    f = w1q_ref.shape[1]
    c_out = o_ref.shape[-1]
    sx = sc_ref[0, 0]

    def quant(v):
        if x_i8:
            return v
        return _rq(v.astype(jnp.float32), 1.0 / sx)

    def c1(xq):
        """int8 conv1 + temporal-shift correction on one QUANTIZED
        [T,R',Wh,C] plane -> f32 [T,R',Wh,F] (_kernel_halo_i8 algebra)."""
        tt, rr = xq.shape[0], xq.shape[1]
        mm = tt * rr * wh
        acc = jnp.dot(xq.reshape(mm, c), w1q_ref[:],
                      preferred_element_type=jnp.int32)
        x2 = xq[..., : 2 * fold]
        z2 = jnp.zeros_like(x2[:1])
        nxt = jnp.concatenate([x2[1:], z2], axis=0)
        prv = jnp.concatenate([z2, x2[: tt - 1]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * fold), 3)
        sel = jnp.where(lane < fold, nxt, prv).reshape(mm, 2 * fold)
        acc += jnp.dot(sel, w1h_ref[:], preferred_element_type=jnp.int32)
        acc -= jnp.dot(x2.reshape(mm, 2 * fold), w1h_ref[:],
                       preferred_element_type=jnp.int32)
        y = jnp.maximum(
            acc.astype(jnp.float32) * a1_ref[:] + b1_ref[:], 0.0)
        return y.reshape(tt, rr, wh, f)

    j = pl.program_id(1)
    edge = jnp.where(j == 0, 0.0, 1.0)
    x = x_ref[0]
    top = top_ref[0]
    # quantize each plane ONCE (the even plane also feeds the residual)
    xq_even, xq_odd = quant(x[..., :c]), quant(x[..., c:])
    tq_even, tq_odd = quant(top[..., :c]), quant(top[..., c:])
    y1e = jnp.concatenate([edge * c1(tq_even), c1(xq_even)], axis=1)
    y1o = jnp.concatenate([edge * c1(tq_odd), c1(xq_odd)], axis=1)

    def row_taps(y1):
        ye = y1[:, : 2 * r].reshape(t, r, 2, wh, f)
        return (
            ye[:, :, 0],
            ye[:, :, 1],
            (jnp.concatenate([ye[:, 1:, 0], y1[:, 2 * r: 2 * r + 1]],
                             axis=1)
             if r > 1 else y1[:, 2: 3]),
        )

    taps_e = row_taps(y1e)
    taps_o = row_taps(y1o)
    m2 = t * r * wh
    zc = jnp.zeros((t, r, 1, f), jnp.float32)
    acc = None
    for dr in (1, 0, 2):
        ce, co = taps_e[dr], taps_o[dr]
        tap_l = jnp.concatenate([zc, co[:, :, :-1]], axis=2)
        zq = _rq(jnp.concatenate([tap_l, ce, co], axis=-1), sc_ref[0, 1])
        d = (jnp.dot(zq.reshape(m2, 3 * f), w2q_ref[dr],
                     preferred_element_type=jnp.int32).astype(jnp.float32)
             * a2_ref[dr])
        acc = d if acc is None else acc + d
    y2q = _rq(jnp.maximum(acc + b2_ref[:], 0.0), sc_ref[0, 2])
    acc3 = jnp.dot(y2q, w3q_ref[:], preferred_element_type=jnp.int32)
    y3 = (acc3.astype(jnp.float32) * a3_ref[:]
          + b3_ref[:]).reshape(t, r, wh, c_out)
    # stride-2 projection: even plane at even rows, SAME quantized input
    xpe = xq_even.reshape(t, r, 2, wh, c)[:, :, 0]
    accp = jnp.dot(xpe.reshape(m2, c), wpq_ref[:],
                   preferred_element_type=jnp.int32)
    res = (accp.astype(jnp.float32) * ap_ref[:]
           + bp_ref[:]).reshape(t, r, wh, c_out)
    out = jnp.maximum(y3 + res, 0.0)
    if out_mode == "i8":
        o_ref[0] = _rq(out, sc_ref[0, 3])
    else:
        o_ref[0] = out.astype(o_ref.dtype)


def tsm_bottleneck_s2_planar_int8_pallas(xpm, w1, w2, w3, s1, b1, s2, b2,
                                         s3, b3, wp, sp, bp, act_scales,
                                         n_segment: int, n_div: int = 8,
                                         out_mode: str = "i8",
                                         out_dtype=jnp.bfloat16,
                                         rows: int = 0):
    """W8A8 pair-merged-input fused stride-2 downsample bottleneck:
    xpm [N*T, H, W/2, 2C] int8 (interior; scale act_scales[0]) or
    bf16/f32 (stage entry) -> [N*T, H/2, W/2, Cout] int8 (out_mode='i8')
    or out_dtype. Mirrors tsm_bottleneck_s2_planar_pallas's tiling."""
    nt, h, wh, c2 = xpm.shape
    c = c2 // 2
    t = n_segment
    b = nt // t
    w1 = w1.reshape(c, -1)
    f = w1.shape[1]
    assert f % 128 == 0, f
    w3 = w3.reshape(f, -1)
    c_out = w3.shape[1]
    fold = c // n_div

    w1q, sw1 = quantize_weight(w1)
    w2r = w2.reshape(3, 3 * f, f)  # dr-major, K = (left, center, right)
    w2flat = jnp.concatenate([w2r[0], w2r[1], w2r[2]], axis=1)
    w2q, sw2 = quantize_weight(w2flat)
    w2q_taps = jnp.stack([w2q[:, i * f: (i + 1) * f] for i in range(3)])
    w3q, sw3 = quantize_weight(w3)
    wpq, swp = quantize_weight(wp.reshape(c, c_out))

    sc = jnp.asarray(act_scales, jnp.float32).reshape(-1)
    sx, sz, sy2, sout = sc[0], sc[1], sc[2], sc[3]
    vec = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    a1 = vec(sx * sw1 * jnp.asarray(s1, jnp.float32))
    b1v = vec(b1)
    s2f = jnp.asarray(s2, jnp.float32)
    a2 = (sz * sw2 * jnp.concatenate([s2f, s2f, s2f])).reshape(3, f)
    b2v = vec(b2)
    a3 = vec(sy2 * sw3 * jnp.asarray(s3, jnp.float32))
    b3v = vec(b3)
    ap = vec(sx * swp * jnp.asarray(sp, jnp.float32))
    bpv = vec(bp)
    scalars = jnp.zeros((1, 8), jnp.float32)
    scalars = scalars.at[0, 0].set(sx)
    scalars = scalars.at[0, 1].set(1.0 / sz)
    scalars = scalars.at[0, 2].set(1.0 / sy2)
    scalars = scalars.at[0, 3].set(1.0 / sout)

    x_i8 = xpm.dtype == jnp.int8
    if not rows:
        from .tsm_block_pallas import _pick_rows_s2

        # same tile geometry as the bf16 kernel (es=2): the f32 y1/z
        # intermediates dominate the VMEM working set either way
        rows = _pick_rows_s2(h, 2 * wh, c, c_out, t, 2)
    assert h % (2 * rows) == 0, (h, rows)
    n_tiles = h // (2 * rows)
    x5 = xpm.reshape(b, t, h, wh, c2)
    idx = lambda i, j: (i, 0, j, 0, 0)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    odt = jnp.int8 if out_mode == "i8" else out_dtype
    out = pl.pallas_call(
        functools.partial(_kernel_s2_planar_i8, fold=fold, x_i8=x_i8,
                          out_mode=out_mode),
        out_shape=jax.ShapeDtypeStruct((b, t, h // 2, wh, c_out), odt),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, t, 2 * rows, wh, c2), idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, t, 1, wh, c2),
                lambda i, j: (i, 0, jnp.maximum(j * 2 * rows - 1, 0),
                              0, 0),
                memory_space=pltpu.VMEM),
            full((c, f)), full((2 * fold, f)), full((3, 3 * f, f)),
            full((f, c_out)), full((c, c_out)),
            full((1, f)), full((1, f)), full((3, f)), full((1, f)),
            full((1, c_out)), full((1, c_out)),
            full((1, c_out)), full((1, c_out)), full((1, 8)),
        ],
        out_specs=pl.BlockSpec((1, t, rows, wh, c_out), idx,
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x5, x5, w1q, w1q[: 2 * fold], w2q_taps, w3q, wpq,
      a1, b1v, a2, b2v, a3, b3v, ap, bpv, scalars)
    return out.reshape(nt, h // 2, wh, c_out)


def tsm_bottleneck_int8_pallas(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                               act_scales, n_segment: int, n_div: int = 8,
                               out_mode: str = "i8",
                               out_dtype=jnp.bfloat16,
                               force_halo: bool = False):
    """W8A8 fused inference bottleneck (stride-1, non-projection).

    x: [N*T, H, W, C] int8 (interior block, scale act_scales[0]) or
    bf16/f32 (stage entry — quantized in kernel). w1/w2/w3: the FLOAT
    folded weights (quantized per output channel at trace time);
    s*/b*: inference-folded BN affines; act_scales: (4,) f32
    (sx, sz, sy2, sout) from ops/quantize.py calibration.
    out_mode: 'i8' -> int8 [NT,H,W,C]; 'bf16' -> out_dtype same shape;
    'planar' -> out_dtype [NT,H,W/2,2C] pair-merged for the next fused
    stride-2 block0 (tsm_block_pallas._kernel_s2_planar)."""
    nt, h, w, c = x.shape
    t = n_segment
    b = nt // t
    w1 = w1.reshape(c, -1)
    f = w1.shape[1]
    w2 = w2.reshape(3, 3, f, f)
    w3 = w3.reshape(f, -1)
    assert w3.shape[1] == c, (w3.shape, c)
    fold = c // n_div

    s1, b1, s2, b2 = (jnp.asarray(v).reshape(-1) for v in (s1, b1, s2, b2))
    if f % 128:
        # zero-pad the bottleneck width to full 128-lane tiles (layer 1,
        # F=64): padded y1/y2 lanes are exactly 0 (zero weight columns ->
        # sw clamp -> zero wq; zero affines) — bit-identical result,
        # tile-aligned lane ops (same trick as the bf16 wrapper's fpad)
        fp = -(-f // 128) * 128
        w1 = jnp.pad(w1, ((0, 0), (0, fp - f)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, fp - f), (0, fp - f)))
        w3 = jnp.pad(w3, ((0, fp - f), (0, 0)))
        s1, b1, s2, b2 = (jnp.pad(v, (0, fp - f)) for v in (s1, b1, s2, b2))
        f = fp

    w1q, sw1 = quantize_weight(w1)
    w2r = w2.reshape(3, 3 * f, f)
    w2flat = jnp.concatenate([w2r[0], w2r[1], w2r[2]], axis=1)  # [3F,3F]
    w2q, sw2 = quantize_weight(w2flat)
    w3q, sw3 = quantize_weight(w3)

    sc = jnp.asarray(act_scales, jnp.float32).reshape(-1)
    sx, sz, sy2, sout = sc[0], sc[1], sc[2], sc[3]
    vec = lambda v: jnp.asarray(v, jnp.float32).reshape(1, -1)
    a1 = vec(sx * sw1 * jnp.asarray(s1, jnp.float32))
    b1v = vec(b1)
    # conv2 column dequant folds sz, the per-column weight scale and the
    # per-channel BN2 scale (taps sum AFTER the per-channel multiply —
    # distributive); BN2 bias is added once after the tap sum
    s2f = jnp.asarray(s2, jnp.float32)
    a2 = vec(sz * sw2 * jnp.concatenate([s2f, s2f, s2f]))
    b2v = vec(b2)
    a3 = vec(sy2 * sw3 * jnp.asarray(s3, jnp.float32))
    b3v = vec(b3)
    scalars = jnp.zeros((1, 8), jnp.float32)
    scalars = scalars.at[0, 0].set(sx)
    scalars = scalars.at[0, 1].set(1.0 / sz)
    scalars = scalars.at[0, 2].set(1.0 / sy2)
    scalars = scalars.at[0, 3].set(1.0 / sout)

    x_i8 = x.dtype == jnp.int8
    interp = jax.default_backend() != "tpu"
    # whole-sample flat form iff its dominant f32 im2col temp fits VMEM;
    # otherwise the row-tiled halo form (layer 1)
    flat_fits = t * h * w * 3 * f * 4 <= 40 * 1024 * 1024
    if not flat_fits or force_halo:
        rows = 14 if h % 14 == 0 else max(
            r for r in (8, 4, 2, 1) if h % r == 0)
        if rows == h:
            rows = max(h // 2, 1)
        assert h % rows == 0, (h, rows)
        n_tiles = h // rows
        x5 = x.reshape(b, t, h, w, c)
        idx = lambda i, j: (i, 0, j, 0, 0)
        full = lambda shape: pl.BlockSpec(
            shape, lambda i, j: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        halo_specs = [
            pl.BlockSpec((1, t, 1, w, c),
                         lambda i, j: (i, 0, jnp.maximum(j * rows - 1, 0),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, w, c),
                         lambda i, j: (i, 0,
                                       jnp.minimum(j * rows + rows, h - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if out_mode == "i8":
            out_shape, out_block = (b, t, h, w, c), (1, t, rows, w, c)
            odt = jnp.int8
        elif out_mode == "planar":
            assert w % 2 == 0, w
            wpmb = -(-(w // 2) // 8) * 8
            out_shape = (b, t, h, w // 2, 2 * c)
            out_block = (1, t, rows, wpmb, 2 * c)
            odt = out_dtype
        else:
            out_shape, out_block = (b, t, h, w, c), (1, t, rows, w, c)
            odt = out_dtype
        # same quantized weights/scales as the flat (nstack) form, split
        # per row tap: w2flat columns [r*F:(r+1)*F] ARE tap r
        a2h = a2.reshape(3, f)
        w2q_taps = jnp.stack(
            [w2q[:, r * f: (r + 1) * f] for r in range(3)])
        out = pl.pallas_call(
            functools.partial(_kernel_halo_i8, fold=fold, x_i8=x_i8,
                              out_mode=out_mode),
            out_shape=jax.ShapeDtypeStruct(out_shape, odt),
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, t, rows, w, c), idx,
                             memory_space=pltpu.VMEM),
                *halo_specs,
                full((c, f)), full((2 * fold, f)),
                full((3, 3 * f, f)), full((f, c)),
                full((1, f)), full((1, f)), full((3, f)), full((1, f)),
                full((1, c)), full((1, c)), full((1, 8)),
            ],
            out_specs=pl.BlockSpec(out_block, idx,
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interp,
        )(x5, x5, x5, w1q, w1q[: 2 * fold], w2q_taps,
          w3q, a1, b1v, a2h, b2v, a3, b3v, scalars)
        return out.reshape(nt, *out.shape[2:])
    wp8 = -(-w // 8) * 8
    if out_mode == "i8":
        out_shape, out_block = (b, t, h, w, c), (1, t, h, wp8, c)
        odt = jnp.int8
    elif out_mode in ("planar", "planar_i8"):
        assert w % 2 == 0, w
        out_shape = (b, t, h, w // 2, 2 * c)
        out_block = (1, t, h, wp8 // 2, 2 * c)
        odt = jnp.int8 if out_mode == "planar_i8" else out_dtype
    else:
        out_shape, out_block = (b, t, h, w, c), (1, t, h, wp8, c)
        odt = out_dtype
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    x5 = x.reshape(b, t, h, w, c)
    out = pl.pallas_call(
        functools.partial(_kernel_flat_i8, fold=fold, h=h, w=wp8, wt=w,
                          x_i8=x_i8, out_mode=out_mode),
        out_shape=jax.ShapeDtypeStruct(out_shape, odt),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, h, wp8, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((c, f)), full((2 * fold, f)), full((3 * f, 3 * f)),
            full((f, c)),
            full((1, f)), full((1, f)), full((1, 3 * f)), full((1, f)),
            full((1, c)), full((1, c)), full((1, 8)),
        ],
        out_specs=pl.BlockSpec(out_block, lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x5, w1q, w1q[: 2 * fold], w2q, w3q,
      a1, b1v, a2, b2v, a3, b3v, scalars)
    return out.reshape(nt, *out.shape[2:])


def int8_s2_bottleneck_reference(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                                 wp, sp, bp, act_scales, n_segment: int,
                                 n_div: int = 8):
    """Pure-jnp integer spec of the stride-2 planar kernel, on the
    UN-merged spatial input x [NT, H, W, C] (int8 or float) ->
    (out_f32 [NT, H/2, W/2, Cout], out_i8). Tap-sum order matches the
    kernel exactly (dr 1, 0, 2) for bit-parity in interpret mode."""
    from .temporal_shift import temporal_shift

    nt, h, w, c = x.shape
    w1 = w1.reshape(c, -1)
    f = w1.shape[1]
    w3 = w3.reshape(f, -1)
    c_out = w3.shape[1]
    sc = jnp.asarray(act_scales, jnp.float32).reshape(-1)
    sx, sz, sy2, sout = sc[0], sc[1], sc[2], sc[3]

    w1q, sw1 = quantize_weight(w1)
    w2r = w2.reshape(3, 3 * f, f)
    w2flat = jnp.concatenate([w2r[0], w2r[1], w2r[2]], axis=1)
    w2q, sw2 = quantize_weight(w2flat)
    w3q, sw3 = quantize_weight(w3)
    wpq, swp = quantize_weight(wp.reshape(c, c_out))

    if x.dtype == jnp.int8:
        xq = x
    else:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
    xs = temporal_shift(xq.astype(jnp.int32), n_segment, n_div)
    acc1 = jnp.einsum("nhwc,cf->nhwf", xs, w1q.astype(jnp.int32))
    y1 = jnp.maximum(
        acc1.astype(jnp.float32)
        * (sx * sw1 * jnp.asarray(s1, jnp.float32))
        + jnp.asarray(b1, jnp.float32), 0.0)

    ho, wo = h // 2, w // 2
    y1p = jnp.pad(y1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    s2f = jnp.asarray(s2, jnp.float32)
    a2 = (sz * sw2 * jnp.concatenate([s2f, s2f, s2f])).reshape(3, f)
    acc = None
    for dr in (1, 0, 2):
        rowsel = y1p[:, dr: dr + 2 * ho: 2]   # padded rows 2r+dr
        z = jnp.concatenate(
            [rowsel[:, :, 0: 2 * wo: 2],      # col 2w-1 (padded)
             rowsel[:, :, 1: 2 * wo + 1: 2],  # col 2w
             rowsel[:, :, 2: 2 * wo + 2: 2]], axis=-1)
        zq = jnp.clip(jnp.round(z / sz), -127, 127).astype(jnp.int8)
        d = (jnp.einsum("nhwj,jk->nhwk", zq.astype(jnp.int32),
                        w2q[:, dr * f: (dr + 1) * f].astype(jnp.int32))
             .astype(jnp.float32) * a2[dr])
        acc = d if acc is None else acc + d
    y2 = jnp.maximum(acc + jnp.asarray(b2, jnp.float32), 0.0)
    y2q = jnp.clip(jnp.round(y2 / sy2), -127, 127).astype(jnp.int8)
    acc3 = jnp.einsum("nhwf,fk->nhwk", y2q.astype(jnp.int32),
                      w3q.astype(jnp.int32))
    y3 = (acc3.astype(jnp.float32)
          * (sy2 * sw3 * jnp.asarray(s3, jnp.float32))
          + jnp.asarray(b3, jnp.float32))
    accp = jnp.einsum("nhwc,ck->nhwk",
                      xq[:, ::2, ::2].astype(jnp.int32),
                      wpq.astype(jnp.int32))
    res = (accp.astype(jnp.float32)
           * (sx * swp * jnp.asarray(sp, jnp.float32))
           + jnp.asarray(bp, jnp.float32))
    out = jnp.maximum(y3 + res, 0.0)
    outq = jnp.clip(jnp.round(out / sout), -127, 127).astype(jnp.int8)
    return out, outq


def int8_bottleneck_reference(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                              act_scales, n_segment: int, n_div: int = 8):
    """Pure-jnp reference of the EXACT integer kernel spec (module
    docstring) — tests pin the pallas kernel against it bit-for-bit in
    f32/i32 (interpret mode off-TPU). x: [NT, H, W, C] int8 or float."""
    from .temporal_shift import temporal_shift

    nt, h, w, c = x.shape
    w1 = w1.reshape(c, -1)
    f = w1.shape[1]
    w3 = w3.reshape(f, -1)
    sc = jnp.asarray(act_scales, jnp.float32).reshape(-1)
    sx, sz, sy2, sout = sc[0], sc[1], sc[2], sc[3]

    w1q, sw1 = quantize_weight(w1)
    w2r = w2.reshape(3, 3, f, f).reshape(3, 3 * f, f)
    w2flat = jnp.concatenate([w2r[0], w2r[1], w2r[2]], axis=1)
    w2q, sw2 = quantize_weight(w2flat)
    w3q, sw3 = quantize_weight(w3)

    if x.dtype == jnp.int8:
        xq = x
        xf = x.astype(jnp.float32) * sx
    else:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        xf = x.astype(jnp.float32)

    xs = temporal_shift(xq.astype(jnp.int32), n_segment, n_div)
    acc1 = jnp.einsum("nhwc,cf->nhwf", xs, w1q.astype(jnp.int32))
    y1 = jnp.maximum(
        acc1.astype(jnp.float32)
        * (sx * sw1 * jnp.asarray(s1, jnp.float32))
        + jnp.asarray(b1, jnp.float32), 0.0)

    # im2col of the 3 column taps, quantized as ONE tensor
    zl = jnp.pad(y1, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w]
    zr = jnp.pad(y1, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
    zc = jnp.concatenate([zl, y1, zr], axis=-1)
    zcq = jnp.clip(jnp.round(zc / sz), -127, 127).astype(jnp.int8)
    dd = jnp.einsum("nhwj,jk->nhwk", zcq.astype(jnp.int32),
                    w2q.astype(jnp.int32)).astype(jnp.float32)
    s2f = jnp.asarray(s2, jnp.float32)
    dd = dd * (sz * sw2 * jnp.concatenate([s2f, s2f, s2f]))
    d0, d1, d2 = dd[..., :f], dd[..., f: 2 * f], dd[..., 2 * f:]
    top = jnp.pad(d0, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :h]
    bot = jnp.pad(d2, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
    y2 = jnp.maximum(d1 + top + bot + jnp.asarray(b2, jnp.float32), 0.0)
    y2q = jnp.clip(jnp.round(y2 / sy2), -127, 127).astype(jnp.int8)

    acc3 = jnp.einsum("nhwf,fc->nhwc", y2q.astype(jnp.int32),
                      w3q.astype(jnp.int32))
    y3 = (acc3.astype(jnp.float32)
          * (sy2 * sw3 * jnp.asarray(s3, jnp.float32))
          + jnp.asarray(b3, jnp.float32))
    out = jnp.maximum(y3 + xf, 0.0)
    outq = jnp.clip(jnp.round(out / sout), -127, 127).astype(jnp.int8)
    return out, outq
