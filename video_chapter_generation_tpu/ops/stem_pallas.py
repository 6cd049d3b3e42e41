"""Pallas TPU kernels for the ResNet stem tail: folded-BN affine + ReLU +
3x3/stride-2 max-pool in one VMEM-resident pass.

Profiling the all-pallas trunk (PERF.md round 2) showed the stem's
bn/relu/max-pool tail costing ~9.4ms of 57ms at B=32: XLA lowers the
max-pool to an unfused reduce-window (4.7ms) and inserts a 4.8ms layout
transpose between the convolution's batch-minor output and the pool. This
kernel replaces both: one read of the conv output, one write of the pooled
activation.

Stride-2 window selections follow the Mosaic layout rules worked out for
the bottleneck kernels (ops/tsm_block_pallas.py): row pairs via an
untiled-axis split, column pairs via a single natural-layout sublane->lane
merge, never reshaping a pair-merged value again. Max-pool padding uses 0
rather than -inf: inputs are post-ReLU so every true window max is >= 0.

Reference semantics: torchvision ResNet stem `maxpool = MaxPool2d(3, 2,
padding=1)` on `relu(bn1(conv1(x)))` (model/vision/resnet50_tsm.py wraps
torchvision.resnet50; reference never changes the stem).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, s_ref, b_ref, o_ref):
    """x_ref [G, H, W, C] (conv output tile), o_ref [G, H/2, W/2, C].
    Computes relu(x*s + b) then 3x3 stride-2 max pool with SAME padding
    (pad=1): out (p, q) = max over rows 2p-1+dr, cols 2q-1+dc, dr/dc in
    0..2 — equivalently rows 2p..2p+2 of the 1-padded input; torch pads
    with -inf but post-relu 0-padding is equivalent."""
    g, h, w, c = x_ref.shape
    ho, wo = h // 2, w // 2
    x = x_ref[:]
    y = jnp.maximum(x * s_ref[0] + b_ref[0], 0.0).astype(x.dtype)

    # torch MaxPool2d(3, 2, padding=1): out p reads padded rows
    # 2p..2p+2 = original rows 2p-1..2p+1
    zrow = jnp.zeros((g, 1, w, c), y.dtype)
    yp = jnp.concatenate([zrow, y, zrow], axis=1)  # [G, H+2, W, C]
    ye = yp[:, : 2 * ho].reshape(g, ho, 2, w, c)
    r0 = ye[:, :, 0]  # padded rows 0, 2, ... = original 2p-1
    r1 = ye[:, :, 1]  # original rows 2p
    r2 = jnp.concatenate([ye[:, 1:, 0], yp[:, 2 * ho : 2 * ho + 1]],
                         axis=1)  # original rows 2p+1
    rowmax = jnp.maximum(jnp.maximum(r0, r1), r2)  # [G, ho, W, C]

    # columns: pair-merge W into lanes; out q reads cols 2q-1, 2q, 2q+1.
    # Mosaic only shape-casts sublane->lane merges when the lane count is a
    # multiple of 128, so pad C up to a full tile first (zeros are inert:
    # only lanes [0,c) are ever read back).
    cp = -(-c // 128) * 128
    if cp != c:
        rowmax = jnp.concatenate(
            [rowmax, jnp.zeros((g, ho, w, cp - c), y.dtype)], axis=-1)
    v = rowmax.reshape(g, ho, wo, 2 * cp)
    even = v[..., :c]              # col 2q
    odd = v[..., cp : cp + c]      # col 2q+1
    zcol = jnp.zeros((g, ho, 1, c), y.dtype)
    prev_odd = jnp.concatenate([zcol, v[:, :, : wo - 1, cp : cp + c]],
                               axis=2)
    o_ref[:] = jnp.maximum(jnp.maximum(even, odd), prev_odd)


def bn_relu_maxpool_pallas(x, scale, bias):
    """relu(x * scale + bias) -> 3x3/2 max pool (SAME, pad 1).

    x [N, H, W, C] with H, W even; scale/bias [C] (inference-folded BN).
    Returns [N, H/2, W/2, C]."""
    n, h, w, c = x.shape
    g = 4
    while n % g:
        g //= 2
    grid = (n // g,)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, h // 2, w // 2, c),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x,
        jnp.asarray(scale).reshape(1, c).astype(jnp.float32),
        jnp.asarray(bias).reshape(1, c).astype(jnp.float32),
    )
    return out


def _stem_weight_im2col(w7, dtype):
    """Map the [7,7,3,64] stride-2 conv kernel onto the phase-packed
    space-to-depth im2col weight [432, 256].

    Input is 4x4 space-to-depth: cell (I, J) holds original pixels
    (4I+di, 4J+dj), channels laid out ch48 = di*12 + dj*3 + c. The kernel's
    im2col patch z for output cell (I, J) concatenates the 3x3 cell
    neighborhood: lane = tap_r*144 + tap_c*48 + ch48. Output packs the 4
    conv-output phases (2I+pr, 2J+pc): n = (pr*2+pc)*64 + f.

    Conv output pixel (2I+pr, .) reads original rows 2(2I+pr)-3+dr',
    dr' in 0..6 (SAME pad 3); the patch provides rows 4(I-1+tap_r)+di, so
    dr' = 4*tap_r + di - 2*pr - 1 (valid iff 0 <= dr' <= 6); same for
    columns. Invalid combinations are zero."""
    sel = _phase_selection()
    w = w7.reshape(147, 64).astype(dtype)
    out = jnp.einsum("prd,df->rpf", jnp.asarray(sel, dtype), w)
    return out.reshape(432, 256)


def _phase_selection():
    """The constant 0/1 selection tensor sel[ph, rk, dd] mapping row
    dd = (dr*7+dc)*3+c of the flattened [147, 64] stem kernel to patch
    row rk under output phase ph (see _stem_weight_im2col). Shared by
    the forward weight build and the training-mode weight-gradient
    un-map (dw7 = einsum('prd,rpf->df', sel, dw2))."""
    import numpy as np

    tr, tc, di, dj, c = np.meshgrid(
        np.arange(3), np.arange(3), np.arange(4), np.arange(4),
        np.arange(3), indexing="ij")  # row-major over rk lane order

    # Build per-phase CONSTANT 0/1 selection matrices and apply them with
    # one einsum: sel[ph, rk, dd] picks row dd = (dr*7+dc)*3+c of the
    # flattened [147, 64] kernel for patch row rk under phase ph. (A
    # gather formulation ran as a 1.4ms kCustom fusion every forward —
    # dense selection fuses into a trivial matmul instead.)
    tr_f = tr.reshape(-1)
    tc_f = tc.reshape(-1)
    di_f = di.reshape(-1)
    dj_f = dj.reshape(-1)
    c_f = c.reshape(-1)
    sel = np.zeros((4, 432, 147), np.float32)
    for ph in range(4):
        p_r, p_c = ph // 2, ph % 2
        dr = 4 * tr_f + di_f - 2 * p_r - 1
        dc = 4 * tc_f + dj_f - 2 * p_c - 1
        valid = (dr >= 0) & (dr <= 6) & (dc >= 0) & (dc <= 6)
        rows = np.arange(432)[valid]
        sel[ph, rows, (dr[valid] * 7 + dc[valid]) * 3 + c_f[valid]] = 1.0
    return sel


def _normalize_u8(x, a_ref, bin_ref, dt):
    """Raw uint8 frames: normalize on the small s2d tile in VMEM (the
    conv's SAME padding applies AFTER normalization, so folding the
    affine into the weights would mis-handle edges). Mosaic has no
    direct u8->f32 cast; widen through int32."""
    return (x.astype(jnp.int32).astype(jnp.float32) * a_ref[0]
            + bin_ref[0]).astype(dt)


def _build_z(x, zbuild: str):
    """The [G,n,n,432] im2col patch tensor of the s2d tile x [G,n,n,48]
    (lane order tap_r-major, tap_c, ch48; SAME zero padding).

    zbuild — how the patch is materialized:
    - "two": column im2col first ([.., 144]), then 3 row-shifted copies
      concatenated (writes ~672 lanes/pixel incl. the shifted pieces);
    - "nine": one 9-piece concat of row-sliced column-shift tensors
      (writes ~528 lanes/pixel — skips the 144-lane intermediate)."""
    g, n = x.shape[0], x.shape[1]
    zr = jnp.zeros((g, 1, n, 48), x.dtype)
    xp = jnp.concatenate([zr, x, zr], axis=1)  # [G, n+2, n, 48]
    # column taps as shift-by-concat (keeps every operand at sublane
    # offset 0 — Mosaic cannot concatenate lanes across offset mismatches)
    zc1 = jnp.zeros((g, n + 2, 1, 48), x.dtype)
    left = jnp.concatenate([zc1, xp[:, :, : n - 1]], axis=2)
    right = jnp.concatenate([xp[:, :, 1:], zc1], axis=2)
    if zbuild == "nine":
        return jnp.concatenate(
            [v[:, dr : dr + n]
             for dr in range(3) for v in (left, xp, right)],
            axis=-1)  # [G, n, n, 432]
    zc = jnp.concatenate([left, xp, right], axis=-1)  # [G, n+2, n, 144]
    return jnp.concatenate(
        [zc[:, 0:n], zc[:, 1 : n + 1], zc[:, 2 : n + 2]],
        axis=-1)  # [G, n, n, 432]


def _stem_kernel(x_ref, *refs, zbuild: str = "two"):
    """x_ref [G, 56, 56, 48] (4x4 space-to-depth frames; bf16 normalized,
    or uint8 raw with in-kernel normalize via extra a/b [1,48] refs),
    w_ref [432, 256] (phase-packed im2col weight), s/b [1, 256] (folded
    BN, tiled over the 4 phases), o_ref [G, 56, 56, 64]: 7x7/2 conv + bn
    + relu + 3x3/2 max pool, one frame batch per grid step."""
    if len(refs) == 6:
        a_ref, bin_ref, w_ref, s_ref, b_ref, o_ref = refs
    else:
        w_ref, s_ref, b_ref, o_ref = refs
        a_ref = bin_ref = None
    g = x_ref.shape[0]
    n = x_ref.shape[1]
    dt = o_ref.dtype
    x = x_ref[:]
    if a_ref is not None:
        x = _normalize_u8(x, a_ref, bin_ref, dt)

    z = _build_z(x, zbuild)
    acc = jnp.dot(z.reshape(g * n * n, 432), w_ref[:],
                  preferred_element_type=jnp.float32)
    y = jnp.maximum(acc * s_ref[0] + b_ref[0], 0.0).astype(dt)
    y = y.reshape(g, n, n, 256)  # phases (pr, pc) in 64-lane groups

    o_ref[:] = _phase_maxpool(y)


def _phase_maxpool(y):
    """3x3/2 max pool (SAME, pad 1) of the phase-packed conv output
    y [G, n, n, 256] -> [G, n, n, 64].

    pool(p, q) = max over conv pixels rows 2p-1..2p+1, cols 2q-1..2q+1;
    in phase terms: all 4 phases of cell (p, q), row-phase-1 of
    (p-1, q), col-phase-1 of (p, q-1), phase (1,1) of (p-1, q-1);
    out-of-range cells contribute 0 (inputs are post-relu).
    Shift FULL 256-lane tensors (offset-0 operands — Mosaic concat cannot
    mix lane/sublane offsets), then slice phase groups out of the shifted
    copies; elementwise max across offset slices is supported."""
    g, n = y.shape[0], y.shape[1]
    dt = y.dtype
    zrow = jnp.zeros((g, 1, n, 256), dt)
    zcol = jnp.zeros((g, n, 1, 256), dt)
    shift_r = lambda v: jnp.concatenate([zrow, v[:, : n - 1]], axis=1)
    shift_c = lambda v: jnp.concatenate([zcol, v[:, :, : n - 1]], axis=2)
    ysr = shift_r(y)
    ysc = shift_c(y)
    ysrc = shift_c(ysr)
    a = jnp.maximum(jnp.maximum(y[..., 0:64], y[..., 64:128]),
                    jnp.maximum(y[..., 128:192], y[..., 192:256]))
    b_ = jnp.maximum(ysr[..., 128:192], ysr[..., 192:256])  # row phase 1
    c_ = jnp.maximum(ysc[..., 64:128], ysc[..., 192:256])   # col phase 1
    return jnp.maximum(jnp.maximum(a, b_),
                       jnp.maximum(c_, ysrc[..., 192:256]))


def stem_conv_bn_pool_pallas(x, w7, scale, bias, out_dtype=None):
    """Fused ResNet stem: 7x7/2 conv (SAME pad 3) + folded-BN + ReLU +
    3x3/2 max pool (SAME pad 1), x [N, H, W, 3] -> [N, H/4, W/4, 64].

    H and W must be multiples of 4 (true for the 224x224 hot path). The
    conv is ONE [M, 432] x [432, 256] matmul per tile on 4x4
    space-to-depth input with the 4 output phases packed in lanes; the max
    pool unpacks phases with lane-group maxes and row/col shifts — no
    XLA convolution or reduce-window is involved, so no batch-minor layout
    transposes appear at the pallas boundaries."""
    nt, h, w, c = x.shape
    assert c == 3 and h % 4 == 0 and w % 4 == 0, (nt, h, w, c)
    n = h // 4
    assert w // 4 == n, "stem kernel assumes square frames"
    s4 = x.reshape(nt, n, 4, n, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    s4 = s4.reshape(nt, n, n, 48)
    return stem_s2d_pallas(s4, w7, scale, bias, out_dtype=out_dtype
                           or x.dtype)


def stem_s2d_pallas(s4, w7, scale, bias, out_dtype=jnp.bfloat16,
                    zbuild: str = "two"):
    """Fused stem on 4x4 space-to-depth input [N, H/4, W/4, 48].

    With uint8 input the frames are RAW pixels: the kernel applies the
    ImageNet normalize affine in VMEM (ops/preprocess.py semantics) before
    the conv — the host never materializes normalized frames, never
    transposes on device, and ships 1 byte/pixel over PCIe/HBM.
    zbuild: z-build strategy knob, see _stem_kernel."""
    nt, n, n2, c48 = s4.shape
    assert c48 == 48 and n == n2, s4.shape
    is_u8 = s4.dtype == jnp.uint8
    dt = out_dtype

    w2 = _stem_weight_im2col(w7, dt)
    sb = jnp.tile(jnp.asarray(scale).reshape(1, 64), (1, 4))
    bb = jnp.tile(jnp.asarray(bias).reshape(1, 64), (1, 4))

    norm_specs, norm_args = [], []
    if is_u8:
        from .preprocess import _affine_consts

        a3, b3 = _affine_consts(jnp.float32)
        norm_specs = [
            pl.BlockSpec((1, 48), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 48), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        norm_args = [jnp.tile(a3, 16).reshape(1, 48),
                     jnp.tile(b3, 16).reshape(1, 48)]

    # frames per grid step; the f32 fallback halves it (z + the f32
    # accumulator dominate the working set)
    g = 4 if jnp.dtype(dt).itemsize <= 2 else 2
    while nt % g:
        g //= 2
    grid = (nt // g,)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, zbuild=zbuild),
        out_shape=jax.ShapeDtypeStruct((nt, n, n, 64), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, n, n, 48), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *norm_specs,
            pl.BlockSpec((432, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, n, n, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(s4, *norm_args, w2, sb.astype(dt), bb.astype(dt))
    return out


def _stem_kernel_i8(x_ref, wq_ref, sv_ref, wb_ref, o_ref, *,
                    zbuild: str = "two"):
    """W8 (weight-quantized) stem on RAW uint8 s2d frames — the
    activations are EXACT integers: x-128 fits int8, the conv runs as one
    int8 [M,432]x[432,256] MXU dot at 2x the bf16 rate, and the missing
    +128 / normalize-bias contribution of only the VALID (non-padding)
    taps is restored by a tiny [M,16]x[16,256] f32 dot against
    per-tap-validity bias rows (the reason the bf16 kernel could not fold
    the normalize into the weights — SAME padding applies after
    normalization). Only the weight rounding approximates."""
    g, n = x_ref.shape[0], x_ref.shape[1]
    dt = o_ref.dtype
    xc = (x_ref[:].astype(jnp.int32) - 128).astype(jnp.int8)
    z = _build_z(xc, zbuild)  # i8 [G, n, n, 432]
    acc = jnp.dot(z.reshape(g * n * n, 432), wq_ref[:],
                  preferred_element_type=jnp.int32)
    # per-tap validity columns: tap t = tr*3+tc reads cell
    # (I-1+tr, J-1+tc); lane 9 is the always-on BN-bias row
    row = jax.lax.broadcasted_iota(jnp.int32, (g, n, n, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, n, n, 1), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 16), 3)
    tr, tc = lane // 3, lane % 3
    rvalid = (row + tr - 1 >= 0) & (row + tr - 1 <= n - 1)
    cvalid = (col + tc - 1 >= 0) & (col + tc - 1 <= n - 1)
    zv = jnp.where((lane < 9) & rvalid & cvalid, 1.0,
                   jnp.where(lane == 9, 1.0, 0.0)).astype(jnp.float32)
    bias_term = jnp.dot(zv.reshape(g * n * n, 16), wb_ref[:],
                        preferred_element_type=jnp.float32)
    y = jnp.maximum(acc.astype(jnp.float32) * sv_ref[0] + bias_term,
                    0.0).astype(dt)
    o_ref[:] = _phase_maxpool(y.reshape(g, n, n, 256))


def stem_s2d_int8_pallas(s4, w7, scale, bias, out_dtype=jnp.bfloat16,
                         zbuild: str = "two"):
    """int8 fused stem on RAW uint8 4x4 space-to-depth input
    [N, H/4, W/4, 48] (see _stem_kernel_i8). Weight-only quantization:
    the normalize affine's scale folds into the per-output-channel
    quantized weights, its bias (and the conv's edge handling) into the
    validity-bias rows — no activation calibration needed."""
    nt, n, n2, c48 = s4.shape
    assert c48 == 48 and n == n2 and s4.dtype == jnp.uint8, (
        s4.shape, s4.dtype)
    from .preprocess import _affine_consts
    from .tsm_block_int8_pallas import quantize_weight

    a3, b3 = _affine_consts(jnp.float32)
    a48 = jnp.tile(a3, 16)
    bp48 = a48 * 128.0 + jnp.tile(b3, 16)  # normalize(128) per channel

    w2 = _stem_weight_im2col(w7, jnp.float32)  # [432, 256]
    wfold = w2 * jnp.tile(a48, 9)[:, None]
    wq, sw = quantize_weight(wfold)
    s_bn = jnp.tile(jnp.asarray(scale, jnp.float32).reshape(64), 4)
    b_bn = jnp.tile(jnp.asarray(bias, jnp.float32).reshape(64), 4)
    sv = (sw * s_bn).reshape(1, 256)
    # wb rows 0..8: tap t's bias contribution sum_ch w2[t*48+ch, :] *
    # normalize(128)[ch], BN-scaled; row 9: the BN bias
    wb9 = jnp.einsum("tkc,k->tc", w2.reshape(9, 48, 256), bp48) * s_bn
    wb = jnp.zeros((16, 256), jnp.float32)
    wb = wb.at[:9].set(wb9).at[9].set(b_bn)

    g = 4
    while nt % g:
        g //= 2
    out = pl.pallas_call(
        functools.partial(_stem_kernel_i8, zbuild=zbuild),
        out_shape=jax.ShapeDtypeStruct((nt, n, n, 64), out_dtype),
        grid=(nt // g,),
        in_specs=[
            pl.BlockSpec((g, n, n, 48), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((432, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, n, n, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(s4, wq, sv, wb)
    return out


def bn_relu_maxpool_reference(x, scale, bias):
    """Pure-XLA reference (tests + non-TPU fallback): torch-semantics
    MaxPool2d(3, 2, padding=1) on relu(x*scale+bias)."""
    y = jnp.maximum(x * scale + bias, 0).astype(x.dtype)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ).astype(x.dtype)
