"""Pallas TPU kernels: TRAINING-mode fused ResNet-TSM bottleneck.

The inference whole-block kernels (ops/tsm_block_pallas.py) cannot be used
under grad: they fold BatchNorm into precomputed scale/bias, but training
BN normalizes with the CURRENT batch's statistics, which depend on the
very conv outputs the kernel is fusing — a one-pass whole-block kernel is
mathematically impossible with batch-stat BN. The reference trains with
exactly those semantics (torch BatchNorm in train mode) and hand-writes an
in-place autograd Function purely to make the temporal shift's *training*
memory cheap (/root/reference/video_chapter_generation/ops/
temporal_shift.py:54-81). This module is the TPU-native answer for the
training path, superseding the 3-tap-conv fallback that paid 3x conv1
input reads and left BN reductions as separate XLA passes (PERF.md
round-3 training profile: conv fusions ~52%, BN reduce+copies ~12%, tap3
fusions ~22%).

Design — three fused kernels per direction with full-batch stat barriers
between them (the minimum legal structure):

Variants: plain stride-1 (tsm_bottleneck_train), stride-1 projection
(tsm_bottleneck_proj_train, layer1 block0 — the projection 1x1 rides in
the conv1 kernels) and stride-2 projection (tsm_bottleneck_s2_train,
layers 2-4 block0 — stride-2 selections use the inference kernels'
pair-merge constructions; the conv-transpose emits planar even/odd
column outputs that ONE XLA reshape interleaves). Together they cover
all 16 ResNet50 bottlenecks.

forward (per stride-1 non-projection bottleneck):
  FK1  u = conv1(tshift(x))                 + accumulate (sum u, sum u^2)
  FK2  z = conv2_3x3(relu(bn1-apply(u)))    + accumulate moments of z
  FK3  p = conv3(relu(bn2-apply(z)))        + accumulate moments of p
  XLA  y = relu(bn3-apply(p) + x)           (elementwise; XLA fuses)
BN apply uses scale/bias vectors finalized from the accumulated moments
between kernels (tiny [F]-sized XLA math) — the batch-stat reductions ride
along inside the conv kernels' epilogues instead of re-reading the conv
outputs from HBM.

backward (jax.custom_vjp; residuals = x, u, z, p, y + the batch stats):
  XLA  dq = dy * (y>0); BN3 backward moments (one fused pass)
  BK3  dp = bn3-bwd-apply; da2 = (dp @ w3^T) * relu'(y2)
       + accumulate dw3 = y2^T dp and the BN2 backward moments
  BK2  dz = bn2-bwd-apply; da1 = conv2^T(dz) * relu'(y1)
       + accumulate dw2 (9-tap im2col-transpose dots) and BN1 moments
  BK1  du = bn1-bwd-apply; dx = untshift(du @ w1^T) + dq
       + accumulate dw1 = tshift(x)^T du
BN backward needs two batch reductions of the incoming gradient BEFORE it
can be applied, so each BK kernel computes the NEXT stage's reduction in
its epilogue (it already holds the tensors), leaving only scalar math
between kernels.

Tiling: grid (batch, row_tiles); blocks are 4-D [1, T, R, Wp, C] with the
block width sublane-padded (Wp = ceil(W/8)*8, ragged blocks) so every
[T,R,Wp,C] <-> [M,C] reshape around a dot is relayout-free at ALL ResNet50
widths (56/28/14/7) — the same trick as the inference flat kernels, but
row-tiled, which also covers layer1 (whose samples exceed VMEM). The 3x3
taps read +-1 halo rows supplied as clamped 1-row blocks (zeroed at true
image edges = SAME zero padding; for the transposed conv in BK2 the same
zeroing is the transpose of SAME padding). All accumulators (moments [2,F],
weight grads) are f32 outputs with constant index maps, initialized on the
first grid step and accumulated across the sequential TPU grid
(dimension_semantics "arbitrary").

Numerics match the standard flax path (nn.BatchNorm: biased batch var,
eps 1e-5, stats in f32, bn output cast to the compute dtype before the
residual add): tests/test_tsm_block_train_pallas.py checks forward, grads
and stats against jax.grad of a pure-XLA reference at f32, plus the model-
level path against the tap3 training stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(w: int) -> int:
    return -(-w // 8) * 8


FORCE_ROWS = None  # test hook: force every kernel's row-tile size


def _rows_divisor(h: int, bytes_per_row: int,
                  budget: int = 24 * 1024 * 1024) -> int:
    """Largest divisor of h whose tile fits the VMEM budget."""
    if FORCE_ROWS is not None:
        assert h % FORCE_ROWS == 0, (h, FORCE_ROWS)
        return FORCE_ROWS
    rows = max(1, min(h, budget // max(bytes_per_row, 1)))
    while h % rows:
        rows -= 1
    return rows


def _rows_divisor_even(h: int, bytes_per_row: int,
                       budget: int = 24 * 1024 * 1024) -> int:
    """Largest EVEN divisor of h in budget (stride-2 kernels split row
    tiles into even/odd planes; h is even for every stride-2 block)."""
    assert h % 2 == 0, h
    rows = _rows_divisor(h, bytes_per_row, budget)
    if FORCE_ROWS is not None:
        assert rows % 2 == 0, (h, rows)  # stride-2 tiles split row pairs
        return rows
    while rows % 2:
        rows -= 1
        while h % rows:
            rows -= 1
    return rows


def _first_step():
    return jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)


def _col_lt(shape_w: int, wt: int):
    """[1,1,Wp,1] mask of true (non-pad) columns."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, shape_w, 1), 2)
    return col < wt


def _moments(v4, wt, m_ref):
    """Accumulate masked f32 (sum, sum^2) of v4 [T,R,Wp,F] into m_ref
    [2,F]."""
    t, r, wp, f = v4.shape
    vm = jnp.where(_col_lt(wp, wt), v4.astype(jnp.float32), 0.0)
    v2 = vm.reshape(t * r * wp, f)
    s = jnp.sum(v2, axis=0, keepdims=True)
    s2 = jnp.sum(v2 * v2, axis=0, keepdims=True)

    @pl.when(_first_step())
    def _init():
        m_ref[:] = jnp.zeros_like(m_ref)

    m_ref[:] += jnp.concatenate([s, s2], axis=0)


def _acc_init(ref):
    @pl.when(_first_step())
    def _init():
        ref[:] = jnp.zeros_like(ref)


def _tshift_diff(x4, fold: int):
    """Temporal pair-diff d [T,R,Wp,2*fold]: lanes [0,fold) need the NEXT
    frame, lanes [fold,2fold) the PREVIOUS (zero at clip edges); d is the
    correction conv1 adds on the first 2*fold input channels
    (tsm_conv_pallas.py _kernel_correction algebra)."""
    t = x4.shape[0]
    x2 = x4[..., : 2 * fold]
    z2 = jnp.zeros_like(x2[:1])
    nxt = jnp.concatenate([x2[1:], z2], axis=0)
    prv = jnp.concatenate([z2, x2[: t - 1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * fold), 3)
    return (jnp.where(lane < fold, nxt, prv) - x2).astype(x4.dtype)


def _dotT(a2, b2):
    """[M,A]^T @ [M,B] -> [A,B] f32 (contraction on the leading dim)."""
    return jax.lax.dot_general(
        a2, b2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _im2col_w(src):
    """Width-im2col of src [T,R+2,Wp,F] (pad columns ZEROED by the
    caller) -> [T, R+2, Wp, 3F] (dc-major lanes: left, center, right)."""
    t, r2, wp, f = src.shape
    zcol = jnp.zeros((t, r2, 1, f), src.dtype)
    return jnp.concatenate(
        [
            jnp.concatenate([zcol, src[:, :, :-1]], axis=2),
            src,
            jnp.concatenate([src[:, :, 1:], zcol], axis=2),
        ],
        axis=-1,
    )


def _conv2_taps(zc, w2_ref, r):
    """SAME 3x3 conv from the im2col tensor zc [T,R+2,Wp,3F] with w2_ref
    [3, 3F, F] (dr-major, dc-major K): 3 row-ranged dots -> f32
    [T*R*Wp, F]."""
    t, r2, wp, f3 = zc.shape
    m = t * r * wp
    acc = jnp.dot(zc[:, 1 : r + 1].reshape(m, f3), w2_ref[1],
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(zc[:, :r].reshape(m, f3), w2_ref[0],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(zc[:, 2 : r + 2].reshape(m, f3), w2_ref[2],
                   preferred_element_type=jnp.float32)
    return acc


def _bn_apply_relu(v4, sa_ref, sb_ref, dt):
    """relu(sa*v + sb) in f32, cast to dt (flax BatchNorm promotes to f32
    and casts the normalized output back to the compute dtype)."""
    y = v4.astype(jnp.float32) * sa_ref[0] + sb_ref[0]
    return jnp.maximum(y, 0.0).astype(dt)


def _gt0(x):
    """x > 0 computed in f32: Mosaic/v5e has no bf16 vector compare
    ("Target does not support this comparison", arith.cmpf on a packed
    8x128x2 bf16 vector — caught by tools/aot_compile.py); the bf16->f32
    upcast is exact so the mask is unchanged."""
    return x.astype(jnp.float32) > 0.0


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _merge_pairs(v4, wq):
    """Pair-merge adjacent columns of a NATURAL-layout [T,R,Wp,F] tensor
    (Wp even) into the planar form [T,R,Wp/2,2F] (lanes [0,F) = even
    columns, [F,2F) = odd), zero-padded on the merged width up to the
    block width wq. The merge is the Mosaic-legal direction (FROM a
    natural layout); the result is never reshaped again."""
    t, r, wp, f = v4.shape
    mw = wp // 2
    vm = v4.reshape(t * r * wp, f).reshape(t * r * mw, 2 * f)
    vm4 = vm.reshape(t, r, mw, 2 * f)
    if wq > mw:
        vm4 = jnp.concatenate(
            [vm4, jnp.zeros((t, r, wq - mw, 2 * f), vm4.dtype)], axis=2)
    return vm4


def _untshift(dxm4, fold: int, dt):
    """Transpose of the temporal shift: lanes [0,fold) read x[t+1] in the
    forward, so their dx[t] receives the cotangent's t-1 slot (and vice
    versa for lanes [fold,2fold)); remaining lanes pass through."""
    t = dxm4.shape[0]
    x2 = dxm4[..., : 2 * fold]
    z2 = jnp.zeros_like(x2[:1])
    prv = jnp.concatenate([z2, x2[: t - 1]], axis=0)
    nxt = jnp.concatenate([x2[1:], z2], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * fold), 3)
    sh = jnp.where(lane < fold, prv, nxt).astype(dt)
    return jnp.concatenate([sh, dxm4[..., 2 * fold :].astype(dt)], axis=-1)


def _fk1(*refs, fold: int, wt: int, proj: bool = False,
         s2: bool = False, prev: str = ""):
    """u = conv1(tshift(x)) + moments. x_ref [1,T,R,Wp,C] ->
    u_ref [1,T,R,Wp,F], m_ref [2,F] f32 accumulator. With proj, x feeds
    a second 1x1 (the projection residual) in the same kernel — x is
    only read from HBM once for both convs: extra wp_ref [C,Cp] in,
    pr_ref + mp_ref [2,Cp] out. s2 makes that projection the STRIDE-2
    1x1 (layers 2-4 block0): even rows via the untiled split, even
    columns via one natural-layout pair merge + lane slice (the proven
    tsm_block_pallas._kernel_s2 construction); pr_ref is then the
    half-resolution [1,T,R/2,Wq,Cp] block (R even).

    prev (trunk mode, tsm_trunk_train_pallas.py): instead of reading
    this block's input x from HBM, COMPUTE it as the PREVIOUS block's
    finale y = relu(bn3(p) + r) from pp_ref/rr_ref tiles — "plain"
    takes r raw (identity residual), "proj" applies the projection BN
    affine — and write it out (y_ref) so the backward and the residual
    chain read the materialized input. This fuses the former XLA finale
    into the kernel and removes the f32 convert of p that XLA
    materialized between the finale and the backward moment reduce
    (PERF.md round 3: ~0.85 ms per plain block at B=4)."""
    i = 0
    if prev:
        pp_ref, rr_ref, sa3_ref, sb3_ref = refs[:4]
        i = 4
        if prev == "proj":
            sap_ref, sbp_ref = refs[4:6]
            i = 6
    else:
        x_ref = refs[0]
        i = 1
    w1_ref = refs[i]
    i += 1
    if proj:
        wp_ref = refs[i]
        i += 1
    if prev:
        y_ref = refs[i]
        i += 1
    u_ref = refs[i]
    i += 1
    if proj:
        pr_ref = refs[i]
        i += 1
    m_ref = refs[i]
    i += 1
    if proj:
        mp_ref = refs[i]
    f = w1_ref.shape[1]
    dt = u_ref.dtype
    if prev:
        t, r, wp, c = pp_ref.shape[1:]
        # previous block's finale, bit-matching the former XLA chain:
        # bn3 affine in f32 cast to dt, residual add + relu exact in f32
        a3 = (pp_ref[0].astype(jnp.float32) * sa3_ref[0]
              + sb3_ref[0]).astype(dt)
        if prev == "proj":
            rr = (rr_ref[0].astype(jnp.float32) * sap_ref[0]
                  + sbp_ref[0]).astype(dt)
        else:
            rr = rr_ref[0]
        x = jnp.maximum(a3.astype(jnp.float32) + rr.astype(jnp.float32),
                        0.0).astype(dt)
        y_ref[0] = x
    else:
        t, r, wp, c = x_ref.shape[1:]
        x = x_ref[0]
    m = t * r * wp
    acc = jnp.dot(x.reshape(m, c), w1_ref[:],
                  preferred_element_type=jnp.float32)
    d = _tshift_diff(x, fold)
    acc += jnp.dot(d.reshape(m, 2 * fold), w1_ref[: 2 * fold],
                   preferred_element_type=jnp.float32)
    u4 = acc.astype(dt).reshape(t, r, wp, f)
    u_ref[0] = u4
    _moments(u4, wt, m_ref)
    if proj and s2:
        cp = wp_ref.shape[1]
        rr, mw = r // 2, wp // 2
        xe = x.reshape(t, rr, 2, wp, c)[:, :, 0]  # even rows
        xpe = xe.reshape(t * rr * wp, c).reshape(
            t * rr * mw, 2 * c)[:, :c]  # even columns (lane slice)
        pr = jnp.dot(xpe, wp_ref[:], preferred_element_type=jnp.float32)
        pr4 = pr.astype(dt).reshape(t, rr, mw, cp)
        wq = pr_ref.shape[3]
        if wq > mw:
            pr4 = jnp.concatenate(
                [pr4, jnp.zeros((t, rr, wq - mw, cp), dt)], axis=2)
        pr_ref[0] = pr4
        _moments(pr4, wt // 2, mp_ref)
    elif proj:
        cp = wp_ref.shape[1]
        pr = jnp.dot(x.reshape(m, c), wp_ref[:],
                     preferred_element_type=jnp.float32)
        pr4 = pr.astype(dt).reshape(t, r, wp, cp)
        pr_ref[0] = pr4
        _moments(pr4, wt, mp_ref)


def _fk2(u_ref, top_ref, bot_ref, sa_ref, sb_ref, w2_ref, z_ref, m_ref,
         *, wt: int):
    """z = conv2_3x3(relu(bn1-apply(u))) + moments. Halo rows as clamped
    1-row blocks, zeroed (in y1 space) at the true image edges."""
    t, r, wp, f = u_ref.shape[1:]
    dt = z_ref.dtype
    j = pl.program_id(1)
    n = pl.num_programs(1)
    cmask = _col_lt(wp, wt)

    def y1(part):
        v = _bn_apply_relu(part, sa_ref, sb_ref, dt)
        return jnp.where(cmask, v, 0.0).astype(dt)

    topm = jnp.where(j == 0, 0.0, 1.0).astype(dt)
    botm = jnp.where(j == n - 1, 0.0, 1.0).astype(dt)
    y1e = jnp.concatenate(
        [topm * y1(top_ref[0]), y1(u_ref[0]), botm * y1(bot_ref[0])],
        axis=1,
    )  # [T, R+2, Wp, F]
    acc = _conv2_taps(_im2col_w(y1e), w2_ref, r)
    z4 = acc.astype(dt).reshape(t, r, wp, f)
    z_ref[0] = z4
    _moments(z4, wt, m_ref)


def _fk2_s2(u_ref, top_ref, sa_ref, sb_ref, w2_ref, z_ref, m_ref,
            *, wt: int):
    """Stride-2 FK2: z = conv2_3x3/s2(relu(bn1-apply(u))) + moments.

    u_ref [1,T,2R,Wp,F] = the input rows feeding out-rows [jR,(j+1)R);
    top_ref [1,T,1,Wp,F] = input row 2jR-1 (clamped; zeroed at j==0);
    z_ref [1,T,R,Wq,F] half-resolution. Out row r reads input rows
    2r-1..2r+1 and out col q reads input cols 2q-1..2q+1 (pad 1, k=3,
    s=2). Column selection uses the pair-merge construction proven in
    tsm_block_pallas._kernel_s2 'pair' mode: every tap of a true output
    reads true columns only."""
    t, r2, wp, f = u_ref.shape[1:]
    ro = r2 // 2
    dt = z_ref.dtype
    cmask = _col_lt(wp, wt)

    def y1(part):
        v = _bn_apply_relu(part, sa_ref, sb_ref, dt)
        return jnp.where(cmask, v, 0.0).astype(dt)

    j = pl.program_id(1)
    topm = jnp.where(j == 0, 0.0, 1.0).astype(dt)
    y1e = jnp.concatenate([topm * y1(top_ref[0]), y1(u_ref[0])], axis=1)
    # [T, 2R+1, Wp, F]; index k = input row 2jR + k - 1
    ye = y1e[:, : 2 * ro].reshape(t, ro, 2, wp, f)
    taps = (
        ye[:, :, 0],  # dr=0: input rows 2r-1
        ye[:, :, 1],  # dr=1: rows 2r
        (jnp.concatenate([ye[:, 1:, 0], y1e[:, 2 * ro : 2 * ro + 1]],
                         axis=1)
         if ro > 1 else y1e[:, 2 : 3]),  # dr=2: rows 2r+1
    )
    mw = wp // 2
    m2 = t * ro * mw
    col0 = (jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) % mw) == 0
    zero_row = jnp.zeros((1, 2 * f), dt)
    acc = jnp.zeros((m2, f), jnp.float32)
    for dr in (1, 0, 2):
        v = taps[dr].reshape(t * ro * wp, f).reshape(m2, 2 * f)
        vprev = jnp.concatenate([zero_row, v[:-1]], axis=0)
        tap_l = jnp.where(col0, 0.0, vprev[:, f:]).astype(dt)
        z2 = jnp.concatenate([tap_l, v], axis=-1)  # [M2,3F] = (L,C,R)
        acc += jnp.dot(z2, w2_ref[dr], preferred_element_type=jnp.float32)
    z4 = acc.astype(dt).reshape(t, ro, mw, f)
    wq = z_ref.shape[3]
    if wq > mw:
        z4 = jnp.concatenate(
            [z4, jnp.zeros((t, ro, wq - mw, f), dt)], axis=2)
    z_ref[0] = z4
    _moments(z4, wt // 2, m_ref)


def _fk3(z_ref, sa_ref, sb_ref, w3_ref, p_ref, m_ref, *, wt: int):
    """p = conv3(relu(bn2-apply(z))) + moments."""
    t, r, wp, f = z_ref.shape[1:]
    c_out = w3_ref.shape[1]
    dt = p_ref.dtype
    y2 = _bn_apply_relu(z_ref[0], sa_ref, sb_ref, dt)
    m = t * r * wp
    acc = jnp.dot(y2.reshape(m, f), w3_ref[:],
                  preferred_element_type=jnp.float32)
    p4 = acc.astype(dt).reshape(t, r, wp, c_out)
    p_ref[0] = p4
    _moments(p4, wt, m_ref)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bk3(dq_ref, z_ref, a3_ref, e3_ref, f3_ref, sa2_ref, sb2_ref,
         mu2_ref, w3t_ref, da2_ref, dw3_ref, m_ref, *, wt: int):
    """dp = bn3-bwd-apply(dq, p); da2 = (dp @ w3^T) * relu'(y2);
    accumulate dw3 = y2^T dp and BN2 backward moments (sum da2,
    sum da2*(z-mu2) — centered).

    p is NOT read from HBM: it is recomputed in-kernel as y2 @ w3 from
    the z tile that is already resident for dw3/y2 (same operands and
    accumulation as the forward FK3 dot, so f32 runs are bit-identical;
    bf16 runs use the pre-cast f32 value the forward rounded). This
    removes a 4F-channel input pass per block and lets the trunk drop p
    from its saved residuals entirely (tsm_trunk_train_pallas.py)."""
    t, r, wp, c_out = dq_ref.shape[1:]
    f = w3t_ref.shape[1]
    dt = da2_ref.dtype
    m = t * r * wp
    cmask = _col_lt(wp, wt)

    zm = jnp.where(cmask, z_ref[0], 0.0).astype(dt)
    y2 = _bn_apply_relu(zm, sa2_ref, sb2_ref, dt)
    y2 = jnp.where(cmask, y2, 0.0).astype(dt)  # pad cols: relu(sb2) != 0

    pf = jax.lax.dot_general(
        y2.reshape(m, f), w3t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [m, c_out] = y2 @ w3
    dp = (dq_ref[0].astype(jnp.float32) * a3_ref[0]
          + pf.reshape(t, r, wp, c_out) * e3_ref[0] + f3_ref[0])
    dp = jnp.where(cmask, dp, 0.0)
    dpb = dp.astype(dt).reshape(m, c_out)

    dy2 = jnp.dot(dpb, w3t_ref[:], preferred_element_type=jnp.float32)
    da2 = jnp.where(_gt0(y2.reshape(m, f)), dy2, 0.0).astype(dt)
    da2_ref[0] = da2.reshape(t, r, wp, f)

    _acc_init(dw3_ref)
    dw3_ref[:] += _dotT(y2.reshape(m, f), dpb)

    da2f = da2.astype(jnp.float32)
    # centered product (da2f is exactly 0 at pad columns, and zm was
    # masked, so pad contributions are 0*(-mu2) = 0)
    zc32 = zm.reshape(m, f).astype(jnp.float32) - mu2_ref[0]
    s = jnp.sum(da2f, axis=0, keepdims=True)
    s1 = jnp.sum(da2f * zc32, axis=0, keepdims=True)
    _acc_init(m_ref)
    m_ref[:] += jnp.concatenate([s, s1], axis=0)


def _bk2(da2_ref, t_da2, b_da2, z_ref, t_z, b_z, u_ref, t_u, b_u,
         a2_ref, e2_ref, f2_ref, sa1_ref, sb1_ref, mu1_ref, w2b_ref,
         da1_ref, dw2_ref, m_ref, *, wt: int):
    """dz = bn2-bwd-apply(da2, z); da1 = conv2^T(dz) * relu'(y1);
    accumulate dw2[dr] = im2col(y1)[rows dr:dr+R]^T dz and BN1 backward
    moments. conv2^T is a SAME conv of dz with the flipped-transposed taps
    (w2b[dr,dc] = w2[2-dr,2-dc]^T, packed [3,3F,F] like the forward); its
    zero padding is the transpose of the forward's SAME padding, so halo
    rows are zeroed at true image edges exactly as in FK2."""
    t, r, wp, f = da2_ref.shape[1:]
    dt = da1_ref.dtype
    j = pl.program_id(1)
    n = pl.num_programs(1)
    m = t * r * wp
    cmask = _col_lt(wp, wt)
    topm = jnp.where(j == 0, 0.0, 1.0).astype(dt)
    botm = jnp.where(j == n - 1, 0.0, 1.0).astype(dt)

    def ext(tile_ref, top_ref, bot_ref, fn):
        return jnp.concatenate(
            [topm * fn(top_ref[0]), fn(tile_ref[0]), botm * fn(bot_ref[0])],
            axis=1,
        )

    def dz_of(da2p, zp):
        v = (da2p.astype(jnp.float32) * a2_ref[0]
             + zp.astype(jnp.float32) * e2_ref[0] + f2_ref[0])
        return jnp.where(cmask, v, 0.0).astype(dt)

    # dz on tile + halos (halo rows are real rows except at image edges,
    # where dz is zero — the conv-transpose's padding)
    dze = jnp.concatenate(
        [
            topm * dz_of(t_da2[0], t_z[0]),
            dz_of(da2_ref[0], z_ref[0]),
            botm * dz_of(b_da2[0], b_z[0]),
        ],
        axis=1,
    )  # [T, R+2, Wp, F]

    def y1_of(up):
        v = _bn_apply_relu(up, sa1_ref, sb1_ref, dt)
        return jnp.where(cmask, v, 0.0).astype(dt)

    y1e = ext(u_ref, t_u, b_u, y1_of)  # [T, R+2, Wp, F]

    # data grad: SAME conv of dz with the flipped-transposed taps
    acc = _conv2_taps(_im2col_w(dze), w2b_ref, r)
    y1 = y1e[:, 1 : r + 1].reshape(m, f)
    da1 = jnp.where(_gt0(y1), acc, 0.0).astype(dt)
    da1_ref[0] = da1.reshape(t, r, wp, f)

    # weight grad: dw2[dr] = zc(y1_ext)[:, dr:dr+R]^T @ dz_tile
    zc_y = _im2col_w(y1e)
    dzb = dze[:, 1 : r + 1].reshape(m, f)
    _acc_init(dw2_ref)
    for dr in range(3):
        dw2_ref[dr] += _dotT(zc_y[:, dr : dr + r].reshape(m, 3 * f), dzb)

    da1f = da1.astype(jnp.float32)
    # centered (da1f is exactly 0 at pad columns)
    um = jnp.where(cmask, u_ref[0], 0.0).astype(jnp.float32).reshape(m, f)
    s = jnp.sum(da1f, axis=0, keepdims=True)
    s1 = jnp.sum(da1f * (um - mu1_ref[0]), axis=0, keepdims=True)
    _acc_init(m_ref)
    m_ref[:] += jnp.concatenate([s, s1], axis=0)


def _bk2_s2(da2_ref, b_da2, z_ref, b_z, u_ref, t_u, a2_ref, e2_ref,
            f2_ref, sa1_ref, sb1_ref, mu1d_ref, w2c_ref, w2l_ref,
            da1_ref, dw2_ref, m_ref, *, wt: int):
    """Stride-2 BK2: dz = bn2-bwd-apply(da2, z) (half-res); da1 =
    conv2/s2^T(dz) * relu'(y1) (FULL-res, stored in the PLANAR column
    form [1,T,2R,Wq,2F]: lanes [0,F) = even columns, [F,2F) = odd — the
    zero-interleave a strided scatter would need is Mosaic-illegal, so
    the column interleave is ONE XLA reshape outside); accumulate
    dw2[dr,dc] = y1[2r+dr-1, 2q+dc-1]^T dz[r,q] and the BN1 backward
    moments (per PLANE [2,2F]; the wrapper folds the two lane groups).

    Transpose placement: full row 2k gets dz[k] @ w2[1,:]^T; full row
    2k+1 gets dz[k] @ w2[2,:]^T + dz[k+1] @ w2[0,:]^T (bottom halo row,
    zeroed at the true image bottom — the conv-transpose's padding).
    Even columns take dc=1; odd column 2q+1 takes dc=2 at q plus dc=0 at
    q+1 (a half-res column shift; zero past the true right edge by the
    dz column mask). w2c_ref [3,F,2F] = [w2[dr,1]^T | w2[dr,2]^T];
    w2l_ref [3,F,F] = w2[dr,0]^T."""
    t, ro, wq, f = da2_ref.shape[1:]
    wp = u_ref.shape[3]
    r2 = 2 * ro
    dt = da1_ref.dtype
    j = pl.program_id(1)
    n = pl.num_programs(1)
    wo_t = wt // 2
    cmask_h = _col_lt(wq, wo_t)
    cmask_f = _col_lt(wp, wt)

    def dz_of(da2p, zp):
        v = (da2p.astype(jnp.float32) * a2_ref[0]
             + zp.astype(jnp.float32) * e2_ref[0] + f2_ref[0])
        return jnp.where(cmask_h, v, 0.0).astype(dt)

    botm = jnp.where(j == n - 1, 0.0, 1.0).astype(dt)
    dze = jnp.concatenate(
        [dz_of(da2_ref[0], z_ref[0]), botm * dz_of(b_da2[0], b_z[0])],
        axis=1)  # [T, R+1, Wq, F]; index k = half-res out row jR + k

    me = t * (ro + 1) * wq
    dzf = dze.reshape(me, f)
    # half-res column shift: col q reads dz col q+1 (zero past the right
    # edge — dze is masked to the true half width)
    dzs = jnp.concatenate(
        [dze[:, :, 1:], jnp.zeros((t, ro + 1, 1, f), dt)],
        axis=2).reshape(me, f)
    planes = []
    for dr in range(3):
        a = jnp.dot(dzf, w2c_ref[dr], preferred_element_type=jnp.float32)
        bv = jnp.dot(dzs, w2l_ref[dr], preferred_element_type=jnp.float32)
        a4 = a.reshape(t, ro + 1, wq, 2 * f)
        b4 = bv.reshape(t, ro + 1, wq, f)
        planes.append(
            jnp.concatenate([a4[..., :f], a4[..., f:] + b4], axis=-1))
    pe = planes[1][:, :ro]                      # full rows 2k
    po = planes[2][:, :ro] + planes[0][:, 1:]   # full rows 2k+1
    pf = jnp.concatenate(
        [pe.reshape(t, ro, 1, wq, 2 * f),
         po.reshape(t, ro, 1, wq, 2 * f)], axis=2
    ).reshape(t, r2, wq, 2 * f)  # f32 planar, full rows

    def y1_of(upart):
        v = _bn_apply_relu(upart, sa1_ref, sb1_ref, dt)
        return jnp.where(cmask_f, v, 0.0).astype(dt)

    topm = jnp.where(j == 0, 0.0, 1.0).astype(dt)
    y1e = jnp.concatenate([topm * y1_of(t_u[0]), y1_of(u_ref[0])], axis=1)
    # [T, 2R+1, Wp, F]; index k = full row 2jR + k - 1
    y1m = _merge_pairs(y1e[:, 1:], wq)  # the tile's own rows, planar
    da1 = jnp.where(_gt0(y1m), pf, 0.0)   # f32
    da1_ref[0] = da1.astype(dt)

    # BN1 backward moments, per plane (the wrapper folds lane groups)
    um = _merge_pairs(
        jnp.where(cmask_f, u_ref[0], 0.0).astype(dt), wq)
    # sums reduce in 4-d: da1/um carry the merged (1,128) layout and a
    # merged value must never be reshaped (tools/aot_compile.py)
    s = jnp.sum(da1, axis=(0, 1, 2))[None]
    s1 = jnp.sum(da1 * (um.astype(jnp.float32) - mu1d_ref[0]),
                 axis=(0, 1, 2))[None]
    _acc_init(m_ref)
    m_ref[:] += jnp.concatenate([s, s1], axis=0)

    # dw2[dr] = [sel_L | sel_C | sel_R]^T dz with sel_dc = y1 at rows
    # 2r+dr-1, cols 2q+dc-1 — row taps from the halo-extended planar y1,
    # column taps as plane slices (dc=0 = odd plane shifted down one
    # half-res column, zero at q=0)
    # row taps split on the NATURAL-layout y1e FIRST, then each tap
    # pair-merges straight to 2-d (the forward _fk2_s2 pattern): a
    # pair-merged value must never be reshaped (Mosaic "Invalid input
    # layout" on tpu.reshape of a (1,128)-layout vector, caught by
    # tools/aot_compile.py), so merged values are consumed by lane
    # slices, row shifts and dots only
    ye = y1e[:, : 2 * ro].reshape(t, ro, 2, wp, f)
    nat_taps = (
        ye[:, :, 0],  # full rows 2r-1
        ye[:, :, 1],  # rows 2r
        (jnp.concatenate([ye[:, 1:, 0], y1e[:, 2 * ro : 2 * ro + 1]],
                         axis=1)
         if ro > 1 else y1e[:, 2 : 3]),  # rows 2r+1
    )
    m2 = t * ro * wq
    dzb = dze[:, :ro].reshape(m2, f)
    col0 = (jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) % wq) == 0
    zero_row = jnp.zeros((1, f), dt)
    _acc_init(dw2_ref)
    for dr in range(3):
        v4 = nat_taps[dr]
        if 2 * wq > wp:  # pad the NATURAL width so merged half == wq
            v4 = jnp.concatenate(
                [v4, jnp.zeros((t, ro, 2 * wq - wp, f), dt)], axis=2)
        vm = v4.reshape(t * ro * 2 * wq, f).reshape(m2, 2 * f)
        ev, od = vm[:, :f], vm[:, f:]
        # dc=0 tap: odd column of half-res col q-1 (zero at q == 0)
        odm = jnp.where(
            col0, 0.0,
            jnp.concatenate([zero_row, od[:-1]], axis=0)).astype(dt)
        sel = jnp.concatenate([odm, ev, od], axis=-1)  # (L, C, R)
        dw2_ref[dr] += _dotT(sel, dzb)


def _bk1(da1_ref, u_ref, x_ref, dq_ref, *refs, fold: int, wt: int,
         proj: bool = False, prev: str = ""):
    """du = bn1-bwd-apply(da1, u); dx = untshift(du @ w1^T) + dq (plain:
    the identity residual grad) or + (bnp-bwd-apply(dq, pr) @ wp^T)
    (projection residual); accumulate dw1 = tshift(x)^T du (= x^T du +
    pair-diff correction on the first 2*fold rows — the transpose of the
    forward's correction dot) and, with proj, dwp = x^T dpr.

    prev (trunk mode): this block's dx IS the previous block's dy, and x
    (this block's input) is the previous block's relu output — so the
    epilogue applies the previous finale's relu mask (dq_prev =
    where(x>0, dx, 0), stored in dx_ref) and accumulates the previous
    BN3 (and projection BN) backward moment sums into mprev_ref
    ([2|3, C] f32: sum dq, sum dq*(p_prev-mu3), [sum dq*(pr_prev-mup)]),
    replacing the former XLA convert+reduce pass over three 4F tensors
    (PERF.md round 3: 15 ms of the B=4 step). p_prev is NOT read: it is
    recomputed from the previous block's z tile (an F-channel read + the
    forward FK3 dot, replacing a 4F read), and for a projection previous
    block pr_prev is recovered by inverting the finale (rr = y - bn3(p)
    where y = x > 0; dq is 0 elsewhere so only those sites contribute) —
    dropping BOTH 4F-channel residual tensors from the trunk's saves."""
    assert not (proj and prev)
    if proj:
        (pr_ref, a1_ref, e1_ref, f1_ref, ap_ref, ep_ref, fp_ref,
         w1t_ref, wpt_ref, dx_ref, dw1_ref, dwp_ref) = refs
    elif prev == "proj":
        (zp_ref, a1_ref, e1_ref, f1_ref, sa2p_ref, sb2p_ref, mu3p_ref,
         sa3p_ref, sb3p_ref, mupp_ref, w1t_ref, w3p_ref,
         dx_ref, dw1_ref, mprev_ref) = refs
    elif prev == "plain":
        (zp_ref, a1_ref, e1_ref, f1_ref, sa2p_ref, sb2p_ref, mu3p_ref,
         w1t_ref, w3p_ref, dx_ref, dw1_ref, mprev_ref) = refs
    else:
        a1_ref, e1_ref, f1_ref, w1t_ref, dx_ref, dw1_ref = refs
    t, r, wp, f = da1_ref.shape[1:]
    c = x_ref.shape[4]
    dt = dx_ref.dtype
    m = t * r * wp
    cmask = _col_lt(wp, wt)

    du = (da1_ref[0].astype(jnp.float32) * a1_ref[0]
          + u_ref[0].astype(jnp.float32) * e1_ref[0] + f1_ref[0])
    du = jnp.where(cmask, du, 0.0)
    dub = du.astype(dt).reshape(m, f)

    dxm = jnp.dot(dub, w1t_ref[:], preferred_element_type=jnp.float32)
    dxm4 = dxm.astype(dt).reshape(t, r, wp, c)
    # transpose of the temporal shift: lanes [0,fold) read x[t+1] in the
    # forward, so their dx[t] receives du[t-1] (and vice versa for lanes
    # [fold,2fold)); remaining lanes pass through.
    x2 = dxm4[..., : 2 * fold]
    z2 = jnp.zeros_like(x2[:1])
    prv = jnp.concatenate([z2, x2[: t - 1]], axis=0)
    nxt = jnp.concatenate([x2[1:], z2], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * fold), 3)
    sh = jnp.where(lane < fold, prv, nxt).astype(dt)
    dx4 = jnp.concatenate([sh, dxm4[..., 2 * fold :]], axis=-1)

    xm = jnp.where(cmask, x_ref[0], 0.0).astype(dt)
    if proj:
        cp = dq_ref.shape[4]
        dpr = (dq_ref[0].astype(jnp.float32) * ap_ref[0]
               + pr_ref[0].astype(jnp.float32) * ep_ref[0] + fp_ref[0])
        dpr = jnp.where(cmask, dpr, 0.0)
        dprb = dpr.astype(dt).reshape(m, cp)
        dres = jnp.dot(dprb, wpt_ref[:],
                       preferred_element_type=jnp.float32)
        dx_ref[0] = dx4 + dres.astype(dt).reshape(t, r, wp, c)
        _acc_init(dwp_ref)
        dwp_ref[:] += _dotT(xm.reshape(m, c), dprb)
    elif prev:
        # trunk epilogue: relu-mask dx into the previous block's dq and
        # accumulate its BN3/BNp backward moment sums (xm pad columns
        # are zeroed, so the mask kills pad contributions exactly)
        out = dx4 + dq_ref[0]
        outf = jnp.where(_gt0(xm), out.astype(jnp.float32), 0.0)
        dx_ref[0] = outf.astype(dt)
        dq2 = outf.reshape(m, c)
        # recompute p_prev = conv3(relu(bn2(z_prev))) — the forward FK3
        # dot on the F-channel z tile, instead of a 4F-channel p read
        fprev = zp_ref.shape[4]
        zpm = jnp.where(cmask, zp_ref[0], 0.0).astype(dt)
        y2p = _bn_apply_relu(zpm, sa2p_ref, sb2p_ref, dt)
        y2p = jnp.where(cmask, y2p, 0.0).astype(dt)
        ppf = jnp.dot(y2p.reshape(m, fprev), w3p_ref[:],
                      preferred_element_type=jnp.float32)  # [m, C]
        rows = [
            jnp.sum(dq2, axis=0, keepdims=True),
            jnp.sum(dq2 * (ppf - mu3p_ref[0]), axis=0, keepdims=True),
        ]
        if prev == "proj":
            # pr_prev by finale inversion: where y = x > 0 (the only
            # sites with dq != 0), y = bn3(p) + bnp(pr), so
            # rr := bnp(pr) = y - (p*sa3 + sb3). The BNp backward
            # moment is sum dq*(pr - mup) = (1/sap)*sum dq*(rr - cpp)
            # with cpp = bnp(mup) = sap*mup + sbp — mupp_ref carries
            # cpp (centering preserved for f32 accuracy) and the
            # wrapper divides this row by sap.
            rrf = (xm.astype(jnp.float32).reshape(m, c)
                   - (ppf * sa3p_ref[0] + sb3p_ref[0]))
            rows.append(jnp.sum(
                dq2 * (rrf - mupp_ref[0]), axis=0, keepdims=True))
        _acc_init(mprev_ref)
        mprev_ref[:] += jnp.concatenate(rows, axis=0)
    else:
        dx_ref[0] = dx4 + dq_ref[0]

    part = _dotT(xm.reshape(m, c), dub)  # [C, F]
    d = _tshift_diff(xm, fold)  # [T,R,Wp,2fold]
    part2 = _dotT(d.reshape(m, 2 * fold), dub)  # [2fold, F]
    corr = jnp.concatenate(
        [part2, jnp.zeros((c - 2 * fold, f), jnp.float32)], axis=0)
    _acc_init(dw1_ref)
    dw1_ref[:] += part + corr


def _bk1_s2(da1p_ref, u_ref, x_ref, dq_ref, prq_ref, *refs, fold: int,
            wt: int, prev: str = ""):
    """Stride-2 BK1, entirely in the planar column space: du = bn1-bwd-
    apply(da1, u) per plane; dx = untshift(du @ w1^T) per plane plus the
    stride-2 projection residual grad (dpr @ wp^T at even rows of the
    even plane, with dpr = bnp-bwd-apply(dq, pr) computed IN-KERNEL from
    the dq/pr tiles and the A/E/F vectors); accumulate dw1 =
    tshift(x)^T du (both planes + per-plane pair-diff corrections) and
    dwp = x[even rows, even cols]^T dpr. Output dx stays PLANAR
    [1,T,R,Wq,2C]; the wrapper's one XLA reshape interleaves the columns
    back.

    da1p_ref [1,T,R,Wq,2F] (planar, from _bk2_s2); u/x natural
    [1,T,R,Wp,*] (pair-merged in-kernel, the legal direction); dq_ref /
    prq_ref [1,T,R/2,Wq,Cp] half-res. Vectors a1d/e1d/f1d are the
    BN1-backward A/E/F duplicated over the two lane groups [1,2F].

    prev (trunk mode; a stage's block0 always follows a PLAIN block):
    relu-mask dx with the previous finale (x>0, per plane) into dq_prev
    (stored planar in dxp_ref; the wrapper's interleave restores column
    order) and accumulate the previous BN3 backward moment sums per
    PLANE into mprev_ref [2, 2C] (the wrapper folds the lane halves)."""
    if prev:
        (zp_ref, a1d_ref, e1d_ref, f1d_ref, apv_ref, epv_ref, fpv_ref,
         mu3d_ref, sa2p_ref, sb2p_ref, w1t_ref, wpt_ref, w3p_ref,
         dxp_ref, dw1_ref, dwp_ref, mprev_ref) = refs
    else:
        (a1d_ref, e1d_ref, f1d_ref, apv_ref, epv_ref, fpv_ref,
         w1t_ref, wpt_ref, dxp_ref, dw1_ref, dwp_ref) = refs
    t, r, wq, f2 = da1p_ref.shape[1:]
    f = f2 // 2
    wp = u_ref.shape[3]
    c = x_ref.shape[4]
    cp = dq_ref.shape[4]
    rr = r // 2
    dt = dxp_ref.dtype
    cmask_f = _col_lt(wp, wt)
    hmask = _col_lt(wq, wt // 2)

    m2 = t * r * wq

    def merge2(v4, ch):
        """Natural [T,R,Wp,ch] -> planar 2-d [m2, 2ch]: pad the natural
        width to 2*wq (so the merged half-width matches the planar row
        count), collapse to [M,ch] (legal: width % 8 == 0), then ONE
        sublane->lane pair reshape. Merged values are consumed by lane
        slices, row shifts and dots ONLY — never reshaped (Mosaic
        rejects tpu.reshape of (1,128) layouts; tools/aot_compile.py)."""
        if 2 * wq > wp:
            v4 = jnp.concatenate(
                [v4, jnp.zeros((t, r, 2 * wq - wp, ch), dt)], axis=2)
        return v4.reshape(t * r * 2 * wq, ch).reshape(m2, 2 * ch)

    um2 = merge2(jnp.where(cmask_f, u_ref[0], 0.0).astype(dt), f)
    da1p2 = da1p_ref[0].reshape(m2, f2)  # natural load: reshape legal
    du = (da1p2.astype(jnp.float32) * a1d_ref[0]
          + um2.astype(jnp.float32) * e1d_ref[0] + f1d_ref[0])
    qcol = jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) % wq
    du = jnp.where(qcol < wt // 2, du, 0.0)
    dub = du.astype(dt)
    du_e = dub[:, :f]
    du_o = dub[:, f:]

    dx_e = jnp.dot(du_e, w1t_ref[:],
                   preferred_element_type=jnp.float32)
    dx_o = jnp.dot(du_o, w1t_ref[:],
                   preferred_element_type=jnp.float32)
    dx_e4 = _untshift(dx_e.astype(dt).reshape(t, r, wq, c), fold, dt)
    dx_o4 = _untshift(dx_o.astype(dt).reshape(t, r, wq, c), fold, dt)

    # projection residual: dpr = bnp-bwd-apply(dq, pr) in-kernel
    # (formerly an XLA elementwise pass), then dpr @ wp^T lands on even
    # rows / even columns
    dprm = (dq_ref[0].astype(jnp.float32) * apv_ref[0]
            + prq_ref[0].astype(jnp.float32) * epv_ref[0] + fpv_ref[0])
    dprm = jnp.where(hmask, dprm, 0.0)
    dprb = dprm.astype(dt).reshape(t * rr * wq, cp)
    dres = jnp.dot(dprb, wpt_ref[:], preferred_element_type=jnp.float32)
    dres5 = dres.astype(dt).reshape(t, rr, 1, wq, c)
    dxe5 = dx_e4.reshape(t, rr, 2, wq, c)
    dxe5 = jnp.concatenate(
        [dxe5[:, :, :1] + dres5, dxe5[:, :, 1:]], axis=2)
    dx_e4 = dxe5.reshape(t, r, wq, c)

    x4 = jnp.where(cmask_f, x_ref[0], 0.0).astype(dt)
    if prev:
        # trunk epilogue (previous block is plain): per-plane relu mask
        # into dq_prev + previous BN3 backward moment sums per plane
        dxp4 = jnp.concatenate([dx_e4, dx_o4], axis=-1)
        xm4 = _merge_pairs(x4, wq)
        dqp = jnp.where(_gt0(xm4), dxp4.astype(jnp.float32), 0.0)
        dxp_ref[0] = dqp.astype(dt)
        # recompute p_prev = conv3(relu(bn2(z_prev))) from the natural
        # F-channel z tile (the forward FK3 dot — no 4F p read), then
        # pair-merge the dt-rounded result for the per-plane sums
        fprev = zp_ref.shape[4]
        zpm = jnp.where(cmask_f, zp_ref[0], 0.0).astype(dt)
        y2p = _bn_apply_relu(zpm, sa2p_ref, sb2p_ref, dt)
        y2p = jnp.where(cmask_f, y2p, 0.0).astype(dt)
        ppf = jnp.dot(y2p.reshape(t * r * wp, fprev), w3p_ref[:],
                      preferred_element_type=jnp.float32)
        ppm4 = _merge_pairs(ppf.astype(dt).reshape(t, r, wp, c), wq)
        # sums reduce in 4-d: dqp/ppm4 carry the merged (1,128) layout
        # and a merged value must never be reshaped
        s0 = jnp.sum(dqp, axis=(0, 1, 2))[None]
        s1 = jnp.sum(dqp * (ppm4.astype(jnp.float32) - mu3d_ref[0]),
                     axis=(0, 1, 2))[None]
        _acc_init(mprev_ref)
        mprev_ref[:] += jnp.concatenate([s0, s1], axis=0)
    else:
        dxp_ref[0] = jnp.concatenate([dx_e4, dx_o4], axis=-1)
    xm2 = merge2(x4, c)
    xe2 = xm2[:, :c]
    xo2 = xm2[:, c:]
    part = _dotT(xe2, du_e) + _dotT(xo2, du_o)

    blk = r * wq  # rows per time step in the planar 2-d space

    def tdiff2(xp2):
        # _tshift_diff in the planar 2-d space: time neighbors sit one
        # row-block away (clip edges zero)
        s2 = xp2[:, : 2 * fold]
        zb = jnp.zeros((blk, 2 * fold), dt)
        nxt = jnp.concatenate([s2[blk:], zb], axis=0)
        prv = jnp.concatenate([zb, s2[: m2 - blk]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * fold), 1)
        return (jnp.where(lane < fold, nxt, prv) - s2).astype(dt)

    part2 = _dotT(tdiff2(xe2), du_e) + _dotT(tdiff2(xo2), du_o)
    corr = jnp.concatenate(
        [part2, jnp.zeros((c - 2 * fold, f), jnp.float32)], axis=0)
    _acc_init(dw1_ref)
    dw1_ref[:] += part + corr

    # even full-res rows of the even plane: split rows on the NATURAL
    # x first, then pair-merge to 2-d
    xe_rows = x4.reshape(t, rr, 2, wp, c)[:, :, 0]
    if 2 * wq > wp:
        xe_rows = jnp.concatenate(
            [xe_rows, jnp.zeros((t, rr, 2 * wq - wp, c), dt)], axis=2)
    xev = xe_rows.reshape(t * rr * 2 * wq, c).reshape(
        t * rr * wq, 2 * c)[:, :c]
    _acc_init(dwp_ref)
    dwp_ref[:] += _dotT(xev, dprb)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _vmem_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )


def _specs(b, t, rows, wp, chans, h):
    """(tile spec, top-halo spec, bot-halo spec) for a [b,t,h,w,chans]
    operand tiled over (batch, row tiles)."""
    tile = pl.BlockSpec((1, t, rows, wp, chans),
                        lambda i, j: (i, 0, j, 0, 0),
                        memory_space=pltpu.VMEM)
    top = pl.BlockSpec((1, t, 1, wp, chans),
                       lambda i, j: (i, 0, jnp.maximum(j * rows - 1, 0),
                                     0, 0),
                       memory_space=pltpu.VMEM)
    bot = pl.BlockSpec((1, t, 1, wp, chans),
                       lambda i, j: (i, 0,
                                     jnp.minimum(j * rows + rows, h - 1),
                                     0, 0),
                       memory_space=pltpu.VMEM)
    return tile, top, bot


def _const(shape):
    return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _vec(v, n):
    return jnp.asarray(v, jnp.float32).reshape(1, n)


def _finalize_stats(msum, M, eps):
    """(sum, sum^2) [2,F] -> mu, var (biased), sa = 1/sigma-scale pieces."""
    mu = msum[0] / M
    var = msum[1] / M - mu * mu
    return mu, var


def _bn_vectors(gamma, mu, var, beta, eps):
    r = jax.lax.rsqrt(var + eps)
    sa = gamma.astype(jnp.float32) * r
    sb = beta.astype(jnp.float32) - mu * sa
    return sa, sb


def _bn_bwd_vectors(gamma, mu, var, s0, s1c, M, eps):
    """BN backward as du = A*da + E*u + F from the moments s0 = sum(da),
    s1c = sum(da*(u-mu)) (CENTERED in the accumulating kernel —
    sum(da*u)-mu*sum(da) cancels catastrophically at real scales):
      du = g*r*(da - mean(da) - xhat*mean(da*xhat)),
      mean(da*xhat) = r*s1c/M.
    Also returns (dgamma = sum(da*xhat), dbeta = sum(da))."""
    r = jax.lax.rsqrt(var + eps)
    g = gamma.astype(jnp.float32)
    a = g * r
    t0 = s0 / M
    t1 = r * s1c / M
    e = -a * t1 * r
    fv = -a * t0 + a * t1 * r * mu
    dgamma = r * s1c
    dbeta = s0
    return a, e, fv, dgamma, dbeta


def _pack_w2(w2, dt):
    """[3,3,F,F] HWIO -> [3, 3F, F] (dr-major rows, dc-major K)."""
    f = w2.shape[-1]
    return w2.reshape(3, 3 * f, f).astype(dt)


def _pack_w2_bwd(w2, dt):
    """Flipped-transposed taps for the conv2 data grad: w2b[dr,dc] =
    w2[2-dr,2-dc]^T, packed [3, 3F, F]."""
    w2b = w2[::-1, ::-1].transpose(0, 1, 3, 2)
    f = w2b.shape[-1]
    return w2b.reshape(3, 3 * f, f).astype(dt)


def _fk1_call(x5, prev, w1k, wpk, *, b, t, h, w, c, f, c_out, fold, dt,
              interp, s2=False):
    """Run FK1 (conv1 + shift [+ projection] + moments). Either x5
    [B,T,H,W,C] is the materialized block input (prev None), or prev =
    (mode, p5, r5, sa3, sb3, sap, sbp) and FK1 computes + writes the
    input as the previous block's finale (trunk mode). Returns
    (x5_materialized, u5, pr5|None, m1, mp|None)."""
    es = jnp.dtype(dt).itemsize
    proj = wpk is not None
    wp = _pad8(w)
    wq = _pad8(w // 2) if s2 else wp
    bpr1 = t * wp * es * (2 * c + 2 * f) + t * wp * 4 * f
    if prev is not None:
        bpr1 += t * wp * es * 6 * c  # p_prev + r_prev in, y out
    if proj:
        bpr1 += t * wp * 4 * c_out
        bpr1 += t * wq * es * c_out if s2 else t * wp * es * 2 * c_out
    rows1 = (_rows_divisor_even if s2 else _rows_divisor)(h, bpr1)
    tile_c, _, _ = _specs(b, t, rows1, wp, c, h)
    u_spec = pl.BlockSpec((1, t, rows1, wp, f),
                          lambda i, j: (i, 0, j, 0, 0),
                          memory_space=pltpu.VMEM)
    if prev is None:
        pmode = ""
        in_ops, in_specs = [x5], [tile_c]
    else:
        pmode, p5p, r5p, sa3p, sb3p, sapp, sbpp = prev
        in_ops = [p5p, r5p, _vec(sa3p, c), _vec(sb3p, c)]
        in_specs = [tile_c, tile_c, _const((1, c)), _const((1, c))]
        if pmode == "proj":
            in_ops += [_vec(sapp, c), _vec(sbpp, c)]
            in_specs += [_const((1, c)), _const((1, c))]
    in_ops.append(w1k)
    in_specs.append(_const((c, f)))
    if proj:
        in_ops.append(wpk)
        in_specs.append(_const((c, c_out)))
    out_shapes, out_specs = [], []
    if prev is not None:
        out_shapes.append(jax.ShapeDtypeStruct((b, t, h, w, c), dt))
        out_specs.append(pl.BlockSpec((1, t, rows1, wp, c),
                                      lambda i, j: (i, 0, j, 0, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((b, t, h, w, f), dt))
    out_specs.append(u_spec)
    if proj:
        if s2:
            out_shapes.append(
                jax.ShapeDtypeStruct((b, t, h // 2, w // 2, c_out), dt))
            out_specs.append(pl.BlockSpec(
                (1, t, rows1 // 2, wq, c_out),
                lambda i, j: (i, 0, j, 0, 0), memory_space=pltpu.VMEM))
        else:
            out_shapes.append(jax.ShapeDtypeStruct((b, t, h, w, c_out), dt))
            out_specs.append(pl.BlockSpec(
                (1, t, rows1, wp, c_out),
                lambda i, j: (i, 0, j, 0, 0), memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((2, f), jnp.float32))
    out_specs.append(_const((2, f)))
    if proj:
        out_shapes.append(jax.ShapeDtypeStruct((2, c_out), jnp.float32))
        out_specs.append(_const((2, c_out)))
    outs = pl.pallas_call(
        functools.partial(_fk1, fold=fold, wt=w, proj=proj, s2=s2,
                          prev=pmode),
        out_shape=tuple(out_shapes),
        grid=(b, h // rows1),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(*in_ops)
    outs = list(outs)
    x5m = outs.pop(0) if prev is not None else x5
    u5 = outs.pop(0)
    pr5 = outs.pop(0) if proj else None
    m1 = outs.pop(0)
    mp = outs.pop(0) if proj else None
    return x5m, u5, pr5, m1, mp


def _forward(x, w1, w2, w3, g1, be1, g2, be2, g3, be3, n_segment, n_div,
             eps, wproj=None, gp=None, bep=None, prev=None, trunk=False):
    """Per-block contract (trunk=False): x [NT,H,W,C] -> (y, stats,
    residuals) with the finale y = relu(bn3(p)+residual) as an XLA
    elementwise chain. Trunk contract (tsm_trunk_train_pallas.py): x is
    5-d [B,T,H,W,C] (or None with prev set — FK1 then materializes the
    block input from the previous block's p/r), NO finale runs, and the
    return is (x5, u5, z5, p5, pr5, stats)."""
    if trunk:
        ref5 = prev[1] if prev is not None else x
        b, t, h, w, c = ref5.shape
        nt = b * t
        dt = ref5.dtype
        x5 = x
    else:
        nt, h, w, c = x.shape
        t = n_segment
        b = nt // t
        dt = x.dtype
        x5 = x.reshape(b, t, h, w, c)
    es = jnp.dtype(dt).itemsize
    w1 = w1.reshape(c, -1).astype(dt)
    f = w1.shape[1]
    w2 = w2.reshape(3, 3, f, f)
    w3 = w3.reshape(f, -1).astype(dt)
    c_out = w3.shape[1]
    proj = wproj is not None
    assert proj == (c_out != c), (c, c_out)
    fold = c // n_div
    wp = _pad8(w)
    M = nt * h * w
    interp = jax.default_backend() != "tpu"

    # FK1: conv1 + shift (+ stride-1 projection) + moments -------------
    wpk = wproj.reshape(c, c_out).astype(dt) if proj else None
    x5, u5, pr5, m1, mp = _fk1_call(
        x5, prev, w1, wpk, b=b, t=t, h=h, w=w, c=c, f=f, c_out=c_out,
        fold=fold, dt=dt, interp=interp)
    if proj:
        mup, varp = _finalize_stats(mp, M, eps)
        sap, sbp = _bn_vectors(gp, mup, varp, bep, eps)
    mu1, var1 = _finalize_stats(m1, M, eps)
    sa1, sb1 = _bn_vectors(g1, mu1, var1, be1, eps)

    # FK2: bn1 apply + relu + 3x3 conv + moments ----------------------
    bpr2 = t * wp * es * (2 * f + 2 * f + 2 * 3 * f) + t * wp * 4 * f
    rows2 = _rows_divisor(h, bpr2)
    tile_u, top_u, bot_u = _specs(b, t, rows2, wp, f, h)
    z5, m2 = pl.pallas_call(
        functools.partial(_fk2, wt=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, h, w, f), dt),
            jax.ShapeDtypeStruct((2, f), jnp.float32),
        ),
        grid=(b, h // rows2),
        in_specs=[tile_u, top_u, bot_u, _const((1, f)), _const((1, f)),
                  _const((3, 3 * f, f))],
        out_specs=(
            pl.BlockSpec((1, t, rows2, wp, f), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((2, f)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(u5, u5, u5, _vec(sa1, f), _vec(sb1, f), _pack_w2(w2, dt))
    mu2, var2 = _finalize_stats(m2, M, eps)
    sa2, sb2 = _bn_vectors(g2, mu2, var2, be2, eps)

    # FK3: bn2 apply + relu + conv3 + moments -------------------------
    bpr3 = t * wp * es * (2 * f + 2 * c_out) + t * wp * 4 * c_out
    rows3 = _rows_divisor(h, bpr3)
    tile_z, _, _ = _specs(b, t, rows3, wp, f, h)
    p5, m3 = pl.pallas_call(
        functools.partial(_fk3, wt=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, h, w, c_out), dt),
            jax.ShapeDtypeStruct((2, c_out), jnp.float32),
        ),
        grid=(b, h // rows3),
        in_specs=[tile_z, _const((1, f)), _const((1, f)),
                  _const((f, c_out))],
        out_specs=(
            pl.BlockSpec((1, t, rows3, wp, c_out),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((2, c_out)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(z5, _vec(sa2, f), _vec(sb2, f), w3)
    mu3, var3 = _finalize_stats(m3, M, eps)
    sa3, sb3 = _bn_vectors(g3, mu3, var3, be3, eps)

    if trunk:
        stats = ((mu1, var1, mu2, var2, mu3, var3, mup, varp) if proj
                 else (mu1, var1, mu2, var2, mu3, var3))
        return x5, u5, z5, p5, pr5, stats

    # finale (XLA fuses the elementwise chain)
    u = u5.reshape(nt, h, w, f)
    z = z5.reshape(nt, h, w, f)
    p = p5.reshape(nt, h, w, c_out)
    a3 = (p.astype(jnp.float32) * sa3 + sb3).astype(dt)
    if proj:
        pr = pr5.reshape(nt, h, w, c_out)
        ap = (pr.astype(jnp.float32) * sap + sbp).astype(dt)
        y = jnp.maximum(a3 + ap, 0.0)
        stats = (mu1, var1, mu2, var2, mu3, var3, mup, varp)
        return y, stats, (x, u, z, p, y, pr)
    y = jnp.maximum(a3 + x, 0.0)
    stats = (mu1, var1, mu2, var2, mu3, var3)
    return y, stats, (x, u, z, p, y, None)


def _backward(n_segment, n_div, eps, res, dy, trunk=None):
    """Per-block contract (trunk None): res holds 4-d residuals, dy is
    the block-output cotangent, and the relu mask + BN3/BNp backward
    moments run as one XLA pass; returns the per-argument grads.

    Trunk contract (tsm_trunk_train_pallas.py): res holds 5-d residuals
    (y None), dy is ignored, and trunk is a dict {dq, s0, s1, s1p, prev}
    — dq [B,T,H,W,Cout] is the already-relu-masked cotangent with its
    BN3 (/BNp) backward moment sums s0/s1(/s1p), both produced by the
    NEXT block's BK1 epilogue (or the trunk driver at the top block).
    prev is None | ("plain", p5_prev, mu3_prev) | ("proj", p5_prev,
    pr5_prev, mu3_prev, mup_prev) and requests the BK1 epilogue for the
    PREVIOUS block. Returns (grads, carry): grads ordered like the block
    param tuple (dw1,dw2,dw3[,dwp],dg1,dbe1,...,dg3,dbe3[,dgp,dbep]);
    carry = (dx5, None) when prev is None else (dq5_prev, mprev)."""
    (x, u, z, p, y, pr, stats, w1o, w2o, w3o, wpo,
     g1, be1, g2, be2, g3, be3, gp, bep) = res
    mu1, var1, mu2, var2, mu3, var3 = stats[:6]
    proj = pr is not None
    if trunk is not None:
        b, t, h, w, c = x.shape
        nt = b * t
        dt = x.dtype
        x5, u5, z5 = x, u, z
        pr5 = pr
    else:
        nt, h, w, c = x.shape
        t = n_segment
        b = nt // t
        dt = x.dtype
    es = jnp.dtype(dt).itemsize
    w1 = w1o.reshape(c, -1).astype(dt)
    f = w1.shape[1]
    w2 = w2o.reshape(3, 3, f, f)
    w3 = w3o.reshape(f, -1).astype(dt)
    c_out = w3.shape[1]
    fold = c // n_div
    wp = _pad8(w)
    M = nt * h * w
    interp = jax.default_backend() != "tpu"

    if proj:
        mup, varp = stats[6:8]
    if trunk is not None:
        dq5 = trunk["dq"]
        s0_3, s1_3 = trunk["s0"], trunk["s1"]
        if proj:
            s1_p = trunk["s1p"]
    else:
        # XLA: relu mask + BN3 (and BNp) backward moments in one fused
        # pass; the u-moments are centered — see _bn_bwd_vectors
        dq = jnp.where(y > 0, dy, 0).astype(dt)
        dqf = dq.astype(jnp.float32)
        s0_3 = jnp.sum(dqf, axis=(0, 1, 2))
        s1_3 = jnp.sum(dqf * (p.astype(jnp.float32) - mu3),
                       axis=(0, 1, 2))
        if proj:
            s1_p = jnp.sum(dqf * (pr.astype(jnp.float32) - mup),
                           axis=(0, 1, 2))
        dq5 = dq.reshape(b, t, h, w, c_out)
        z5 = z.reshape(b, t, h, w, f)
        u5 = u.reshape(b, t, h, w, f)
        x5 = x.reshape(b, t, h, w, c)
        pr5 = None
    a3, e3, f3, dg3, dbe3 = _bn_bwd_vectors(g3, mu3, var3, s0_3, s1_3, M,
                                            eps)
    if proj:
        ap_, ep_, fp_, dgp, dbep = _bn_bwd_vectors(
            gp, mup, varp, s0_3, s1_p, M, eps)
    sa1, sb1 = _bn_vectors(g1, mu1, var1, be1, eps)
    sa2, sb2 = _bn_vectors(g2, mu2, var2, be2, eps)

    # BK3 (p recomputed in-kernel from z; no p input pass) --------------
    bpr = t * wp * es * (2 * c_out + 2 * f * 2) + t * wp * 4 * c_out
    rows = _rows_divisor(h, bpr)
    tile_q, _, _ = _specs(b, t, rows, wp, c_out, h)
    tile_zf, _, _ = _specs(b, t, rows, wp, f, h)
    da2_5, dw3, mda2 = pl.pallas_call(
        functools.partial(_bk3, wt=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, h, w, f), dt),
            jax.ShapeDtypeStruct((f, c_out), jnp.float32),
            jax.ShapeDtypeStruct((2, f), jnp.float32),
        ),
        grid=(b, h // rows),
        in_specs=[tile_q, tile_zf,
                  _const((1, c_out)), _const((1, c_out)),
                  _const((1, c_out)),
                  _const((1, f)), _const((1, f)), _const((1, f)),
                  _const((c_out, f))],
        out_specs=(
            pl.BlockSpec((1, t, rows, wp, f), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((f, c_out)),
            _const((2, f)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(dq5, z5, _vec(a3, c_out), _vec(e3, c_out), _vec(f3, c_out),
      _vec(sa2, f), _vec(sb2, f), _vec(mu2, f),
      w3.reshape(f, c_out).T.astype(dt))
    s0_2, s1_2 = mda2[0], mda2[1]
    a2, e2, f2v, dg2, dbe2 = _bn_bwd_vectors(g2, mu2, var2, s0_2, s1_2, M,
                                             eps)

    # BK2 ---------------------------------------------------------------
    bpr = t * wp * es * (3 * 2 * f + 2 * f + 4 * 3 * f) + t * wp * 4 * f
    rows = _rows_divisor(h, bpr)
    tile_f, top_f, bot_f = _specs(b, t, rows, wp, f, h)
    da1_5, dw2p, mda1 = pl.pallas_call(
        functools.partial(_bk2, wt=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, h, w, f), dt),
            jax.ShapeDtypeStruct((3, 3 * f, f), jnp.float32),
            jax.ShapeDtypeStruct((2, f), jnp.float32),
        ),
        grid=(b, h // rows),
        in_specs=[tile_f, top_f, bot_f,
                  tile_f, top_f, bot_f,
                  tile_f, top_f, bot_f,
                  _const((1, f)), _const((1, f)), _const((1, f)),
                  _const((1, f)), _const((1, f)), _const((1, f)),
                  _const((3, 3 * f, f))],
        out_specs=(
            pl.BlockSpec((1, t, rows, wp, f), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((3, 3 * f, f)),
            _const((2, f)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(da2_5, da2_5, da2_5, z5, z5, z5, u5, u5, u5,
      _vec(a2, f), _vec(e2, f), _vec(f2v, f), _vec(sa1, f), _vec(sb1, f),
      _vec(mu1, f), _pack_w2_bwd(w2, dt))
    s0_1, s1_1 = mda1[0], mda1[1]
    a1, e1, f1v, dg1, dbe1 = _bn_bwd_vectors(g1, mu1, var1, s0_1, s1_1, M,
                                             eps)

    # BK1 ---------------------------------------------------------------
    tprev = trunk.get("prev") if trunk is not None else None
    assert not (proj and tprev is not None)
    bpr = (t * wp * es * (2 * f * 2 + 2 * c * 2 + 2 * c_out
                          + (2 * c_out if proj else 0) + 4 * c)
           + t * wp * 4 * f)
    if tprev is not None:
        bpr += t * wp * es * 2 * (c // 4)  # prev z tile (F channels)
    rows = _rows_divisor(h, bpr)
    tile_f1, _, _ = _specs(b, t, rows, wp, f, h)
    tile_c, _, _ = _specs(b, t, rows, wp, c, h)
    tile_co, _, _ = _specs(b, t, rows, wp, c_out, h)
    dx_spec = pl.BlockSpec((1, t, rows, wp, c),
                           lambda i, j: (i, 0, j, 0, 0),
                           memory_space=pltpu.VMEM)
    vecs1 = [_vec(a1, f), _vec(e1, f), _vec(f1v, f)]
    w1t = w1.reshape(c, f).T.astype(dt)
    mprev = None
    if proj:
        wpk = wpo.reshape(c, c_out).astype(dt)
        pr5 = pr.reshape(b, t, h, w, c_out)
        dx5, dw1, dwp = pl.pallas_call(
            functools.partial(_bk1, fold=fold, wt=w, proj=True),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, h, w, c), dt),
                jax.ShapeDtypeStruct((c, f), jnp.float32),
                jax.ShapeDtypeStruct((c, c_out), jnp.float32),
            ),
            grid=(b, h // rows),
            in_specs=[tile_f1, tile_f1, tile_c, tile_co, tile_co,
                      _const((1, f)), _const((1, f)), _const((1, f)),
                      _const((1, c_out)), _const((1, c_out)),
                      _const((1, c_out)),
                      _const((f, c)), _const((c_out, c))],
            out_specs=(dx_spec, _const((c, f)), _const((c, c_out))),
            compiler_params=_vmem_params(),
            interpret=interp,
        )(da1_5, u5, x5, dq5, pr5, *vecs1,
          _vec(ap_, c_out), _vec(ep_, c_out), _vec(fp_, c_out),
          w1t, wpk.T)
    elif tprev is not None:
        # trunk: dx doubles as the PREVIOUS block's dq (relu-masked in
        # the kernel epilogue), with its BN3(/BNp) backward moment sums
        # computed from the previous block's z tile — p_prev/pr_prev
        # are never saved (see _bk1: FK3-dot recompute + finale
        # inversion); tprev = ("plain"|"proj", z_prev, sa2p, sb2p, w3p,
        # mu3p[, sa3p, sb3p, cpp]) built by the trunk driver
        pmode, zp5, sa2p, sb2p, w3p, mu3p = tprev[:6]
        fp = zp5.shape[4]
        tile_fp, _, _ = _specs(b, t, rows, wp, fp, h)
        in_ops = [da1_5, u5, x5, dq5, zp5]
        in_specs = [tile_f1, tile_f1, tile_c, tile_c, tile_fp]
        in_ops += vecs1
        in_specs += [_const((1, f))] * 3
        in_ops += [_vec(sa2p, fp), _vec(sb2p, fp), _vec(mu3p, c)]
        in_specs += [_const((1, fp))] * 2 + [_const((1, c))]
        if pmode == "proj":
            sa3p, sb3p, cpp = tprev[6:9]
            in_ops += [_vec(sa3p, c), _vec(sb3p, c), _vec(cpp, c)]
            in_specs += [_const((1, c))] * 3
        in_ops += [w1t, w3p.astype(dt)]
        in_specs += [_const((f, c)), _const((fp, c))]
        nm = 3 if pmode == "proj" else 2
        dx5, dw1, mprev = pl.pallas_call(
            functools.partial(_bk1, fold=fold, wt=w, prev=pmode),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, h, w, c), dt),
                jax.ShapeDtypeStruct((c, f), jnp.float32),
                jax.ShapeDtypeStruct((nm, c), jnp.float32),
            ),
            grid=(b, h // rows),
            in_specs=in_specs,
            out_specs=(dx_spec, _const((c, f)), _const((nm, c))),
            compiler_params=_vmem_params(),
            interpret=interp,
        )(*in_ops)
    else:
        dx5, dw1 = pl.pallas_call(
            functools.partial(_bk1, fold=fold, wt=w),
            out_shape=(
                jax.ShapeDtypeStruct((b, t, h, w, c), dt),
                jax.ShapeDtypeStruct((c, f), jnp.float32),
            ),
            grid=(b, h // rows),
            in_specs=[tile_f1, tile_f1, tile_c, tile_c,
                      _const((1, f)), _const((1, f)), _const((1, f)),
                      _const((f, c))],
            out_specs=(dx_spec, _const((c, f))),
            compiler_params=_vmem_params(),
            interpret=interp,
        )(da1_5, u5, x5, dq5, *vecs1, w1t)

    # unpack dw2 [3,3F,F] (dr, dc-major K) -> [3,3,F,F]; cotangents must
    # match each primal's shape and dtype
    dw1 = dw1.reshape(w1o.shape).astype(w1o.dtype)
    dw2 = dw2p.reshape(w2o.shape).astype(w2o.dtype)
    dw3 = dw3.reshape(w3o.shape).astype(w3o.dtype)
    as_p = lambda dg, g: dg.astype(g.dtype)
    if trunk is not None:
        grads = (dw1, dw2, dw3) + (
            (dwp.reshape(wpo.shape).astype(wpo.dtype),) if proj else ())
        grads += (as_p(dg1, g1), as_p(dbe1, be1), as_p(dg2, g2),
                  as_p(dbe2, be2), as_p(dg3, g3), as_p(dbe3, be3))
        if proj:
            grads += (as_p(dgp, gp), as_p(dbep, bep))
        return grads, (dx5, mprev)

    dx = dx5.reshape(nt, h, w, c)
    base = (dx, dw1, dw2, dw3,
            as_p(dg1, g1), as_p(dbe1, be1), as_p(dg2, g2),
            as_p(dbe2, be2), as_p(dg3, g3), as_p(dbe3, be3))
    if proj:
        return base + (dwp.reshape(wpo.shape).astype(wpo.dtype),
                       as_p(dgp, gp), as_p(dbep, bep))
    return base


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def tsm_bottleneck_train(x, w1, w2, w3, g1, be1, g2, be2, g3, be3,
                         n_segment: int, n_div: int = 8,
                         eps: float = 1e-5):
    """Training-mode fused bottleneck (stride-1, no projection):
    x [N*T, H, W, C] -> (y [N*T, H, W, C], batch stats).

    w1 [1,1,C,F] or [C,F]; w2 [3,3,F,F]; w3 [1,1,F,C] or [F,C];
    g*/be*: BatchNorm scale/bias (f32 params). Returns the block output
    and (mu1, var1, mu2, var2, mu3, var3) — the biased batch statistics
    each BatchNorm normalized with, for the caller's running-average
    update (flax nn.BatchNorm convention). Fully differentiable wrt all
    array arguments via a hand-written Pallas backward."""
    y, stats, _ = _forward(x, w1, w2, w3, g1, be1, g2, be2, g3, be3,
                           n_segment, n_div, eps)
    return y, stats


def _vjp_fwd(x, w1, w2, w3, g1, be1, g2, be2, g3, be3, n_segment, n_div,
             eps):
    y, stats, (x_, u, z, p, y_, pr) = _forward(
        x, w1, w2, w3, g1, be1, g2, be2, g3, be3, n_segment, n_div, eps)
    res = (x, u, z, p, y, pr,
           tuple(jax.lax.stop_gradient(s) for s in stats),
           w1, w2, w3, None, g1, be1, g2, be2, g3, be3, None, None)
    return (y, stats), res


def _vjp_bwd(n_segment, n_div, eps, res, ct):
    dy, _dstats = ct  # running-stat updates do not backprop (buffers)
    return _backward(n_segment, n_div, eps, res, dy)


tsm_bottleneck_train.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def tsm_bottleneck_proj_train(x, w1, w2, w3, wp, g1, be1, g2, be2, g3,
                              be3, gp, bep, n_segment: int,
                              n_div: int = 8, eps: float = 1e-5):
    """Training-mode fused STRIDE-1 PROJECTION bottleneck (ResNet50
    layer1 block0): like tsm_bottleneck_train plus the 1x1 projection
    residual wp [1,1,C,Cout] / gp/bep (proj BatchNorm) — the projection
    conv and its moments ride in the conv1 kernel (x is read once for
    both), its BN backward in the conv1-backward kernel. Returns
    (y, (mu1, var1, mu2, var2, mu3, var3, mup, varp))."""
    y, stats, _ = _forward(x, w1, w2, w3, g1, be1, g2, be2, g3, be3,
                           n_segment, n_div, eps, wproj=wp, gp=gp,
                           bep=bep)
    return y, stats


def _vjp_fwd_proj(x, w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep,
                  n_segment, n_div, eps):
    y, stats, (x_, u, z, p, y_, pr) = _forward(
        x, w1, w2, w3, g1, be1, g2, be2, g3, be3, n_segment, n_div, eps,
        wproj=wp, gp=gp, bep=bep)
    res = (x, u, z, p, y, pr,
           tuple(jax.lax.stop_gradient(s) for s in stats),
           w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep)
    return (y, stats), res


def _vjp_bwd_proj(n_segment, n_div, eps, res, ct):
    dy, _dstats = ct
    (dx, dw1, dw2, dw3, dg1, dbe1, dg2, dbe2, dg3, dbe3, dwp, dgp,
     dbep) = _backward(n_segment, n_div, eps, res, dy)
    return (dx, dw1, dw2, dw3, dwp, dg1, dbe1, dg2, dbe2, dg3, dbe3,
            dgp, dbep)


tsm_bottleneck_proj_train.defvjp(_vjp_fwd_proj, _vjp_bwd_proj)


# ---------------------------------------------------------------------------
# stride-2 projection bottleneck (layers 2-4 block0)
# ---------------------------------------------------------------------------


def _forward_s2(x, w1, w2, w3, wproj, g1, be1, g2, be2, g3, be3, gp, bep,
                n_segment, n_div, eps, prev=None, trunk=False):
    """Training-mode fused STRIDE-2 projection bottleneck forward.

    Same kernel structure as the stride-1 path; the stride-2 selections
    reuse tsm_block_pallas's proven constructions (even rows via the
    untiled split, even columns via one natural-layout pair merge).
    Returns y [NT,H/2,W/2,Cout], the 8 batch stats, and the residuals.
    prev/trunk: see _forward — in trunk mode x/prev tensors are 5-d,
    FK1 materializes the block input, no finale runs, and the return is
    (x5, u5, z5, p5, pr5, stats)."""
    if trunk:
        ref5 = prev[1] if prev is not None else x
        b, t, h, w, c = ref5.shape
        nt = b * t
        dt = ref5.dtype
        x5 = x
    else:
        nt, h, w, c = x.shape
        t = n_segment
        b = nt // t
        dt = x.dtype
        x5 = x.reshape(b, t, h, w, c)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    es = jnp.dtype(dt).itemsize
    w1k = w1.reshape(c, -1).astype(dt)
    f = w1k.shape[1]
    w2k = w2.reshape(3, 3, f, f)
    w3k = w3.reshape(f, -1).astype(dt)
    c_out = w3k.shape[1]
    wpk = wproj.reshape(c, c_out).astype(dt)
    fold = c // n_div
    wp = _pad8(w)
    ho, wo = h // 2, w // 2
    wq = _pad8(wo)
    assert wq >= wp // 2, (wq, wp)
    M = nt * h * w
    M2 = nt * ho * wo
    interp = jax.default_backend() != "tpu"

    # FK1: conv1 + shift + stride-2 projection + moments ---------------
    x5, u5, pr5, m1, mp = _fk1_call(
        x5, prev, w1k, wpk, b=b, t=t, h=h, w=w, c=c, f=f, c_out=c_out,
        fold=fold, dt=dt, interp=interp, s2=True)
    mu1, var1 = _finalize_stats(m1, M, eps)
    sa1, sb1 = _bn_vectors(g1, mu1, var1, be1, eps)
    mup, varp = _finalize_stats(mp, M2, eps)
    sap, sbp = _bn_vectors(gp, mup, varp, bep, eps)

    # FK2: bn1 apply + relu + 3x3/s2 conv + moments --------------------
    bpr2 = (2 * t * wp * es * (2 * f + 2 * f) + t * wq * es * 5 * f
            + t * wq * 4 * f)
    ro2 = _rows_divisor(ho, bpr2)
    z5, m2 = pl.pallas_call(
        functools.partial(_fk2_s2, wt=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, ho, wo, f), dt),
            jax.ShapeDtypeStruct((2, f), jnp.float32),
        ),
        grid=(b, ho // ro2),
        in_specs=[
            pl.BlockSpec((1, t, 2 * ro2, wp, f),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, wp, f),
                         lambda i, j: (i, 0,
                                       jnp.maximum(j * 2 * ro2 - 1, 0),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            _const((1, f)), _const((1, f)), _const((3, 3 * f, f)),
        ],
        out_specs=(
            pl.BlockSpec((1, t, ro2, wq, f), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((2, f)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(u5, u5, _vec(sa1, f), _vec(sb1, f), _pack_w2(w2k, dt))
    mu2, var2 = _finalize_stats(m2, M2, eps)
    sa2, sb2 = _bn_vectors(g2, mu2, var2, be2, eps)

    # FK3 (half-res, shared kernel) ------------------------------------
    bpr3 = t * wq * es * (2 * f + 2 * c_out) + t * wq * 4 * c_out
    rows3 = _rows_divisor(ho, bpr3)
    tile_z, _, _ = _specs(b, t, rows3, wq, f, ho)
    p5, m3 = pl.pallas_call(
        functools.partial(_fk3, wt=wo),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, ho, wo, c_out), dt),
            jax.ShapeDtypeStruct((2, c_out), jnp.float32),
        ),
        grid=(b, ho // rows3),
        in_specs=[tile_z, _const((1, f)), _const((1, f)),
                  _const((f, c_out))],
        out_specs=(
            pl.BlockSpec((1, t, rows3, wq, c_out),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((2, c_out)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(z5, _vec(sa2, f), _vec(sb2, f), w3k)
    mu3, var3 = _finalize_stats(m3, M2, eps)
    sa3, sb3 = _bn_vectors(g3, mu3, var3, be3, eps)

    stats = (mu1, var1, mu2, var2, mu3, var3, mup, varp)
    if trunk:
        return x5, u5, z5, p5, pr5, stats

    u = u5.reshape(nt, h, w, f)
    z = z5.reshape(nt, ho, wo, f)
    p = p5.reshape(nt, ho, wo, c_out)
    pr = pr5.reshape(nt, ho, wo, c_out)
    a3 = (p.astype(jnp.float32) * sa3 + sb3).astype(dt)
    ap = (pr.astype(jnp.float32) * sap + sbp).astype(dt)
    y = jnp.maximum(a3 + ap, 0.0)
    return y, stats, (x, u, z, p, y, pr)


def _backward_s2(n_segment, n_div, eps, res, dy, trunk=None):
    """Stride-2 backward; per-block and trunk contracts as in _backward.
    In trunk mode the carry is (dqp_5, mprev) with dqp_5 the PREVIOUS
    block's dq in the PLANAR column form [B,T,H,W/2,2C] and mprev its
    per-plane BN3 backward moment sums [2,2C] — the trunk driver's one
    XLA reshape interleaves the columns and folds the lane halves."""
    (x, u, z, p, y, pr, stats, w1o, w2o, w3o, wpo,
     g1, be1, g2, be2, g3, be3, gp, bep) = res
    mu1, var1, mu2, var2, mu3, var3, mup, varp = stats
    if trunk is not None:
        b, t, h, w, c = x.shape
        nt = b * t
        dt = x.dtype
        x5, u5, z5, pr5 = x, u, z, pr
    else:
        nt, h, w, c = x.shape
        t = n_segment
        b = nt // t
        dt = x.dtype
    es = jnp.dtype(dt).itemsize
    w1 = w1o.reshape(c, -1).astype(dt)
    f = w1.shape[1]
    w2 = w2o.reshape(3, 3, f, f)
    w3 = w3o.reshape(f, -1).astype(dt)
    c_out = w3.shape[1]
    wpk = wpo.reshape(c, c_out).astype(dt)
    fold = c // n_div
    wp = _pad8(w)
    ho, wo = h // 2, w // 2
    wq = _pad8(wo)
    M = nt * h * w
    M2 = nt * ho * wo
    interp = jax.default_backend() != "tpu"

    if trunk is not None:
        dq5 = trunk["dq"]
        s0_3, s1_3, s1_p = trunk["s0"], trunk["s1"], trunk["s1p"]
    else:
        # XLA: relu mask + BN3/BNp backward moments (half-res, fused)
        dq = jnp.where(y > 0, dy, 0).astype(dt)
        dqf = dq.astype(jnp.float32)
        s0_3 = jnp.sum(dqf, axis=(0, 1, 2))
        s1_3 = jnp.sum(dqf * (p.astype(jnp.float32) - mu3),
                       axis=(0, 1, 2))
        s1_p = jnp.sum(dqf * (pr.astype(jnp.float32) - mup),
                       axis=(0, 1, 2))
        dq5 = dq.reshape(b, t, ho, wo, c_out)
        z5 = z.reshape(b, t, ho, wo, f)
        u5 = u.reshape(b, t, h, w, f)
        x5 = x.reshape(b, t, h, w, c)
        pr5 = pr.reshape(b, t, ho, wo, c_out)
    a3, e3, f3, dg3, dbe3 = _bn_bwd_vectors(g3, mu3, var3, s0_3, s1_3,
                                            M2, eps)
    ap_, ep_, fp_, dgp, dbep = _bn_bwd_vectors(gp, mup, varp, s0_3, s1_p,
                                               M2, eps)
    sa1, sb1 = _bn_vectors(g1, mu1, var1, be1, eps)
    sa2, sb2 = _bn_vectors(g2, mu2, var2, be2, eps)

    # BK3 (half-res, shared kernel; p recomputed in-kernel from z) ------
    bpr = t * wq * es * (2 * c_out + 2 * f * 2) + t * wq * 4 * c_out
    rows = _rows_divisor(ho, bpr)
    tile_q, _, _ = _specs(b, t, rows, wq, c_out, ho)
    tile_zf, _, _ = _specs(b, t, rows, wq, f, ho)
    da2_5, dw3, mda2 = pl.pallas_call(
        functools.partial(_bk3, wt=wo),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, ho, wo, f), dt),
            jax.ShapeDtypeStruct((f, c_out), jnp.float32),
            jax.ShapeDtypeStruct((2, f), jnp.float32),
        ),
        grid=(b, ho // rows),
        in_specs=[tile_q, tile_zf,
                  _const((1, c_out)), _const((1, c_out)),
                  _const((1, c_out)),
                  _const((1, f)), _const((1, f)), _const((1, f)),
                  _const((c_out, f))],
        out_specs=(
            pl.BlockSpec((1, t, rows, wq, f), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((f, c_out)),
            _const((2, f)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(dq5, z5, _vec(a3, c_out), _vec(e3, c_out), _vec(f3, c_out),
      _vec(sa2, f), _vec(sb2, f), _vec(mu2, f),
      w3.reshape(f, c_out).T.astype(dt))
    s0_2, s1_2 = mda2[0], mda2[1]
    a2, e2, f2v, dg2, dbe2 = _bn_bwd_vectors(g2, mu2, var2, s0_2, s1_2,
                                             M2, eps)

    # BK2 (stride-2 transpose; planar full-res output) ------------------
    bpr = (t * wq * (es * (4 * f + 10 * f) + 4 * 16 * f)
           + 2 * t * wp * es * 3 * f)
    rob = _rows_divisor(ho, bpr)
    tile_h, _, _ = _specs(b, t, rob, wq, f, ho)
    bot_h = pl.BlockSpec((1, t, 1, wq, f),
                         lambda i, j: (i, 0,
                                       jnp.minimum(j * rob + rob, ho - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM)
    w2c = jnp.concatenate(
        [w2[:, 1].transpose(0, 2, 1), w2[:, 2].transpose(0, 2, 1)],
        axis=2).astype(dt)  # [3, F, 2F]
    w2l = w2[:, 0].transpose(0, 2, 1).astype(dt)  # [3, F, F]
    mu1d = jnp.concatenate([jnp.asarray(mu1, jnp.float32)] * 2)
    da1p_5, dw2p, mda1 = pl.pallas_call(
        functools.partial(_bk2_s2, wt=w),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, h, wo, 2 * f), dt),
            jax.ShapeDtypeStruct((3, 3 * f, f), jnp.float32),
            jax.ShapeDtypeStruct((2, 2 * f), jnp.float32),
        ),
        grid=(b, ho // rob),
        in_specs=[
            tile_h, bot_h, tile_h, bot_h,
            pl.BlockSpec((1, t, 2 * rob, wp, f),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, wp, f),
                         lambda i, j: (i, 0,
                                       jnp.maximum(j * 2 * rob - 1, 0),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            _const((1, f)), _const((1, f)), _const((1, f)),
            _const((1, f)), _const((1, f)), _const((1, 2 * f)),
            _const((3, f, 2 * f)), _const((3, f, f)),
        ],
        out_specs=(
            pl.BlockSpec((1, t, 2 * rob, wq, 2 * f),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            _const((3, 3 * f, f)),
            _const((2, 2 * f)),
        ),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(da2_5, da2_5, z5, z5, u5, u5,
      _vec(a2, f), _vec(e2, f), _vec(f2v, f), _vec(sa1, f), _vec(sb1, f),
      mu1d.reshape(1, 2 * f), w2c, w2l)
    s0_1 = mda1[0, :f] + mda1[0, f:]
    s1_1 = mda1[1, :f] + mda1[1, f:]
    a1, e1, f1v, dg1, dbe1 = _bn_bwd_vectors(g1, mu1, var1, s0_1, s1_1,
                                             M, eps)

    # BK1 (planar; projection residual grads + in-kernel dpr) -----------
    tprev = trunk.get("prev") if trunk is not None else None
    bpr = (t * wq * es * (2 * f * 2 + 2 * c * 3 + 2 * c_out)
           + t * wq * 4 * (2 * f + 2 * c) + t * wp * es * (f + c))
    if tprev is not None:
        bpr += t * wp * es * 2 * (c // 4)  # prev z tile (F channels)
    rowsb = _rows_divisor_even(h, bpr)
    dup2 = lambda v: jnp.concatenate(
        [jnp.asarray(v, jnp.float32)] * 2).reshape(1, 2 * f)
    tile_p2f = pl.BlockSpec((1, t, rowsb, wq, 2 * f),
                            lambda i, j: (i, 0, j, 0, 0),
                            memory_space=pltpu.VMEM)
    tile_ff = pl.BlockSpec((1, t, rowsb, wp, f),
                           lambda i, j: (i, 0, j, 0, 0),
                           memory_space=pltpu.VMEM)
    tile_fc = pl.BlockSpec((1, t, rowsb, wp, c),
                           lambda i, j: (i, 0, j, 0, 0),
                           memory_space=pltpu.VMEM)
    tile_hq = pl.BlockSpec((1, t, rowsb // 2, wq, c_out),
                           lambda i, j: (i, 0, j, 0, 0),
                           memory_space=pltpu.VMEM)
    dxp_spec = pl.BlockSpec((1, t, rowsb, wq, 2 * c),
                            lambda i, j: (i, 0, j, 0, 0),
                            memory_space=pltpu.VMEM)
    w1t = w1.reshape(c, f).T.astype(dt)
    in_ops = [da1p_5, u5, x5, dq5, pr5]
    in_specs = [tile_p2f, tile_ff, tile_fc, tile_hq, tile_hq]
    pmode = ""
    mprev = None
    if tprev is not None:
        # tprev = ("plain", z_prev, sa2p, sb2p, w3p, mu3p): a stage's
        # block0 always follows a PLAIN block; p_prev is recomputed in
        # the epilogue from its z tile (see _bk1_s2)
        pmode, zp5, sa2p, sb2p, w3p, mu3p = tprev[:6]
        fp5 = zp5.shape[4]
        in_ops.append(zp5)
        in_specs.append(pl.BlockSpec(
            (1, t, rowsb, wp, fp5), lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM))
    in_ops += [dup2(a1), dup2(e1), dup2(f1v),
               _vec(ap_, c_out), _vec(ep_, c_out), _vec(fp_, c_out)]
    in_specs += [_const((1, 2 * f))] * 3 + [_const((1, c_out))] * 3
    if tprev is not None:
        mu3d = jnp.concatenate(
            [jnp.asarray(mu3p, jnp.float32)] * 2).reshape(1, 2 * c)
        in_ops += [mu3d, _vec(sa2p, fp5), _vec(sb2p, fp5)]
        in_specs += [_const((1, 2 * c)), _const((1, fp5)),
                     _const((1, fp5))]
    in_ops += [w1t, wpk.T]
    in_specs += [_const((f, c)), _const((c_out, c))]
    if tprev is not None:
        in_ops.append(w3p.astype(dt))
        in_specs.append(_const((fp5, c)))
    out_shapes = [
        jax.ShapeDtypeStruct((b, t, h, wo, 2 * c), dt),
        jax.ShapeDtypeStruct((c, f), jnp.float32),
        jax.ShapeDtypeStruct((c, c_out), jnp.float32),
    ]
    out_specs = [dxp_spec, _const((c, f)), _const((c, c_out))]
    if tprev is not None:
        out_shapes.append(jax.ShapeDtypeStruct((2, 2 * c), jnp.float32))
        out_specs.append(_const((2, 2 * c)))
    outs = pl.pallas_call(
        functools.partial(_bk1_s2, fold=fold, wt=w, prev=pmode),
        out_shape=tuple(out_shapes),
        grid=(b, h // rowsb),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=_vmem_params(),
        interpret=interp,
    )(*in_ops)
    if tprev is not None:
        dxp_5, dw1, dwp, mprev = outs
    else:
        dxp_5, dw1, dwp = outs

    dw1 = dw1.reshape(w1o.shape).astype(w1o.dtype)
    dw2 = dw2p.reshape(w2o.shape).astype(w2o.dtype)
    dw3 = dw3.reshape(w3o.shape).astype(w3o.dtype)
    as_p = lambda dg, g: dg.astype(g.dtype)
    if trunk is not None:
        grads = (dw1, dw2, dw3,
                 dwp.reshape(wpo.shape).astype(wpo.dtype),
                 as_p(dg1, g1), as_p(dbe1, be1), as_p(dg2, g2),
                 as_p(dbe2, be2), as_p(dg3, g3), as_p(dbe3, be3),
                 as_p(dgp, gp), as_p(dbep, bep))
        return grads, (dxp_5, mprev)

    # the ONE interleave the planar pipeline defers to XLA: lanes
    # [0,C)=even columns, [C,2C)=odd -> [NT,H,W,C]
    dx = dxp_5.reshape(nt, h, wo, 2, c).reshape(nt, h, w, c)
    return (dx, dw1, dw2, dw3,
            dwp.reshape(wpo.shape).astype(wpo.dtype),
            as_p(dg1, g1), as_p(dbe1, be1), as_p(dg2, g2),
            as_p(dbe2, be2), as_p(dg3, g3), as_p(dbe3, be3),
            as_p(dgp, gp), as_p(dbep, bep))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def tsm_bottleneck_s2_train(x, w1, w2, w3, wp, g1, be1, g2, be2, g3,
                            be3, gp, bep, n_segment: int, n_div: int = 8,
                            eps: float = 1e-5):
    """Training-mode fused STRIDE-2 projection bottleneck (ResNet50
    layers 2-4 block0, v1.5: stride on the 3x3): x [NT,H,W,C] ->
    (y [NT,H/2,W/2,Cout], (mu1,var1,mu2,var2,mu3,var3,mup,varp)).

    Forward: the conv1 kernel also emits the stride-2 1x1 projection
    (x read from HBM once for both); a stride-2 FK2 takes the pair-merge
    column construction from the inference kernel; FK3 runs the shared
    half-res kernel. Backward: the conv2/s2 transpose emits the full-res
    da1 (and BK1 the dx) in the PLANAR even/odd-column form — the zero-
    interleave a strided scatter would need is Mosaic-illegal — and ONE
    XLA reshape restores the column order. Completes the fused training
    trunk: with the stride-1 kernels, all 16 bottlenecks train fused.

    BN1 statistics are full-resolution (M=NT*H*W); bn2/bn3/proj use the
    half-res count, exactly like the standard flax path. Reference
    semantics: torch Bottleneck w/ downsample under DDP training
    (train_video_segment_ddp.py); numerics vs jax.grad of the XLA stack
    in tests/test_tsm_block_train_pallas.py."""
    y, stats, _ = _forward_s2(x, w1, w2, w3, wp, g1, be1, g2, be2, g3,
                              be3, gp, bep, n_segment, n_div, eps)
    return y, stats


def _vjp_fwd_s2(x, w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep,
                n_segment, n_div, eps):
    y, stats, (x_, u, z, p, y_, pr) = _forward_s2(
        x, w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep,
        n_segment, n_div, eps)
    res = (x, u, z, p, y, pr,
           tuple(jax.lax.stop_gradient(s) for s in stats),
           w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep)
    return (y, stats), res


def _vjp_bwd_s2(n_segment, n_div, eps, res, ct):
    dy, _dstats = ct
    (dx, dw1, dw2, dw3, dwp, dg1, dbe1, dg2, dbe2, dg3, dbe3, dgp,
     dbep) = _backward_s2(n_segment, n_div, eps, res, dy)
    return (dx, dw1, dw2, dw3, dwp, dg1, dbe1, dg2, dbe2, dg3, dbe3,
            dgp, dbep)


tsm_bottleneck_s2_train.defvjp(_vjp_fwd_s2, _vjp_bwd_s2)
