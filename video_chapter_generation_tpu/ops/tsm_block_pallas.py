"""Pallas TPU kernel: a WHOLE ResNet bottleneck block with temporal shift,
fused into one VMEM-resident pipeline (inference path).

Computes, for a stride-1 / no-projection bottleneck (the 11 of 16 blocks of
ResNet50-TSM that dominate the vision-embed hot path, reference semantics
`ops/temporal_shift.py:11-51` + torchvision bottleneck):

    y1 = relu(bn1(conv1x1(tshift(x))))      # shift fused as matmul correction
    y2 = relu(bn2(conv3x3(y1)))             # 3 row-shifted im2col matmuls
    y  = relu(bn3(conv1x1(y2)) + x)         # residual read from VMEM

in ONE kernel: x is read from HBM once and y written once. The per-conv1
Pallas kernel (tsm_conv_pallas.py) already avoided the materialized shift,
but every bn/relu/conv boundary still cost an HBM round-trip of the
activation; block-level measurement on v5e (PERF.md round 2) showed the
remaining TSM overhead concentrated in layers 1-2 where activations are
large. This kernel removes ALL intra-block traffic:
  HBM bytes/block: read x + 2 halo rows, write y  (vs 3 reads + 3 writes).

Grid/halo design: grid = (batch, row_tiles). The 3x3 conv needs one halo
row above and below each row tile; Pallas BlockSpecs cannot overlap, so the
halo rows arrive as two extra 1-row inputs whose index_map CLAMPS at the
image boundary (top halo of tile j is absolute row j*R-1, clamped to 0) and
the kernel zeroes them at the true edges (SAME zero padding). Column halos
are zero-padded in VMEM (the whole row width is resident).

BatchNorm is pre-folded to scale/bias (inference running stats). Training
uses the per-conv1 custom-vjp kernel instead.

Tuning knobs (module DEFAULT_TUNING, overridable per call) — every
combination is numerically exact; defaults are the fastest measured mix on
TPU v5e (PERF.md):
- conv1_mode: how the temporal-shift correction enters the conv1 matmul.
  "pair" does ONE K=2*fold dot on the first 2*fold channels with a
  lane-selected (next/prev) temporal diff — half the MXU passes of "fold"
  (two K=fold dots) since both folds fit one 128-wide K chunk at L1/L2;
  "masked" is one full-K dot on a channel-masked diff (no lane slicing,
  2x conv1 FLOPs).
- fpad: zero-pad the bottleneck width F up to a multiple of 128 lanes
  (host-side, weights/scales only). At L1 (F=64) this makes the im2col
  lane-concat and every intermediate tile-aligned; padded lanes stay
  exactly zero through relu(0*acc+0) so results are unchanged.
- rows: row-tile override (None = _pick_rows heuristic).
- dimsem: Mosaic dimension_semantics for the grid ("parallel" marks grid
  steps order-independent, enabling more aggressive pipelining).
- s2_mode / flat / gblk: see DEFAULT_TUNING below (stride-2 conv2
  strategy; flat whole-sample kernels; samples per flat grid step).

Layout rules this module is built around (each violation was hit and
measured/compile-errored on v5e — see PERF.md round 2):
- [T,R,W,C] <-> [M,C] reshapes are free only when W % 8 == 0; BLOCK
  widths are therefore padded to sublane multiples (Pallas ragged blocks
  DMA only valid columns and clip stores).
- sublane->lane pair merges ([.., 2w, C] -> [.., w, 2C]) are legal only
  FROM natural layouts at >=128-lane multiples, and pair-merged values
  must never be reshaped again.
- tpu.concatenate rejects operands whose sublane/lane offsets differ:
  shift full offset-0 tensors via concat, then lane-slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_TUNING = dict(
    conv1_mode="pair",  # "pair" | "fold" | "masked"
    # fpad measured SLOWER at L1 on v5e (the extra 128-wide MXU K chunks in
    # conv2 cost more than the alignment saves) — off by default
    fpad=False,         # pad F to a 128-lane multiple (host side)
    rows=None,          # row-tile override
    dimsem="parallel",  # None | "parallel"
    # stride-2 conv2 strategy: "pair" subsamples columns BEFORE the 3x3
    # dots (minimal FLOPs, but every dot input carries a pair-merged
    # (1,128) layout that Mosaic relayouts); "full" computes conv2 at full
    # width with natural layouts and subsamples the small y2 instead
    # (2x conv2 FLOPs, no relayouts). "auto" = full where conv2 is cheap
    # (F <= 128: ResNet50 layer2) and pair where it dominates (layers 3-4)
    # — the measured winner per stage (PERF.md round 2).
    s2_mode="auto",     # "auto" | "full" | "pair"
    # flat whole-sample [M, C] kernel for stride-1 non-projection blocks
    # whose sample fits VMEM: shifts-by-constant + iota masks instead of
    # 4-D reshapes (which relayout whenever W is not a sublane multiple)
    flat=True,
    # samples per flat grid step (None = auto by VMEM budget): deeper
    # layers' samples are tiny (3-6MB) and per-step overhead dominates;
    # batching samples needs only an extra clip-boundary mask on the
    # temporal-shift taps
    gblk=None,
    # flat kernel conv2 row taps as ONE N-stacked [M,3F]x[3F,3F] dot with
    # post-dot output shifts instead of 3 dots on shifted [M,3F] im2col
    # tensors (same MXU tile-passes, ~2/3 less VPU tensor building);
    # requires F % 128 == 0 — auto-disabled otherwise
    nstack=True,
    # max blocks per CHAIN kernel call (tsm_bottleneck_chain_pallas);
    # None = the whole run of consecutive plain blocks in one kernel
    chain=None,
)


def _conv1_shift(x, w1, fold: int, s1, b1, dt, mode: str):
    """Fused temporal-shift + 1x1 conv + bn/relu epilogue on a [T, R, W, C]
    tile (see tsm_conv_pallas.py docstring for the correction algebra).
    Returns bf16 [T, R, W, F]."""
    t, r, w, c = x.shape
    f = w1.shape[1]
    y = jnp.dot(x.reshape(t * r * w, c), w1,
                preferred_element_type=jnp.float32)
    zt = jnp.zeros_like(x[:1])
    if mode == "pair":
        # one dot over the first 2*fold channels: lanes [0,fold) need the
        # NEXT frame, lanes [fold,2fold) the PREVIOUS frame (zero at edges)
        x2 = x[..., : 2 * fold]
        z2 = zt[..., : 2 * fold]
        nxt = jnp.concatenate([x2[1:], z2], axis=0)
        prv = jnp.concatenate([z2, x2[: t - 1]], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * fold), 3)
        d = (jnp.where(lane < fold, nxt, prv) - x2).astype(x.dtype)
        y += jnp.dot(d.reshape(t * r * w, 2 * fold), w1[: 2 * fold],
                     preferred_element_type=jnp.float32)
    elif mode == "masked":
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, c), 3)
        x_next = jnp.concatenate([x[1:], zt], axis=0)
        x_prev = jnp.concatenate([zt, x[: t - 1]], axis=0)
        d = (
            jnp.where(lane < fold, x_next, 0.0)
            + jnp.where((lane >= fold) & (lane < 2 * fold), x_prev, 0.0)
            - jnp.where(lane < 2 * fold, x, 0.0)
        ).astype(x.dtype)
        y += jnp.dot(d.reshape(t * r * w, c), w1,
                     preferred_element_type=jnp.float32)
    else:  # "fold": two K=fold dots on lane slices
        def corr(xs, ws):
            return jnp.dot(xs.reshape(t * r * w, xs.shape[-1]), ws,
                           preferred_element_type=jnp.float32)

        # fold 0 at t reads x[t+1] (zero at t=T-1)
        xl = x[..., :fold]
        y += corr(jnp.concatenate([xl[1:], zt[..., :fold]], axis=0) - xl,
                  w1[:fold])
        # fold 1 at t reads x[t-1] (zero at t=0)
        xr = x[..., fold : 2 * fold]
        y += corr(
            jnp.concatenate([zt[..., fold : 2 * fold], xr[: t - 1]],
                            axis=0) - xr,
            w1[fold : 2 * fold],
        )
    y = jnp.maximum(y.astype(dt) * s1 + b1, 0.0)
    return y.reshape(t, r, w, f)


def _kernel(x_ref, *refs, fold: int, halo: bool, proj: bool,
            conv1_mode: str, planar: bool = False):
    """One (batch sample, row tile) step. Shapes:
    x_ref [1,T,R,W,C]; with halo also top/bot_ref [1,T,1,W,C];
    then w1 [C,F], w2 [3,3F,F] (dr-major im2col layout), w3 [F,Cout],
    s*/b* [1,*]; with proj also wp [C,Cout], sp/bp [1,Cout];
    o_ref [1,T,R,W,Cout]."""
    if halo:
        top_ref, bot_ref = refs[0], refs[1]
        refs = refs[2:]
    (w1_ref, w2_ref, w3_ref, s1_ref, b1_ref, s2_ref, b2_ref, s3_ref,
     b3_ref, *refs) = refs
    if proj:
        wp_ref, sp_ref, bp_ref, o_ref = refs
    else:
        (o_ref,) = refs
    t, r, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    f = w1_ref.shape[1]
    c_out = o_ref.shape[-1] // 2 if planar else o_ref.shape[-1]
    dt = o_ref.dtype

    x = x_ref[0]
    w1 = w1_ref[:]
    s1, b1 = s1_ref[0], b1_ref[0]
    c1 = functools.partial(_conv1_shift, w1=w1, fold=fold, s1=s1, b1=b1,
                           dt=dt, mode=conv1_mode)

    if halo:
        j = pl.program_id(1)
        n_tiles = pl.num_programs(1)
        # conv1 on body + halo rows (halo needs conv1 output for the 3x3).
        # At the TRUE image edges the halo must be the 3x3's SAME zero
        # padding — zero in y1 space, AFTER conv1 (conv1 of a zero row is
        # relu(b1), not zero).
        top_y = jnp.where(j == 0, 0.0, 1.0).astype(dt) * c1(top_ref[0])
        bot_y = (jnp.where(j == n_tiles - 1, 0.0, 1.0).astype(dt)
                 * c1(bot_ref[0]))
        y1 = jnp.concatenate([top_y, c1(x), bot_y], axis=1)  # [T,R+2,W,F]
    else:
        # whole image resident: zero-row padding instead of halo inputs
        zrow = jnp.zeros((t, 1, w, f), dt)
        y1 = jnp.concatenate([zrow, c1(x), zrow], axis=1)

    # 3x3 conv as width-im2col + 3 row-shifted K=3F matmuls:
    # z[t,r,w] = (y1[t,r,w-1], y1[t,r,w], y1[t,r,w+1])  (zero col padding)
    zc = jnp.zeros((t, r + 2, 1, f), dt)
    z = jnp.concatenate(
        [
            jnp.concatenate([zc, y1[:, :, :-1]], axis=2),
            y1,
            jnp.concatenate([y1[:, :, 1:], zc], axis=2),
        ],
        axis=-1,
    )  # [T, R+2, W, 3F]
    acc = jnp.dot(z[:, 1 : r + 1].reshape(t * r * w, 3 * f), w2_ref[1],
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(z[:, :r].reshape(t * r * w, 3 * f), w2_ref[0],
                   preferred_element_type=jnp.float32)
    acc += jnp.dot(z[:, 2 : r + 2].reshape(t * r * w, 3 * f), w2_ref[2],
                   preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc.astype(dt) * s2_ref[0] + b2_ref[0], 0.0)

    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    # cast the f32 accumulator ONCE, then fold BN3 / residual / relu in the
    # block dtype: epilogue passes over the wide [M, 4F] tensor were the
    # dominant VPU cost at f32 width (matches the plain bf16 model's
    # block-boundary precision)
    y3 = (y3.astype(dt) * s3_ref[0] + b3_ref[0]).reshape(t, r, w, c_out)
    if proj:
        res = jnp.dot(x.reshape(t * r * w, c), wp_ref[:],
                      preferred_element_type=jnp.float32)
        res = ((res.astype(dt) * sp_ref[0] + bp_ref[0])
               .reshape(t, r, w, c_out))
    else:
        res = x
    out = jnp.maximum(y3 + res, 0.0)
    if planar:
        # pair-merged store for a following stride-2 block0 (see
        # _kernel_s2_planar): sublane->lane merge FROM natural layout as
        # the final op; zero-fill up to the (possibly sublane-padded)
        # merged block width before the ragged store clips it.
        pm = out.reshape(t, r, w // 2, 2 * c_out)
        wpm = o_ref.shape[3]
        if wpm > w // 2:
            pm = jnp.concatenate(
                [pm, jnp.zeros((t, r, wpm - w // 2, 2 * c_out), dt)],
                axis=2)
        o_ref[0] = pm
    else:
        o_ref[0] = out


def _flat_block_body(x, w1, w2, s1, b1, s2, b2, s3, b3, w3, *, fold: int,
                     g: int, t: int, h: int, w: int, wt: int,
                     nstack: bool, dt):
    """One stride-1 non-projection bottleneck on FLAT [M, C] values
    (weights/affines as in-kernel VALUES so chains can index stacked
    refs). See _kernel_flat for the layout reasoning."""
    m, c = x.shape
    f = w1.shape[1]
    hw = h * w

    # conv1 + temporal-shift correction ("pair" form)
    y = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    x2 = x[:, : 2 * fold]
    zf = jnp.zeros((hw, 2 * fold), x.dtype)
    frame = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // hw
    nxt = jnp.concatenate([x2[hw:], zf], axis=0)
    prv = jnp.concatenate([zf, x2[: m - hw]], axis=0)
    if g > 1:
        nxt = jnp.where(frame % t == t - 1, 0.0, nxt).astype(x.dtype)
        prv = jnp.where(frame % t == 0, 0.0, prv).astype(x.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * fold), 1)
    d = (jnp.where(lane < fold, nxt, prv) - x2).astype(x.dtype)
    y += jnp.dot(d, w1[: 2 * fold], preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y.astype(dt) * s1 + b1, 0.0)  # [M, F]

    # column taps: shift by 1, zeroed at image-row boundaries
    colidx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w
    z1 = jnp.zeros((1, f), dt)
    left = jnp.where(colidx == 0, 0.0,
                     jnp.concatenate([z1, y1[: m - 1]], axis=0)).astype(dt)
    right = jnp.where(colidx >= wt - 1, 0.0,
                      jnp.concatenate([y1[1:], z1], axis=0)).astype(dt)
    zc = jnp.concatenate([left, y1, right], axis=-1)  # [M, 3F]
    # row taps: shift by w, zeroed at image top/bottom rows
    rowidx = (jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) // w) % h
    if nstack:
        dd = jnp.dot(zc, w2, preferred_element_type=jnp.float32)
        d0, d1, d2 = dd[:, :f], dd[:, f : 2 * f], dd[:, 2 * f :]
        zwf = jnp.zeros((w, f), jnp.float32)
        top = jnp.where(rowidx == 0, 0.0,
                        jnp.concatenate([zwf, d0[: m - w]], axis=0))
        bot = jnp.where(rowidx == h - 1, 0.0,
                        jnp.concatenate([d2[w:], zwf], axis=0))
        acc = d1 + top + bot
    else:
        zw = jnp.zeros((w, 3 * f), dt)
        top = jnp.where(rowidx == 0, 0.0,
                        jnp.concatenate([zw, zc[: m - w]], axis=0)
                        ).astype(dt)
        bot = jnp.where(rowidx == h - 1, 0.0,
                        jnp.concatenate([zc[w:], zw], axis=0)).astype(dt)
        acc = jnp.dot(zc, w2[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(top, w2[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(bot, w2[2], preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc.astype(dt) * s2 + b2, 0.0)

    y3 = jnp.dot(y2, w3, preferred_element_type=jnp.float32)
    y3 = y3.astype(dt) * s3 + b3
    return jnp.maximum(y3 + x, 0.0)


def _kernel_flat_chain(x_ref, w1_ref, w2_ref, w3_ref, s1_ref, b1_ref,
                       s2_ref, b2_ref, s3_ref, b3_ref, o_ref, *,
                       nblk: int, fold: int, h: int, w: int, wt: int,
                       planar: bool = False, nstack: bool = False):
    """CHAIN of nblk consecutive stride-1 non-projection bottlenecks on a
    whole VMEM-resident sample: x is read from HBM once and the chain's
    final output written once — the nblk-1 intermediate activations never
    touch HBM, and the per-grid-step overhead is paid once instead of
    nblk times. Weight refs are the single-block refs STACKED on a
    leading block axis (w1_ref [nblk, C, F], ...). No halo recompute:
    unlike the row-tiled 4-D kernels, the flat form already holds every
    row of the sample."""
    g, t, c = x_ref.shape[0], x_ref.shape[1], x_ref.shape[4]
    m = g * t * h * w
    dt = o_ref.dtype
    v = x_ref[:].reshape(m, c)
    for k in range(nblk):
        v = _flat_block_body(
            v, w1_ref[k], w2_ref[k], s1_ref[k], b1_ref[k], s2_ref[k],
            b2_ref[k], s3_ref[k], b3_ref[k], w3_ref[k],
            fold=fold, g=g, t=t, h=h, w=w, wt=wt, nstack=nstack, dt=dt)
    v = v.reshape(g, t, h, w, c)
    if planar:
        o_ref[:] = v.reshape(g, t, h, w // 2, 2 * c)
    else:
        o_ref[:] = v


def _kernel_halo_chain(x_ref, *refs, nblk: int, fold: int,
                       conv1_mode: str, h: int, rows: int,
                       planar: bool = False):
    """CHAIN of nblk stride-1 non-projection bottlenecks on a ROW-TILED
    4-D block — for stages whose samples exceed the flat kernels' VMEM
    budget (ResNet50 layer1). Fusing K blocks needs K halo rows per side
    (each chained conv2 consumes one more row than it produces), arriving
    as 2K clamped 1-row blocks; block k computes output rows
    [-e, R+e), e = K-1-k, and rows whose ABSOLUTE index falls outside the
    image are zeroed in y1 space (the 3x3's SAME padding — garbage in
    out-of-image halo rows can never reach a true output). HBM traffic
    for the pair: one read of x + one write of the final y (vs K reads +
    K writes unchained), at a conv recompute cost of ~2K/rows extra rows
    on the earliest block.

    refs: 2*nblk one-row halo refs (tops by ascending absolute row, then
    bots), then stacked weights w1s [K,C,F], w2s [K,3,3F,F], w3s [K,F,C],
    s1s/b1s/s2s/b2s [K,1,F], s3s/b3s [K,1,C], then o_ref."""
    k_h = nblk
    tops, bots = refs[:k_h], refs[k_h : 2 * k_h]
    (w1s, w2s, w3s, s1s, b1s, s2s, b2s, s3s, b3s, o_ref) = refs[2 * k_h :]
    t, r, w, c = (x_ref.shape[1], x_ref.shape[2], x_ref.shape[3],
                  x_ref.shape[4])
    f = w1s.shape[2]
    dt = o_ref.dtype
    j = pl.program_id(1)

    v = jnp.concatenate(
        [*(ref[0] for ref in tops), x_ref[0], *(ref[0] for ref in bots)],
        axis=1)  # [T, R+2K, W, C], rows at absolute j*rows - K + i
    for k in range(nblk):
        e = nblk - 1 - k
        ro = r + 2 * e           # this block's output rows
        rv = ro + 2              # = v's current row count
        c1 = functools.partial(_conv1_shift, w1=w1s[k], fold=fold,
                               s1=s1s[k][0], b1=b1s[k][0], dt=dt,
                               mode=conv1_mode)
        y1 = c1(v)  # [T, rv, W, F]
        # SAME zero padding at the true image edges: zero y1 rows whose
        # absolute index is outside [0, h) (covers both clamped halo
        # duplicates and garbage out-of-image rows from earlier blocks)
        rowabs = (j * rows - (e + 1)
                  + jax.lax.broadcasted_iota(jnp.int32, (1, rv, 1, 1), 1))
        y1 = jnp.where((rowabs >= 0) & (rowabs < h), y1, 0.0).astype(dt)

        zcol = jnp.zeros((t, rv, 1, f), dt)
        zc = jnp.concatenate(
            [
                jnp.concatenate([zcol, y1[:, :, :-1]], axis=2),
                y1,
                jnp.concatenate([y1[:, :, 1:], zcol], axis=2),
            ],
            axis=-1,
        )  # [T, rv, W, 3F]
        m = t * ro * w
        acc = jnp.dot(zc[:, 1 : ro + 1].reshape(m, 3 * f), w2s[k][1],
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(zc[:, :ro].reshape(m, 3 * f), w2s[k][0],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(zc[:, 2 : ro + 2].reshape(m, 3 * f), w2s[k][2],
                       preferred_element_type=jnp.float32)
        y2 = jnp.maximum(acc.astype(dt) * s2s[k][0] + b2s[k][0], 0.0)
        y3 = jnp.dot(y2, w3s[k], preferred_element_type=jnp.float32)
        y3 = (y3.astype(dt) * s3s[k][0] + b3s[k][0]).reshape(t, ro, w, c)
        v = jnp.maximum(y3 + v[:, 1 : 1 + ro], 0.0)

    if planar:
        o_ref[0] = v.reshape(t, r, w // 2, 2 * c)
    else:
        o_ref[0] = v


def _kernel_flat(x_ref, w1_ref, w2_ref, w3_ref, s1_ref, b1_ref, s2_ref,
                 b2_ref, s3_ref, b3_ref, o_ref, *, fold: int, h: int,
                 w: int, wt: int, planar: bool = False,
                 nstack: bool = False):
    """Whole-sample stride-1 non-projection bottleneck in FLAT [M, C]
    space (M = G*T*H*W; x_ref [G,T,H,W,C] — G whole samples per grid
    step, temporal taps masked at clip boundaries so samples never mix).

    Why flat: at layers 3-4 the image width (14/7) is not a sublane
    multiple, so every [T,R,W,C] <-> [M,C] reshape around a dot forces a
    Mosaic relayout of the full tensor. In flat space there are NO
    reshapes: the 3x3's column taps are shifts by 1, row taps shifts by W,
    and the temporal shift is a shift by H*W — all realized as offset-0
    concats, with iota masks zeroing the taps that would leak across an
    image-row / image / clip boundary (the 2-D zero padding).

    Blocks stay 4-D ([1,T,H,W,C]) with the block width W padded UP to a
    sublane multiple (wt = true width): Pallas ragged-block handling DMAs
    only the valid columns and clips stores, the VMEM ref is naturally
    tiled so the in-kernel flatten is free, and the pad columns (undefined
    contents) never reach a true output: dots mix only within a pixel's K
    lanes, the right tap is masked at col wt-1, the left at col 0, and
    row/temporal shifts map pad columns onto pad columns.

    The nstack row-tap form (see DEFAULT_TUNING) does ONE [M,3F]x[3F,3F]
    dot and row-shifts the three F-lane OUTPUT slices — same MXU
    tile-passes, ~2/3 less VPU tensor building (the shifted [M,3F]
    im2col tensors are never built; F is a 128-lane multiple on every
    flat layer so the f32 slices and adds are tile-aligned).

    Body shared with _kernel_flat_chain via _flat_block_body."""
    g, t, c = x_ref.shape[0], x_ref.shape[1], x_ref.shape[4]
    m = g * t * h * w
    dt = o_ref.dtype
    x = x_ref[:].reshape(m, c)
    v = _flat_block_body(
        x, w1_ref[:], w2_ref[:], s1_ref[:], b1_ref[:], s2_ref[:],
        b2_ref[:], s3_ref[:], b3_ref[:], w3_ref[:],
        fold=fold, g=g, t=t, h=h, w=w, wt=wt, nstack=nstack, dt=dt)
    v = v.reshape(g, t, h, w, c)
    if planar:
        # pair-merged store for a following stride-2 block0 (see
        # _kernel_s2_planar): the sublane->lane merge is the final op,
        # FROM a natural layout — the legal direction. w (the padded
        # block width) is even, so true columns pair with true columns.
        o_ref[:] = v.reshape(g, t, h, w // 2, 2 * c)
    else:
        o_ref[:] = v


def _kernel_s2(x_ref, top_ref, w1_ref, w2_ref, w3_ref, s1_ref, b1_ref,
               s2_ref, b2_ref, s3_ref, b3_ref, wp_ref, sp_ref, bp_ref,
               o_ref, *, fold: int, conv1_mode: str, s2_mode: str,
               wt: int):
    """Stride-2 projection bottleneck (ResNet v1.5: stride on the 3x3).

    x_ref [1,T,2R,W,C] = the input rows feeding out-rows [jR, jR+R);
    top_ref [1,T,1,W,C] = input row j*2R-1 (clamped; zeroed at j==0);
    o_ref [1,T,R,Wo,Cout]. Out row r uses input rows 2r-1, 2r, 2r+1 and
    out col w uses input cols 2w-1, 2w, 2w+1 (SAME padding, k=3, s=2).
    The residual is the stride-2 1x1 projection: x at even rows/cols.

    Block widths may be sublane-padded (ragged blocks; wt = TRUE width):
    in "pair" mode every tap of a surviving even-anchor output reads true
    columns only, so pad columns (undefined) never contaminate results;
    in "full" mode the last true column's right tap WOULD read a pad
    column (garbage lands in y2 odd lanes that only zero rows of w3
    cancel — which fails if the pad VMEM holds NaN/Inf), so pad columns
    of y1 are explicitly zeroed before the conv2 taps. The output block
    may be wider than W/2 (zero-filled before store, clipped by
    Pallas)."""
    t, r2, w, c = (x_ref.shape[1], x_ref.shape[2], x_ref.shape[3],
                   x_ref.shape[4])
    r, wo = r2 // 2, w // 2
    wob = o_ref.shape[3]
    f = w1_ref.shape[1]
    c_out = o_ref.shape[-1]
    dt = o_ref.dtype

    x = x_ref[0]
    c1 = functools.partial(_conv1_shift, w1=w1_ref[:], fold=fold,
                           s1=s1_ref[0], b1=b1_ref[0], dt=dt,
                           mode=conv1_mode)
    j = pl.program_id(1)
    top_y = jnp.where(j == 0, 0.0, 1.0).astype(dt) * c1(top_ref[0])
    y1 = jnp.concatenate([top_y, c1(x)], axis=1)  # [T, 2R+1, W, F]
    if s2_mode == "full" and wt < w:
        # sublane-padded block: zero y1's pad columns so the full-width
        # conv2 taps never propagate undefined pad VMEM (0*NaN = NaN)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
        y1 = jnp.where(col < wt, y1, 0.0).astype(dt)

    # Stride-2 selection rules on Mosaic: no strided slices/gathers, and
    # sublane->lane "pair" reshapes are only legal FROM a natural layout —
    # never reshape a pair-merged value again. So: select rows on the
    # UNTILED axis in 4-D, merge to 2-D from the natural layout, then
    # pair-merge once ([M, F] -> [M/2, 2F]: lanes [0,F) = even col 2w =
    # center tap, lanes [F,2F) = odd col 2w+1 = right tap) and feed dots
    # directly. The left tap (col 2w-1) is the previous pair's right tap:
    # one sublane shift, zeroed at each image row's first column.
    y1e = y1[:, : 2 * r].reshape(t, r, 2, w, f)
    row_taps = (
        y1e[:, :, 0],  # dr=0: y1 rows 0, 2, ..., 2r-2
        y1e[:, :, 1],  # dr=1: rows 1, 3, ..., 2r-1
        # dr=2: rows 2, 4, ..., 2r (Mosaic rejects zero-size operands, so
        # single-out-row tiles take the bare slice)
        (jnp.concatenate([y1e[:, 1:, 0], y1[:, 2 * r : 2 * r + 1]], axis=1)
         if r > 1 else y1[:, 2 : 3]),
    )
    m2 = t * r * wo
    if s2_mode == "full":
        # conv2 at FULL width with natural layouts (s1-kernel-style column
        # shifts), then subsample even columns from the small y2 via one
        # 2-D pair merge whose odd lanes are ignored by zero rows of the
        # [2F, Cout] conv3 weight. 2x conv2 FLOPs, zero relayouts.
        zc = jnp.zeros((t, r, 1, f), dt)
        acc = None
        for dr in (1, 0, 2):
            y = row_taps[dr]
            z = jnp.concatenate(
                [
                    jnp.concatenate([zc, y[:, :, :-1]], axis=2),
                    y,
                    jnp.concatenate([y[:, :, 1:], zc], axis=2),
                ],
                axis=-1,
            )  # [T, R, W, 3F]
            d = jnp.dot(z.reshape(t * r * w, 3 * f), w2_ref[dr],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        y2 = jnp.maximum(acc.astype(dt) * s2_ref[0] + b2_ref[0], 0.0)
        y2p = y2.reshape(m2, 2 * f)  # lanes [0,F) = even cols
        y3 = jnp.dot(y2p, w3_ref[:],  # [2F, Cout], odd-col rows zero
                     preferred_element_type=jnp.float32)
    else:
        col0 = (jax.lax.broadcasted_iota(jnp.int32, (m2, 1), 0) % wo) == 0
        zero_row = jnp.zeros((1, 2 * f), dt)
        acc = jnp.zeros((m2, f), jnp.float32)
        for dr in (1, 0, 2):
            v = row_taps[dr].reshape(t * r * w, f).reshape(m2, 2 * f)
            vprev = jnp.concatenate([zero_row, v[:-1]], axis=0)
            tap_l = jnp.where(col0, 0.0, vprev[:, f:]).astype(dt)
            z2 = jnp.concatenate([tap_l, v], axis=-1)  # [M/2,3F]=(L,C,R)
            acc += jnp.dot(z2, w2_ref[dr],
                           preferred_element_type=jnp.float32)
        y2 = jnp.maximum(acc.astype(dt) * s2_ref[0] + b2_ref[0], 0.0)
        y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    y3 = (y3.astype(dt) * s3_ref[0] + b3_ref[0]).reshape(t, r, wo, c_out)
    # stride-2 1x1 projection anchors at (0, 0): even rows via the untiled
    # split, even cols as the leading lane group of the 2-D pair merge
    # (offset-0 lane slice — feeds the dot without reshaping the merged
    # value, so no pad-to-2C FLOP doubling)
    xe = x.reshape(t, r, 2, w, c)[:, :, 0]
    xp = xe.reshape(t * r * w, c).reshape(m2, 2 * c)[:, :c]
    res = jnp.dot(xp, wp_ref[:], preferred_element_type=jnp.float32)
    res = (res.astype(dt) * sp_ref[0] + bp_ref[0]).reshape(t, r, wo, c_out)
    out = jnp.maximum(y3 + res, 0.0)
    if wob > wo:  # out block wider than the computed half-width
        out = jnp.concatenate(
            [out, jnp.zeros((t, r, wob - wo, c_out), dt)], axis=2)
    o_ref[0] = out


def _kernel_s2_planar(x_ref, top_ref, w1_ref, w2_ref,
                      w3_ref, s1_ref, b1_ref, s2_ref, b2_ref, s3_ref,
                      b3_ref, wp_ref, sp_ref, bp_ref, o_ref, *, fold: int,
                      conv1_mode: str):
    """Stride-2 projection bottleneck on a PAIR-MERGED column input.

    The inter-block layout redesign (TODO round 2): the producer block
    emits its output with adjacent columns packed into lanes —
    x[..., w, :C] = even col 2w, x[..., w, C:] = odd col 2w+1 — so the
    stride-2 column selection that forced an in-kernel sublane->lane pair
    merge (whose (1,128)-layout output Mosaic relayouts before every MXU
    pass: ~0.9GB/step at L2 block0) disappears entirely. The producer's
    merge happens right before its store FROM a natural layout (the legal
    direction), and this kernel only LANE-SLICES freshly loaded natural
    blocks at 128-multiples (clean, probe-verified). Every tap is then a
    natural-layout tensor:
      out col w: left tap = odd plane col w-1 (one sublane shift, zeroed
      at col 0), center tap = even plane col w, right tap = odd plane
      col w.
    Row selection stays on the untiled axis as in _kernel_s2. The
    projection residual is the even plane at even rows — no pair merge.

    x_ref [1,T,2R,Wh,2C] (Wh = sublane-padded half width; pad columns
    undefined — they only ever flow to pad output columns, which the
    ragged store clips); top_ref [1,T,1,Wh,2C] = merged input row
    j*2R-1 (clamped, zeroed at j==0); o_ref [1,T,R,Wh,Cout]."""
    t, r2, wh, c2 = (x_ref.shape[1], x_ref.shape[2], x_ref.shape[3],
                     x_ref.shape[4])
    c = c2 // 2
    r = r2 // 2
    f = w1_ref.shape[1]
    c_out = o_ref.shape[-1]
    dt = o_ref.dtype

    c1 = functools.partial(_conv1_shift, w1=w1_ref[:], fold=fold,
                           s1=s1_ref[0], b1=b1_ref[0], dt=dt,
                           mode=conv1_mode)
    j = pl.program_id(1)
    edge = jnp.where(j == 0, 0.0, 1.0).astype(dt)
    x = x_ref[0]
    top = top_ref[0]
    y1e = jnp.concatenate([edge * c1(top[..., :c]), c1(x[..., :c])],
                          axis=1)
    y1o = jnp.concatenate([edge * c1(top[..., c:]), c1(x[..., c:])],
                          axis=1)
    # [T, 2R+1, Wh, F] each

    def row_taps(y1):
        ye = y1[:, : 2 * r].reshape(t, r, 2, wh, f)
        return (
            ye[:, :, 0],  # dr=0: input rows 2r-1 relative to out row r
            ye[:, :, 1],  # dr=1: rows 2r
            (jnp.concatenate([ye[:, 1:, 0], y1[:, 2 * r : 2 * r + 1]],
                             axis=1)
             if r > 1 else y1[:, 2 : 3]),  # dr=2: rows 2r+1
        )

    taps_e = row_taps(y1e)
    taps_o = row_taps(y1o)
    m2 = t * r * wh
    zc = jnp.zeros((t, r, 1, f), dt)
    acc = None
    for dr in (1, 0, 2):
        ce, co = taps_e[dr], taps_o[dr]
        # left tap of out col w = odd col w-1 (zero at w == 0: SAME pad)
        tap_l = jnp.concatenate([zc, co[:, :, :-1]], axis=2)
        z = jnp.concatenate([tap_l, ce, co], axis=-1)  # [T,R,Wh,3F]
        d = jnp.dot(z.reshape(m2, 3 * f), w2_ref[dr],
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y2 = jnp.maximum(acc.astype(dt) * s2_ref[0] + b2_ref[0], 0.0)
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    y3 = (y3.astype(dt) * s3_ref[0] + b3_ref[0]).reshape(t, r, wh, c_out)
    # stride-2 1x1 projection: even plane at even rows — natural layout
    xe_even = x[..., :c].reshape(t, r, 2, wh, c)[:, :, 0]
    res = jnp.dot(xe_even.reshape(m2, c), wp_ref[:],
                  preferred_element_type=jnp.float32)
    res = (res.astype(dt) * sp_ref[0] + bp_ref[0]).reshape(t, r, wh, c_out)
    o_ref[0] = jnp.maximum(y3 + res, 0.0)


def tsm_bottleneck_s2_planar_pallas(xpm, w1, w2, w3, s1, b1, s2, b2,
                                    s3, b3, wp, sp, bp, n_segment: int,
                                    n_div: int = 8, tuning=None):
    """Pair-merged-input fused stride-2 downsample bottleneck:
    xpm [N*T, H, W/2, 2C] (adjacent columns packed into lanes:
    xpm[..., w, :C] = col 2w, xpm[..., w, C:] = col 2w+1)
    -> [N*T, H/2, W/2, Cout]. Producers emit this layout directly
    (tsm_bottleneck_pallas planar_out=True), removing the in-kernel
    stride-2 column-selection relayout. Weight/affine layout as
    tsm_bottleneck_s2_pallas."""
    tune = dict(DEFAULT_TUNING)
    if tuning:
        tune.update(tuning)
    nt, h, wh, c2 = xpm.shape
    c = c2 // 2
    b = nt // n_segment
    t = n_segment
    w1 = w1.reshape(c, -1).astype(xpm.dtype)
    f = w1.shape[1]
    w2 = w2.reshape(3, 3, f, f).astype(xpm.dtype)
    w3 = w3.reshape(f, -1).astype(xpm.dtype)
    c_out = w3.shape[1]
    fold = c // n_div

    s1, b1, s2, b2 = (jnp.asarray(v).reshape(-1) for v in (s1, b1, s2, b2))
    rows = tune["rows"] or _pick_rows_s2(h, 2 * wh, c, c_out, t,
                                         xpm.dtype.itemsize)
    assert (h // 2) % rows == 0, (
        f"rows override {rows} must divide output height {h // 2}")
    n_tiles = (h // 2) // rows
    x5 = xpm.reshape(b, t, h, wh, c2)
    grid = (b, n_tiles)
    whb = -(-wh // 8) * 8  # sublane-padded ragged half-width block

    def vec(v, n):
        return jnp.asarray(v).reshape(1, n).astype(xpm.dtype)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_s2_planar, fold=fold,
                          conv1_mode=tune["conv1_mode"]),
        out_shape=jax.ShapeDtypeStruct((b, t, h // 2, wh, c_out),
                                       xpm.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, 2 * rows, whb, c2),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, t, 1, whb, c2),
                lambda i, j: (i, 0, jnp.maximum(j * 2 * rows - 1, 0),
                              0, 0),
                memory_space=pltpu.VMEM),
            full((c, f)), full((3, 3 * f, f)), full((f, c_out)),
            full((1, f)), full((1, f)), full((1, f)), full((1, f)),
            full((1, c_out)), full((1, c_out)),
            full((c, c_out)), full((1, c_out)), full((1, c_out)),
        ],
        out_specs=pl.BlockSpec((1, t, rows, whb, c_out),
                               lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=(
                (tune["dimsem"],) * 2 if tune["dimsem"] else None
            ),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x5, x5, w1, w2.reshape(3, 3 * f, f), w3,
        vec(s1, f), vec(b1, f), vec(s2, f), vec(b2, f),
        vec(s3, c_out), vec(b3, c_out),
        wp.reshape(c, c_out).astype(xpm.dtype),
        vec(sp, c_out), vec(bp, c_out),
    )
    return out.reshape(nt, h // 2, wh, c_out)


def _pick_rows_s2(h: int, w: int, c: int, c_out: int, t: int,
                  es: int = 2) -> int:
    """Out-row tile size for the stride-2 kernel (body is 2R input rows);
    es = activation itemsize (bf16 hot path = 2; f32 doubles budgets)."""
    f = c_out // 4
    # per OUT row: 2 input rows + half-res output + y1 (2 rows) + z + acc
    bytes_per_row = t * w * (
        2 * c * es + c_out * es // 2 + 2 * f * es + 3 * f * es // 2
        + 2 * f)
    ho = h // 2
    rows = max(1, (24 * 1024 * 1024) // max(bytes_per_row, 1))
    if rows >= ho:
        return ho
    n_tiles = -(-ho // rows)
    while ho % n_tiles:
        n_tiles += 1
    return ho // n_tiles


def tsm_bottleneck_s2_pallas(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                             wp, sp, bp, n_segment: int, n_div: int = 8,
                             tuning=None):
    """Fused inference stride-2 downsample bottleneck:
    x [N*T, H, W, C] -> [N*T, H/2, W/2, Cout] with the stride-2 1x1
    projection residual (ResNet50 layer2/3/4 block0; v1.5 stride placement
    on the 3x3). Weight/affine layout as tsm_bottleneck_pallas."""
    tune = dict(DEFAULT_TUNING)
    if tuning:
        tune.update(tuning)
    nt, h, w, c = x.shape
    b = nt // n_segment
    t = n_segment
    w1 = w1.reshape(c, -1).astype(x.dtype)
    f = w1.shape[1]
    w2 = w2.reshape(3, 3, f, f).astype(x.dtype)
    w3 = w3.reshape(f, -1).astype(x.dtype)
    c_out = w3.shape[1]
    fold = c // n_div

    s1, b1, s2, b2 = (jnp.asarray(v).reshape(-1) for v in (s1, b1, s2, b2))
    if tune["fpad"] and f % 128:
        fp = -(-f // 128) * 128
        w1 = jnp.pad(w1, ((0, 0), (0, fp - f)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, fp - f), (0, fp - f)))
        w3 = jnp.pad(w3, ((0, fp - f), (0, 0)))
        s1, b1, s2, b2 = (jnp.pad(v, (0, fp - f)) for v in (s1, b1, s2, b2))
        f = fp

    s2_mode = tune["s2_mode"]
    if s2_mode == "auto":
        s2_mode = "full" if f <= 128 else "pair"
    if s2_mode == "full":
        # conv3 consumes the pair-merged full-width y2: odd-col K rows zero
        w3 = jnp.pad(w3, ((0, f), (0, 0)))
    rows = tune["rows"] or _pick_rows_s2(h, w, c, c_out, t,
                                          x.dtype.itemsize)
    assert (h // 2) % rows == 0, (
        f"rows override {rows} must divide output height {h // 2}")
    n_tiles = (h // 2) // rows
    x5 = x.reshape(b, t, h, w, c)
    grid = (b, n_tiles)
    wp8 = -(-w // 8) * 8        # sublane-padded ragged block width
    wob = -(-(w // 2) // 8) * 8  # padded output block width

    def vec(v, n):
        return jnp.asarray(v).reshape(1, n).astype(x.dtype)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_s2, fold=fold,
                          conv1_mode=tune["conv1_mode"],
                          s2_mode=s2_mode, wt=w),
        out_shape=jax.ShapeDtypeStruct((b, t, h // 2, w // 2, c_out),
                                       x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, 2 * rows, wp8, c),
                         lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, wp8, c),
                         lambda i, j: (i, 0,
                                       jnp.maximum(j * 2 * rows - 1, 0),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            full((c, f)), full((3, 3 * f, f)), full((w3.shape[0], c_out)),
            full((1, f)), full((1, f)), full((1, f)), full((1, f)),
            full((1, c_out)), full((1, c_out)),
            full((c, c_out)), full((1, c_out)), full((1, c_out)),
        ],
        out_specs=pl.BlockSpec((1, t, rows, wob, c_out),
                               lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=(
                (tune["dimsem"],) * 2 if tune["dimsem"] else None
            ),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        x5, x5, w1, w2.reshape(3, 3 * f, f), w3,
        vec(s1, f), vec(b1, f), vec(s2, f), vec(b2, f),
        vec(s3, c_out), vec(b3, c_out),
        wp.reshape(c, c_out).astype(x.dtype),
        vec(sp, c_out), vec(bp, c_out),
    )
    return out.reshape(nt, h // 2, w // 2, c_out)


def flat_sample_fits(t: int, h: int, w: int, c: int, itemsize: int) -> bool:
    """True when one whole sample (plus flat-kernel intermediates) fits
    the VMEM budget — the gate for the flat whole-sample kernels (and
    chains; chaining adds one sample-sized live value, covered by the
    margin in the factor)."""
    return (t * h * (-(-w // 8) * 8) * c * itemsize * 7
            <= 100 * 1024 * 1024)


def _chain_fits(t: int, h: int, w: int, c: int, f: int,
                itemsize: int) -> bool:
    """VMEM estimate for the CHAIN kernel: in/out double-buffered sample
    pairs + the live chain value + y1/zc intermediates + the f32 conv3
    accumulator. Chain length does not change the peak (one block body
    live at a time)."""
    wp = -(-w // 8) * 8
    m = t * h * wp
    bytes_ = m * (itemsize * (5 * c + 4 * f) + 4 * c)
    return bytes_ <= 100 * 1024 * 1024


def tsm_bottleneck_chain_pallas(x, blocks, n_segment: int, n_div: int = 8,
                                tuning=None, planar_out: bool = False):
    """CHAIN of consecutive stride-1 non-projection fused bottlenecks:
    x [N*T, H, W, C] -> [N*T, H, W, C] (or the planar pair-merged layout
    with planar_out). blocks = sequence of per-block parameter tuples
    (w1, w2, w3, s1, b1, s2, b2, s3, b3) with the same layouts as
    tsm_bottleneck_pallas.

    The whole chain runs in ONE kernel per sample: intermediate block
    activations stay VMEM-resident (no HBM round-trips between blocks)
    and the per-grid-step overhead — which dominates the deep layers,
    where a sample's dots are far too small to fill the MXU — is paid
    once instead of len(blocks) times. Falls back to shorter sub-chains
    automatically if the VMEM estimate rejects the full chain (the peak
    is chain-length-independent, so in practice it either chains fully
    or the caller should not have chained at all)."""
    tune = dict(DEFAULT_TUNING)
    if tuning:
        tune.update(tuning)
    nt, h, w, c = x.shape
    b = nt // n_segment
    t = n_segment
    dt = x.dtype
    fold = c // n_div
    wp8 = -(-w // 8) * 8
    assert flat_sample_fits(t, h, w, c, dt.itemsize), (t, h, w, c)

    nblk = len(blocks)
    norm = []
    f = None
    for (w1, w2, w3, s1, b1, s2, b2, s3, b3) in blocks:
        w1 = w1.reshape(c, -1).astype(dt)
        if f is None:
            f = w1.shape[1]
        assert w1.shape[1] == f
        w2 = w2.reshape(3, 3, f, f).astype(dt)
        w3 = w3.reshape(f, -1).astype(dt)
        assert w3.shape[1] == c, "chain blocks must be non-projection"
        vec = lambda v, n: jnp.asarray(v).reshape(1, n).astype(dt)
        norm.append((w1, w2, w3, vec(s1, f), vec(b1, f), vec(s2, f),
                     vec(b2, f), vec(s3, c), vec(b3, c)))

    nstack = tune["nstack"] and f % 128 == 0

    def pack_w2(w2):
        w2r = w2.reshape(3, 3 * f, f)
        if nstack:
            return jnp.concatenate([w2r[0], w2r[1], w2r[2]], axis=1)
        return w2r

    flat_full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    w2shape = (3 * f, 3 * f) if nstack else (3, 3 * f, f)

    gblk = tune["gblk"] or 1
    while b % gblk:
        gblk -= 1

    def run_chain(v, group, planar):
        k = len(group)
        stacked = [
            jnp.stack([pack_w2(g[1]) if i == 1 else g[i] for g in group])
            for i in range(9)
        ]
        # order: w1s, w2s, w3s, s1s, b1s, s2s, b2s, s3s, b3s
        return pl.pallas_call(
            functools.partial(_kernel_flat_chain, nblk=k, fold=fold, h=h,
                              w=wp8, wt=w, planar=planar, nstack=nstack),
            out_shape=jax.ShapeDtypeStruct(
                (b, t, h, w // 2, 2 * c) if planar else (b, t, h, w, c),
                dt),
            grid=(b // gblk,),
            in_specs=[
                pl.BlockSpec((gblk, t, h, wp8, c),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                flat_full((k, c, f)), flat_full((k, *w2shape)),
                flat_full((k, f, c)),
                flat_full((k, 1, f)), flat_full((k, 1, f)),
                flat_full((k, 1, f)), flat_full((k, 1, f)),
                flat_full((k, 1, c)), flat_full((k, 1, c)),
            ],
            out_specs=pl.BlockSpec(
                (gblk, t, h, wp8 // 2, 2 * c) if planar
                else (gblk, t, h, wp8, c),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=(
                    (tune["dimsem"],) if tune["dimsem"] else None),
            ),
            interpret=jax.default_backend() != "tpu",
        )(v.reshape(b, t, h, w, c), *stacked).reshape(
            nt, h, *((w // 2, 2 * c) if planar else (w, c)))

    max_len = tune.get("chain") or nblk
    if not _chain_fits(t, h, w, c, f, dt.itemsize):
        max_len = 1
    v = x
    i = 0
    while i < nblk:
        group = norm[i : i + max_len]
        last = i + len(group) >= nblk
        v = run_chain(v, group, planar_out and last)
        i += len(group)
    return v


def tsm_bottleneck_halo_chain_pallas(x, blocks, n_segment: int,
                                     n_div: int = 8, tuning=None,
                                     planar_out: bool = False):
    """Row-tiled CHAIN of stride-1 non-projection fused bottlenecks for
    stages whose samples exceed the flat kernels' VMEM budget (layer1).
    blocks = per-block (w1, w2, w3, s1, b1, s2, b2, s3, b3); see
    _kernel_halo_chain. Requires W % 8 == 0 (no ragged-width support —
    true for layer1's 56)."""
    tune = dict(DEFAULT_TUNING)
    if tuning:
        tune.update(tuning)
    nt, h, w, c = x.shape
    assert w % 8 == 0, w
    b = nt // n_segment
    t = n_segment
    dt = x.dtype
    fold = c // n_div
    nblk = len(blocks)

    norm = []
    f = None
    for (w1, w2, w3, s1, b1, s2, b2, s3, b3) in blocks:
        w1 = w1.reshape(c, -1).astype(dt)
        if f is None:
            f = w1.shape[1]
        w2 = w2.reshape(3, 3, f, f).astype(dt).reshape(3, 3 * f, f)
        w3 = w3.reshape(f, -1).astype(dt)
        assert w3.shape[1] == c
        vec = lambda v, n: jnp.asarray(v).reshape(1, n).astype(dt)
        norm.append((w1, w2, w3, vec(s1, f), vec(b1, f), vec(s2, f),
                     vec(b2, f), vec(s3, c), vec(b3, c)))
    stacked = [jnp.stack([g[i] for g in norm]) for i in range(9)]

    es = dt.itemsize
    # per-out-row live set: x + v + out (+dbuf) at C lanes, y1/zc at
    # F/3F, f32 conv accumulators at 4C+4F
    bpr = t * w * (es * (5 * c + 4 * f) + 4 * (c + f))
    rows = tune["rows"] or max(1, min(h, (60 * 1024 * 1024) // bpr))
    while h % rows:
        rows -= 1
    grid = (b, h // rows)
    x5 = x.reshape(b, t, h, w, c)

    def top_spec(i):
        return pl.BlockSpec(
            (1, t, 1, w, c),
            lambda bi, j, i=i: (bi, 0,
                                jnp.maximum(j * rows - nblk + i, 0), 0, 0),
            memory_space=pltpu.VMEM)

    def bot_spec(i):
        return pl.BlockSpec(
            (1, t, 1, w, c),
            lambda bi, j, i=i: (bi, 0,
                                jnp.minimum(j * rows + rows + i, h - 1),
                                0, 0),
            memory_space=pltpu.VMEM)

    full = lambda shape: pl.BlockSpec(
        shape, lambda bi, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_halo_chain, nblk=nblk, fold=fold,
                          conv1_mode=tune["conv1_mode"], h=h, rows=rows,
                          planar=planar_out),
        out_shape=jax.ShapeDtypeStruct(
            (b, t, h, w // 2, 2 * c) if planar_out else (b, t, h, w, c),
            dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, rows, w, c),
                         lambda bi, j: (bi, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            *(top_spec(i) for i in range(nblk)),
            *(bot_spec(i) for i in range(nblk)),
            full((nblk, c, f)), full((nblk, 3, 3 * f, f)),
            full((nblk, f, c)),
            full((nblk, 1, f)), full((nblk, 1, f)),
            full((nblk, 1, f)), full((nblk, 1, f)),
            full((nblk, 1, c)), full((nblk, 1, c)),
        ],
        out_specs=pl.BlockSpec(
            (1, t, rows, w // 2, 2 * c) if planar_out
            else (1, t, rows, w, c),
            lambda bi, j: (bi, 0, j, 0, 0),
            memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=(
                (tune["dimsem"],) * 2 if tune["dimsem"] else None),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x5, *([x5] * (2 * nblk)), *stacked)
    return out.reshape(nt, h, *((w // 2, 2 * c) if planar_out
                                else (w, c)))


def _pick_rows(h: int, w: int, c: int, t: int, es: int = 2) -> int:
    """Row-tile size. Prefer the WHOLE image per grid step when its
    working set fits ~40MB of VMEM — the block DMA is then one fully
    contiguous chunk, which is what gets Pallas near the HBM roofline;
    otherwise split into equal halo tiles of ~14MB (x + out + y1 + im2col
    + f32 accumulators, x/out doubled by pipelining). es = activation
    itemsize (2 on the bf16 hot path; f32 halves the feasible tiles)."""
    f = c // 4
    bytes_per_row = t * w * (2 * c * es + f * es + f * 4 + f * es)
    if bytes_per_row * h <= 40 * 1024 * 1024:
        return h
    rows = max(1, (26 * 1024 * 1024) // max(bytes_per_row, 1))
    n_tiles = -(-h // rows)  # ceil
    while h % n_tiles:
        n_tiles += 1
    return h // n_tiles


def tsm_bottleneck_pallas(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                          n_segment: int, n_div: int = 8,
                          wp=None, sp=None, bp=None, tuning=None,
                          planar_out: bool = False):
    """Fused inference bottleneck: x [N*T, H, W, C] -> [N*T, H, W, Cout].

    w1 [1,1,C,F] or [C,F]; w2 [3,3,F,F]; w3 [1,1,F,Cout] or [F,Cout];
    s*/b*: inference-folded BatchNorm scale/bias per conv output. With
    wp/sp/bp ([C,Cout] + affine) the residual goes through the projection
    conv (stride-1 downsample blocks, e.g. ResNet50 layer1 block0).
    tuning: optional dict overriding DEFAULT_TUNING entries.
    planar_out: emit [N*T, H, W/2, 2*Cout] with adjacent columns packed
    into lanes — the input layout of tsm_bottleneck_s2_planar_pallas
    (used when the NEXT block is a fused stride-2 downsample)."""
    tune = dict(DEFAULT_TUNING)
    if tuning:
        tune.update(tuning)
    nt, h, w, c = x.shape
    if planar_out:
        assert w % 2 == 0, w
    b = nt // n_segment
    t = n_segment
    w1 = w1.reshape(c, -1).astype(x.dtype)
    f = w1.shape[1]
    w2 = w2.reshape(3, 3, f, f).astype(x.dtype)
    w3 = w3.reshape(f, -1).astype(x.dtype)
    c_out = w3.shape[1]
    assert (wp is not None) == (c_out != c), (c, c_out)
    fold = c // n_div

    s1, b1, s2, b2 = (jnp.asarray(v).reshape(-1) for v in (s1, b1, s2, b2))
    if tune["fpad"] and f % 128:
        # zero-pad the bottleneck width to full 128-lane tiles: padded y1/y2
        # lanes are exactly relu(0*acc + 0) = 0 and w3's padded rows are
        # zero, so the result is bit-identical while every lane concat,
        # slice, and dot in the kernel becomes tile-aligned
        fp = -(-f // 128) * 128
        w1 = jnp.pad(w1, ((0, 0), (0, fp - f)))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, fp - f), (0, fp - f)))
        w3 = jnp.pad(w3, ((0, fp - f), (0, 0)))
        s1, b1, s2, b2 = (jnp.pad(v, (0, fp - f)) for v in (s1, b1, s2, b2))
        f = fp

    rows = tune["rows"] or _pick_rows(h, w, max(c, c_out), t,
                                      x.dtype.itemsize)
    assert h % rows == 0, (
        f"rows override {rows} must divide image height {h}")
    n_tiles = h // rows
    x5 = x.reshape(b, t, h, w, c)

    def vec(v, n):
        return jnp.asarray(v).reshape(1, n).astype(x.dtype)

    halo = n_tiles > 1
    grid = (b, n_tiles) if halo else (b,)
    proj = wp is not None

    flat_fits = flat_sample_fits(t, h, w, max(c, c_out), x.dtype.itemsize)
    if not halo and not proj and tune["flat"] and flat_fits:
        wp8 = -(-w // 8) * 8  # pad the BLOCK width to a sublane multiple
        # gblk > 1 measured SLOWER on v5e even at layer 4 (the clip-
        # boundary masks and bigger working set outweigh the per-step
        # amortization) — kept as a knob, default one sample per step
        gblk = tune["gblk"] or 1
        while b % gblk:
            gblk -= 1
        flat_full = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM)
        out_shape = ((b, t, h, w // 2, 2 * c_out) if planar_out
                     else (b, t, h, w, c_out))
        out_block = ((gblk, t, h, wp8 // 2, 2 * c_out) if planar_out
                     else (gblk, t, h, wp8, c_out))
        nstack = tune["nstack"] and f % 128 == 0
        w2r = w2.reshape(3, 3 * f, f)
        if nstack:  # stack the 3 row-tap weights on N: [3F, 3F]
            w2flat = jnp.concatenate([w2r[0], w2r[1], w2r[2]], axis=1)
            w2spec = flat_full((3 * f, 3 * f))
        else:
            w2flat = w2r
            w2spec = flat_full((3, 3 * f, f))
        out = pl.pallas_call(
            functools.partial(_kernel_flat, fold=fold, h=h, w=wp8, wt=w,
                              planar=planar_out, nstack=nstack),
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            grid=(b // gblk,),
            in_specs=[
                pl.BlockSpec((gblk, t, h, wp8, c),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                flat_full((c, f)), w2spec,
                flat_full((f, c_out)),
                flat_full((1, f)), flat_full((1, f)),
                flat_full((1, f)), flat_full((1, f)),
                flat_full((1, c_out)), flat_full((1, c_out)),
            ],
            out_specs=pl.BlockSpec(out_block,
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=(
                    (tune["dimsem"],) if tune["dimsem"] else None),
            ),
            interpret=jax.default_backend() != "tpu",
        )(
            x5, w1, w2flat, w3,
            vec(s1, f), vec(b1, f), vec(s2, f), vec(b2, f),
            vec(s3, c_out), vec(b3, c_out),
        )
        return out.reshape(nt, h, *out_shape[3:])

    if halo:
        idx = lambda i, j: (i, 0, j, 0, 0)
        body_spec = pl.BlockSpec((1, t, rows, w, c), idx,
                                 memory_space=pltpu.VMEM)
        # halo rows: 1-row blocks at absolute rows j*rows-1 / j*rows+rows,
        # CLAMPED into range at the edges (the kernel zeroes them there)
        halo_specs = [
            pl.BlockSpec(
                (1, t, 1, w, c),
                lambda i, j: (i, 0, jnp.maximum(j * rows - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t, 1, w, c),
                lambda i, j: (i, 0, jnp.minimum(j * rows + rows, h - 1),
                              0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        halo_args = [x5, x5]
    else:
        # whole sample per step: ONE fully contiguous DMA per block
        idx = lambda i: (i, 0, 0, 0, 0)
        body_spec = pl.BlockSpec((1, t, h, w, c), idx,
                                 memory_space=pltpu.VMEM)
        halo_specs, halo_args = [], []

    full = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: tuple(0 for _ in shape)) if halo
        else (lambda i: tuple(0 for _ in shape)),
        memory_space=pltpu.VMEM,
    )

    proj = wp is not None
    proj_specs, proj_args = [], []
    if proj:
        proj_specs = [full((c, c_out)), full((1, c_out)), full((1, c_out))]
        proj_args = [wp.reshape(c, c_out).astype(x.dtype),
                     vec(sp, c_out), vec(bp, c_out)]

    if planar_out:
        wpmb = -(-(w // 2) // 8) * 8  # merged block width, sublane-padded
        out_shape = (b, t, h, w // 2, 2 * c_out)
        out_block = ((1, t, rows, wpmb, 2 * c_out) if halo
                     else (1, t, h, wpmb, 2 * c_out))
    else:
        out_shape = (b, t, h, w, c_out)
        out_block = ((1, t, rows, w, c_out) if halo
                     else (1, t, h, w, c_out))
    out = pl.pallas_call(
        functools.partial(_kernel, fold=fold, halo=halo, proj=proj,
                          conv1_mode=tune["conv1_mode"],
                          planar=planar_out),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        grid=grid,
        in_specs=[
            body_spec, *halo_specs,
            full((c, f)), full((3, 3 * f, f)), full((f, c_out)),
            full((1, f)), full((1, f)), full((1, f)), full((1, f)),
            full((1, c_out)), full((1, c_out)),
            *proj_specs,
        ],
        out_specs=pl.BlockSpec(out_block, idx,
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=(
                (tune["dimsem"],) * len(grid) if tune["dimsem"] else None
            ),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        # w2 in dr-major / dc-stacked im2col layout: [3, 3F, F]
        x5, *halo_args, w1, w2.reshape(3, 3 * f, f), w3,
        vec(s1, f), vec(b1, f), vec(s2, f), vec(b2, f),
        vec(s3, c_out), vec(b3, c_out),
        *proj_args,
    )
    return out.reshape(nt, h, *out_shape[3:])


def tsm_bottleneck_reference(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                             n_segment: int, n_div: int = 8):
    """Pure-XLA reference of the fused block (tests + non-TPU fallback)."""
    from .temporal_shift import temporal_shift

    nt, h, w, c = x.shape
    f = w1.reshape(c, -1).shape[1]
    conv = lambda y, k: jax.lax.conv_general_dilated(
        y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = temporal_shift(x, n_segment, n_div)
    y = conv(y, w1.reshape(1, 1, c, f).astype(x.dtype))
    y = jnp.maximum(y * s1 + b1, 0).astype(x.dtype)
    y = conv(y, w2.reshape(3, 3, f, f).astype(x.dtype))
    y = jnp.maximum(y * s2 + b2, 0).astype(x.dtype)
    y = conv(y, w3.reshape(1, 1, f, c).astype(x.dtype))
    y = y * s3 + b3
    return jnp.maximum(y + x, 0).astype(x.dtype)
