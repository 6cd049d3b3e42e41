"""Training-mode fused ResNet-TSM TRUNK: all bottlenecks in ONE custom
VJP, chained 5-d end-to-end with cross-block kernel fusion.

The per-block training kernels (ops/tsm_block_train_pallas.py) already
fuse each bottleneck's convs, temporal shift and batch-stat BN, but the
per-block custom_vjp boundary leaves ~32% of the B=4 train step as XLA
glue BETWEEN blocks (PERF.md round-3 training profile, 131.8 ms total):

- backward relu-mask + BN3/BNp moment reduces (convert_reduce_fusion,
  15.0 + 3.3 ms): four full passes of a 4F tensor per block;
- the forward finale relu(bn3(p) + residual) (broadcast_maximum, ~10 ms):
  three more passes;
- materialized f32 converts of p shared between the finale and the
  backward reduce (~9.3 + 1.8 ms of "data formatting") plus the 4-d<->5-d
  residual reshapes around every custom call.

This module removes all of it structurally, replacing the reference's
train-time temporal-shift autograd Function + torch BN training semantics
(/root/reference/video_chapter_generation/ops/temporal_shift.py:54-81,
train_video_segment_ddp.py) at trunk granularity:

- block N's FK1 consumes (p, r) of block N-1 and computes the finale
  IN-KERNEL, writing block N's input once (no XLA finale, no f32 p copy);
- block N's BK1 epilogue relu-masks its dx into block N-1's dq and
  accumulates block N-1's BN3(/BNp) backward moment sums (no XLA
  convert+reduce pass);
- every tensor between blocks stays 5-d [B,T,H,W,C] (no reshapes);
- at stage boundaries the stride-2 BK1 emits block N-1's dq in the
  planar even/odd-column form with per-plane moments; ONE XLA reshape
  interleaves (exactly the relayout the per-block path already paid).

Only three XLA regions remain per step: the top block's relu-mask +
moment pass (7x7-scale), the top finale, and the three stage-boundary
interleaves.

Numerics are bit-compatible with the per-block fusedtrain path (the
finale and mask math reproduce the former XLA chains' rounding exactly);
tests/test_tsm_trunk_train_pallas.py checks forward, stats and all grads
against jax.grad of the pure-XLA reference at f32 in interpret mode, and
the model-level path against the tap3 training stack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tsm_block_train_pallas import (
    _backward,
    _backward_s2,
    _bn_vectors,
    _forward,
    _forward_s2,
)

# block kinds: "proj" = stride-1 projection (layer1 block0), "s2" =
# stride-2 projection (block0 of later stages), "plain" = the rest.
# Param tuples: plain (w1, w2, w3, g1, be1, g2, be2, g3, be3);
# proj/s2 (w1, w2, w3, wp, g1, be1, g2, be2, g3, be3, gp, bep).


def _unpack(bk, kind):
    if kind == "plain":
        w1, w2, w3, g1, be1, g2, be2, g3, be3 = bk
        return w1, w2, w3, None, g1, be1, g2, be2, g3, be3, None, None
    return bk


def _trunk_forward(x4, blocks, kinds, t, n_div, eps):
    nt = x4.shape[0]
    b = nt // t
    x5 = x4.reshape(b, t, *x4.shape[1:])
    prev = None
    saved = []
    stats_all = []
    for bk, kind in zip(blocks, kinds):
        w1, w2, w3, wpj, g1, be1, g2, be2, g3, be3, gp, bep = _unpack(
            bk, kind)
        if kind == "s2":
            out = _forward_s2(x5, w1, w2, w3, wpj, g1, be1, g2, be2,
                              g3, be3, gp, bep, t, n_div, eps,
                              prev=prev, trunk=True)
        else:
            out = _forward(x5, w1, w2, w3, g1, be1, g2, be2, g3, be3,
                           t, n_div, eps, wproj=wpj, gp=gp, bep=bep,
                           prev=prev, trunk=True)
        x5b, u5, z5, p5, pr5, stats = out
        sa3, sb3 = _bn_vectors(g3, stats[4], stats[5], be3, eps)
        if kind == "plain":
            prev = ("plain", p5, x5b, sa3, sb3, None, None)
        else:
            sap, sbp = _bn_vectors(gp, stats[6], stats[7], bep, eps)
            prev = ("proj", p5, pr5, sa3, sb3, sap, sbp)
        # p5 is NOT kept as a residual (the backward recomputes it from
        # z via the FK3 dot / finale inversion — tsm_block_train_pallas
        # _bk3/_bk1 epilogues); only the top block's p (7x7-scale) is
        # returned for the XLA prologue. pr5 stays: the projection
        # blocks' own BK1 needs it pointwise for the BNp backward.
        saved.append((x5b, u5, z5, pr5))
        stats_all.append(stats)
        x5 = None
    # top-block finale in XLA (the only one left; 7x7-scale on ResNet50)
    mode, pp, rr, sa3, sb3, sap, sbp = prev
    dt = pp.dtype
    a3 = (pp.astype(jnp.float32) * sa3 + sb3).astype(dt)
    if mode == "proj":
        rr = (rr.astype(jnp.float32) * sap + sbp).astype(dt)
    y5 = jnp.maximum(a3.astype(jnp.float32) + rr.astype(jnp.float32),
                     0.0).astype(dt)
    bb, tt, ho, wo, co = y5.shape
    y4 = y5.reshape(bb * tt, ho, wo, co)
    return y4, tuple(stats_all), (tuple(saved), y5, pp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def tsm_trunk_train(x, blocks, kinds, n_segment: int, n_div: int = 8,
                    eps: float = 1e-5):
    """Training-mode fused bottleneck TRUNK: x [N*T, H, W, C] through
    every ResNet bottleneck -> (y [N*T, H', W', C'], per-block stats).

    blocks: tuple of per-block param tuples (see module docstring);
    kinds: matching tuple of "plain" | "proj" | "s2" (static). Returns
    the trunk output and a tuple of per-block batch-stat tuples for the
    caller's running-average updates. Fully differentiable wrt x and
    every array in blocks via the hand-written cross-block Pallas
    backward."""
    y, stats, _ = _trunk_forward(x, blocks, kinds, n_segment, n_div, eps)
    return y, stats


def _trunk_vjp_fwd(x, blocks, kinds, n_segment, n_div, eps):
    y, stats, (saved, y5_top, p_top) = _trunk_forward(
        x, blocks, kinds, n_segment, n_div, eps)
    res = (saved, y5_top, p_top, blocks,
           tuple(tuple(jax.lax.stop_gradient(s) for s in st)
                 for st in stats))
    return (y, stats), res


def _trunk_vjp_bwd(kinds, n_segment, n_div, eps, res, ct):
    dy4, _dstats = ct  # running-stat updates do not backprop (buffers)
    saved, y5_top, p_top, blocks, stats_all = res
    t = n_segment
    n = len(kinds)

    # top-block prologue (XLA): relu mask + BN3(/BNp) backward moments
    # (p_top is the only p kept — 7x7-scale; every other block's p is
    # recomputed in-kernel from its z residual)
    _, _, _, pr5 = saved[-1]
    dt = p_top.dtype
    dy5 = dy4.reshape(y5_top.shape)
    dq5 = jnp.where(y5_top > 0, dy5, 0).astype(dt)
    dqf = dq5.astype(jnp.float32)
    st = stats_all[-1]
    s0 = jnp.sum(dqf, axis=(0, 1, 2, 3))
    s1 = jnp.sum(dqf * (p_top.astype(jnp.float32) - st[4]),
                 axis=(0, 1, 2, 3))
    if kinds[-1] == "plain":
        s1p = None
    else:
        s1p = jnp.sum(dqf * (pr5.astype(jnp.float32) - st[6]),
                      axis=(0, 1, 2, 3))
    carry = (dq5, s0, s1, s1p)

    grads = [None] * n
    dx5 = None
    for i in reversed(range(n)):
        kind = kinds[i]
        x5b, u5, z5, pr5 = saved[i]
        w1, w2, w3, wpj, g1, be1, g2, be2, g3, be3, gp, bep = _unpack(
            blocks[i], kind)
        prev_spec = None
        sap_prev = None
        if i > 0:
            pk = kinds[i - 1]
            _, _, zp5, _ = saved[i - 1]
            pst = stats_all[i - 1]
            (pw1, pw2, pw3, _pwp, _pg1, _pbe1, pg2, pbe2, pg3, pbe3,
             pgp, pbep) = _unpack(blocks[i - 1], pk)
            fzp = zp5.shape[-1]
            w3p = pw3.reshape(fzp, -1)
            sa2p, sb2p = _bn_vectors(pg2, pst[2], pst[3], pbe2, eps)
            if pk == "plain":
                prev_spec = ("plain", zp5, sa2p, sb2p, w3p, pst[4])
            else:
                # the epilogue recovers bnp(pr_prev) by finale
                # inversion and accumulates sum dq*(rr - cpp) =
                # sap*(sum dq*(pr - mup)); divide by sap below
                sa3p, sb3p = _bn_vectors(pg3, pst[4], pst[5], pbe3, eps)
                sap_prev, sbp_prev = _bn_vectors(
                    pgp, pst[6], pst[7], pbep, eps)
                cpp = sap_prev * pst[6] + sbp_prev
                prev_spec = ("proj", zp5, sa2p, sb2p, w3p, pst[4],
                             sa3p, sb3p, cpp)
        tr = dict(dq=carry[0], s0=carry[1], s1=carry[2], s1p=carry[3],
                  prev=prev_spec)
        res_i = (x5b, u5, z5, None, None, pr5, stats_all[i],
                 w1, w2, w3, wpj, g1, be1, g2, be2, g3, be3, gp, bep)
        bwd = _backward_s2 if kind == "s2" else _backward
        g, (dout, mprev) = bwd(t, n_div, eps, res_i, None, trunk=tr)
        grads[i] = g
        if i == 0:
            dx5 = dout
        elif kind == "s2":
            # the ONE XLA interleave per stage boundary: planar
            # even/odd-column dq -> natural, + fold per-plane moments
            bq, tq, hh, wo2, c2 = dout.shape
            c = c2 // 2
            dq_prev = dout.reshape(bq, tq, hh, wo2, 2, c).reshape(
                bq, tq, hh, 2 * wo2, c)
            carry = (dq_prev, mprev[0, :c] + mprev[0, c:],
                     mprev[1, :c] + mprev[1, c:], None)
        else:
            s1p_prev = (mprev[2] / sap_prev
                        if mprev.shape[0] == 3 else None)
            carry = (dout, mprev[0], mprev[1], s1p_prev)

    dx4 = dx5.reshape(dx5.shape[0] * dx5.shape[1], *dx5.shape[2:])
    return (dx4, tuple(grads))


tsm_trunk_train.defvjp(_trunk_vjp_fwd, _trunk_vjp_bwd)
