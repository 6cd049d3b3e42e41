"""Pallas TPU kernels: TRAINING-mode fused ResNet stem.

The inference stem kernel (ops/stem_pallas.py) folds BatchNorm into a
precomputed affine; training BN normalizes with the CURRENT batch's
statistics of the conv output, so the training stem splits at the stat
barrier exactly like the bottleneck kernels (ops/tsm_block_train_pallas):

forward:
  SFK-A  yc = conv7x7/2(x)  (ONE phase-packed [M,432]x[432,256] matmul
         on the 4x4 space-to-depth input, u8 normalize in VMEM)
         + accumulate (sum, sum^2) of yc per packed lane [2,256]
  XLA    fold the 4 phases -> mu/var [64] -> scale/bias vectors
  SFK-B  out = maxpool3x3/2(relu(bn-apply(yc)))  (phase-unpacked
         lane-group maxes, stem_pallas._phase_maxpool)

backward (jax.custom_vjp; residuals = x, yc, out + stats):
  SBK-A  da = route(dpool) * relu'(y): each conv pixel belongs to 1/2/4
         pool windows by phase parity (phase (0,0) -> its own cell's
         window only; (1,1) -> four windows); a pixel receives a
         window's gradient iff it EQUALS the pooled max (recomputed y is
         bit-identical to the forward's, so equality is exact). Ties
         inside a window double-count where torch routes to the first
         max — measure-zero for continuous activations and killed by
         relu' at the common post-ReLU zero ties.
         + accumulate the BN backward moments (sum da, sum da*(yc-mu))
  XLA    fold phases -> BN-backward A/E/F vectors + dgamma/dbeta
  SBK-B  du = bn-bwd-apply(da, yc); dw2 = z^T du (the im2col patch z is
         rebuilt in-kernel — the stem has NO dx: its input is data)
  XLA    dw7 = einsum('prd,rpf->df', sel, dw2) — the transpose of the
         forward's constant selection that built [432,256] from
         [7,7,3,64]

Numerics match the standard flax stem (nn.BatchNorm biased batch var,
f32 stats, bn output cast to compute dtype before relu; conv stats over
the FULL 2n x 2n conv output): tests/test_stem_train_pallas.py checks
forward, stats and all gradients against jax.grad of the XLA stem.

Reference semantics: torchvision ResNet stem under DDP training
(reference train_video_segment_ddp.py; the reference never changes the
stem)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem_pallas import (
    _build_z,
    _normalize_u8,
    _phase_maxpool,
    _phase_selection,
    _stem_weight_im2col,
)
from .tsm_block_train_pallas import _bn_bwd_vectors, _dotT


def _params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("arbitrary",),  # sequential: accumulators
    )


def _init_acc(ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        ref[:] = jnp.zeros_like(ref)


def _sfk_a(x_ref, *refs, zbuild: str):
    """yc = phase-packed conv (+ u8 normalize) + per-lane moments."""
    if len(refs) == 5:
        a_ref, bin_ref, w_ref, yc_ref, m_ref = refs
    else:
        w_ref, yc_ref, m_ref = refs
        a_ref = bin_ref = None
    g, n = x_ref.shape[0], x_ref.shape[1]
    dt = yc_ref.dtype
    x = x_ref[:]
    if a_ref is not None:
        x = _normalize_u8(x, a_ref, bin_ref, dt)
    z = _build_z(x, zbuild)
    acc = jnp.dot(z.reshape(g * n * n, 432), w_ref[:],
                  preferred_element_type=jnp.float32)
    yc = acc.astype(dt)
    yc_ref[:] = yc.reshape(g, n, n, 256)
    ycf = yc.astype(jnp.float32)
    s = jnp.sum(ycf, axis=0, keepdims=True)
    s2 = jnp.sum(ycf * ycf, axis=0, keepdims=True)
    _init_acc(m_ref)
    m_ref[:] += jnp.concatenate([s, s2], axis=0)


def _sfk_b(yc_ref, s_ref, b_ref, o_ref):
    """out = maxpool(relu(bn-apply(yc))), phase-unpacked."""
    g, n = yc_ref.shape[0], yc_ref.shape[1]
    dt = o_ref.dtype
    y = jnp.maximum(
        yc_ref[:].astype(jnp.float32) * s_ref[0] + b_ref[0], 0.0
    ).astype(dt)
    o_ref[:] = _phase_maxpool(y.reshape(g, n, n, 256))


def _sbk_a(dp_ref, po_ref, yc_ref, s_ref, b_ref, mu_ref, da_ref, m_ref):
    """Pool-grad routing + relu' + BN backward moments.

    A conv pixel receives a window's dpool iff its (bit-identically
    recomputed) activation equals that window's pooled max. Window
    membership by phase: (0,0) -> window (I,J); (0,1) -> (I,J),(I,J+1);
    (1,0) -> (I,J),(I+1,J); (1,1) -> all four. Shifts move the WINDOW
    quantities (dpool, pooled max) so every compare is offset-0."""
    g, n = dp_ref.shape[0], dp_ref.shape[1]
    dt = da_ref.dtype
    y = jnp.maximum(
        yc_ref[:].astype(jnp.float32) * s_ref[0] + b_ref[0], 0.0
    ).astype(dt)  # same op order as _sfk_b -> bit-identical
    dp = dp_ref[:]
    po = po_ref[:]
    zrow = jnp.zeros((g, 1, n, 64), dt)
    zcol = jnp.zeros((g, n, 1, 64), dt)
    up = lambda v: jnp.concatenate([v[:, 1:], zrow], axis=1)
    lf = lambda v: jnp.concatenate([v[:, :, 1:], zcol], axis=2)
    dpd, pod = up(dp), up(po)
    dpr, por = lf(dp), lf(po)
    dprd, pord = lf(dpd), lf(pod)

    def route(yph, *wins):
        # equality compared in f32: Mosaic/v5e has no bf16 vector compare
        # (tools/aot_compile.py); bf16->f32 is exact so bit-identity holds
        yphf = yph.astype(jnp.float32)
        acc = None
        for d, p in wins:
            v = jnp.where(yphf == p.astype(jnp.float32), d,
                          0.0).astype(jnp.float32)
            acc = v if acc is None else acc + v
        return acc

    y0, y1 = y[..., 0:64], y[..., 64:128]
    y2, y3 = y[..., 128:192], y[..., 192:256]
    da = jnp.concatenate(
        [
            route(y0, (dp, po)),
            route(y1, (dp, po), (dpr, por)),
            route(y2, (dp, po), (dpd, pod)),
            route(y3, (dp, po), (dpd, pod), (dpr, por), (dprd, pord)),
        ],
        axis=-1,
    )  # f32 [G, n, n, 256]
    da = jnp.where(y.astype(jnp.float32) > 0, da, 0.0)
    da_ref[:] = da.astype(dt)

    ycf = yc_ref[:].astype(jnp.float32)
    da2 = da.reshape(-1, 256)
    s = jnp.sum(da2, axis=0, keepdims=True)
    s1 = jnp.sum((da * (ycf - mu_ref[0])).reshape(-1, 256), axis=0,
                 keepdims=True)
    _init_acc(m_ref)
    m_ref[:] += jnp.concatenate([s, s1], axis=0)


def _sbk_b(da_ref, yc_ref, a_ref, e_ref, f_ref, x_ref, *refs,
           zbuild: str):
    """du = bn-bwd-apply(da, yc); accumulate dw2 = z^T du."""
    if len(refs) == 3:
        an_ref, bn_ref, dw_ref = refs
    else:
        (dw_ref,) = refs
        an_ref = bn_ref = None
    g, n = x_ref.shape[0], x_ref.shape[1]
    dt = da_ref.dtype
    du = (da_ref[:].astype(jnp.float32) * a_ref[0]
          + yc_ref[:].astype(jnp.float32) * e_ref[0] + f_ref[0])
    dub = du.astype(dt).reshape(g * n * n, 256)
    x = x_ref[:]
    if an_ref is not None:
        x = _normalize_u8(x, an_ref, bn_ref, dt)
    z = _build_z(x, zbuild)
    _init_acc(dw_ref)
    dw_ref[:] += _dotT(z.reshape(g * n * n, 432), dub)


def _tile4(v):
    return jnp.tile(jnp.asarray(v, jnp.float32).reshape(1, 64), (1, 4))


def _fold4(row):
    return row.reshape(4, 64).sum(axis=0)


def _norm_inputs(is_u8):
    if not is_u8:
        return [], []
    from .preprocess import _affine_consts

    a3, b3 = _affine_consts(jnp.float32)
    specs = [
        pl.BlockSpec((1, 48), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 48), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.tile(a3, 16).reshape(1, 48),
            jnp.tile(b3, 16).reshape(1, 48)]
    return specs, args


def _tile_g(nt, itemsize):
    g = 4 if itemsize <= 2 else 2
    while nt % g:
        g //= 2
    return g


def _forward(s4, w7, gamma, beta, eps, out_dtype, zbuild):
    nt, n, n2, c48 = s4.shape
    assert c48 == 48 and n == n2, s4.shape
    dt = out_dtype
    is_u8 = s4.dtype == jnp.uint8
    M = nt * 4 * n * n  # conv output pixel count (2n x 2n)
    interp = jax.default_backend() != "tpu"
    g = _tile_g(nt, jnp.dtype(dt).itemsize)
    norm_specs, norm_args = _norm_inputs(is_u8)
    w2 = _stem_weight_im2col(w7, dt)

    spec_x = pl.BlockSpec((g, n, n, 48), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_yc = pl.BlockSpec((g, n, n, 256), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    yc, m = pl.pallas_call(
        functools.partial(_sfk_a, zbuild=zbuild),
        out_shape=(
            jax.ShapeDtypeStruct((nt, n, n, 256), dt),
            jax.ShapeDtypeStruct((2, 256), jnp.float32),
        ),
        grid=(nt // g,),
        in_specs=[spec_x, *norm_specs, const((432, 256))],
        out_specs=(spec_yc, const((2, 256))),
        compiler_params=_params(),
        interpret=interp,
    )(s4, *norm_args, w2)
    mu = _fold4(m[0]) / M
    var = _fold4(m[1]) / M - mu * mu
    r = jax.lax.rsqrt(var + eps)
    sa = jnp.asarray(gamma, jnp.float32) * r
    sb = jnp.asarray(beta, jnp.float32) - mu * sa

    spec_o = pl.BlockSpec((g, n, n, 64), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _sfk_b,
        out_shape=jax.ShapeDtypeStruct((nt, n, n, 64), dt),
        grid=(nt // g,),
        in_specs=[spec_yc, const((1, 256)), const((1, 256))],
        out_specs=spec_o,
        compiler_params=_params(),
        interpret=interp,
    )(yc, _tile4(sa), _tile4(sb))
    return out, (mu, var), (yc, out, sa, sb)


def _backward(eps, out_dtype, zbuild, res, dpool):
    s4, w7, gamma, beta, yc, out, mu, var, sa, sb = res
    nt, n = s4.shape[0], s4.shape[1]
    dt = out_dtype
    M = nt * 4 * n * n
    interp = jax.default_backend() != "tpu"
    g = _tile_g(nt, jnp.dtype(dt).itemsize)
    norm_specs, norm_args = _norm_inputs(s4.dtype == jnp.uint8)

    spec_x = pl.BlockSpec((g, n, n, 48), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_yc = pl.BlockSpec((g, n, n, 256), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((g, n, n, 64), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    da, mb = pl.pallas_call(
        _sbk_a,
        out_shape=(
            jax.ShapeDtypeStruct((nt, n, n, 256), dt),
            jax.ShapeDtypeStruct((2, 256), jnp.float32),
        ),
        grid=(nt // g,),
        in_specs=[spec_o, spec_o, spec_yc, const((1, 256)),
                  const((1, 256)), const((1, 256))],
        out_specs=(spec_yc, const((2, 256))),
        compiler_params=_params(),
        interpret=interp,
    )(dpool.astype(dt), out, yc, _tile4(sa), _tile4(sb),
      jnp.tile(mu.reshape(1, 64), (1, 4)))
    s0 = _fold4(mb[0])
    s1 = _fold4(mb[1])
    a, e, fv, dgamma, dbeta = _bn_bwd_vectors(gamma, mu, var, s0, s1, M,
                                              eps)

    dw2 = pl.pallas_call(
        functools.partial(_sbk_b, zbuild=zbuild),
        out_shape=jax.ShapeDtypeStruct((432, 256), jnp.float32),
        grid=(nt // g,),
        in_specs=[spec_yc, spec_yc, const((1, 256)), const((1, 256)),
                  const((1, 256)), spec_x, *norm_specs],
        out_specs=const((432, 256)),
        compiler_params=_params(),
        interpret=interp,
    )(da, yc, _tile4(a), _tile4(e), _tile4(fv), s4, *norm_args)

    # un-map [432, 256] -> [7,7,3,64]: transpose of the constant
    # selection einsum that built the phase-packed weight
    sel = jnp.asarray(_phase_selection(), jnp.float32)
    dw7 = jnp.einsum("prd,rpf->df", sel,
                     dw2.reshape(432, 4, 64)).reshape(7, 7, 3, 64)

    if jnp.issubdtype(s4.dtype, jnp.integer):
        dx = np.zeros(s4.shape, jax.dtypes.float0)
    else:
        dx = jnp.zeros(s4.shape, s4.dtype)
    return (dx, dw7.astype(w7.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def stem_s2d_train(s4, w7, gamma, beta, eps: float = 1e-5,
                   out_dtype=jnp.bfloat16, zbuild: str = "two"):
    """Training-mode fused stem on 4x4 space-to-depth input
    [NT, H/4, W/4, 48] (uint8 raw or float): 7x7/2 conv + batch-stat BN
    + ReLU + 3x3/2 max pool -> ([NT, H/4, W/4, 64], (mu, var)).

    The stem consumes DATA, so the custom VJP returns a zero input
    cotangent and only dw7/dgamma/dbeta flow; see the module docstring
    for the kernel split and the max-pool tie caveat."""
    out, stats, _ = _forward(s4, w7, gamma, beta, eps, out_dtype, zbuild)
    return out, stats


def _vjp_fwd(s4, w7, gamma, beta, eps, out_dtype, zbuild):
    out, stats, (yc, out_, sa, sb) = _forward(s4, w7, gamma, beta, eps,
                                              out_dtype, zbuild)
    mu, var = (jax.lax.stop_gradient(s) for s in stats)
    res = (s4, w7, gamma, beta, yc, out,
           mu, var, jax.lax.stop_gradient(sa), jax.lax.stop_gradient(sb))
    return (out, stats), res


def _vjp_bwd(eps, out_dtype, zbuild, res, ct):
    dpool, _dstats = ct  # running-stat updates do not backprop (buffers)
    return _backward(eps, out_dtype, zbuild, res, dpool)


stem_s2d_train.defvjp(_vjp_fwd, _vjp_bwd)


def stem_frames_train(x, w7, gamma, beta, eps: float = 1e-5,
                      out_dtype=jnp.bfloat16):
    """Training stem on standard frames [NT, H, W, 3] (float; H=W,
    H%4==0): one XLA reshape/transpose into the 4x4 space-to-depth view,
    then stem_s2d_train."""
    nt, h, w, c = x.shape
    assert c == 3 and h == w and h % 4 == 0, x.shape
    n = h // 4
    s4 = x.reshape(nt, n, 4, n, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    return stem_s2d_train(s4.reshape(nt, n, n, 48).astype(out_dtype),
                          w7, gamma, beta, eps, out_dtype)
