"""Pallas TPU kernel: fused temporal-shift + 1x1 convolution.

Why a kernel: XLA cannot express "conv reading a time-shifted view" — both
the unfused shift (materializes the shifted tensor) and an XLA-level fused
rewrite (three partial matmuls over channel slices) cost a full extra
HBM round-trip of the activation per bottleneck block, measured ~1.9x
end-to-end slowdown of ResNet50-TSM vs plain ResNet50 on TPU v5e.

Kernel design: grid over (batch, spatial tiles); each step holds the WHOLE
time axis of one spatial tile in VMEM ([T, tile, C]), computes the 1x1 conv
and performs the temporal shift as in-VMEM slice adds. HBM traffic: x read
once, y written once — identical to a plain 1x1 conv.

Two strategies, chosen by fold (= C/n_div) lane alignment:
- fold % 128 != 0 (ResNet50 layer1/2: C=256/512): one MXU call per time
  step against a concatenated masked weight [C, 3F]
  (cols [0:F)   <- W rows [:fold]        (left-shift fold),
   cols [F:2F)  <- W rows [fold:2fold]   (right-shift fold),
   cols [2F:3F) <- W rows [2fold:]       (static channels));
  zero rows elsewhere. 3x conv1 FLOPs, but K=C stays MXU-aligned and the
  model is HBM-bound here, so FLOPs are free.
- fold % 128 == 0 (layer3/4: C=1024/2048): three partial dots on
  lane-aligned channel slices — no FLOP waste.

Backward pass: jax.custom_vjp with closed-form XLA expressions (the
transpose shift distributes the same way), so training works unchanged.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from .temporal_shift import temporal_shift


def _pick_tile(hw: int, c: int, f: int) -> int:
    """Largest spatial tile (multiple of 16 rows if possible, divisor of hw
    preferred) keeping VMEM under ~10MB."""
    budget = 5 * 1024 * 1024
    # x (bf16) + parts (bf16, 3F masked-W worst case) + out (bf16), T<=16,
    # plus double-buffering headroom (x2)
    bytes_per_row = 2 * 16 * (c * 2 + 2 * f * 2 + f * 2)
    max_tile = max(16, budget // max(bytes_per_row, 1))
    if hw <= max_tile:
        return hw  # full spatial dim is always a legal block shape
    # otherwise blocks must have row counts divisible by 8 (ragged final
    # block is masked by Pallas)
    return max(8, (max_tile // 8) * 8)


def _epilogue(y, s_ref, b_ref, relu: bool):
    """Optional fused affine (inference-folded BatchNorm) + ReLU."""
    if s_ref is not None:
        y = y * s_ref[0][None, None, :] + b_ref[0][None, None, :]
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _kernel_correction(x_ref, w_ref, *rest, t_count: int, fold: int,
                       relu: bool = False):
    """x_ref [1,T,tile,C], w_ref [C,F], o_ref [1,T,tile,F]; optional
    s_ref/b_ref [1,F] epilogue refs precede o_ref. Any fold alignment.

    Base-plus-correction formulation: one full [T*tile, C] @ [C, F] conv,
    then ONE K=2*fold correction dot over the first 2*fold channels, whose
    temporal diff is lane-selected (lanes [0,fold) read the NEXT frame,
    lanes [fold,2fold) the PREVIOUS frame; zero at the clip edges):
      y[t] = x[t] @ W + (select(x[t+1], x[t-1]) - x[t])[:, :2fold] @ W[:2fold]
    1.25x conv FLOPs, and both folds share a single MXU K chunk whenever
    2*fold <= 128 (ResNet50 layers 1-2)."""
    if len(rest) == 3:
        s_ref, b_ref, o_ref = rest
    else:
        (o_ref,) = rest
        s_ref = b_ref = None
    t, tile, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    f_out = o_ref.shape[-1]
    x3 = x_ref[0]  # [T, tile, C]

    base = jnp.dot(
        x3.reshape(t * tile, c), w_ref[:],
        preferred_element_type=jnp.float32,
    )

    x2 = x3[:, :, : 2 * fold]
    z2 = jnp.zeros((1, tile, 2 * fold), x3.dtype)
    nxt = jnp.concatenate([x2[1:], z2], axis=0)
    prv = jnp.concatenate([z2, x2[: t - 1]], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * fold), 2)
    d = (jnp.where(lane < fold, nxt, prv) - x2).astype(x3.dtype)
    base += jnp.dot(d.reshape(t * tile, 2 * fold), w_ref[: 2 * fold],
                    preferred_element_type=jnp.float32)

    y = base.astype(o_ref.dtype).reshape(t, tile, f_out)
    o_ref[0] = _epilogue(y, s_ref, b_ref, relu)


def _kernel_sliced(x_ref, w_ref, *rest, t_count: int, fold: int,
                   relu: bool = False):
    """x_ref [1,T,tile,C], w_ref [C,F], o_ref [1,T,tile,F]; fold
    128-aligned; optional s_ref/b_ref [1,F] epilogue refs precede o_ref.

    Three [T*tile, *] dots on lane-aligned channel slices (no FLOP waste),
    then in-VMEM time-shifted adds."""
    if len(rest) == 3:
        s_ref, b_ref, o_ref = rest
    else:
        (o_ref,) = rest
        s_ref = b_ref = None
    t, tile, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    f_out = o_ref.shape[-1]
    x3 = x_ref[0]  # [T, tile, C]

    def dot2(xs, ws):
        m = xs.reshape(-1, xs.shape[-1])
        y = jnp.dot(m, ws, preferred_element_type=jnp.float32)
        return y.astype(o_ref.dtype).reshape(t, tile, f_out)

    same = dot2(x3[..., 2 * fold :], w_ref[2 * fold :])
    left = dot2(x3[..., :fold], w_ref[:fold])
    right = dot2(x3[..., fold : 2 * fold], w_ref[fold : 2 * fold])
    zpad = jnp.zeros_like(same[:1])
    y = (
        same
        + jnp.concatenate([left[1:], zpad], axis=0)
        + jnp.concatenate([zpad, right[: t - 1]], axis=0)
    )
    o_ref[0] = _epilogue(y, s_ref, b_ref, relu)


def _tsm_conv1x1_pallas_fwd(x, kernel, n_segment: int, n_div: int,
                            out_scale=None, out_bias=None,
                            relu: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nt, h, w, c = x.shape
    b = nt // n_segment
    t_count = n_segment
    f_out = kernel.shape[-1]
    fold = c // n_div
    hw = h * w
    x4 = x.reshape(b, t_count, hw, c)
    w2 = kernel.reshape(c, f_out)

    tile = _pick_tile(hw, c, f_out)
    grid = (b, pl.cdiv(hw, tile))

    use_sliced = fold % 128 == 0
    w_in = w2
    w_shape = (c, f_out)
    if use_sliced:
        kern = functools.partial(_kernel_sliced, t_count=t_count, fold=fold,
                                 relu=relu)
    else:
        kern = functools.partial(_kernel_correction, t_count=t_count,
                                 fold=fold, relu=relu)

    in_specs = [
        pl.BlockSpec(
            (1, t_count, tile, c),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(w_shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x4, w_in]
    if out_scale is not None:
        in_specs += [
            pl.BlockSpec((1, f_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [
            out_scale.reshape(1, f_out).astype(x.dtype),
            out_bias.reshape(1, f_out).astype(x.dtype),
        ]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t_count, hw, f_out), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_count, tile, f_out),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*operands)

    return out.reshape(nt, h, w, f_out)


def tsm_conv1x1_bn_relu_pallas(x, kernel, scale, bias, n_segment: int,
                               n_div: int = 8):
    """Inference path: fused [shift -> 1x1 conv -> folded-BN affine ->
    ReLU] in one kernel (no gradient support — inference only)."""
    return _tsm_conv1x1_pallas_fwd(
        x, kernel, n_segment, n_div, out_scale=scale, out_bias=bias,
        relu=True,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def tsm_conv1x1_pallas(x, kernel, n_segment: int, n_div: int = 8):
    """Fused shift+1x1conv: x [N*T,H,W,C], kernel [1,1,C,F] -> [N*T,H,W,F]."""
    return _tsm_conv1x1_pallas_fwd(x, kernel, n_segment, n_div)


def _fwd(x, kernel, n_segment, n_div):
    return _tsm_conv1x1_pallas_fwd(x, kernel, n_segment, n_div), (x, kernel)


def _bwd(n_segment, n_div, res, g):
    """Closed-form transpose in XLA (training path).

    y = conv1x1(shift(x), W)  =>  dX = shift^T(g @ W^T); dW = shift(x)^T g.
    shift^T moves fold 0 right and fold 1 left (the opposite shift).
    """
    x, kernel = res
    nt, h, w, c = x.shape
    f_out = kernel.shape[-1]
    fold = c // n_div
    k2 = kernel.reshape(c, f_out)

    # dX: project g back to input channels, then transpose-shift per fold
    gx = jnp.einsum("nhwf,cf->nhwc", g, k2)  # [N*T,H,W,C]
    b = nt // n_segment
    gx5 = gx.reshape(b, n_segment, h, w, c)
    # fold 0 (x[t+1] was used at t): dX[t] receives g[t-1] part
    left = jnp.concatenate(
        [jnp.zeros_like(gx5[:, :1, ..., :fold]), gx5[:, :-1, ..., :fold]],
        axis=1,
    )
    right = jnp.concatenate(
        [gx5[:, 1:, ..., fold : 2 * fold],
         jnp.zeros_like(gx5[:, :1, ..., fold : 2 * fold])],
        axis=1,
    )
    dx = jnp.concatenate([left, right, gx5[..., 2 * fold :]], axis=-1)
    dx = dx.reshape(nt, h, w, c).astype(x.dtype)

    # dW = shift(x)^T @ g
    xs = temporal_shift(x, n_segment, n_div)
    dw = jnp.einsum("nhwc,nhwf->cf", xs, g).reshape(kernel.shape)
    return dx, dw.astype(kernel.dtype)


tsm_conv1x1_pallas.defvjp(_fwd, _bwd)
