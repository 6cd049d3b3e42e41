"""ResNet-50 with Temporal Shift Module, TPU-native (flax, NHWC).

From-scratch JAX redesign of the reference's vision stream
(`model/vision/resnet50_tsm.py:10-77`, `model/vision/resnet50.py:9-73`,
`ops/temporal_shift.py:104-146`): where the reference monkey-patches
torchvision's ResNet to wrap every residual block's conv1 with a shift, here
the shift is simply part of the block definition ('blockres' placement,
shift on the conv1 input of every bottleneck; ResNet-50's layer3 has 6 < 23
blocks so every block shifts, matching n_round=1).

Layout is NHWC — the TPU-preferred conv layout — and weights can be loaded
from a converted torchvision `resnet50(pretrained=True)` state dict
(`convert_torchvision_resnet50`, OIHW->HWIO).

BatchNorm semantics: training uses batch stats and updates running
averages; evaluation uses running averages by default, but
`bn_batch_stats=True` reproduces the reference's eval-time hack of nulling
running stats (test_video_segment_point.py:117-122).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.temporal_shift import (
    temporal_shift,
    temporal_shift_conv1x1,
    temporal_shift_conv1x1_3tap,
)

STAGE_SIZES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

# inference impl per stage under tsm_impl="auto" (PERF.md round-2 profile:
# an all-pallas trunk removes every XLA-conv<->custom-call layout copy)
AUTO_TSM_IMPL = ("fusedall", "fusedall", "fusedall", "fusedall")

# A/B hook: int8 stride-2 block0s + int8-planar tail emission under
# quantize=True. MEASURED SLOWER on v5e (PERF.md round 3: L2 block0
# 8.35 ms vs 2.95 bf16 — the f32 tap-build byte traffic at full input
# resolution dominates where conv1 runs pre-stride) — kernels + tests
# remain; model-level tests force this on.
INT8_S2_BLOCKS = False

# test hook: exercise the whole-block kernels (interpret mode) off-TPU
FORCE_WHOLE_BLOCKS = False

# A/B hook: tsm_impl="fusedtrain" takes the cross-block TRUNK custom VJP
# (ops/tsm_trunk_train_pallas.py) when eligible; False falls back to the
# per-block fusedtrain kernels (tools/profile_train.py --no-trunk)
TRUNK_TRAIN = True

# tsm_impl="auto" training dispatch: take the trunk only when its saved
# residuals fit comfortably (measured on v5e-16G, PERF.md round 3: with
# p dropped from the saves, B=4 bf16 @224 = 3.8GB -> 1,705 frames/s,
# B=6 = 5.6GB -> 1,840, B=8 = 7.5GB -> 1,878 = 1.54x tap3; B=12 =
# 11.3GB OOMs). Above the budget auto falls back to tap3, which is
# batch-size-insensitive (B=4/6/8 all ~1.2-1.3k frames/s). An explicit
# tsm_impl="fusedtrain" is never budget-gated.
TRUNK_TRAIN_BUDGET = 8 * 2 ** 30


def _trunk_residual_bytes(nt, h, w, c0, sizes, itemsize):
    """Bytes of custom-VJP residuals the training trunk saves: per block
    (x5b, u5, z5[, pr5]) at their true shapes (conv1 runs at input
    resolution; z/pr at output resolution for stride-2 block0s). p is
    NOT saved — the backward recomputes it in-kernel from z (FK3 dot)
    and by finale inversion (tsm_block_train_pallas _bk3/_bk1); only
    the top block's p (7x7-scale) is kept for the XLA prologue."""
    total = 0
    c = c0
    for stage, nb in enumerate(sizes):
        f = 64 * (2 ** stage)
        for b in range(nb):
            s2 = stage > 0 and b == 0
            ho, wo = (h // 2, w // 2) if s2 else (h, w)
            n_in, n_out = nt * h * w, nt * ho * wo
            total += n_in * c + n_in * f + n_out * f
            if b == 0:
                total += n_out * 4 * f  # pr5
            c = 4 * f
            h, w = ho, wo
    total += nt * h * w * c  # top-block p5 (post-loop h/w/c = top out)
    return total * itemsize


def _whole_fused(impl, n_segment, fuse_tsm, use_ra, stride, projection,
                 h, w) -> bool:
    """True when a bottleneck with these settings takes the whole-block
    fused kernel (the single source of truth for Bottleneck's dispatch
    AND ResNet's planar-chain planning — keep them in lockstep)."""
    return (
        impl in ("fusedblk", "fusedall")
        and n_segment > 0 and fuse_tsm and use_ra
        and (jax.default_backend() == "tpu" or FORCE_WHOLE_BLOCKS)
        and (impl == "fusedall" or (stride == 1 and not projection))
        # the stride-2 kernel assumes even input H/W (true for all real
        # ResNet50 shapes; tiny test variants fall back)
        and (stride == 1 or (h % 2 == 0 and w % 2 == 0))
    )


class TSMConv1x1(nn.Module):
    """Fused temporal-shift + 1x1 conv; parameter layout identical to
    nn.Conv(features, (1,1), use_bias=False) so weight converters and
    checkpoints are interchangeable with the unfused path.

    tsm_impl:
    - "tap3" (default): ONE native XLA conv with a channel-masked 3-tap
      temporal kernel (ops/temporal_shift.py temporal_shift_conv1x1_3tap).
      Exact, autodiffs natively, and on v5e runs at the plain-conv roofline
      wherever the block is memory-bound — the fastest path measured
      (PERF.md round 2), for training AND inference.
    - "pallas": the VMEM-resident Pallas kernel (ops/tsm_conv_pallas.py),
      optionally with folded-BN+ReLU epilogue via out_scale/out_bias.
    - "xla": three partial matmuls on time-shifted slices.
    """

    features: int
    n_segment: int
    n_div: int = 8
    tsm_impl: str = "tap3"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out_scale=None, out_bias=None):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
        )
        kernel = kernel.astype(self.dtype)
        # flax convention: inputs promote to the module compute dtype (the
        # custom conv paths call lax.conv directly, which requires it)
        x = x.astype(self.dtype)
        if self.tsm_impl == "tap3" and out_scale is None:
            return temporal_shift_conv1x1_3tap(
                x, kernel, self.n_segment, self.n_div
            )
        if out_scale is not None:
            # inference: folded BN + ReLU epilogue inside the kernel
            from ..ops.tsm_conv_pallas import tsm_conv1x1_bn_relu_pallas

            return tsm_conv1x1_bn_relu_pallas(
                x, kernel, out_scale, out_bias, self.n_segment, self.n_div
            )
        if self.tsm_impl == "pallas" and jax.default_backend() == "tpu":
            from ..ops.tsm_conv_pallas import tsm_conv1x1_pallas

            return tsm_conv1x1_pallas(x, kernel, self.n_segment, self.n_div)
        return temporal_shift_conv1x1(x, kernel, self.n_segment, self.n_div)


class _BNParams(nn.Module):
    """Declares BatchNorm-compatible variables (params scale/bias,
    batch_stats mean/var) WITHOUT computing — used to fold inference BN
    into the fused TSM-conv kernel epilogue while keeping checkpoints
    interchangeable with nn.BatchNorm. With mutable=True returns the
    variable OBJECTS instead of values so the caller can write the
    running-average update (training fused path)."""

    features: int
    mutable: bool = False

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features))
        if self.mutable:
            return scale, bias, mean, var
        return scale, bias, mean.value, var.value


class _ConvKernel(nn.Module):
    """Declares an nn.Conv-compatible 'kernel' param WITHOUT computing —
    used by the whole-block fused path so its checkpoint layout is
    interchangeable with the standard conv modules."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _FusedBlockParams(nn.Module):
    """Declares a plain (stride-1, non-projection) bottleneck's parameters
    with the SAME variable paths as Bottleneck (conv1/conv2/conv3 +
    bn1/bn2/bn3) and returns them inference-folded for the fused chain
    kernel — used when ResNet chains consecutive plain blocks into one
    tsm_bottleneck_chain_pallas call. Checkpoints stay interchangeable
    with the per-block paths."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        f = self.features
        w1 = _ConvKernel((1, 1, c, f), name="conv1")().astype(self.dtype)
        w2 = _ConvKernel((3, 3, f, f), name="conv2")().astype(self.dtype)
        w3 = _ConvKernel((1, 1, f, 4 * f),
                         name="conv3")().astype(self.dtype)

        def fold(bn_name, n):
            scale, bias, mean, var = _BNParams(n, name=bn_name)()
            s = scale * jax.lax.rsqrt(var + 1e-5)
            return s, bias - mean * s

        s1, b1 = fold("bn1", f)
        s2, b2 = fold("bn2", f)
        s3, b3 = fold("bn3", 4 * f)
        return w1, w2, w3, s1, b1, s2, b2, s3, b3


class _TrainBlockVars(nn.Module):
    """Declares one bottleneck's parameters/batch_stats with the SAME
    variable paths as Bottleneck and returns them raw for the fused
    training trunk (ops/tsm_trunk_train_pallas.py) — the trunk consumes
    the values; the caller writes the running-average updates through
    the returned variable objects. Checkpoints stay interchangeable
    with the per-block paths."""

    features: int
    projection: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        f = self.features
        dt = self.dtype
        w1 = _ConvKernel((1, 1, c, f), name="conv1")().astype(dt)
        w2 = _ConvKernel((3, 3, f, f), name="conv2")().astype(dt)
        w3 = _ConvKernel((1, 1, f, 4 * f), name="conv3")().astype(dt)
        bns = [_BNParams(n, mutable=True, name=nm)()
               for nm, n in (("bn1", f), ("bn2", f), ("bn3", 4 * f))]
        if self.projection:
            wp = _ConvKernel((1, 1, c, 4 * f),
                             name="proj_conv")().astype(dt)
            bns.append(_BNParams(4 * f, mutable=True, name="proj_bn")())
            params = (w1, w2, w3, wp,
                      bns[0][0], bns[0][1], bns[1][0], bns[1][1],
                      bns[2][0], bns[2][1], bns[3][0], bns[3][1])
        else:
            params = (w1, w2, w3,
                      bns[0][0], bns[0][1], bns[1][0], bns[1][1],
                      bns[2][0], bns[2][1])
        return params, bns


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck (stride on the 3x3), optional TSM on conv1
    input."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1
    projection: bool = False
    n_segment: int = 0  # >0 enables temporal shift
    n_div: int = 8
    fuse_tsm: bool = True  # fuse shift into conv1
    tsm_impl: str = "tap3"  # "tap3" | "pallas" | "xla" (see TSMConv1x1)
    # override used when NOT in inference mode (training / bn_batch_stats):
    # the 3-tap conv autodiffs natively and measured 22% faster train steps
    # than the custom-vjp pallas kernel (bench_train.py, PERF.md round 2)
    tsm_impl_train: Optional[str] = None
    fold_bn_inference: Optional[bool] = None  # pallas impl only; None: auto
    # planar inter-block chain (ResNet plans it): planar_out makes this
    # block emit [NT, H, W/2, 2C] (adjacent columns packed into lanes);
    # planar_in means x arrives in that layout and this block is the
    # fused stride-2 consumer (tsm_bottleneck_s2_planar_pallas)
    planar_out: bool = False
    planar_in: bool = False
    # W8A8 quantized inference (ResNet plans the chain; plain blocks of
    # layers 2-4 only): the kernel reads x as int8 when the previous
    # quantized block emitted it (dtype-dispatched); quant_last emits
    # bf16 (or bf16 planar when planar_out) instead of int8. Scales live
    # in the "quant" variables collection (ops/quantize.py calibration).
    quant: bool = False
    quant_last: bool = False
    # this stride-2 planar block0 runs the int8 s2 kernel
    quant_s2: bool = False
    # the NEXT stage's block0 is int8: the tail emits int8 planar
    quant_next: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, bn_batch_stats: bool = False):
        use_ra = not train and not bn_batch_stats
        bn = lambda name: nn.BatchNorm(
            use_running_average=use_ra,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )

        residual = x
        y = x
        # whole-bottleneck fused kernel: stride-1 / no-projection blocks at
        # inference only (ops/tsm_block_pallas.py); other blocks of a
        # "fusedblk" stage fall back to the pallas conv1 kernel
        impl = self.tsm_impl
        if not use_ra and self.tsm_impl_train is not None:
            impl = self.tsm_impl_train
        if self.planar_in:
            # x arrives pair-merged from a planar_out producer; only the
            # fused stride-2 consumer understands that layout (ResNet
            # plans the chain so both ends agree)
            assert self.stride == 2 and self.projection
            if self.quant_s2 and use_ra:
                return self._whole_block_s2_int8(x)
            return self._whole_block(x, use_ra)
        if self.quant and use_ra:
            assert self.stride == 1 and not self.projection
            return self._whole_block_int8(x)
        if impl == "fusedtrain":
            # training-mode fused whole-block kernels (batch-stat BN
            # accumulated in-kernel + hand-written Pallas VJP,
            # ops/tsm_block_train_pallas.py) for ALL 16 bottlenecks:
            # stride-1 (plain and the layer1 projection block0) and the
            # stride-2 block0s of layers 2-4. At inference this impl
            # behaves as "fusedall".
            if use_ra:
                impl = "fusedall"
            elif (self.n_segment > 0 and self.fuse_tsm
                  and (jax.default_backend() == "tpu"
                       or FORCE_WHOLE_BLOCKS)
                  and (self.stride == 1
                       or (x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0))):
                return self._whole_block_train(x)
            else:
                impl = "tap3"
        if impl in ("fusedblk", "fusedall"):
            # "fusedblk": only plain residual blocks take the whole-block
            # kernel; "fusedall" additionally fuses projection and stride-2
            # downsample blocks, keeping the whole stage on pallas so no
            # XLA-conv<->custom-call layout copies appear at block
            # boundaries (see PERF.md round 2: those copies cost ~21% of
            # model device time)
            if _whole_fused(impl, self.n_segment, self.fuse_tsm, use_ra,
                            self.stride, self.projection,
                            x.shape[1], x.shape[2]):
                return self._whole_block(x, use_ra)
            impl = "pallas"
        auto_fold = impl == "pallas" and jax.default_backend() == "tpu"
        fold_bn = (
            self.n_segment > 0 and self.fuse_tsm and use_ra
            and (self.fold_bn_inference
                 if self.fold_bn_inference is not None else auto_fold)
        )
        if fold_bn:
            # pallas inference: fold BN1 + ReLU into the kernel epilogue
            # (the tap3 impl needs no folding — XLA fuses eval-BN+ReLU
            # into the conv on its own)
            scale, bias, mean, var = _BNParams(self.features, name="bn1")()
            s = scale * jax.lax.rsqrt(var + 1e-5)
            b = bias - mean * s
            y = TSMConv1x1(self.features, self.n_segment, self.n_div,
                           "pallas", self.dtype, name="conv1")(
                               y, out_scale=s, out_bias=b)
        else:
            if self.n_segment > 0 and self.fuse_tsm:
                y = TSMConv1x1(self.features, self.n_segment, self.n_div,
                               impl, self.dtype, name="conv1")(y)
            else:
                if self.n_segment > 0:
                    y = temporal_shift(y, self.n_segment, self.n_div)
                y = conv(self.features, 1, 1, "conv1")(y)
            y = nn.relu(bn("bn1")(y))
        y = conv(self.features, 3, self.stride, "conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(self.features * 4, 1, 1, "conv3")(y)
        y = bn("bn3")(y)

        if self.projection:
            residual = conv(self.features * 4, 1, self.stride, "proj_conv")(residual)
            residual = bn("proj_bn")(residual)

        return nn.relu(y + residual)

    def _whole_block(self, x, use_ra: bool):
        """Inference fast path: the entire bottleneck (shift + conv1 +
        bn/relu + 3x3 + bn/relu + conv3 + bn + residual + relu) in ONE
        Pallas kernel. Parameter tree identical to the standard path."""
        from ..ops.tsm_block_pallas import (
            tsm_bottleneck_pallas,
            tsm_bottleneck_s2_pallas,
            tsm_bottleneck_s2_planar_pallas,
        )

        f = self.features
        c = x.shape[-1] // 2 if self.planar_in else x.shape[-1]
        w1 = _ConvKernel((1, 1, c, f), name="conv1")().astype(self.dtype)
        w2 = _ConvKernel((3, 3, f, f), name="conv2")().astype(self.dtype)
        w3 = _ConvKernel((1, 1, f, 4 * f), name="conv3")().astype(self.dtype)

        def fold(bn_name, n):
            scale, bias, mean, var = _BNParams(n, name=bn_name)()
            s = scale * jax.lax.rsqrt(var + 1e-5)
            return s, bias - mean * s

        s1, b1 = fold("bn1", f)
        s2, b2 = fold("bn2", f)
        s3, b3 = fold("bn3", 4 * f)
        wp = sp = bp = None
        if self.projection:
            wp = _ConvKernel((1, 1, c, 4 * f),
                             name="proj_conv")().astype(self.dtype)
            sp, bp = fold("proj_bn", 4 * f)
        if self.stride == 2:  # downsample block0 of layers 2-4
            if self.planar_in:
                return tsm_bottleneck_s2_planar_pallas(
                    x, w1, w2, w3, s1, b1, s2, b2, s3, b3, wp, sp, bp,
                    self.n_segment, self.n_div)
            return tsm_bottleneck_s2_pallas(
                x, w1, w2, w3, s1, b1, s2, b2, s3, b3, wp, sp, bp,
                self.n_segment, self.n_div)
        return tsm_bottleneck_pallas(x, w1, w2, w3, s1, b1, s2, b2, s3, b3,
                                     self.n_segment, self.n_div,
                                     wp=wp, sp=sp, bp=bp,
                                     planar_out=self.planar_out)

    def _whole_block_int8(self, x):
        """W8A8 quantized inference fast path (opt-in; ResNet.quantize):
        the entire plain bottleneck in ONE int8 Pallas kernel
        (ops/tsm_block_int8_pallas.py) — int8 dots on the MXU's 2x int8
        rate, int8 activations between interior blocks. Weights are
        quantized per output channel at trace time from the SAME folded
        parameters as the bf16 path (checkpoints unchanged); activation
        scales come from the "quant" collection (ops/quantize.py)."""
        from ..ops.tsm_block_int8_pallas import tsm_bottleneck_int8_pallas

        f = self.features
        c = x.shape[-1]
        w1 = _ConvKernel((1, 1, c, f), name="conv1")()
        w2 = _ConvKernel((3, 3, f, f), name="conv2")()
        w3 = _ConvKernel((1, 1, f, 4 * f), name="conv3")()

        def fold(bn_name, n):
            scale, bias, mean, var = _BNParams(n, name=bn_name)()
            s = scale * jax.lax.rsqrt(var + 1e-5)
            return s, bias - mean * s

        s1, b1 = fold("bn1", f)
        s2, b2 = fold("bn2", f)
        s3, b3 = fold("bn3", 4 * f)
        scales = self.variable(
            "quant", "act_scales",
            lambda: jnp.ones((4,), jnp.float32)).value
        out_mode = ("planar_i8" if (self.planar_out and self.quant_next)
                    else "planar" if self.planar_out
                    else "bf16" if self.quant_last else "i8")
        return tsm_bottleneck_int8_pallas(
            x, w1, w2, w3, s1, b1, s2, b2, s3, b3, scales,
            self.n_segment, self.n_div, out_mode=out_mode,
            out_dtype=self.dtype)

    def _whole_block_s2_int8(self, x):
        """W8A8 stride-2 planar block0 (ops/tsm_block_int8_pallas.py
        _kernel_s2_planar_i8): consumes the previous stage tail's planar
        emission (int8 when that stage was quantized, bf16 from layer 1),
        emits int8 for the stage's entry plain block."""
        from ..ops.tsm_block_int8_pallas import (
            tsm_bottleneck_s2_planar_int8_pallas,
        )

        f = self.features
        c = x.shape[-1] // 2
        w1 = _ConvKernel((1, 1, c, f), name="conv1")()
        w2 = _ConvKernel((3, 3, f, f), name="conv2")()
        w3 = _ConvKernel((1, 1, f, 4 * f), name="conv3")()
        wp = _ConvKernel((1, 1, c, 4 * f), name="proj_conv")()

        def fold(bn_name, n):
            scale, bias, mean, var = _BNParams(n, name=bn_name)()
            s = scale * jax.lax.rsqrt(var + 1e-5)
            return s, bias - mean * s

        s1, b1 = fold("bn1", f)
        s2, b2 = fold("bn2", f)
        s3, b3 = fold("bn3", 4 * f)
        sp, bp = fold("proj_bn", 4 * f)
        scales = self.variable(
            "quant", "act_scales",
            lambda: jnp.ones((4,), jnp.float32)).value
        return tsm_bottleneck_s2_planar_int8_pallas(
            x, w1, w2, w3, s1, b1, s2, b2, s3, b3, wp, sp, bp, scales,
            self.n_segment, self.n_div, out_mode="i8",
            out_dtype=self.dtype)

    def _whole_block_train(self, x):
        """Training fast path: the bottleneck's convs fused with temporal
        shift, in-kernel batch-stat accumulation and a full Pallas custom
        VJP (ops/tsm_block_train_pallas.py); projection blocks take the
        proj/s2 variants (projection conv fused into the conv1 kernel),
        so ALL 16 ResNet50 bottlenecks train fused. Parameter and
        batch_stats trees identical to the standard path; running
        averages updated with nn.BatchNorm's convention (momentum 0.9,
        biased batch variance)."""
        from ..ops.tsm_block_train_pallas import (
            tsm_bottleneck_proj_train,
            tsm_bottleneck_s2_train,
            tsm_bottleneck_train,
        )

        f = self.features
        c = x.shape[-1]
        dt = self.dtype
        w1 = _ConvKernel((1, 1, c, f), name="conv1")().astype(dt)
        w2 = _ConvKernel((3, 3, f, f), name="conv2")().astype(dt)
        w3 = _ConvKernel((1, 1, f, 4 * f), name="conv3")().astype(dt)
        bns = [_BNParams(n, mutable=True, name=name)()
               for name, n in (("bn1", f), ("bn2", f), ("bn3", 4 * f))]
        if self.projection:
            wp = _ConvKernel((1, 1, c, 4 * f),
                             name="proj_conv")().astype(dt)
            bns.append(_BNParams(4 * f, mutable=True, name="proj_bn")())
            block_fn = (tsm_bottleneck_s2_train if self.stride == 2
                        else tsm_bottleneck_proj_train)
            y, stats = block_fn(
                x.astype(dt), w1, w2, w3, wp,
                bns[0][0], bns[0][1], bns[1][0], bns[1][1],
                bns[2][0], bns[2][1], bns[3][0], bns[3][1],
                self.n_segment, self.n_div, 1e-5)
        else:
            y, stats = tsm_bottleneck_train(
                x.astype(dt), w1, w2, w3,
                bns[0][0], bns[0][1], bns[1][0], bns[1][1],
                bns[2][0], bns[2][1],
                self.n_segment, self.n_div, 1e-5)
        if not self.is_initializing():
            mom = 0.9
            for i, (_, _, mean_v, var_v) in enumerate(bns):
                mu, var = stats[2 * i], stats[2 * i + 1]
                mean_v.value = mom * mean_v.value + (1 - mom) * mu
                var_v.value = mom * var_v.value + (1 - mom) * var
        return y


class ResNet(nn.Module):
    """ResNet-50/101 backbone -> [N, feature_dim] pooled features."""

    depth: int = 50
    n_segment: int = 0  # >0: TSM on every block ('blockres')
    n_div: int = 8
    fuse_tsm: bool = True
    # "auto" (default) = the best measured mix per mode (PERF.md rounds
    # 2-3): INFERENCE runs the all-pallas whole-block fused kernels;
    # TRAINING runs the cross-block fused TRUNK custom VJP when its
    # residuals fit TRUNK_TRAIN_BUDGET (1,704 frames/s at B=4 bf16 =
    # 1.40x tap3), else the natively-differentiable 3-tap conv.
    # Or: one impl string for all stages, or a per-stage 4-tuple.
    tsm_impl: Any = "auto"
    # rematerialize each bottleneck under grad (training only): residuals
    # are recomputed in the backward pass, so only block INPUTS are stored
    # — the f32 per-conv activation saves that OOM'd B=16 training steps
    # (PERF.md round 3) vanish, at ~1/3 extra forward FLOPs in backward.
    remat: bool = False
    # chain consecutive plain blocks of a stage into ONE flat kernel call
    # at inference (tsm_bottleneck_chain_pallas): intermediates stay
    # VMEM-resident and the per-grid-step overhead is paid once per chain
    # instead of once per block. MEASURED SLOWER on v5e (PERF.md round 3):
    # flat chains ~neutral (16.65 vs 16.15 ms for the plain stages), the
    # halo-tiled layer1 pair a clear loss (10.51 vs 6.65 ms — halo
    # recompute + the narrower row tiles it forces), so OFF by default;
    # kept as an A/B knob (tools/profile_model.py --chain).
    chain_blocks: bool = False
    # W8A8 quantized inference (OPT-IN; never a silent default): plain
    # bottlenecks of layers 2-4 run the int8 fused kernels
    # (ops/tsm_block_int8_pallas.py) with activation scales from the
    # "quant" variables collection — calibrate with
    # ops.quantize.calibrate_resnet_quant and apply with
    # {**variables, "quant": scales}. ~1.5x the bf16 flat kernels on
    # v5e (PERF.md round 3); accuracy is a calibration property.
    quantize: bool = False
    fold_bn_inference: Optional[bool] = None
    fuse_stem_pool: bool = True  # fused stem bn+relu+maxpool at inference
    # "frames": x is [N, H, W, 3] (normalized float). "s2d": x is the 4x4
    # space-to-depth view [N, H/4, W/4, 48] — uint8 RAW pixels (the fused
    # stem normalizes in VMEM; ops/preprocess.py constants) or normalized
    # float. Host loaders emit s2d order for free, which removes the
    # on-device transpose + normalize passes from the hot path (PERF.md).
    stem_input: str = "frames"
    stage_sizes: Optional[Sequence[int]] = None  # override blocks-per-stage
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, x, train: bool = False, bn_batch_stats: bool = False,
                 from_stage: int = 0, capture=None):
        """x: [N, H, W, 3] (N = batch*time when TSM enabled, time-major per
        sample). Returns pooled features [N, 2048].

        from_stage > 0 skips the stem and earlier stages, taking x as the
        intermediate activation (used by Grad-CAM, which re-enters from a
        captured stage input). capture: optional dict receiving stage
        outputs under 'stage{i}'.
        """
        use_ra = not train and not bn_batch_stats
        sizes = self.stage_sizes or STAGE_SIZES[self.depth]
        y = x
        if from_stage == 0:
            s2d = self.stem_input == "s2d"
            fuse_stem = (
                self.fuse_stem_pool and use_ra
                and (jax.default_backend() == "tpu" or FORCE_WHOLE_BLOCKS)
                and y.shape[1] == y.shape[2]
                and (s2d or (y.shape[-1] == 3 and y.shape[1] % 4 == 0))
            )
            # training-mode fused stem (batch-stat BN accumulated in the
            # conv kernel + hand-written VJP, ops/stem_train_pallas.py):
            # pairs with tsm_impl="fusedtrain" so the whole vision trunk
            # trains on pallas with no XLA-conv layout boundary.
            # `auto` takes the trunk only under the residual budget (gate
            # at the blocks below); the stem must take the SAME decision
            # BEFORE the stem runs, so predict the post-stem shape
            # (7x7/2 conv pad 3, then 3x3/2 pool pad 1; s2d inputs are
            # already at post-stem resolution) and apply the same test.
            if s2d:
                hp_, wp_ = y.shape[1], y.shape[2]
            else:
                hc_, wc_ = ((y.shape[1] - 1) // 2 + 1,
                            (y.shape[2] - 1) // 2 + 1)
                hp_, wp_ = (hc_ + 1) // 2, (wc_ + 1) // 2
            auto_trunk = (
                TRUNK_TRAIN and self.tsm_impl == "auto"
                and not self.remat and self.fuse_tsm
                and self.n_segment > 0
                and _trunk_residual_bytes(
                    y.shape[0], hp_, wp_, 64, sizes,
                    jnp.dtype(self.dtype).itemsize)
                <= TRUNK_TRAIN_BUDGET)
            wants_ft = (self.tsm_impl == "fusedtrain" or auto_trunk
                        or (not isinstance(self.tsm_impl, str)
                            and "fusedtrain" in tuple(self.tsm_impl)))
            fuse_stem_train = (
                self.fuse_stem_pool and not use_ra and wants_ft
                and (jax.default_backend() == "tpu"
                     or FORCE_WHOLE_BLOCKS)
                and y.shape[1] == y.shape[2]
                and (s2d or (y.shape[-1] == 3 and y.shape[1] % 4 == 0))
            )
            if s2d and not fuse_stem and not fuse_stem_train:
                # fallback (training / off-TPU): undo the space-to-depth
                # and normalize, then run the standard stem
                from ..ops.preprocess import normalize_frames

                n_, nsp = y.shape[0], y.shape[1]
                y = y.reshape(n_, nsp, nsp, 4, 4, 3)
                y = y.transpose(0, 1, 3, 2, 4, 5)
                y = y.reshape(n_, 4 * nsp, 4 * nsp, 3)
                if y.dtype == jnp.uint8:
                    y = normalize_frames(y, out_dtype=self.dtype)
            if fuse_stem_train:
                from ..ops.stem_train_pallas import (
                    stem_frames_train,
                    stem_s2d_train,
                )

                w7 = _ConvKernel((7, 7, 3, 64),
                                 name="conv_init")().astype(self.dtype)
                scale, bias, mean_v, var_v = _BNParams(
                    64, mutable=True, name="bn_init")()
                stem_fn = stem_s2d_train if s2d else stem_frames_train
                y, (mu, var) = stem_fn(y, w7, scale, bias, 1e-5,
                                       self.dtype)
                if not self.is_initializing():
                    mom = 0.9
                    mean_v.value = mom * mean_v.value + (1 - mom) * mu
                    var_v.value = mom * var_v.value + (1 - mom) * var
            elif fuse_stem and s2d:
                # the weight-only int8 stem (stem_s2d_int8_pallas)
                # measured only -0.14 ms (3.45 -> 3.31: the stem is
                # z-build/VPU-bound, not MXU-bound) — not worth the
                # weight-rounding error in the layer every downstream
                # feature depends on, so even quantize=True keeps the
                # bf16 stem (PERF.md round 3)
                from ..ops.stem_pallas import stem_s2d_pallas

                w7 = _ConvKernel((7, 7, 3, 64),
                                 name="conv_init")().astype(self.dtype)
                scale, bias, mean, var = _BNParams(64, name="bn_init")()
                s = scale * jax.lax.rsqrt(var + 1e-5)
                y = stem_s2d_pallas(y, w7, s, bias - mean * s,
                                    out_dtype=self.dtype)
            elif fuse_stem:
                # whole stem (7x7/2 conv + bn + relu + 3x3/2 max pool) in
                # one Pallas kernel: no XLA conv batch-minor layouts, no
                # reduce-window, no transposes (PERF.md round 2: the XLA
                # stem tail cost ~10.4ms of 56ms at B=32). Param tree
                # identical to the standard path.
                from ..ops.stem_pallas import stem_conv_bn_pool_pallas

                w7 = _ConvKernel((7, 7, 3, 64),
                                 name="conv_init")().astype(self.dtype)
                scale, bias, mean, var = _BNParams(64, name="bn_init")()
                s = scale * jax.lax.rsqrt(var + 1e-5)
                y = stem_conv_bn_pool_pallas(y, w7, s, bias - mean * s)
            else:
                y = nn.Conv(
                    64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv_init",
                )(y)
                y = nn.BatchNorm(
                    use_running_average=use_ra, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="bn_init",
                )(y)
                y = nn.relu(y)
                y = nn.max_pool(y, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            if capture is not None:
                capture["stem"] = y

        if (TRUNK_TRAIN and from_stage == 0 and capture is None
                and not use_ra
                and (self.tsm_impl == "fusedtrain"
                     or (self.tsm_impl == "auto"
                         and _trunk_residual_bytes(
                             y.shape[0], y.shape[1], y.shape[2],
                             y.shape[3], sizes,
                             jnp.dtype(self.dtype).itemsize)
                         <= TRUNK_TRAIN_BUDGET))
                and not self.remat
                and self.n_segment > 0 and self.fuse_tsm
                and (jax.default_backend() == "tpu" or FORCE_WHOLE_BLOCKS)
                and all(nb >= 2 for nb in sizes)
                and y.shape[1] % (2 ** (len(sizes) - 1)) == 0
                and y.shape[2] % (2 ** (len(sizes) - 1)) == 0):
            y = self._fused_trunk_train(y, sizes)
            return jnp.mean(y, axis=(1, 2))
        block_cls = Bottleneck
        if self.remat and not use_ra:
            # static_argnums counts the module instance as arg 0
            block_cls = nn.remat(Bottleneck, static_argnums=(2, 3))

        def impl_for(stage):
            if self.tsm_impl == "auto":
                return AUTO_TSM_IMPL[stage], "tap3"
            if isinstance(self.tsm_impl, str):
                return self.tsm_impl, None
            return self.tsm_impl[stage], None

        # planar inter-block chain planning: link stage s -> s+1 when the
        # LAST block of s and the stride-2 block0 of s+1 both take fused
        # kernels — the producer then stores pair-merged columns and the
        # consumer skips the stride-2 column-selection relayout entirely
        # (ops/tsm_block_pallas.py _kernel_s2_planar). Disabled when
        # re-entering mid-backbone or capturing stage outputs (Grad-CAM
        # consumers expect standard-layout activations).
        links = [False] * len(sizes)
        if from_stage == 0 and capture is None:
            hs, ws = y.shape[1], y.shape[2]
            for s in range(len(sizes) - 1):
                i_s, _ = impl_for(s)
                i_n, _ = impl_for(s + 1)
                # producer = LAST block of stage s: must be a stride-1
                # block (single-block stages of tiny variants make block0
                # the stride-2 block itself — it cannot be both ends)
                p_stride = 2 if (s > 0 and sizes[s] == 1) else 1
                p_proj = sizes[s] == 1
                links[s] = (
                    ws % 2 == 0 and p_stride == 1
                    and _whole_fused(i_s, self.n_segment, self.fuse_tsm,
                                     use_ra, p_stride, p_proj, hs, ws)
                    and _whole_fused(i_n, self.n_segment, self.fuse_tsm,
                                     use_ra, 2, True, hs, ws)
                )
                hs, ws = hs // 2, ws // 2

        # W8A8 chains (layers 2-4 only: layer 1's F=64 pads to 128 lanes
        # and the doubled f32 im2col/requant VPU work made its int8 halo
        # kernel a wash or worse — 3.70/3.42 ms vs 3.20/3.45 bf16,
        # PERF.md round 3). Per quantized stage: the stride-2 planar
        # block0 runs int8 (consuming the previous tail's planar
        # emission — int8 when that stage was quantized too, bf16 from
        # layer 1), interior plain blocks pass int8 activations, and the
        # tail emits bf16 (or int8 planar when the next block0 is int8).
        quant_stages = [
            self.quantize and use_ra and stage > 0
            and from_stage == 0 and capture is None
            and sizes[stage] >= 2
            and self.n_segment > 0 and self.fuse_tsm
            and (jax.default_backend() == "tpu" or FORCE_WHOLE_BLOCKS)
            for stage in range(len(sizes))
        ]
        for stage, num_blocks in enumerate(sizes):
            if stage + 1 <= from_stage:
                continue
            features = 64 * (2**stage)
            quant_stage = quant_stages[stage]
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                impl, impl_train = impl_for(stage)
                chain_mode = (
                    self._chain_stage(impl, use_ra, y)
                    if (block == 1 and num_blocks >= 3 and use_ra
                        and self.chain_blocks and not quant_stage)
                    else None)
                if chain_mode:
                    from ..ops.tsm_block_pallas import (
                        tsm_bottleneck_chain_pallas,
                        tsm_bottleneck_halo_chain_pallas,
                    )

                    params = [
                        _FusedBlockParams(
                            features, self.dtype,
                            name=f"layer{stage + 1}_block{k}",
                        )(y.shape[-1])
                        for k in range(1, num_blocks)
                    ]
                    chain_fn = (tsm_bottleneck_chain_pallas
                                if chain_mode == "flat"
                                else tsm_bottleneck_halo_chain_pallas)
                    y = chain_fn(y, params, self.n_segment, self.n_div,
                                 planar_out=links[stage])
                    break
                y = block_cls(
                    features=features,
                    stride=stride,
                    projection=(block == 0),
                    n_segment=self.n_segment,
                    n_div=self.n_div,
                    fuse_tsm=self.fuse_tsm,
                    tsm_impl=impl,
                    tsm_impl_train=impl_train,
                    fold_bn_inference=self.fold_bn_inference,
                    planar_out=(block == num_blocks - 1 and links[stage]),
                    planar_in=(block == 0 and stage > 0
                               and links[stage - 1]),
                    quant=quant_stage and block > 0,
                    quant_last=quant_stage and block == num_blocks - 1,
                    quant_s2=(INT8_S2_BLOCKS and quant_stage
                              and block == 0 and stage > 0
                              and links[stage - 1]),
                    quant_next=(INT8_S2_BLOCKS
                                and stage + 1 < len(sizes)
                                and links[stage]
                                and quant_stages[stage + 1]),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(y, train, bn_batch_stats)
            if capture is not None:
                capture[f"stage{stage + 1}"] = y

        # global average pool (torchvision avgpool + flatten)
        return jnp.mean(y, axis=(1, 2))

    def _fused_trunk_train(self, y, sizes):
        """Training fast path for tsm_impl='fusedtrain': ALL bottlenecks
        in ONE cross-block custom VJP (ops/tsm_trunk_train_pallas.py) —
        each block's finale fused into the next block's conv1 kernel,
        the backward relu/BN3-moment passes into the next block's
        conv1-backward epilogue, tensors 5-d end to end. Parameter and
        batch_stats trees identical to the per-block paths; running
        averages updated with nn.BatchNorm's convention."""
        from ..ops.tsm_trunk_train_pallas import tsm_trunk_train

        dt = self.dtype
        blocks, kinds, bns_all = [], [], []
        c = y.shape[-1]
        for stage, num_blocks in enumerate(sizes):
            features = 64 * (2 ** stage)
            for block in range(num_blocks):
                proj = block == 0
                kinds.append("s2" if (proj and stage > 0)
                             else "proj" if proj else "plain")
                params, bns = _TrainBlockVars(
                    features, proj, dt,
                    name=f"layer{stage + 1}_block{block}")(c)
                blocks.append(params)
                bns_all.append(bns)
                c = 4 * features
        y, stats_all = tsm_trunk_train(
            y.astype(dt), tuple(blocks), tuple(kinds),
            self.n_segment, self.n_div, 1e-5)
        if not self.is_initializing():
            mom = 0.9
            for bns, stats in zip(bns_all, stats_all):
                for i, (_, _, mean_v, var_v) in enumerate(bns):
                    mu, var = stats[2 * i], stats[2 * i + 1]
                    mean_v.value = mom * mean_v.value + (1 - mom) * mu
                    var_v.value = mom * var_v.value + (1 - mom) * var
        return y

    def _chain_stage(self, impl, use_ra, y):
        """Chain strategy for a stage's plain blocks: 'flat' (whole
        sample per step, layers 2-4), 'halo' (row-tiled with K halo rows,
        layer1 — sample too big for flat), or None (no chaining)."""
        from ..ops.tsm_block_pallas import DEFAULT_TUNING, flat_sample_fits

        h, w, c = y.shape[1], y.shape[2], y.shape[3]
        if not _whole_fused(impl, self.n_segment, self.fuse_tsm, use_ra,
                            1, False, h, w):
            return None
        if DEFAULT_TUNING["flat"] and flat_sample_fits(
                self.n_segment, h, w, c, jnp.dtype(self.dtype).itemsize):
            return "flat"
        if w % 8 == 0:
            return "halo"
        return None


class Resnet50TSM(nn.Module):
    """Vision embedder + optional clip classifier head.

    forward contract of the reference wrapper (resnet50_tsm.py:68-77):
    input [B, T, H, W, 3] -> features [B, T, 2048]; with the chapter head,
    logits over the concatenated time dim (Linear(T*2048 -> 2)).
    """

    segments_size: int = 16
    shift_div: int = 8
    with_head: bool = False
    fuse_tsm: bool = True
    tsm_impl: Any = "auto"
    stem_input: str = "frames"  # see ResNet.stem_input
    quantize: bool = False  # opt-in W8A8 trunk, see ResNet.quantize
    stage_sizes: Optional[Sequence[int]] = None  # tiny variants for tests
    dtype: Any = jnp.float32

    def setup(self):
        self.base_model = ResNet(
            depth=50, n_segment=self.segments_size, n_div=self.shift_div,
            fuse_tsm=self.fuse_tsm, tsm_impl=self.tsm_impl,
            stem_input=self.stem_input, quantize=self.quantize,
            stage_sizes=self.stage_sizes, dtype=self.dtype,
        )
        if self.with_head:
            self.head = nn.Dense(2, dtype=self.dtype)

    def features(self, x, train: bool = False, bn_batch_stats: bool = False):
        b, t = x.shape[0], x.shape[1]
        flat = x.reshape(b * t, *x.shape[2:])
        out = self.base_model(flat, train=train, bn_batch_stats=bn_batch_stats)
        return out.reshape(b, t, -1)

    def __call__(self, x, train: bool = False, bn_batch_stats: bool = False):
        feats = self.features(x, train=train, bn_batch_stats=bn_batch_stats)
        if not self.with_head:
            return feats
        b = feats.shape[0]
        logits = self.head(feats.reshape(b, -1))
        return logits, jax.nn.softmax(logits, axis=-1)


# ---------------------------------------------------------------------------
# torchvision weight conversion
# ---------------------------------------------------------------------------


def convert_torchvision_resnet50(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a torchvision resnet50 state dict (tensors or numpy arrays)
    into {'params': ..., 'batch_stats': ...} for `ResNet`.

    Accepts keys like 'conv1.weight', 'layer1.0.conv1.weight',
    'layer1.0.downsample.0.weight'. The 'fc.*' head is dropped (the
    reference replaces it with Identity, resnet50_tsm.py:19).
    """
    import numpy as np

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_w(v):
        return to_np(v).transpose(2, 3, 1, 0)  # OIHW -> HWIO

    for key, v in state_dict.items():
        if key.startswith("fc."):
            continue
        parts = key.split(".")
        if parts[0] == "conv1":
            put(params, ("conv_init", "kernel"), conv_w(v))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn_init",), parts[1], to_np(v))
        elif parts[0].startswith("layer"):
            layer, block = parts[0], parts[1]
            mod = f"{layer}_block{block}"
            sub = parts[2]
            if sub.startswith("conv"):
                put(params, (mod, sub, "kernel"), conv_w(v))
            elif sub.startswith("bn"):
                _put_bn(params, stats, (mod, sub), parts[3], to_np(v))
            elif sub == "downsample":
                if parts[3] == "0":  # conv
                    put(params, (mod, "proj_conv", "kernel"), conv_w(v))
                else:  # 1 -> bn
                    _put_bn(params, stats, (mod, "proj_bn"), parts[4], to_np(v))
        # num_batches_tracked and anything else: ignore

    return {"params": params, "batch_stats": stats}


def _put_bn(params, stats, path, field, value):
    def put(tree, p, leaf):
        node = tree
        for x in p[:-1]:
            node = node.setdefault(x, {})
        node[p[-1]] = leaf

    if field == "weight":
        put(params, (*path, "scale"), value)
    elif field == "bias":
        put(params, (*path, "bias"), value)
    elif field == "running_mean":
        put(stats, (*path, "mean"), value)
    elif field == "running_var":
        put(stats, (*path, "var"), value)


def convert_hf_resnet(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a HuggingFace `ResNetModel` state dict (microsoft/resnet-50
    lineage — same v1.5 bottleneck architecture) into `ResNet` variables.

    Key mapping: embedder -> conv_init/bn_init;
    encoder.stages.{s}.layers.{b}.layer.{0,1,2} -> layer{s+1}_block{b}.conv1..3;
    .shortcut -> proj_conv/proj_bn.
    """
    import numpy as np

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for x in path[:-1]:
            node = node.setdefault(x, {})
        node[path[-1]] = leaf

    def conv_w(v):
        return to_np(v).transpose(2, 3, 1, 0)

    for key, v in state_dict.items():
        parts = key.split(".")
        if key.startswith("embedder."):
            if parts[-2] == "convolution":
                put(params, ("conv_init", "kernel"), conv_w(v))
            else:
                _put_bn(params, stats, ("bn_init",), parts[-1], to_np(v))
        elif key.startswith("encoder.stages."):
            s, b = int(parts[2]), int(parts[4])
            mod = f"layer{s + 1}_block{b}"
            if parts[5] == "shortcut":
                if parts[-2] == "convolution":
                    put(params, (mod, "proj_conv", "kernel"), conv_w(v))
                else:
                    _put_bn(params, stats, (mod, "proj_bn"), parts[-1], to_np(v))
            elif parts[5] == "layer":
                conv_idx = int(parts[6]) + 1
                if parts[-2] == "convolution":
                    put(params, (mod, f"conv{conv_idx}", "kernel"), conv_w(v))
                else:
                    _put_bn(
                        params, stats, (mod, f"bn{conv_idx}"), parts[-1], to_np(v)
                    )

    return {"params": params, "batch_stats": stats}
