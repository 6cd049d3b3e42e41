"""Fused frame preprocessing: uint8 -> normalized float, on device.

Replaces the reference's per-image torchvision `ToTensor + Normalize`
(test_whole_pipeline_per_video.py:109-116, ImageNet mean/std) with a single
fused affine on-device: out = u8 * scale + bias where
scale = 1/(255*std), bias = -mean/std. Doing this on the TPU instead of the
host (a) ships 4x fewer bytes over PCIe (uint8 vs float32) and (b) fuses
into the first convolution's input.

The Pallas variant tiles the flattened pixel stream into [rows, 3*128]
lane-aligned blocks so the period-3 channel pattern lands exactly on lane
boundaries; the XLA variant handles arbitrary shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization (torchvision convention).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _affine_consts(dtype=jnp.float32):
    scale = 1.0 / (255.0 * IMAGENET_STD)
    bias = -IMAGENET_MEAN / IMAGENET_STD
    return jnp.asarray(scale, dtype), jnp.asarray(bias, dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def normalize_frames(frames_u8: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """[..., H, W, 3] uint8 -> normalized [..., H, W, 3] float.

    One fused multiply-add; XLA fuses it into the consumer.
    """
    scale, bias = _affine_consts(jnp.float32)
    out = frames_u8.astype(jnp.float32) * scale + bias
    return out.astype(out_dtype)


_BLOCK_LANES = 3 * 128  # period-3 channel pattern tiles exactly into lanes


def _norm_kernel(x_ref, scale_ref, bias_ref, o_ref):
    o_ref[:] = x_ref[:].astype(jnp.float32) * scale_ref[:] + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def normalize_frames_pallas(frames_u8: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """Pallas version of `normalize_frames` (identical numerics).

    Requires the total pixel-channel count to be divisible by 384
    (true for 224x224x3 = 150528 = 392 * 384).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = frames_u8.shape
    total = int(np.prod(shape))
    if total % _BLOCK_LANES != 0:
        return normalize_frames(frames_u8, out_dtype)

    rows = total // _BLOCK_LANES
    x = frames_u8.reshape(rows, _BLOCK_LANES)
    scale, bias = _affine_consts(jnp.float32)
    scale_row = jnp.tile(scale, _BLOCK_LANES // 3)[None, :]
    bias_row = jnp.tile(bias, _BLOCK_LANES // 3)[None, :]

    block_rows = min(rows, 512)
    # fall back to XLA when rows don't tile evenly
    if rows % block_rows != 0:
        return normalize_frames(frames_u8, out_dtype)

    out = pl.pallas_call(
        _norm_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _BLOCK_LANES), jnp.float32),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, _BLOCK_LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, _BLOCK_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, _BLOCK_LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, scale_row, bias_row)

    return out.reshape(shape).astype(out_dtype)


def resize_frames(frames: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize [..., H, W, C] -> [..., height, width, C] on device."""
    out_shape = (*frames.shape[:-3], height, width, frames.shape[-1])
    return jax.image.resize(frames, out_shape, method="bilinear")
