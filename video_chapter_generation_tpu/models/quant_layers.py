"""Weight-only int8 layers for serving the text models.

TPU decode is weight-streaming-bound: a Pegasus-large KV-cached decode
step reads every decoder matrix + the tied lm-head table from HBM for ~8
rows of activations. XLA fuses an `int8 -> bf16` convert into the matmul
operand (measured 1.98x on decode-shaped chains, tools/probe_int8_text.py;
PERF.md round 3), so weight-only quantization needs no custom kernel:
store kernels as int8 with per-output-channel bf16 scales and let the
dot's epilogue apply the scale.

These modules mirror `nn.Dense` / `nn.Embed` call signatures; the param
tree is produced from a float checkpoint by
`ops.quantize.quantize_seq2seq` (same module paths, `kernel` ->
`kernel_q` + `scale`). Activations stay bf16 (W8A16) — per-step
activations are tiny at decode, so there is nothing to win from
quantizing them, and accuracy stays within weight-rounding error.

Reference surface: the reference serves Pegasus-large in fp32 with a
cacheless generate (pegasus_hugface.py:105-146); this is the TPU-native
replacement's serving-efficiency path.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def quantize_weight(w, axis=0):
    """Per-channel symmetric int8 quantization of a float matrix.

    Returns (q int8, scale f32) with w ~= q * scale, scale per output
    channel (all axes except `axis` reduced ... here: scale shaped like
    w.shape[1-axis] for 2-d w reduced over `axis`).
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / jnp.expand_dims(scale, axis)), -127, 127)
    return q.astype(jnp.int8), scale


class Int8Dense(nn.Module):
    """Drop-in Dense with int8 kernel + per-output-channel scale.

    y = (x @ kernel_q) * scale + bias; the convert + scale fuse into the
    matmul on TPU, so the kernel streams from HBM as int8.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        q = self.param(
            "kernel_q", nn.initializers.zeros,
            (x.shape[-1], self.features), jnp.int8)
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        y = jnp.dot(x, q.astype(self.dtype)) * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Int8Embed(nn.Module):
    """Tied-embedding table stored int8 with per-ROW (vocab) scales.

    Serves both uses of the shared Pegasus table: lookup (row gather *
    scalar scale — exact same rounding as the head) and the tied lm head
    (`logits`: hidden @ q.T * scale, the 96k x 1024 matrix that dominates
    decode-step HBM traffic).
    """

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding_q = self.param(
            "embedding_q", nn.initializers.zeros,
            (self.num_embeddings, self.features), jnp.int8)
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.num_embeddings,),
            jnp.float32)

    def __call__(self, ids):
        rows = jnp.take(self.embedding_q, ids, axis=0).astype(self.dtype)
        row_scale = jnp.take(self.scale, ids, axis=0)[..., None]
        return rows * row_scale.astype(self.dtype)

    def logits(self, hidden):
        y = jnp.dot(hidden.astype(self.dtype),
                    self.embedding_q.T.astype(self.dtype))
        return y * self.scale.astype(self.dtype)
