"""Post-training W8A8 calibration for the quantized inference trunk.

Collects per-tensor activation abs-max statistics by running the CLEAN
bf16/f32 bottleneck math (never the quantized path) over calibration
frames, and returns the "quant" flax variables collection consumed by
models/resnet.py ResNet(quantize=True) — per plain block of stages 2-4
a (4,) f32 vector (sx, sz, sy2, sout):

  sx   input scale (== previous block's output scale: same tensor)
  sz   conv2 input (the relu(bn1 conv1) im2col values)
  sy2  conv3 input (relu(bn2 conv2))
  sout block output

Usage:
  scales = calibrate_resnet_quant(model, variables, frames)
  qmodel = model.clone(quantize=True)
  feats  = qmodel.apply({**variables, "quant": scales}, frames)

Statistics come from the reference's own inference semantics (folded
running-stat BN, temporal shift per ops/temporal_shift.py); max_pct
trims outliers (e.g. 99.9) at the usual accuracy/saturation trade-off.
The reference stack has no quantized path — this is a TPU-serving
extension, opt-in and validated by tests/test_int8_quant.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .temporal_shift import temporal_shift


def _fold(params, stats, name):
    s = params[name]["scale"] * jax.lax.rsqrt(stats[name]["var"] + 1e-5)
    return s, params[name]["bias"] - stats[name]["mean"] * s


def _amax(v, pct: Optional[float]):
    v = jnp.abs(v.astype(jnp.float32))
    if pct is None:
        return jnp.max(v)
    return jnp.quantile(v.reshape(-1), pct / 100.0)


def _block_forward(x, params, stats, stride, proj, n_segment, n_div,
                   pct=None, collect=False):
    """Generic bottleneck forward (bf16/f32 reference math, folded BN);
    with collect=True also returns the three intermediate amaxes."""
    c = x.shape[-1]
    w1 = params["conv1"]["kernel"].reshape(c, -1)
    f = w1.shape[1]
    w2 = params["conv2"]["kernel"]
    w3 = params["conv3"]["kernel"].reshape(f, -1)
    s1, b1 = _fold(params, stats, "bn1")
    s2, b2 = _fold(params, stats, "bn2")
    s3, b3 = _fold(params, stats, "bn3")

    y = temporal_shift(x, n_segment, n_div)
    y = jnp.einsum("nhwc,cf->nhwf", y, w1.astype(y.dtype))
    y1 = jnp.maximum(y * s1 + b1, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        y1, w2.astype(y1.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y2 = jnp.maximum(y * s2 + b2, 0.0).astype(x.dtype)
    y = jnp.einsum("nhwf,fc->nhwc", y2, w3.astype(y2.dtype))
    y3 = y * s3 + b3
    residual = x
    if proj:
        wp = params["proj_conv"]["kernel"].reshape(c, -1)
        sp, bp = _fold(params, stats, "proj_bn")
        r = x[:, ::stride, ::stride] if stride > 1 else x
        residual = (jnp.einsum("nhwc,ck->nhwk", r, wp.astype(x.dtype))
                    * sp + bp)
    out = jnp.maximum(y3 + residual, 0.0).astype(x.dtype)
    if not collect:
        return out
    return out, (_amax(y1, pct), _amax(y2, pct), _amax(out, pct))


def calibrate_resnet_quant(model, variables, frames,
                           max_pct: Optional[float] = None,
                           train: bool = False) -> Dict[str, Any]:
    """Run `model` (a models.resnet.ResNet, quantize=False) over
    calibration `frames` ([N*T, H, W, 3] normalized float, or the s2d
    uint8 pack for stem_input='s2d' models) and return the "quant"
    variables collection for the quantized twin.

    Stage inputs come from the model's own capture hook (so the stem and
    block0s run the production path); the per-block intermediates rerun
    the reference bottleneck math above."""
    del train
    params_keys = variables["params"].keys()
    sizes = model.stage_sizes or tuple(
        sum(1 for k in params_keys if k.startswith(f"layer{s}_block"))
        for s in range(1, 5))

    def collect(variables, frames):
        # one jitted graph: eager apply through the tunneled runtime is
        # dispatch-bound (CLAUDE.md) — calibration must compile
        capture: Dict[str, Any] = {}
        model.apply(variables, frames, capture=capture)
        params = variables["params"]
        stats = variables["batch_stats"]
        eps0 = 1e-6
        out: Dict[str, Any] = {}
        for stage in range(len(sizes)):  # all stages with plain blocks
            x = capture["stem"] if stage == 0 else capture[f"stage{stage}"]
            name0 = f"layer{stage + 1}_block0"
            sx0 = _amax(x, max_pct) / 127.0
            x, (a1, a2, ao) = _block_forward(
                x, params[name0], stats[name0],
                2 if stage > 0 else 1, True,
                model.n_segment, model.n_div, pct=max_pct, collect=True)
            # the stride-2 block0's own scales (int8 s2 kernel); its
            # sout IS the entry plain block's sx (same tensor)
            out[name0] = {"act_scales": jnp.stack([
                jnp.maximum(sx0, eps0), jnp.maximum(a1 / 127.0, eps0),
                jnp.maximum(a2 / 127.0, eps0),
                jnp.maximum(ao / 127.0, eps0)])}
            sx = ao / 127.0
            for blk in range(1, sizes[stage]):
                name = f"layer{stage + 1}_block{blk}"
                x, (a1, a2, ao) = _block_forward(
                    x, params[name], stats[name], 1, False,
                    model.n_segment, model.n_div, pct=max_pct,
                    collect=True)
                eps = 1e-6
                out[name] = {"act_scales": jnp.stack([
                    jnp.maximum(sx, eps), jnp.maximum(a1 / 127.0, eps),
                    jnp.maximum(a2 / 127.0, eps),
                    jnp.maximum(ao / 127.0, eps)])}
                sx = ao / 127.0  # next block's input IS this output
        return out

    out = jax.jit(collect)(variables, frames)
    return jax.tree_util.tree_map(np.asarray, out)


def calibrate_tsm_quant(model50, variables, clips_u8,
                        max_pct: Optional[float] = None) -> Dict[str, Any]:
    """Calibration for the Resnet50TSM wrapper: clips_u8 [B, T, ...]
    uint8 (s2d pack or frames, matching model50.stem_input) -> the
    "quant" collection nested for the wrapper's variable tree
    ({"base_model": {...}}). Pair with model50.clone(quantize=True) and
    apply({**variables, "quant": scales}, ...)."""
    import jax.numpy as jnp

    from ..models.resnet import ResNet

    inner = ResNet(
        depth=50, n_segment=model50.segments_size,
        n_div=model50.shift_div, fuse_tsm=model50.fuse_tsm,
        tsm_impl=model50.tsm_impl, stem_input=model50.stem_input,
        stage_sizes=model50.stage_sizes, dtype=model50.dtype)
    sub = {"params": variables["params"]["base_model"],
           "batch_stats": variables["batch_stats"]["base_model"]}
    flat = jnp.asarray(clips_u8).reshape(-1, *clips_u8.shape[2:])
    scales = calibrate_resnet_quant(inner, sub, flat, max_pct=max_pct)
    return {"base_model": scales}


def calibrate_two_stream_quant(model, variables, clips,
                               max_pct: Optional[float] = None,
                               ) -> Dict[str, Any]:
    """Calibration for a fusion.TwoStream boundary scorer: clips
    [B, T, ...] (uint8 s2d pack for stem_input='s2d' vision models,
    otherwise frames — uint8 frames are normalized here) -> the "quant"
    collection nested for the TwoStream variable tree
    ({"vision_model": {...}}). Pair with
    model.clone(vision_model=model.vision_model.clone(quantize=True))
    and apply({**variables, "quant": scales}, ...) — or pass the scales
    to pipeline.boundary.make_{packed_,}two_stream_score_fn."""
    import jax.numpy as jnp

    vision = model.vision_model
    sub = {"params": variables["params"]["vision_model"],
           "batch_stats": variables["batch_stats"]["vision_model"]}
    clips = jnp.asarray(clips)
    flat = clips.reshape(-1, *clips.shape[2:])
    if vision.stem_input != "s2d" and flat.dtype == jnp.uint8:
        from .preprocess import normalize_frames

        flat = normalize_frames(flat)
    scales = calibrate_resnet_quant(vision, sub, flat, max_pct=max_pct)
    return {"vision_model": scales}


def quantize_seq2seq(variables) -> Dict[str, Any]:
    """Weight-only int8 transform of a float Seq2Seq variable tree.

    Maps every 2-d Dense `kernel` to (`kernel_q` int8, `scale` f32
    per-output-channel) and the tied `shared` embedding table to
    (`embedding_q` int8, `scale` f32 per-vocab-row) — the param layout of
    models/quant_layers.Int8Dense / Int8Embed. Everything else
    (LayerNorms, biases, position tables, final_logits_bias) passes
    through unchanged. Pair with a model built from
    `dataclasses.replace(cfg, weight_quant=True)`.

    Decode is weight-streaming-bound on TPU; int8 weights halve HBM
    traffic vs bf16 (4x vs the f32 checkpoint layout) with the
    int8->bf16 convert fused into the matmul (PERF.md round 3).

    Only the Seq2Seq core is transformed (enc_layer*/dec_layer*/lm_head
    kernels + the `shared` table, at any nesting depth) — sibling modules
    in composed trees (Seq2SeqVisionEmb's VisionFusionHead, task heads)
    keep float nn.Dense params, matching which modules actually switch to
    Int8Dense under `weight_quant=True`.
    """
    from ..models.quant_layers import quantize_weight

    def in_core(path):
        return any(
            p.startswith(("enc_layer", "dec_layer")) or p == "lm_head"
            for p in path
        )

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (k == "kernel" and hasattr(v, "ndim") and v.ndim == 2
                    and in_core(path)):
                q, s = quantize_weight(v, axis=0)
                out["kernel_q"] = q
                out["scale"] = s
            elif (k == "embedding" and path and path[-1] == "shared"
                  and hasattr(v, "ndim") and v.ndim == 2):
                q, s = quantize_weight(v, axis=1)
                out["embedding_q"] = q
                out["scale"] = s
            else:
                out[k] = walk(v, path + (k,))
        return out

    out = dict(variables)
    out["params"] = walk(variables["params"], ())
    return out


def cast_serving_params(variables, dtype=jnp.bfloat16):
    """Cast float params to a serving storage dtype (default bf16).

    flax stores params in f32 by default (`param_dtype`) and converts at
    apply time — so a bf16-compute model still STREAMS f32 weights from
    HBM every decode step. For weight-streaming-bound serving this is a
    free ~2x: cast the float leaves once at load. Integer leaves (int8
    kernels, ids) pass through.
    """
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return x

    return jax.tree_util.tree_map(cast, variables)
