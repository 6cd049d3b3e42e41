"""Converters: reference torch checkpoints -> this framework's parameters.

Maps the reference's state-dict layouts (per-window-position ModuleLists,
Sequential indices) onto our stacked-parameter flax modules, so trained
reference checkpoints (train_video_segment_ddp.py's
{model_state_dict, ...}) load directly. Differential-tested against the
reference's own torch modules in tests/test_convert_reference.py.

Covered:
- TwoStreamWindow (two_stream_window.py): lang/vision projection stacks,
  mlp fusion head, StackedVideoChapterAttention
- base TwoStream ChapterHead (two_stream.py:51-95)
- full model trees via the BERT / torchvision-ResNet converters
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .bert import convert_hf_bert
from .resnet import convert_torchvision_resnet50


def _np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _strip(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _stack_linear(sd, fmt: str, n: int):
    """fmt like 'lang_proj_heads.{i}.0' -> kernel [n, in, out], bias [n, out]."""
    ws = [_np(sd[fmt.format(i=i) + ".weight"]).T for i in range(n)]
    bs = [_np(sd[fmt.format(i=i) + ".bias"]) for i in range(n)]
    return {"kernel": np.stack(ws), "bias": np.stack(bs)}


def _stack_ln(sd, fmt: str, n: int):
    return {
        "scale": np.stack([_np(sd[fmt.format(i=i) + ".weight"])
                           for i in range(n)]),
        "bias": np.stack([_np(sd[fmt.format(i=i) + ".bias"])
                          for i in range(n)]),
    }


def _linear(sd, key: str):
    out = {"kernel": _np(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _ln(sd, key: str):
    return {"scale": _np(sd[key + ".weight"]), "bias": _np(sd[key + ".bias"])}


def convert_window_chapter_head(sd: Dict[str, Any], num_clips: int,
                                head_type: str = "mlp") -> Dict[str, Any]:
    """fusion_head.* of two_stream_window.py -> WindowChapterHead params.

    Sequential index map (torch -> ours):
      2-layer proj MLP:  0 Linear->dense0, 1 LN->ln0, 4 Linear->dense1
      3-layer proj MLP:  0->dense0, 1->ln0, 4->dense1, 5->ln1, 8->dense2
    """
    p: Dict[str, Any] = {}
    p["lang_proj_heads"] = {
        "dense0": _stack_linear(sd, "lang_proj_heads.{i}.0", num_clips),
        "ln0": _stack_ln(sd, "lang_proj_heads.{i}.1", num_clips),
        "dense1": _stack_linear(sd, "lang_proj_heads.{i}.4", num_clips),
    }
    p["vision_proj_heads"] = {
        "dense0": _stack_linear(sd, "vision_proj_heads.{i}.0", num_clips),
        "ln0": _stack_ln(sd, "vision_proj_heads.{i}.1", num_clips),
        "dense1": _stack_linear(sd, "vision_proj_heads.{i}.4", num_clips),
        "ln1": _stack_ln(sd, "vision_proj_heads.{i}.5", num_clips),
        "dense2": _stack_linear(sd, "vision_proj_heads.{i}.8", num_clips),
    }
    if head_type == "mlp":
        p["head"] = {
            "dense0": _stack_linear(sd, "head.{i}.0", num_clips),
            "ln0": _stack_ln(sd, "head.{i}.1", num_clips),
            "dense1": _stack_linear(sd, "head.{i}.4", num_clips),
            "ln1": _stack_ln(sd, "head.{i}.5", num_clips),
            "dense2": _stack_linear(sd, "head.{i}.8", num_clips),
        }
    elif head_type == "cross_attn":
        p["head"] = {
            "lang_norm": _ln(sd, "head.lang_norm"),
            "vision_norm": _ln(sd, "head.vision_norm"),
            "frame_pos_encoding": _linear(sd, "head.frame_pos_encoding"),
            "query_proj": _linear(sd, "head.query_proj"),
            "key_proj": _linear(sd, "head.key_proj"),
            "value_proj": _linear(sd, "head.value_proj"),
            "out_proj": _linear(sd, "head.out_proj"),
        }
    else:
        raise NotImplementedError(head_type)
    return p


def convert_stacked_window_attention(sd: Dict[str, Any],
                                     num_layers: int = 6) -> Dict[str, Any]:
    """window_attn.* (stacked_window_self_attention.py) ->
    StackedWindowAttention params."""
    p: Dict[str, Any] = {}
    for i in range(num_layers):
        hf = f"layers.{i}"
        blk = {
            "attention_norm": _ln(sd, f"{hf}.attention_norm"),
            "ffn_norm": _ln(sd, f"{hf}.ffn_norm"),
            "position_encoding": _linear(sd, f"{hf}.attention.position_encoding"),
            "query": _linear(sd, f"{hf}.attention.query"),
            "key": _linear(sd, f"{hf}.attention.key"),
            "value": _linear(sd, f"{hf}.attention.value"),
            "out_proj": _linear(sd, f"{hf}.attention.out_proj"),
            "window_pos_bias": _np(sd[f"{hf}.attention.window_pos_bias"]),
        }
        # ffn Sequential: Linears at 0,3,6,9 -> ffn0..3
        for j, idx in enumerate((0, 3, 6, 9)):
            blk[f"ffn{j}"] = _linear(sd, f"{hf}.ffn.{idx}")
        p[f"block{i}"] = blk
    p["final_layer_norm"] = _ln(sd, "final_layer_norm")
    # classifier Sequential: Linear/LN pairs at (0,1),(4,5),(8,9),(12,13),
    # final Linear at 16 -> cls{j}/cls_ln{j} + classifier
    for j, idx in enumerate((0, 4, 8, 12)):
        p[f"cls{j}"] = _linear(sd, f"classifier.{idx}")
        p[f"cls_ln{j}"] = _ln(sd, f"classifier.{idx + 1}")
    p["classifier"] = _linear(sd, "classifier.16")
    return p


def convert_base_chapter_head(sd: Dict[str, Any],
                              head_type: str = "mlp") -> Dict[str, Any]:
    """two_stream.py:51-95 ChapterHead -> our ChapterHead params."""
    p = {
        "lang_proj_head": {"kernel": _np(sd["lang_proj_head.weight"]).T},
        "vision_proj_head": {"kernel": _np(sd["vision_proj_head.weight"]).T},
    }
    if head_type == "mlp":
        p["head"] = _linear(sd, "head")
    else:  # attn (SelfAttention)
        p["head"] = {
            "query": _linear(sd, "head.query"),
            "key": _linear(sd, "head.key"),
            "value": _linear(sd, "head.value"),
            "proj": _linear(sd, "head.proj"),
        }
    return p


def convert_two_stream_window(state_dict: Dict[str, Any], window_size: int,
                              head_type: str = "mlp") -> Dict[str, Any]:
    """Full reference TwoStreamWindow checkpoint -> TwoStreamWindow params."""
    num_clips = 2 * window_size + 1
    bert = convert_hf_bert(_strip(state_dict, "lang_model.base_model."))
    resnet = convert_torchvision_resnet50(
        _strip(state_dict, "vision_model.base_model.")
    )
    return {
        "params": {
            "lang_model": bert["params"],
            "vision_model": resnet["params"],
            "fusion_head": convert_window_chapter_head(
                _strip(state_dict, "fusion_head."), num_clips, head_type
            ),
            "window_attn": convert_stacked_window_attention(
                _strip(state_dict, "window_attn.")
            ),
        },
        "batch_stats": {"vision_model": resnet["batch_stats"]},
    }
