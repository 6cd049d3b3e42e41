"""Deterministic, torch-free data pipeline."""

from .clip_grid import (
    ClipInfo,
    build_clip_grid,
    chapter_spans,
    clip_iou_with_cut_point,
    flatten_video_to_clips,
    frame_indices_for_clip,
    label_clips,
    subtitle_text_for_window,
    valid_cut_points,
    window_clip_indices,
)
from .text_encode import (
    encode_clip_text,
    encode_encoder_text,
    encode_title_decoder,
)
from .tokenization import UnigramTokenizer, WordPieceTokenizer

__all__ = [
    "ClipInfo",
    "build_clip_grid",
    "chapter_spans",
    "clip_iou_with_cut_point",
    "flatten_video_to_clips",
    "frame_indices_for_clip",
    "label_clips",
    "subtitle_text_for_window",
    "valid_cut_points",
    "window_clip_indices",
    "encode_clip_text",
    "encode_encoder_text",
    "encode_title_decoder",
    "UnigramTokenizer",
    "WordPieceTokenizer",
]
