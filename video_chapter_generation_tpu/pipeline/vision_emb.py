"""Vision-embedding extraction stage (convert2vision_emb.py:52-215).

Runs the TSM vision backbone over every clip of every video and yields
[T, 2048] embeddings per clip — in memory, or written in the reference's
npy layout (<out_dir>/<vid>/vision_emb_<start>_<end>.npy) so downstream
title+vision training is drop-in compatible.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..core.metrics import StepTimer
from ..data.clip_grid import ClipInfo
from ..data.frames import load_clip_frames


def make_vision_embed_fn(vision_model, variables):
    """uint8 frames -> [B,T,2048] embeddings, jitted, bf16-friendly.

    When the model was built with `stem_input="s2d"` the input is the raw
    uint8 4x4 space-to-depth view [B,T,H/4,W/4,48] that the native loader
    emits (data/native_loader.py decode_batch_s2d) and the fused stem
    kernel normalizes in VMEM; otherwise [B,T,H,W,3] uint8, normalized on
    device before the backbone."""
    import jax

    from ..ops.preprocess import normalize_frames

    s2d = getattr(vision_model, "stem_input", "frames") == "s2d"

    @jax.jit
    def fn(v, img_u8):
        x = (img_u8 if s2d
             else normalize_frames(img_u8, out_dtype=vision_model.dtype))
        return vision_model.apply(v, x, train=False)

    return lambda img_u8: fn(variables, img_u8)


def extract_vision_embs(
    clips: Sequence[ClipInfo],
    embed_fn: Callable,
    batch_size: int = 16,
    hw: int = 224,
    out_dir: Optional[str] = None,
    timer: Optional[StepTimer] = None,
    s2d: bool = False,
) -> Iterator[Tuple[ClipInfo, np.ndarray]]:
    """Yields (clip, emb [T,2048]); also writes npy files when out_dir set.
    s2d=True loads frames in the space-to-depth order consumed by a
    stem_input='s2d' model (pair with make_vision_embed_fn on one)."""
    timer = timer or StepTimer()
    n = len(clips)
    for start in range(0, n, batch_size):
        rows = clips[start : min(start + batch_size, n)]
        pad = batch_size - len(rows)
        timer.start("host_load")
        loaded = [load_clip_frames(c.image_paths, hw, s2d=s2d)
                  for c in rows]
        imgs = np.stack(loaded + [np.zeros_like(loaded[-1])] * pad)
        timer.stop("host_load", len(rows))
        timer.start("embed")
        embs = np.asarray(embed_fn(imgs))
        timer.stop("embed", len(rows) * imgs.shape[1])
        for c, e in zip(rows, embs):
            if out_dir is not None:
                d = os.path.join(out_dir, c.vid)
                os.makedirs(d, exist_ok=True)
                s, t = c.clip_start_end
                np.save(os.path.join(d, f"vision_emb_{s}_{t}.npy"), e)
            yield c, e
