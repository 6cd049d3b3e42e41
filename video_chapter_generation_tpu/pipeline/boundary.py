"""Batched boundary scoring over flattened clips.

The TPU replacement for the reference's eval loops
(test_video_segment_point.py:168-226): static-shape batches (last batch
padded, never a recompile), double-buffered host->device feeding, scores
written back into the ClipInfo records exactly like the reference mutates
`all_clip_infos` with pred_score/pred_label (:220-222).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..core.metrics import StepTimer
from ..data.clip_grid import ClipInfo
from ..data.loader import collate


def score_clips(
    dataset,
    score_fn: Callable[[Dict[str, np.ndarray]], np.ndarray],
    batch_size: int = 16,
    timer: Optional[StepTimer] = None,
    prefetch: int = 2,
) -> List[ClipInfo]:
    """Run `score_fn` (batch dict -> positive-class prob [B]) over every
    clip of an InferClipDataset/InferWindowClipDataset; returns the clip
    list with pred_score/pred_label filled in.

    Host batch assembly (JPEG decode, tokenized text) runs on a background
    thread `prefetch` batches ahead, overlapping with device execution —
    the double-buffered host->TPU feed of the north-star design."""
    import queue
    import threading

    timer = timer or StepTimer()
    n = len(dataset)
    infos = dataset.all_clip_infos

    starts = list(range(0, n, batch_size))

    def make_batch(start):
        rows = list(range(start, min(start + batch_size, n)))
        pad = batch_size - len(rows)
        items = [dataset.__getitem__(i) for i in rows]
        if pad:  # static shapes: repeat the last row, drop its scores
            items += [items[-1]] * pad
        return rows, collate(items)

    if prefetch > 0 and len(starts) > 1:
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()

        def producer():
            try:
                for s in starts:
                    q.put(make_batch(s))
            finally:
                q.put(stop)

        threading.Thread(target=producer, daemon=True).start()

        def batches():
            while True:
                item = q.get()
                if item is stop:
                    return
                yield item
    else:
        def batches():
            for s in starts:
                timer.start("host_load")
                out = make_batch(s)
                timer.stop("host_load", len(out[0]))
                yield out

    for rows, batch in batches():
        timer.start("device_score")
        scores = np.asarray(score_fn(batch))
        timer.stop("device_score", len(rows))
        for j, i in enumerate(rows):
            infos[i].pred_score = float(scores[j])
            infos[i].pred_label = int(scores[j] >= 0.5)
    return infos


def make_text_score_fn(model, variables):
    """Positive-class probability from a text-only BertForChapter.

    Weights are jit ARGUMENTS, not closure constants — embedded constants
    bloat the compile payload (and break tunneled remote compile)."""
    import jax

    @jax.jit
    def fn(v, text_ids, attention_mask):
        _, prob = model.apply(v, text_ids, attention_mask)
        return prob[:, 1]

    return lambda batch: fn(variables, batch["text_ids"],
                            batch["attention_mask"])


def make_two_stream_score_fn(model, variables, normalize=True):
    """Positive-class probability from TwoStream (base) on uint8 frames."""
    import jax
    import jax.numpy as jnp

    from ..ops.preprocess import normalize_frames

    @jax.jit
    def fn(v, img_u8, text_ids, attention_mask):
        img = normalize_frames(img_u8) if normalize else img_u8
        _, prob = model.apply(v, img, text_ids, attention_mask)
        return prob[:, 1]

    return lambda batch: fn(
        variables, batch["img_clip"], batch["text_ids"],
        batch["attention_mask"]
    )


def make_window_score_fn(model, variables, normalize=True):
    """Positive-class probability from TwoStreamWindow on uint8 frames."""
    import jax

    from ..ops.preprocess import normalize_frames

    @jax.jit
    def fn(v, img_u8, text_ids, attention_mask):
        img = normalize_frames(img_u8) if normalize else img_u8
        _, prob = model.apply(v, img, text_ids, attention_mask)
        return prob[:, 1]

    return lambda batch: fn(
        variables, batch["img_clips"], batch["text_ids"],
        batch["attention_mask"]
    )
