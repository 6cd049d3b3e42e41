"""Multi-chip inference: mesh-sharded clip scoring + title decode, and
video-level multi-process fan-out.

The reference's only inference-side parallelism was `torch.nn.DataParallel`
on the title path (train_chapter_title_gen.py:289); its whole-pipeline
driver (test_whole_pipeline_per_video.py) is single-GPU. Here both hot
stages run as ONE jitted call whose batch dim is sharded over the mesh
'data' axis — XLA splits the work across chips and inserts the ICI
collectives — and whole videos fan out across processes with the host
collectives of parallel/dist.py. This is the serving shape of the
50-videos/min-on-v5e-8 north star: per-chip batches stay MXU-sized while
one host drives all local chips through a single device_put per batch.

Batch-size contract: `score_clips` always pads the last batch to
`batch_size`, so sharded scoring only requires batch_size % n_data == 0;
the title wrapper pads the chapter rows itself.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated


def _put_batch(mesh, batch: Dict[str, np.ndarray]):
    """Host batch dict -> device arrays sharded over 'data' on dim 0."""
    import jax

    s = batch_sharding(mesh)
    ndata = mesh.shape[DATA_AXIS]
    out = {}
    for k, v in batch.items():
        assert v.shape[0] % ndata == 0, (
            f"batch dim {v.shape[0]} of '{k}' not divisible by data axis "
            f"{ndata}; pick batch_size divisible by the data-axis size"
        )
        out[k] = jax.device_put(v, s)
    return out


def _put_replicated(mesh, tree):
    import jax

    return jax.device_put(tree, replicated(mesh))


def make_sharded_text_score_fn(model, variables, mesh):
    """Data-sharded version of boundary.make_text_score_fn."""
    import jax

    v = _put_replicated(mesh, variables)

    @jax.jit
    def fn(vv, text_ids, attention_mask):
        _, prob = model.apply(vv, text_ids, attention_mask)
        return prob[:, 1]

    def score(batch):
        b = _put_batch(mesh, {k: batch[k]
                              for k in ("text_ids", "attention_mask")})
        return fn(v, b["text_ids"], b["attention_mask"])

    return score


def make_sharded_two_stream_score_fn(model, variables, mesh,
                                     normalize: bool = True,
                                     quant_scales=None):
    """Data-sharded version of boundary.make_two_stream_score_fn: frames
    enter uint8, the per-chip shard normalizes on device. quant_scales
    (ops.quantize.calibrate_two_stream_quant) enables the int8 vision
    trunk, same as the single-device fn."""
    import jax

    from ..ops.preprocess import normalize_frames

    if quant_scales is not None:
        model = model.clone(
            vision_model=model.vision_model.clone(quantize=True))
        variables = {**variables, "quant": quant_scales}
    v = _put_replicated(mesh, variables)

    @jax.jit
    def fn(vv, img, text_ids, attention_mask):
        img = normalize_frames(img) if normalize else img
        _, prob = model.apply(vv, img, text_ids, attention_mask)
        return prob[:, 1]

    def score(batch):
        b = _put_batch(mesh, {k: batch[k] for k in
                              ("img_clip", "text_ids", "attention_mask")})
        return fn(v, b["img_clip"], b["text_ids"], b["attention_mask"])

    return score


def make_sharded_window_score_fn(model, variables, mesh,
                                 normalize: bool = True):
    """Data-sharded version of boundary.make_window_score_fn."""
    import jax

    from ..ops.preprocess import normalize_frames

    v = _put_replicated(mesh, variables)

    @jax.jit
    def fn(vv, img, text_ids, attention_mask):
        img = normalize_frames(img) if normalize else img
        _, prob = model.apply(vv, img, text_ids, attention_mask)
        return prob[:, 1]

    def score(batch):
        b = _put_batch(mesh, {k: batch[k] for k in
                              ("img_clips", "text_ids", "attention_mask")})
        return fn(v, b["img_clips"], b["text_ids"], b["attention_mask"])

    return score


def shard_title_fn(title_fn: Callable, mesh) -> Callable:
    """Wrap a ChapterPipeline title_fn so its chapter batch shards over
    'data': rows are padded (repeating the last row) to a multiple of the
    data-axis size, device_put sharded, and the pad rows dropped after
    decode. Works for both the text-only (ids, mask) and vision-conditioned
    (ids, mask, vision_embs, vision_mask) signatures."""
    import jax

    ndata = mesh.shape[DATA_AXIS]
    s = batch_sharding(mesh)

    def padded(*arrays):
        n = arrays[0].shape[0]
        pad = (-n) % ndata
        out = []
        for a in arrays:
            a = np.asarray(a)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            out.append(jax.device_put(a, s))
        return n, out

    def fn(*arrays):
        n, arrs = padded(*arrays)
        gen = title_fn(*arrs)
        return np.asarray(gen)[:n]

    return fn


def run_videos_distributed(pipe, vids: Optional[Sequence[str]] = None,
                           pipelined: bool = True, lookahead: int = 2):
    """Video-level fan-out across processes: each process chapterizes
    vids[rank::world] with its local pipeline (whose score/title fns may
    themselves be mesh-sharded over local chips), then every process
    receives the merged {vid: VideoChapters} via all_gather_object — the
    multi-process analogue of the reference's per-rank eval +
    all_gather_object metric merge (train_video_segment_ddp.py:273-281)."""
    from ..parallel import dist

    vids = list(vids if vids is not None else pipe.corpus.vids)
    rank, world = dist.process_index(), dist.process_count()
    local = vids[rank::world]
    local_out = pipe.run(local, pipelined=pipelined, lookahead=lookahead)
    merged: Dict = {}
    for part in dist.all_gather_object(local_out):
        merged.update(part)
    return {vid: merged[vid] for vid in vids if vid in merged}
