"""Per-video end-to-end chaptering: frames + subtitles -> boundaries ->
cut points -> chapter spans -> titles.

TPU re-design of test_whole_pipeline_per_video.py:27-288: the two stages
(clip classification, title generation) run as batched jitted calls over
static shapes instead of per-clip / per-token python loops, and frames flow
host->device as uint8 with fused on-device normalization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..core.metrics import StepTimer
from ..data.clip_grid import chapter_spans, flatten_video_to_clips
from ..data.corpus import VideoCorpus
from ..data.datasets import InferClipDataset, _chapter_text
from ..data.text_encode import encode_encoder_text
from ..evalkit.boundary import convert_clip_label2cut_point
from .boundary import score_clips


@dataclass
class VideoChapters:
    vid: str
    cut_points: List[int]
    spans: List
    titles: List[str]
    clip_scores: List[float] = field(default_factory=list)


class ChapterPipeline:
    """score_fn: batch dict -> positive prob [B]
    title_fn: (text_ids [B,L], attention_mask [B,L]) -> generated id rows
    decode_fn: id row -> text (tokenizer decode)."""

    def __init__(self, corpus: VideoCorpus, tokenizer, score_fn: Callable,
                 title_fn: Callable, decode_fn: Callable,
                 clip_frame_num: int = 16, max_text_len: int = 100,
                 title_input_len: int = 512, batch_size: int = 16,
                 score_mode: str = "text", fps: int = 1,
                 hw: int = 224, title_tokenizer=None,
                 vision_emb_provider: Optional[Callable] = None,
                 max_vision_emb: int = 10, vision_emb_dim: int = 2048,
                 frame_pack: bool = False):
        self.corpus = corpus
        self.tokenizer = tokenizer  # boundary (BERT) tokenizer
        self.title_tokenizer = title_tokenizer or tokenizer
        self.score_fn = score_fn
        self.title_fn = title_fn
        self.decode_fn = decode_fn
        # vision-conditioned titles: provider(vid, start, end) -> embs; when
        # set, title_fn also receives (vision_embs, vision_attention_mask)
        self.vision_emb_provider = vision_emb_provider
        self.max_vision_emb = max_vision_emb
        self.vision_emb_dim = vision_emb_dim
        self.clip_frame_num = clip_frame_num
        self.max_text_len = max_text_len
        self.title_input_len = title_input_len
        self.batch_size = batch_size
        self.score_mode = score_mode
        self.fps = fps
        self.hw = hw
        # frame_pack=True: each video's UNIQUE frames move host->device
        # ONCE as an s2d uint8 pack and clip batches gather by index on
        # device (score_fn takes (batch, pack) —
        # boundary.make_packed_two_stream_score_fn). Clips at stride 4
        # overlap 4x, so per-clip stacks would transfer 4x the bytes.
        self.frame_pack = frame_pack
        self.timer = StepTimer()

    # -- stage 1: boundaries ------------------------------------------------
    def predict_cut_points(self, vid: str):
        clips = flatten_video_to_clips(
            vid, self.corpus.img_dir, self.corpus.image_num(vid),
            self.corpus.raw_cut_secs(vid), self.corpus.subtitles(vid),
            self.clip_frame_num, fps=self.fps,
        )
        ds = InferClipDataset(clips, self.tokenizer, self.max_text_len,
                              mode=self.score_mode, hw=self.hw)
        clips = score_clips(ds, self.score_fn, self.batch_size, self.timer)
        pred_labels = [c.pred_label for c in clips]
        cut_points = convert_clip_label2cut_point(
            pred_labels, self.clip_frame_num, 2 * self.fps
        )
        return cut_points, clips

    # -- stage 2: titles ----------------------------------------------------
    def generate_titles(self, vid: str, cut_points: Sequence[int]) -> List[str]:
        duration = round(self.corpus.records[vid].duration - 1)
        spans = chapter_spans(list(cut_points), duration)
        if not spans:
            return []
        subs = self.corpus.subtitles(vid)
        ids_rows, mask_rows, vis_rows, vmask_rows = [], [], [], []
        for start_t, end_t in spans:
            text = _chapter_text(subs, start_t, end_t, self.fps)
            ids, mask = encode_encoder_text(text, self.title_tokenizer,
                                            self.title_input_len)
            ids_rows.append(ids)
            mask_rows.append(mask)
            if self.vision_emb_provider is not None:
                embs = self.vision_emb_provider(vid, int(start_t), int(end_t))
                vis = np.zeros((self.max_vision_emb, self.vision_emb_dim),
                               np.float32)
                vmask = np.zeros((self.max_vision_emb,), np.int32)
                for k, e in enumerate(embs[: self.max_vision_emb]):
                    e = np.asarray(e)
                    vis[k] = e.mean(axis=0) if e.ndim == 2 else e
                    vmask[k] = 1
                vis_rows.append(vis)
                vmask_rows.append(vmask)
        self.timer.start("title_generate")
        if self.vision_emb_provider is not None:
            gen_rows = self.title_fn(np.stack(ids_rows), np.stack(mask_rows),
                                     np.stack(vis_rows), np.stack(vmask_rows))
        else:
            gen_rows = self.title_fn(np.stack(ids_rows), np.stack(mask_rows))
        self.timer.stop("title_generate", len(spans))
        return [self.decode_fn(row) for row in gen_rows]

    # -- end to end -----------------------------------------------------------
    def run_video(self, vid: str) -> VideoChapters:
        if self.frame_pack:
            self.timer.start("video_total")
            out = self._finish_video(*self._prepare(vid))
            self.timer.stop("video_total", 1)
            return out
        self.timer.start("video_total")
        cut_points, clips = self.predict_cut_points(vid)
        titles = self.generate_titles(vid, cut_points)
        self.timer.stop("video_total", 1)
        duration = round(self.corpus.records[vid].duration - 1)
        return VideoChapters(
            vid=vid,
            cut_points=list(cut_points),
            spans=chapter_spans(list(cut_points), duration),
            titles=titles,
            clip_scores=[c.pred_score for c in clips],
        )

    def run(self, vids: Optional[Sequence[str]] = None,
            pipelined: bool = False,
            lookahead: int = 2) -> Dict[str, VideoChapters]:
        vids = list(vids or self.corpus.vids)
        if pipelined:
            return self.run_pipelined(vids, lookahead)
        out = {}
        for vid in vids:
            out[vid] = self.run_video(vid)
        return out

    # -- pipelined mode -----------------------------------------------------
    def _prepare(self, vid: str):
        """Host-side stage: clip flattening, JPEG decode, tokenization —
        ALL score batches of one video prebuilt, so a producer thread can
        overlap the next video's host work with this video's device
        compute (two-in-flight, the north-star host->TPU overlap).

        Returns (vid, clip_infos, batches, frame_pack). With
        frame_pack=True, the video's UNIQUE frames are decoded once into
        an s2d uint8 pack (native threaded decoder) and batches carry
        [B, T] frame indices; otherwise frame_pack is None and batches
        carry stacked per-clip frames."""
        from ..data.loader import collate

        clips = flatten_video_to_clips(
            vid, self.corpus.img_dir, self.corpus.image_num(vid),
            self.corpus.raw_cut_secs(vid), self.corpus.subtitles(vid),
            self.clip_frame_num, fps=self.fps,
        )
        if self.frame_pack:
            return (vid, *self._prepare_packed(clips))
        ds = InferClipDataset(clips, self.tokenizer, self.max_text_len,
                              mode=self.score_mode, hw=self.hw)
        n = len(ds)
        batches = []
        for start in range(0, n, self.batch_size):
            rows = list(range(start, min(start + self.batch_size, n)))
            items = [ds.__getitem__(i) for i in rows]
            pad = self.batch_size - len(rows)
            if pad:  # static shapes: repeat the last row, drop its scores
                items += [items[-1]] * pad
            batches.append((rows, collate(items)))
        return vid, ds.all_clip_infos, batches, None

    def _prepare_packed(self, clips):
        """Packed host stage: one threaded s2d decode of the video's unique
        frames + per-clip text encode + [B, T] gather indices."""
        from ..data.frames import load_clip_frames
        from ..data.loader import collate
        from ..data.text_encode import encode_clip_text

        paths: List[str] = []
        pos: Dict[str, int] = {}
        for c in clips:
            for p in c.image_paths:
                if p not in pos:
                    pos[p] = len(paths)
                    paths.append(p)
        pack = load_clip_frames(paths, self.hw, cache=None, s2d=True)

        items = []
        for c in clips:
            ids, mask = encode_clip_text(c.text_clip, self.tokenizer,
                                         self.max_text_len)
            items.append({
                "text_ids": ids,
                "attention_mask": mask,
                "frame_idx": np.asarray([pos[p] for p in c.image_paths],
                                        np.int32),
            })
        n = len(items)
        batches = []
        for start in range(0, n, self.batch_size):
            rows = list(range(start, min(start + self.batch_size, n)))
            chunk = [items[i] for i in rows]
            pad = self.batch_size - len(rows)
            if pad:
                chunk += [chunk[-1]] * pad
            batches.append((rows, collate(chunk)))
        return list(clips), batches, pack

    def _finish_video(self, vid: str, infos, batches,
                      frame_pack=None) -> VideoChapters:
        """Device stages: boundary scoring over prebuilt batches, cut
        points, title generation. With a frame pack, the pack moves
        host->device ONCE and score_fn gathers clips on device."""
        self.timer.start("device_score")
        if frame_pack is not None:
            import jax

            pack = jax.device_put(frame_pack)
            score = lambda batch: self.score_fn(batch, pack)
        else:
            score = self.score_fn
        for rows, batch in batches:
            scores = np.asarray(score(batch))
            for j, i in enumerate(rows):
                infos[i].pred_score = float(scores[j])
                infos[i].pred_label = int(scores[j] >= 0.5)
        self.timer.stop("device_score", len(infos))
        cut_points = convert_clip_label2cut_point(
            [c.pred_label for c in infos], self.clip_frame_num,
            2 * self.fps,
        )
        titles = self.generate_titles(vid, cut_points)
        duration = round(self.corpus.records[vid].duration - 1)
        return VideoChapters(
            vid=vid, cut_points=list(cut_points),
            spans=chapter_spans(list(cut_points), duration), titles=titles,
            clip_scores=[c.pred_score for c in infos],
        )

    def run_pipelined(self, vids: Sequence[str],
                      lookahead: int = 2) -> Dict[str, VideoChapters]:
        """Two-in-flight videos: a producer thread prepares video N+1's
        batches (decode + tokenize) while the device scores/decodes video
        N (builder of the reference's test_whole_pipeline_per_video.py
        flow, host/device overlapped)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=lookahead)
        stop = object()

        def producer():
            try:
                for vid in vids:
                    q.put(self._prepare(vid))
            finally:
                q.put(stop)

        threading.Thread(target=producer, daemon=True).start()
        out: Dict[str, VideoChapters] = {}
        while True:
            item = q.get()
            if item is stop:
                break
            vid, infos, batches, pack = item
            self.timer.start("video_total")
            out[vid] = self._finish_video(vid, infos, batches, pack)
            self.timer.stop("video_total", 1)
        return out

    def videos_per_minute(self) -> float:
        return self.timer.rate("video_total") * 60.0


def bucket_title_fn(title_fn: Callable, multiple: int = 8) -> Callable:
    """Run a title_fn over fixed-size chunks of exactly `multiple` rows
    (last chunk padded by repeating its final row; pad rows dropped after
    decode). Predicted cut points make the chapter count data-dependent;
    chunking means ONE batch shape ever compiles, no matter how many
    chapters a video produces — a single warmup video covers all later
    videos."""

    def fn(*arrays):
        arrays = [np.asarray(a) for a in arrays]
        n = arrays[0].shape[0]
        outs = []
        for start in range(0, n, multiple):
            chunk = [a[start:start + multiple] for a in arrays]
            k = chunk[0].shape[0]
            if k < multiple:
                chunk = [
                    np.concatenate([c, np.repeat(c[-1:], multiple - k,
                                                 axis=0)])
                    for c in chunk
                ]
            outs.append(np.asarray(title_fn(*chunk))[:k])
        return np.concatenate(outs, axis=0)

    return fn
