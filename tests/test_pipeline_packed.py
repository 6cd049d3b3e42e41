"""Packed per-video frame flow (ChapterPipeline(frame_pack=True)), the
title-bucket wrapper, and the on-disk synthetic corpus behind
bench_pipeline.py — the real-e2e benchmark path.

Equivalence standard: the packed flow (unique frames decoded once into an
s2d pack + on-device gather by [B, T] index) must produce bit-identical
clip scores / cut points / titles to the straightforward per-clip stacked
flow, because the gather happens BEFORE the vision model so both arms run
the same [B*T, ...] compute (reference flow:
test_whole_pipeline_per_video.py:27-288 stacks per clip).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_unigram, make_wordpiece

from video_chapter_generation_tpu.data.corpus import VideoCorpus
from video_chapter_generation_tpu.data.native_loader import space_to_depth4
from video_chapter_generation_tpu.data.synth import (
    make_synth_corpus_on_disk,
    synth_frame,
)
from video_chapter_generation_tpu.models.bert import BertConfig, BertModel
from video_chapter_generation_tpu.models.fusion import TwoStream
from video_chapter_generation_tpu.models.resnet import ResNet
from video_chapter_generation_tpu.pipeline import (
    ChapterPipeline,
    bucket_title_fn,
    make_packed_two_stream_score_fn,
)

SEG, HW, TEXT_LEN = 4, 32, 16


@pytest.fixture(scope="module")
def disk_corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_corpus"))
    paths = make_synth_corpus_on_disk(root, n_videos=2, video_sec=48,
                                      n_chapters=3, hw=HW)
    corpus = VideoCorpus.from_files(paths["img_dir"], paths["data_file"],
                                    paths["vid_file"],
                                    paths["subtitle_dir"])
    return root, paths, corpus


@pytest.fixture(scope="module")
def tiny_two_stream():
    model = TwoStream(
        lang_model=BertModel(BertConfig.tiny()),
        vision_model=ResNet(stage_sizes=(1, 1, 1, 1), n_segment=SEG,
                            stem_input="s2d"),
        segment_size=SEG, hidden_size=16, head_type="mlp",
    )
    img0 = jnp.zeros((2, SEG, HW // 4, HW // 4, 48), jnp.uint8)
    ids0 = jnp.ones((2, TEXT_LEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img0, ids0,
                           jnp.ones_like(ids0))
    return model, variables


def test_synth_corpus_layout(disk_corpus):
    root, paths, corpus = disk_corpus
    assert len(corpus.vids) == 2
    for vid in corpus.vids:
        assert corpus.image_num(vid) == 48
        cuts = corpus.raw_cut_secs(vid)
        assert cuts[0] == 0 and len(cuts) == 3
        assert sorted(cuts) == list(cuts)
        subs = corpus.subtitles(vid)
        assert len(subs) == 24 and all(s["text"] for s in subs)
    # deterministic frames: regenerating frame t yields the stored pixels
    # (decode tolerance = JPEG loss only)
    from video_chapter_generation_tpu.data.frames import load_frame
    import os

    vid = corpus.vids[0]
    stored = load_frame(os.path.join(paths["img_dir"], vid, "00003.jpg"), HW)
    fresh = synth_frame(0 * 7919 + 0, 3, HW)
    assert np.abs(stored.astype(int) - fresh.astype(int)).mean() < 12.0


def test_synth_corpus_idempotent(disk_corpus):
    import os
    import time

    root, paths, corpus = disk_corpus
    probe = os.path.join(paths["img_dir"], corpus.vids[0], "00001.jpg")
    mtime = os.path.getmtime(probe)
    t0 = time.time()
    again = make_synth_corpus_on_disk(root, n_videos=2, video_sec=48,
                                      n_chapters=3, hw=HW)
    assert time.time() - t0 < 1.0  # manifest hit: no re-encode
    assert again == paths
    assert os.path.getmtime(probe) == mtime


def _title_fn(ids, mask):
    # deterministic fake decode: first 3 ids of each row
    return np.asarray(ids)[:, :3]


def _pipes(corpus, model, variables, wp, uni, frame_pack):
    packed_score = make_packed_two_stream_score_fn(model, variables)

    if frame_pack:
        score_fn = packed_score
    else:
        def score_fn(batch):
            imgs = batch["img_clip"]  # [B, T, hw, hw, 3] uint8
            b, t = imgs.shape[:2]
            pack = space_to_depth4(imgs.reshape(-1, HW, HW, 3))
            idx = np.arange(b * t, dtype=np.int32).reshape(b, t)
            return packed_score(
                {"text_ids": batch["text_ids"],
                 "attention_mask": batch["attention_mask"],
                 "frame_idx": idx},
                pack,
            )

    return ChapterPipeline(
        corpus, wp, score_fn=score_fn, title_fn=_title_fn,
        decode_fn=lambda row: uni.decode(list(row)),
        clip_frame_num=SEG, max_text_len=TEXT_LEN, title_input_len=24,
        batch_size=4, score_mode="all", hw=HW, title_tokenizer=uni,
        frame_pack=frame_pack,
    )


def test_learnable_synth_corpus(tmp_path_factory):
    """learnable=True must plant real signal at the chapter structure
    (the impl-A/B accuracy harness depends on it): boundary markers in
    the subtitles at cut seconds, extractable titles whose keywords
    pepper their chapter, per-chapter frame-style jumps, split files."""
    from video_chapter_generation_tpu.data.synth import _MARKERS
    from video_chapter_generation_tpu.datasetkit.parsing import (
        extract_first_timestamp,
    )

    import os

    from video_chapter_generation_tpu.data.frames import load_frame

    root = str(tmp_path_factory.mktemp("learnable_corpus"))
    paths = make_synth_corpus_on_disk(
        root, n_videos=3, video_sec=60, n_chapters=3, hw=32,
        learnable=True, splits={"train": 2, "test": 1},
    )
    assert paths["train_vid_file"].endswith("train.txt")
    train_vids = open(paths["train_vid_file"]).read().split()
    test_vids = open(paths["test_vid_file"]).read().split()
    assert len(train_vids) == 2 and len(test_vids) == 1
    assert not set(train_vids) & set(test_vids)

    corpus = VideoCorpus.from_files(paths["img_dir"], paths["data_file"],
                                    paths["train_vid_file"],
                                    paths["subtitle_dir"])
    vid = corpus.vids[0]
    cuts = corpus.raw_cut_secs(vid)
    subs = corpus.subtitles(vid)
    marker = " ".join(_MARKERS)
    # markers exactly at the non-zero cut seconds
    marker_times = [s["start"] for s in subs if marker in s["text"]]
    assert sorted(marker_times) == [float(c) for c in cuts[1:]]

    # titles are corpus words that recur inside their own chapter
    chapters = corpus.chapter_descriptions(vid)
    for (start_t, desc), end_t in zip(
            chapters, [c for c in cuts[1:]] + [60]):
        kws = desc.split()
        assert 1 <= len(kws) <= 3
        span_text = " ".join(s["text"] for s in subs
                             if start_t <= s["start"] < end_t)
        assert any(k in span_text for k in kws), (desc, span_text[:100])

    # frame style jumps at the boundary: cross-boundary frame diff far
    # exceeds within-chapter diff
    cut = cuts[1]
    f = lambda t: load_frame(
        os.path.join(paths["img_dir"], vid, "%05d.jpg" % t), 32
    ).astype(int)
    within = np.abs(f(cut - 3) - f(cut - 2)).mean()
    across = np.abs(f(cut) - f(cut + 1)).mean()
    assert across > 2 * within, (within, across)


def test_packed_flow_matches_stacked(disk_corpus, tiny_two_stream):
    """frame_pack=True == per-clip stacking, bit for bit (scores, cut
    points, titles), sequential AND pipelined."""
    _, _, corpus = disk_corpus
    model, variables = tiny_two_stream
    wp, uni = make_wordpiece(), make_unigram()

    ref = _pipes(corpus, model, variables, wp, uni, frame_pack=False).run()
    packed_pipe = _pipes(corpus, model, variables, wp, uni, frame_pack=True)
    packed = packed_pipe.run()
    piped = packed_pipe.run(pipelined=True)

    for vid in corpus.vids:
        np.testing.assert_allclose(packed[vid].clip_scores,
                                   ref[vid].clip_scores, rtol=0, atol=1e-6)
        assert packed[vid].cut_points == ref[vid].cut_points
        assert packed[vid].titles == ref[vid].titles
        assert packed[vid].spans == ref[vid].spans
        assert piped[vid].clip_scores == packed[vid].clip_scores
        assert piped[vid].titles == packed[vid].titles
    assert packed_pipe.videos_per_minute() > 0


def test_packed_pack_is_deduplicated(disk_corpus, tiny_two_stream):
    """Clips at stride SEG/4 overlap: the pack must hold each unique frame
    once (the 4x H2D byte saving the flow exists for)."""
    _, _, corpus = disk_corpus
    model, variables = tiny_two_stream
    pipe = _pipes(corpus, model, variables, make_wordpiece(),
                  make_unigram(), frame_pack=True)
    vid = corpus.vids[0]
    from video_chapter_generation_tpu.data.clip_grid import (
        flatten_video_to_clips,
    )

    # 8-frame clips on the 4s grid -> 2x frame overlap between clips
    clips = flatten_video_to_clips(
        vid, corpus.img_dir, corpus.image_num(vid),
        corpus.raw_cut_secs(vid), corpus.subtitles(vid), 2 * SEG, fps=1)
    infos, batches, pack = pipe._prepare_packed(clips)
    n_unique = len({p for c in clips for p in c.image_paths})
    n_stacked = sum(len(c.image_paths) for c in clips)
    assert pack.shape == (n_unique, HW // 4, HW // 4, 48)
    assert n_unique < n_stacked  # overlap actually exercised
    # every batch's frame_idx addresses inside the pack
    for _, b in batches:
        assert b["frame_idx"].min() >= 0
        assert b["frame_idx"].max() < n_unique


def test_bucket_title_fn_pads_and_trims():
    calls = []

    def raw(ids, mask):
        assert ids.shape == mask.shape
        calls.append(ids.shape[0])
        return ids[:, :2]

    fn = bucket_title_fn(raw, multiple=8)
    ids = np.arange(50).reshape(5, 10)
    out = fn(ids, np.ones_like(ids))
    assert calls == [8]  # padded up to the chunk size
    assert out.shape == (5, 2)  # pad rows trimmed
    np.testing.assert_array_equal(out, ids[:, :2])

    # exact multiple: one full chunk, no padding
    ids8 = np.arange(80).reshape(8, 10)
    fn(ids8, np.ones_like(ids8))
    assert calls[1:] == [8]

    # beyond one chunk: TWO size-8 calls — never a new batch shape
    ids9 = np.arange(90).reshape(9, 10)
    out9 = fn(ids9, np.ones_like(ids9))
    assert calls[2:] == [8, 8] and out9.shape[0] == 9
    np.testing.assert_array_equal(out9, ids9[:, :2])
