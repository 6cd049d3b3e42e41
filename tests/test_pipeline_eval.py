"""End-to-end pipeline + eval-driver tests on the synthetic corpus."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_corpus, make_unigram, make_wordpiece

from video_chapter_generation_tpu.data.clip_grid import flatten_video_to_clips
from video_chapter_generation_tpu.data.datasets import InferClipDataset
from video_chapter_generation_tpu.evalkit.segment_eval import (
    evaluate_segment_predictions,
    group_clips_by_video,
    write_segment_result_files,
)
from video_chapter_generation_tpu.evalkit.title_eval import (
    evaluate_titles,
    lead_baseline,
    principal_baseline,
    write_title_result_file,
)
from video_chapter_generation_tpu.models.seq2seq import (
    Seq2Seq,
    Seq2SeqConfig,
    generate,
    trim_at_eos,
)
from video_chapter_generation_tpu.pipeline import (
    ChapterPipeline,
    score_clips,
)


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n_videos=2, image_num=120)


@pytest.fixture(scope="module")
def wp():
    return make_wordpiece()


@pytest.fixture(scope="module")
def uni():
    return make_unigram()


def all_clips(corpus):
    clips = []
    for vid in corpus.vids:
        clips += flatten_video_to_clips(
            vid, "", corpus.image_num(vid), corpus.raw_cut_secs(vid),
            corpus.subtitles(vid), clip_frame_num=16,
        )
    return clips


def oracle_score_fn(dataset):
    """Scores = GT labels (perfect model) — tests orchestration, not ML."""

    def fn(batch):
        return batch["label"].astype(np.float32) * 0.98 + 0.01

    return fn


def test_score_clips_and_segment_eval(corpus, wp, tmp_path):
    clips = all_clips(corpus)
    ds = InferClipDataset(clips, wp, max_text_len=16, mode="text")
    score_clips(ds, oracle_score_fn(ds), batch_size=4)
    assert all(c.pred_score is not None for c in ds.all_clip_infos)

    result = evaluate_segment_predictions(ds.all_clip_infos, 16, 2)
    # oracle predictions -> perfect localization
    assert result["recall"] == 1.0 and result["precision"] == 1.0
    assert result["f1"] == 1.0
    assert result["mAP"] == 1.0
    # random baseline clearly worse
    assert result["f1_rand"] < 0.7

    rf = str(tmp_path / "res/seg.txt")
    cf = str(tmp_path / "res/vid2cut_points.json")
    write_segment_result_files(result, rf, cf)
    lines = open(rf).read().splitlines()
    assert lines[0].startswith("mAP 1.0")
    assert lines[1].startswith("recall 1.0,")
    cps = json.load(open(cf))
    for vid in corpus.vids:
        assert cps[vid]["second_pred_cut_points"] == cps[vid]["second_gt_cut_points"]


def test_whole_pipeline(corpus, wp, uni, tmp_path):
    cfg = Seq2SeqConfig.tiny(vocab_size=uni.vocab_size, activation="gelu",
                             scale_embedding=False)
    s2s = Seq2Seq(cfg)
    ids0 = jnp.ones((1, 8), jnp.int32)
    variables = s2s.init(jax.random.PRNGKey(0), ids0, ids0, ids0[:, :4])

    def title_fn(text_ids, attention_mask):
        gen_ids, _ = generate(s2s, variables, jnp.asarray(text_ids),
                              jnp.asarray(attention_mask), max_len=6)
        return trim_at_eos(gen_ids, cfg.eos_token_id)

    pipe = ChapterPipeline(
        corpus, wp,  # boundary (BERT) tokenizer
        score_fn=lambda batch: batch["label"].astype(np.float32),
        title_fn=title_fn,
        decode_fn=lambda row: uni.decode(row),
        clip_frame_num=16, max_text_len=16, title_input_len=24,
        batch_size=4, score_mode="text",
        title_tokenizer=uni,  # seq2seq tokenizer for the title stage
    )
    # run one video end to end
    vid = corpus.vids[0]
    out = pipe.run_video(vid)
    # oracle scores recover the GT cut points
    gt = [c for c in corpus.raw_cut_secs(vid) if 4 <= c <= corpus.image_num(vid) - 4]
    assert out.cut_points == gt
    # one span per cut point (last span ends at duration)
    assert len(out.titles) == len(out.spans) == len(gt)
    assert pipe.videos_per_minute() > 0

    full = pipe.run()
    assert set(full.keys()) == set(corpus.vids)

    # pipelined mode (two-in-flight producer thread) must produce the
    # exact same results as the sequential path
    piped = pipe.run(pipelined=True)
    assert set(piped.keys()) == set(corpus.vids)
    for v in corpus.vids:
        assert piped[v].cut_points == full[v].cut_points
        assert piped[v].titles == full[v].titles
        assert piped[v].spans == full[v].spans


def test_title_eval_baselines():
    src = ["alpha beta gamma delta " * 6, "one two three four five " * 4]
    gt = ["alpha beta gamma", "nine ten"]
    gen = ["alpha beta gamma", "one two"]
    res = evaluate_titles(gen, gt, src, test_loss=1.0, test_acc=0.5)
    assert res["generated"]["rouge-1"]["f"] > res["random"]["rouge-1"]["f"] - 1e-9
    # lead baseline: first 10 words
    assert lead_baseline(src[0]) == "alpha beta gamma delta alpha beta gamma delta alpha beta"
    # principal picks the window with max rouge-1 vs the source itself
    assert len(principal_baseline(src[0]).split()) <= 10


def test_title_result_file(tmp_path):
    res = evaluate_titles(["a b"], ["a b"], ["a b c d"], 2.0, 0.4)
    path = str(tmp_path / "title.txt")
    write_title_result_file(res, path)
    content = open(path).read()
    assert "test_loss 2.0" in content
    assert "rouge-1 f" in content


def test_segment_eval_compat_first_clip_double_count(corpus, wp):
    """The compat flag reproduces the reference's accumulation bug
    (test_video_segment_point.py:287-295) and its delta vs the corrected
    accumulation is measurable but small on imperfect predictions."""
    clips = all_clips(corpus)
    ds = InferClipDataset(clips, wp, max_text_len=16, mode="text")
    # imperfect model: oracle with every 5th clip flipped
    score_clips(ds, oracle_score_fn(ds), batch_size=4)
    for i, c in enumerate(ds.all_clip_infos):
        if i % 5 == 0:
            c.pred_score = 1.0 - c.pred_score
            c.pred_label = 1 - c.pred_label

    base = evaluate_segment_predictions(
        ds.all_clip_infos, 16, 2, rng=np.random.default_rng(123))
    compat = evaluate_segment_predictions(
        ds.all_clip_infos, 16, 2, rng=np.random.default_rng(123),
        compat_first_clip_double_count=True)

    # the duplicated first clip changes per-video score arrays -> mAP moves
    assert base["mAP"] != compat["mAP"]
    assert abs(base["mAP"] - compat["mAP"]) < 0.1
    # exact reference behavior: first clip appears twice in the label array
    per_video = group_clips_by_video(ds.all_clip_infos)
    vid0 = next(iter(per_video))
    n = len(per_video[vid0])
    # compat cut points may shift by one grid slot (4s) vs corrected
    for vid in per_video:
        a = base["vid2cut_points"][vid]["second_pred_cut_points"]
        b = compat["vid2cut_points"][vid]["second_pred_cut_points"]
        assert len(a) == len(b) or abs(len(a) - len(b)) <= 1
