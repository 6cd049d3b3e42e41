"""Dataset + loader tests over the synthetic in-memory corpus."""

import numpy as np
import pytest

from fixtures import make_corpus, make_unigram, make_wordpiece

from video_chapter_generation_tpu.data.clip_grid import flatten_video_to_clips
from video_chapter_generation_tpu.data.datasets import (
    AllChapterTitleDataset,
    AllChapterTitleVisionEmbDataset,
    ChapterTitleDataset,
    ChapterTitleVisionEmbDataset,
    npy_vision_emb_provider,
    vision_emb_block_range,
    ClipDataset,
    ContrastiveSubtitleDataset,
    InferClipDataset,
    InferWindowClipDataset,
    SubtitlePretrainDataset,
    WindowClipDataset,
    Y_PAD,
    mlm_mask,
)
from video_chapter_generation_tpu.data.loader import DataLoader, collate


@pytest.fixture(scope="module")
def corpus():
    return make_corpus()


@pytest.fixture(scope="module")
def wp():
    return make_wordpiece()


@pytest.fixture(scope="module")
def uni():
    return make_unigram()


def test_clip_dataset(corpus, wp):
    ds = ClipDataset(corpus, wp, clip_frame_num=16, max_text_len=32, hw=16)
    item = ds.__getitem__(0, epoch=0)
    assert item["text_ids"].shape == (32,)
    assert item["img_clip"].shape == (16, 16, 16, 3)
    assert item["label"] in (0, 1)
    # deterministic per (epoch, index)
    again = ds.__getitem__(0, epoch=0)
    np.testing.assert_array_equal(item["text_ids"], again["text_ids"])
    other_epoch = ds.__getitem__(0, epoch=1)
    # sampling changes across epochs (with overwhelming probability the
    # chosen clip differs eventually; check over a few epochs)
    diffs = any(
        not np.array_equal(
            ds.__getitem__(0, epoch=e)["text_ids"], item["text_ids"]
        )
        for e in range(1, 6)
    )
    assert diffs


def test_clip_dataset_text_mode(corpus, wp):
    ds = ClipDataset(corpus, wp, mode="text", max_text_len=16)
    item = ds.__getitem__(1, epoch=0)
    assert "img_clip" not in item


def test_window_dataset(corpus, wp):
    ds = WindowClipDataset(corpus, wp, clip_frame_num=16, max_text_len=16,
                           window_size=1, hw=8)
    item = ds.__getitem__(0, epoch=0)
    assert item["img_clips"].shape == (3, 16, 8, 8, 3)
    assert item["text_ids"].shape == (3, 16)
    assert item["clip_start_frame"].shape == (3,)
    # neighbors are skip_size(=4) grid steps = 16 s apart when in range
    starts = item["clip_start_frame"]
    real = starts[starts >= 0]
    if len(real) == 3:
        assert real[1] - real[0] == 16 and real[2] - real[1] == 16
    # padded positions are zero-filled
    for w in range(3):
        if starts[w] == -1:
            assert item["text_ids"][w].sum() == 0
            assert item["img_clips"][w].sum() == 0


def test_window_dataset_s2d(corpus, wp):
    """s2d=True emits the uint8 4x4 space-to-depth pack consumed by a
    stem_input='s2d' model — identical pixels, reordered."""
    from video_chapter_generation_tpu.data.native_loader import (
        space_to_depth4,
    )

    kw = dict(clip_frame_num=16, max_text_len=16, window_size=1, hw=8)
    plain = WindowClipDataset(corpus, wp, **kw).__getitem__(0, epoch=0)
    packed = WindowClipDataset(corpus, wp, s2d=True, **kw).__getitem__(
        0, epoch=0)
    assert packed["img_clips"].shape == (3, 16, 2, 2, 48)
    assert packed["img_clips"].dtype == np.uint8
    np.testing.assert_array_equal(
        packed["img_clips"], space_to_depth4(plain["img_clips"]))


def test_clip_dataset_s2d(corpus, wp):
    from video_chapter_generation_tpu.data.native_loader import (
        space_to_depth4,
    )

    kw = dict(clip_frame_num=16, max_text_len=16, hw=8)
    plain = ClipDataset(corpus, wp, **kw).__getitem__(1, epoch=0)
    packed = ClipDataset(corpus, wp, s2d=True, **kw).__getitem__(1, epoch=0)
    assert packed["img_clip"].shape == (16, 2, 2, 48)
    np.testing.assert_array_equal(
        packed["img_clip"], space_to_depth4(plain["img_clip"]))


def test_infer_clip_dataset(corpus, wp):
    clips = []
    for vid in corpus.vids:
        clips += flatten_video_to_clips(
            vid, "", corpus.image_num(vid), corpus.raw_cut_secs(vid),
            corpus.subtitles(vid), clip_frame_num=16,
        )
    ds = InferClipDataset(clips, wp, max_text_len=16, mode="text")
    assert len(ds) == len(clips)
    item = ds.__getitem__(5)
    assert item["clip_index"] == 5
    assert item["label"] == clips[5].clip_label


def test_infer_window_dataset(corpus, wp):
    clips = []
    for vid in corpus.vids:
        clips += flatten_video_to_clips(
            vid, "", corpus.image_num(vid), corpus.raw_cut_secs(vid),
            corpus.subtitles(vid), clip_frame_num=16,
        )
    ds = InferWindowClipDataset(clips, wp, clip_frame_num=16, max_text_len=16,
                                window_size=1, mode="text")
    n_per_video = len(clips) // 3
    # first clip of the second video: left neighbor must be padding, not a
    # clip of video 1
    item = ds.__getitem__(n_per_video)
    assert item["clip_start_frame"][0] == -1
    assert item["clip_start_frame"][1] == 0
    assert item["target_clip_idx"] == 0


def test_chapter_title_dataset(corpus, uni):
    ds = ChapterTitleDataset(corpus, uni, max_text_len=24,
                             chapter_title_text_len=8)
    item = ds.__getitem__(0, epoch=0)
    assert item["text_ids"].shape == (24,)
    assert item["input_decode_ids"].shape == (8,)
    assert item["input_decode_ids"][0] == uni.pad_id
    assert item["decode_attention_mask"].sum() > 0


def test_all_chapter_title_gt_and_pred(corpus, uni):
    ds = AllChapterTitleDataset(corpus, uni, max_text_len=24,
                                chapter_title_text_len=8)
    assert len(ds) == sum(
        len(corpus.records[v].timestamp_lines) for v in corpus.vids
    )
    _ = ds.__getitem__(0)

    pred_cps = {v: [30, 70] for v in corpus.vids}
    ds2 = AllChapterTitleDataset(corpus, uni, max_text_len=24,
                                 chapter_title_text_len=8,
                                 vid2cut_points=pred_cps)
    assert len(ds2) == 2 * len(corpus.vids)
    item = ds2.__getitem__(0)
    assert item["chapter_start"] == 30


def test_vision_emb_dataset(corpus, uni):
    def provider(vid, chapter_start, chapter_end):
        return [np.ones((16, 32)) * k for k in range(3)]

    ds = ChapterTitleVisionEmbDataset(
        corpus, uni, provider, max_vision_emb=5, emb_dim=32,
        max_text_len=16, chapter_title_text_len=8,
    )
    item = ds.__getitem__(0, epoch=0)
    assert item["vision_embs"].shape == (5, 32)
    assert list(item["vision_attention_mask"]) == [1, 1, 1, 0, 0]
    np.testing.assert_allclose(item["vision_embs"][1], 1.0)


def test_vision_emb_block_range_golden():
    """Pin the reference's chapter->block arithmetic
    (youtube_chapter_title_dataset.py:224-233) on representative cases."""
    def reference(chapter_start_t, chapter_end_t):
        emb_start_idx = int(chapter_start_t // 4) * 4
        emb_end_idx = int(chapter_end_t // 4) * 4 - 16
        if emb_end_idx < 0:
            emb_end_idx = emb_start_idx
        if emb_start_idx > emb_end_idx:
            emb_start_idx = emb_end_idx
        return list(range(emb_start_idx, emb_end_idx + 1, 16))

    cases = [(0, 40), (0, 10), (7, 23), (24, 60), (3, 100), (90, 95),
             (0, 16), (0, 15), (4, 20), (50, 52), (100, 260)]
    for start, end in cases:
        assert list(vision_emb_block_range(start, end)) == reference(
            start, end
        ), (start, end)


def test_npy_vision_emb_provider(tmp_path):
    d = tmp_path / "vidX"
    d.mkdir()
    for st in range(0, 61, 4):
        np.save(d / f"vision_emb_{st}_{st + 16}.npy",
                np.full((16, 8), st, np.float32))
    provider = npy_vision_emb_provider(str(tmp_path))
    embs = provider("vidX", 24, 60)
    # last allowed start is (60//4)*4-16 = 44 -> starts 24, 40
    starts = [int(e[0, 0]) for e in embs]
    assert starts == [24, 40]
    # missing final block file is skipped, not an error
    embs = provider("vidX", 60, 90)  # wants 60..72; only 60 exists
    assert [int(e[0, 0]) for e in embs] == [60]


def test_all_chapter_title_vision_dataset(corpus, uni):
    def provider(vid, start, end):
        return [np.full((4, 16), end - start, np.float32)]

    ds = AllChapterTitleVisionEmbDataset(
        corpus, uni, provider, max_vision_emb=3, emb_dim=16,
        max_text_len=16, chapter_title_text_len=8,
    )
    assert len(ds) == sum(
        len(corpus.records[v].timestamp_lines) for v in corpus.vids
    )
    item = ds.__getitem__(0, epoch=0)
    assert item["vision_embs"].shape == (3, 16)
    assert list(item["vision_attention_mask"]) == [1, 0, 0]
    span = int(item["chapter_end"]) - int(item["chapter_start"])
    np.testing.assert_allclose(item["vision_embs"][0], float(span))

    # predicted-cut-points mode feeds spans through the same vision path
    pred_cps = {v: [30, 70] for v in corpus.vids}
    ds2 = AllChapterTitleVisionEmbDataset(
        corpus, uni, provider, max_vision_emb=3, emb_dim=16,
        max_text_len=16, chapter_title_text_len=8, vid2cut_points=pred_cps,
    )
    item2 = ds2.__getitem__(0, epoch=0)
    assert item2["chapter_start"] == 30
    assert item2["vision_embs"].shape == (3, 16)


def test_mlm_mask_stats(wp):
    rng = np.random.default_rng(0)
    ids = np.arange(10, 110).astype(np.int32)
    mask = np.ones(100, np.int32)
    mask_id = wp.convert_tokens_to_ids([wp.mask_token])[0]
    corrupted, targets = mlm_mask(ids, mask, wp.vocab_size, mask_id, rng)
    chosen = targets != Y_PAD
    assert 10 <= chosen.sum() <= 20  # ~15%
    # targets hold original ids at chosen positions
    np.testing.assert_array_equal(targets[chosen], ids[chosen])
    # most chosen positions became [MASK]
    assert (corrupted[chosen] == mask_id).sum() >= chosen.sum() * 0.5
    # non-chosen positions untouched
    np.testing.assert_array_equal(corrupted[~chosen], ids[~chosen])


def test_pretrain_datasets(corpus, wp):
    mlm = SubtitlePretrainDataset(corpus, wp, task="mlm", max_text_len=32)
    item = mlm.__getitem__(0, epoch=0)
    assert (item["targets"] != Y_PAD).sum() >= 1

    nt = SubtitlePretrainDataset(corpus, wp, task="next_token",
                                 max_text_len=32)
    item = nt.__getitem__(0, epoch=0)
    real = np.flatnonzero(item["attention_mask"] == 1)
    # next-token targets shifted left
    assert item["targets"][real[0]] == item["text_ids"][real[1]]


def test_contrastive_dataset(corpus, wp):
    ds = ContrastiveSubtitleDataset(corpus, wp, num_candidates=3,
                                    max_text_len=16)
    item = ds.__getitem__(0, epoch=0)
    assert item["cand_ids"].shape == (3, 16)
    assert item["query_ids"].shape == (16,)


def test_loader_sharding_and_prefetch(corpus, wp):
    ds = ClipDataset(corpus, wp, mode="text", max_text_len=16)
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=False,
                        prefetch=2)
    batches = list(loader(0))
    assert batches[0]["text_ids"].shape == (2, 16)
    total = sum(b["label"].shape[0] for b in batches)
    assert total == len(ds)
    # same epoch -> same order; different epoch -> different permutation
    again = list(loader(0))
    np.testing.assert_array_equal(batches[0]["text_ids"],
                                  again[0]["text_ids"])

    # shards partition the data
    l0 = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                    num_shards=2, shard_index=0, prefetch=0)
    l1 = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                    num_shards=2, shard_index=1, prefetch=0)
    n0 = sum(1 for _ in l0(0))
    n1 = sum(1 for _ in l1(0))
    assert n0 == n1 == -(-len(ds) // 2)


def test_all_clip_dataset(corpus, wp):
    from video_chapter_generation_tpu.data.datasets import AllClipDataset

    ds = AllClipDataset(corpus, wp, clip_frame_num=16, max_text_len=16,
                        max_clips=64)
    item = ds.__getitem__(0, epoch=0)
    assert item["text_ids"].shape == (64, 16)
    n = int(item["num_clips"])
    assert n > 0
    assert (item["clip_labels"][:n] >= 0).all()
    assert (item["clip_labels"][n:] == -1).all()
    assert 0 <= int(item["target_clip_idx"]) < n
    assert item["label"] == item["clip_labels"][int(item["target_clip_idx"])]


def test_glove_subtitle_dataset(corpus):
    from video_chapter_generation_tpu.data.datasets import (
        GloveSubtitleDataset,
    )

    vocab = sorted({s["text"] for v in corpus.vids
                    for s in corpus.subtitles(v)})
    table = {w: np.full(8, i + 1.0, np.float32)
             for i, w in enumerate(vocab)}
    ds = GloveSubtitleDataset(corpus, table, vocab, clip_frame_num=16,
                              max_text_len=12, emb_dim=8)
    item = ds.__getitem__(0, epoch=0)
    assert item["embeddings"].shape == (12, 8)
    assert item["targets"].shape == (12,)
    real = item["targets"] != Y_PAD
    assert real.sum() > 0
    # next-token alignment: input embedding at position k is the embedding
    # of the token whose id is the TARGET at position k-1
    ids = item["targets"][real]
    for k in range(1, int(real.sum())):
        expected = table[vocab[ids[k - 1]]]
        np.testing.assert_allclose(item["embeddings"][k], expected)
    # determinism
    item2 = ds.__getitem__(0, epoch=0)
    np.testing.assert_array_equal(item["targets"], item2["targets"])
