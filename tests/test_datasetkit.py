"""datasetkit tests: filtering, stats, acquisition parsing, glove, split."""

import numpy as np
import pytest

from video_chapter_generation_tpu.datasetkit.acquire import (
    is_chapter_video,
    parse_description_timestamps,
    timestamps_to_csv_cell,
)
from video_chapter_generation_tpu.datasetkit.filtering import (
    filter_videos,
    has_valid_timestamps,
)
from video_chapter_generation_tpu.datasetkit.glove import (
    embed_tokens,
    load_glove_txt,
    save_glove_pickle,
    load_glove_pickle,
)
from video_chapter_generation_tpu.datasetkit.split import split_vids
from video_chapter_generation_tpu.datasetkit.stats import (
    clips_per_video,
    video_stats,
)


def test_parse_description():
    desc = (
        "Great video!\n0:00 intro\nrandom line\n2:30 main topic\n"
        "10:15 - conclusion\nthanks for watching"
    )
    lines = parse_description_timestamps(desc)
    assert lines == ["0:00 intro", "2:30 main topic", "10:15 - conclusion"]
    assert is_chapter_video(desc)
    assert not is_chapter_video("just 0:30 one stamp")
    cell = timestamps_to_csv_cell(lines)
    assert cell.count("%^&*") == 2


def test_has_valid_timestamps():
    assert has_valid_timestamps(["0:00 a", "1:00 b", "2:00 c"])
    assert not has_valid_timestamps(["1:00 a", "0:30 b"])  # not increasing
    assert not has_valid_timestamps(["0:00 a"])            # too few
    assert not has_valid_timestamps(["no stamp", "1:00 b"])


def test_filter_videos():
    rows = [
        {"vid": "a", "duration": 600, "timestamp_lines": ["0:00 x", "1:00 y"]},
        {"vid": "b", "duration": 60, "timestamp_lines": ["0:00 x", "1:00 y"]},
        {"vid": "c", "duration": 600, "timestamp_lines": ["bad"]},
        {"vid": "d", "duration": 600, "timestamp_lines": ["0:00 x", "1:00 y"]},
    ]
    kept, removed = filter_videos(rows, blacklist=["d"])
    assert [r["vid"] for r in kept] == ["a"]
    assert set(removed) == {"b", "c", "d"}


def test_stats():
    rows = [
        {"vid": "a", "duration": 100,
         "timestamp_lines": ["0:10 x", "0:50 y"]},
        {"vid": "b", "duration": 200,
         "timestamp_lines": ["0:00 x", "1:00 y", "2:00 z"]},
    ]
    s = video_stats(rows)
    assert s["num_videos"] == 2
    assert s["chapters_per_video"]["mean"] == 2.5
    c = clips_per_video(rows, 16, 2)
    assert c["total_clips"] > 0


def test_split_deterministic():
    vids = [f"v{i}" for i in range(100)]
    t1, v1, te1 = split_vids(vids, seed=123)
    t2, v2, te2 = split_vids(vids, seed=123)
    assert t1 == t2 and v1 == v2 and te1 == te2
    assert len(t1) == 70 and len(v1) == 10 and len(te1) == 20
    assert set(t1) | set(v1) | set(te1) == set(vids)


def test_subset_split():
    """Pin the reduce_val_data.py:19-25 subsetting arithmetic: seeded
    random.sample of int(len * fraction) vids, emitted sorted; clips JSON
    filtered to the surviving vids (reduce_val_data.py:32)."""
    import random

    from video_chapter_generation_tpu.datasetkit.split import (
        filter_clips_to_vids,
        subset_split,
    )

    vids = [f"v{i:03d}" for i in range(40)]
    sub = subset_split(vids, 0.5, seed=42)
    assert sub == sorted(random.Random(42).sample(vids, 20))
    assert len(sub) == 20 and sub == sorted(sub)
    assert subset_split(vids, 0.5, seed=42) == sub  # deterministic
    assert set(sub) <= set(vids)

    clips = [{"vid": v, "i": i} for i, v in enumerate(vids * 2)]
    kept = filter_clips_to_vids(clips, sub)
    assert len(kept) == 40
    assert all(c["vid"] in set(sub) for c in kept)


def test_glove(tmp_path):
    txt = tmp_path / "glove.txt"
    txt.write_text("hello 1.0 2.0 3.0\nworld 4.0 5.0 6.0\nbad x y z\n")
    table = load_glove_txt(str(txt))
    assert set(table) == {"hello", "world"}
    p = tmp_path / "glove.pkl"
    save_glove_pickle(table, str(p))
    assert load_glove_pickle(str(p))["hello"][0] == 1.0
    emb = embed_tokens(["hello", "oov"], table, dim=3)
    assert emb.shape == (2, 3)
    assert emb[1].sum() == 0


def test_gated_stages_raise_cleanly():
    from video_chapter_generation_tpu.datasetkit import acquire

    with pytest.raises(RuntimeError):
        acquire.fetch_asr("x")
    with pytest.raises(RuntimeError):
        acquire.download_video("x", "/tmp/nowhere")


def test_easy_hard_splits():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_corpus

    from video_chapter_generation_tpu.datasetkit.split import (
        intersect_split,
        rouge_upper_bound_split,
    )

    e, h = intersect_split(["a", "b", "c"], ["a"], ["c", "d"])
    assert e == ["a"] and h == ["c"]

    corpus = make_corpus(n_videos=2)
    easy, hard = rouge_upper_bound_split(corpus, threshold=0.0)
    assert set(easy) | set(hard) == set(corpus.vids)


def test_parse_timestamp_block_golden():
    """Pin the scrape-time parser (make_video_chapter_dataset.py:45-64)."""
    from video_chapter_generation_tpu.datasetkit.acquire import (
        parse_timestamp_block,
    )

    desc = "\n".join([
        "welcome to my video",
        "x" * 151 + " 0:00 too long, skipped",
        "0:00 intro https://spam.example/x",
        "1:23 middle",
        "no stamp here breaks nothing",
        "12:05 end",
    ])
    lines = parse_timestamp_block(desc)
    assert lines == ["0:00 intro ", "1:23 middle", "12:05 end"]
    # block never starts without a 0:00 line
    assert parse_timestamp_block("1:23 only middle\n2:00 end") == []


class _CannedResponse:
    status_code = 200
    text = ""

    def __init__(self, payload):
        self._payload = payload

    def json(self):
        return self._payload


def test_search_youtube_video_offline():
    """Full search pipeline on canned API responses: pagination,
    description scrape, ASR fan-out, row assembly
    (make_video_chapter_dataset.py:114-257)."""
    from video_chapter_generation_tpu.datasetkit.acquire import (
        YOUTUBE_SEARCH_URL,
        YOUTUBE_VIDEO_URL,
        search_youtube_video,
    )
    from video_chapter_generation_tpu.datasetkit.parsing import (
        TIMESTAMP_DELIMITER,
    )

    def item(vid):
        return {
            "id": {"kind": "youtube#video", "videoId": vid},
            "snippet": {"title": f"t-{vid}", "description": "short",
                        "publishedAt": "2021-01-01", "channelId": "c"},
        }

    descriptions = {
        "vidA": "0:00 intro\n1:00 more",   # has chapters
        "vidB": "no timestamps at all",    # dropped
        "vidC": "0:00 start\n2:30 end",    # has chapters
    }
    pages = {
        None: {"items": [item("vidA"), item("vidB")], "nextPageToken": "p2"},
        "p2": {"items": [item("vidC")]},
    }
    calls = []

    def http_get(url, params):
        calls.append(url)
        if url == YOUTUBE_SEARCH_URL:
            return _CannedResponse(pages[params.get("pageToken")])
        assert url == YOUTUBE_VIDEO_URL
        vid = params["id"]
        return _CannedResponse(
            {"items": [{"snippet": {"description": descriptions[vid]}}]}
        )

    def asr_fetch(vid):
        if vid == "vidC":
            raise RuntimeError("subtitles disabled")  # -> [] row
        return [{"text": f"sub-{vid}", "start": 0.0}]

    out = search_youtube_video("how to paint", 3, api_key="K",
                               http_get=http_get, asr_fetch=asr_fetch,
                               n_workers=2)
    assert out["videoId"] == ["vidA", "vidC"]
    assert out["title"] == ["t-vidA", "t-vidC"]
    assert out["timestamp"][0] == TIMESTAMP_DELIMITER.join(
        ["0:00 intro", "1:00 more"])
    assert out["subtitle"] == [[{"text": "sub-vidA", "start": 0.0}], []]
    # paginated search (2 calls) + one description fetch per video
    assert calls.count(YOUTUBE_SEARCH_URL) == 2
    assert calls.count(YOUTUBE_VIDEO_URL) == 3


def test_merge_all_in_one(tmp_path):
    """Category CSVs + subtitles + durations -> filtered all_in_one CSV
    (youtube_dataset_all_in_one.py:37-122)."""
    import json

    import pandas as pd

    from video_chapter_generation_tpu.datasetkit.merge import (
        collect_video_durations,
        combine_all_data_with_subtitle,
    )
    from video_chapter_generation_tpu.datasetkit.parsing import (
        TIMESTAMP_DELIMITER,
        parse_csv_to_list,
    )

    cat = tmp_path / "howto"
    cat.mkdir()
    ts3 = TIMESTAMP_DELIMITER.join(["0:00 a", "0:30 b", "1:00 c"])
    ts2 = TIMESTAMP_DELIMITER.join(["0:00 a", "0:30 b"])
    ts_late = TIMESTAMP_DELIMITER.join(["0:10 a", "0:30 b", "1:00 c"])
    pd.DataFrame({
        "videoId": ["ok1", "short_ch", "late", "slow", "long", "nodur"],
        "title": ["t1", "t2", "t3", "t4", "t5", "t6"],
        "timestamp": [ts3, ts2, ts_late, ts3, ts3, ts3],
    }).to_csv(cat / "data.csv")
    dense = [{"text": "w " * 50, "start": 0.0}] * 3
    sparse = [{"text": "w", "start": 0.0}]
    for vid, subs in [("ok1", dense), ("short_ch", dense), ("late", dense),
                      ("slow", sparse), ("long", dense), ("nodur", dense)]:
        (cat / f"subtitle_{vid}.json").write_text(json.dumps(subs))

    vdir = tmp_path / "vids"
    vdir.mkdir()
    dur = {"ok1": 100.0, "short_ch": 100.0, "late": 100.0, "slow": 100.0,
           "long": 2000.0}
    for vid in dur:
        (vdir / f"{vid}.mp4").write_bytes(b"")
    vid2duration = collect_video_durations(
        sorted(str(p) for p in vdir.glob("*.mp4")),
        duration_fn=lambda p: dur[p.split("/")[-1].split(".")[0]],
    )
    assert vid2duration == dur

    out_csv = str(tmp_path / "all_in_one_with_subtitle.csv")
    asr_files = sorted(str(p) for p in cat.glob("subtitle_*.json"))
    n = combine_all_data_with_subtitle(asr_files, vid2duration, out_csv)
    # survives: ok1 only (short_ch <3 chapters, late starts >0, slow
    # <0.5 w/s, long >1800s, nodur has no video file)
    assert n == 1
    vids, titles, durations, stamps = parse_csv_to_list(out_csv)
    assert vids == ["ok1"] and titles == ["t1"] and durations == [100.0]
    assert stamps[0] == ["0:00 a", "0:30 b", "1:00 c"]


def test_dataset_sampler():
    from video_chapter_generation_tpu.datasetkit.sampler import (
        DatasetSampler,
        stats_for_videos,
        stats_in_range,
    )

    # 20 videos, two sub-populations with different chapter counts
    vid2row = {}
    for i in range(20):
        n_ch = 2 if i < 10 else 6
        vid2row[f"v{i}"] = {
            "duration": 120.0,
            "timestamp_lines": [f"0:0{k} word word" for k in range(n_ch)],
        }
    all_vids = list(vid2row)
    target = stats_for_videos(all_vids[:10], vid2row)  # the 2-chapter pop
    assert target == {
        "video_count": 10, "avg_chapter_duration": 60.0,
        "avg_chapters_per_video": 2.0, "avg_words_per_chapter": 2.0,
    }
    assert stats_in_range(target, target, 0.05)

    sampler = DatasetSampler(
        category2vid={"Category:Art": all_vids},
        target_stats={"Category:Art": {**target, "video_count": 5}},
        vid2row=vid2row, seed=0, max_attempts=200,
    )
    assert sampler.sample_all_categories() == 1
    sampled = sampler.sampled_videos["Category:Art"]
    assert len(sampled) == 5
    # matched the paper stats: only 2-chapter videos can satisfy them
    assert all(int(v[1:]) < 10 for v in sampled), sampled

    # keep-all category bypasses sampling
    s2 = DatasetSampler(
        {"Category:Youth": all_vids[:3]},
        {"Category:Youth": {"video_count": 1}}, vid2row,
    )
    assert s2.sample_all_categories() == 1
    assert s2.sampled_videos["Category:Youth"] == all_vids[:3]


def test_split_easy_hard_from_labels(tmp_path):
    import pandas as pd

    from video_chapter_generation_tpu.datasetkit.split import (
        split_easy_hard_from_labels,
    )

    pd.DataFrame({
        "object id": ["a", "b", "c", "d", "e"],
        "1_label_result": [2, 1, 0, -1, 1],
        "2_label_result": [float("nan"), float("nan"), float("nan"),
                           float("nan"), 2.0],  # overrides 'e' to easy
    }).to_csv(tmp_path / "labels.csv", index=False)
    easy, hard, ambiguous, wrong = split_easy_hard_from_labels(
        str(tmp_path / "labels.csv"))
    assert easy == ["a", "e"] and hard == ["b"]
    assert ambiguous == ["c"] and wrong == ["d"]
