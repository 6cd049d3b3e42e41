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
