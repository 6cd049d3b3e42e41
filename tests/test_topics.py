"""datasetkit.topics: wikihow query scraping, vid categorization, frame
resizing — offline ports of the reference's last one-off scripts."""

import os

import numpy as np
import pytest

from video_chapter_generation_tpu.datasetkit.topics import (
    annotation_urls,
    assign_query_categories,
    categorize_vids,
    fetch_video_chapters,
    parse_wikihow_titles,
    resize_frames,
    scrape_wikihow_queries,
    subtitle_path_query,
)

WIKIHOW_HTML = """
<html><body>
<div class="content">
  <div class="responsive_thumb_title otherclass"><p>How to
     Draw a   Cat</p></div>
  <div class="responsive_thumb_title">How to Bake <b>Bread</b></div>
  <div class="unrelated">not a title</div>
</div>
</body></html>
"""


def test_parse_wikihow_titles_normalizes_whitespace():
    titles = parse_wikihow_titles(WIKIHOW_HTML)
    assert titles == ["How to Draw a Cat", "How to Bake Bread"]


def test_scrape_with_injected_http():
    pages = {"https://www.wikihow.com/Category:Health": WIKIHOW_HTML}
    out = scrape_wikihow_queries(
        subjects=["Category:Health", "Category:Travel"],
        http_get=lambda url: pages.get(url),
    )
    # failed fetches are skipped, like the reference's status-200 gate
    assert list(out) == ["Category:Health"]
    assert out["Category:Health"][0] == "How to Draw a Cat"


def test_assign_query_categories():
    cat2q = {
        "Category:Health": ["How to Sleep", "How to Run"],
        "Category:Travel": ["How to Pack"],
    }
    q2c, counts = assign_query_categories(
        ["How to Run", "How to Pack", "How to Fly"], cat2q
    )
    assert q2c == {
        "How to Run": "Category:Health",
        "How to Pack": "Category:Travel",
        "How to Fly": "unknown",
    }
    assert counts == {"unknown": 1, "Category:Health": 1,
                      "Category:Travel": 1}


def test_categorize_vids():
    paths = [
        "dataset/How to Run/subtitle_vidA.json",
        "dataset/How to Pack/subtitle_vidB.json",
        "dataset/Mystery Query/subtitle_vidC.json",
    ]
    assert subtitle_path_query(paths[0]) == ("How to Run", "vidA")
    q2c = {"How to Run": "Category:Health", "How to Pack": "Category:Travel"}
    out = categorize_vids(paths, q2c, valid_vids=["vidA", "vidC"])
    assert out == {"Category:Health": ["vidA"], "unknown": ["vidC"]}


def test_fetch_video_chapters_injected():
    desc = "hi\n0:00 intro\n1:30 middle\n3:45 end\n"
    def http_get(url, params):
        assert params["id"] == "abc123"
        return {"items": [{"snippet": {"description": desc}}]}

    lines = fetch_video_chapters("abc123", api_key="k", http_get=http_get)
    assert lines == ["0:00 intro", "1:30 middle", "3:45 end"]
    assert fetch_video_chapters(
        "missing", "k", http_get=lambda u, p: {"items": []}
    ) == []


def test_annotation_urls():
    urls = annotation_urls(
        {"b/data.csv": ["v3", "v4", "v5"], "a/data.csv": ["v1", "v2"]},
        per_file=2,
    )
    assert urls == [
        "https://www.youtube.com/watch?v=v1",
        "https://www.youtube.com/watch?v=v2",
        "https://www.youtube.com/watch?v=v3",
        "https://www.youtube.com/watch?v=v4",
    ]


def test_resize_frames(tmp_path):
    from PIL import Image

    d = tmp_path / "vid1"
    d.mkdir()
    for i in range(3):
        Image.fromarray(
            np.random.default_rng(i).integers(0, 255, (224, 224, 3),
                                              dtype=np.uint8)
        ).save(d / f"{i:05d}.jpg")
    n = resize_frames(str(d), target_size=96)
    assert n == 3
    with Image.open(d / "00000.jpg") as img:
        assert img.size == (96, 96)
