"""Topic/query tooling and one-off dataset helpers.

Ports the reference's last peripheral scripts as pure, testable functions
(the originals are filesystem/network one-offs):
- wikihow topic scraping + query->category assignment
  (get_topics_for_searching.py:33-134)
- video property fetch + chapter parse (get_youtube_video_property.py:15-41;
  the timestamp parser itself is `acquire.parse_timestamp_block`)
- annotation URL listing (annotate_minidataset.py:1-15)
- frame resizing (resize_image.py:1-17) — PIL instead of cv2.

Network and filesystem access are injectable (`http_get`), matching
acquire.py's offline-testable style.
"""

from __future__ import annotations

import os
import re
from html.parser import HTMLParser
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from .acquire import parse_timestamp_block

WIKIHOW_WEBSITE = "https://www.wikihow.com/"

# the reference's fixed subject list (get_topics_for_searching.py:12-30)
WIKIHOW_SUBJECTS = [
    "Category:Arts-and-Entertainment",
    "Category:Cars-%26-Other-Vehicles",
    "Category:Computers-and-Electronics",
    "Category:Education-and-Communications",
    "Category:Family-Life",
    "Category:Finance-and-Business",
    "Category:Food-and-Entertaining",
    "Category:Health",
    "Category:Hobbies-and-Crafts",
    "Category:Holidays-and-Traditions",
    "Category:Home-and-Garden",
    "Category:Personal-Care-and-Style",
    "Category:Pets-and-Animals",
    "Category:Sports-and-Fitness",
    "Category:Travel",
    "Category:Work-World",
    "Category:Youth",
]


class _ThumbTitleParser(HTMLParser):
    """Extracts the text of <div class="responsive_thumb_title"> elements
    (the "How to ..." article titles on a wikihow category page)."""

    def __init__(self):
        super().__init__()
        self._depth = 0
        self._parts: List[str] = []
        self.titles: List[str] = []

    def handle_starttag(self, tag, attrs):
        if self._depth > 0:
            if tag == "div":
                self._depth += 1
            return
        if tag == "div":
            classes = dict(attrs).get("class", "") or ""
            if "responsive_thumb_title" in classes.split():
                self._depth = 1
                self._parts = []

    def handle_endtag(self, tag):
        if self._depth > 0 and tag == "div":
            self._depth -= 1
            if self._depth == 0:
                text = "".join(self._parts)
                self.titles.append(" ".join(text.split()))

    def handle_data(self, data):
        if self._depth > 0:
            self._parts.append(data)


def parse_wikihow_titles(html: str) -> List[str]:
    """One category page's HTML -> article-title queries, whitespace
    normalized exactly like the reference (split + rejoin,
    get_topics_for_searching.py:44-50)."""
    p = _ThumbTitleParser()
    p.feed(html)
    return p.titles


def scrape_wikihow_queries(
    subjects: Optional[Sequence[str]] = None,
    http_get: Optional[Callable[[str], Optional[str]]] = None,
) -> Dict[str, List[str]]:
    """category -> ["How to ...", ...] per wikihow subject page.
    `http_get(url) -> html or None` is injectable for offline tests."""
    if http_get is None:
        def http_get(url):
            import requests

            resp = requests.get(url)
            return resp.content.decode("utf-8") if resp.status_code == 200 \
                else None

    category2query: Dict[str, List[str]] = {}
    for subject in subjects if subjects is not None else WIKIHOW_SUBJECTS:
        html = http_get(WIKIHOW_WEBSITE + subject)
        if html is None:
            continue
        category2query[subject] = parse_wikihow_titles(html)
    return category2query


def assign_query_categories(
    queries: Sequence[str], category2query: Dict[str, List[str]]
) -> Tuple[Dict[str, str], Dict[str, int]]:
    """Each query -> its first matching category, "unknown" otherwise;
    returns (query2category, per-category counts)
    (get_topics_for_searching.py:68-87)."""
    counts: Dict[str, int] = {"unknown": 0}
    query2category: Dict[str, str] = {}
    for q in queries:
        for cat, qs in category2query.items():
            if q in qs:
                counts[cat] = counts.get(cat, 0) + 1
                query2category[q] = cat
                break
        else:
            counts["unknown"] += 1
            query2category[q] = "unknown"
    return query2category, counts


def subtitle_path_query(path: str) -> Tuple[str, str]:
    """dataset/<query>/subtitle_<vid>.json -> (query, vid)
    (get_topics_for_searching.py:96-101)."""
    parts = path.replace(os.sep, "/").split("/")
    query = parts[-2]
    vid = os.path.basename(path)[9:-5]
    return query, vid


def categorize_vids(
    subtitle_paths: Sequence[str],
    query2category: Dict[str, str],
    valid_vids: Optional[Sequence[str]] = None,
) -> Dict[str, List[str]]:
    """category -> vids, via each vid's search query (its subtitle-file
    directory); restricted to `valid_vids` when given
    (get_topics_for_searching.py:96-125)."""
    vid2category: Dict[str, str] = {}
    for p in subtitle_paths:
        query, vid = subtitle_path_query(p)
        vid2category[vid] = query2category.get(query, "unknown")
    vids = list(valid_vids) if valid_vids is not None else list(vid2category)
    out: Dict[str, List[str]] = {}
    for vid in vids:
        out.setdefault(vid2category[vid], []).append(vid)
    return out


def fetch_video_chapters(
    vid: str, api_key: str,
    http_get: Optional[Callable[[str, Dict], Dict]] = None,
) -> List[str]:
    """Video id -> chapter timestamp lines from its description via the
    Data API snippet endpoint (get_youtube_video_property.py:36-41); the
    line parser is the shared `parse_timestamp_block`."""
    if http_get is None:
        from .acquire import _default_http_get as http_get
    data = http_get(
        "https://www.googleapis.com/youtube/v3/videos",
        {"part": "snippet", "id": vid, "key": api_key},
    )
    items = (data or {}).get("items", [])
    if not items:
        return []
    return parse_timestamp_block(items[0]["snippet"]["description"])


def annotation_urls(vids_per_file: Dict[str, Sequence[str]],
                    per_file: int = 5) -> List[str]:
    """First `per_file` vids of each data.csv -> watch URLs for manual
    annotation (annotate_minidataset.py:6-14)."""
    urls = []
    for _, vids in sorted(vids_per_file.items()):
        for vid in list(vids)[:per_file]:
            urls.append(f"https://www.youtube.com/watch?v={vid}")
    return urls


def resize_frames(img_dir: str, target_size: int = 96,
                  pattern: str = "*.jpg") -> int:
    """Resize every frame JPEG in a video's directory in place
    (resize_image.py:8-17; PIL instead of cv2). Returns #files written."""
    import glob

    from PIL import Image

    n = 0
    for path in sorted(glob.glob(os.path.join(img_dir, pattern))):
        with Image.open(path) as img:
            resized = img.convert("RGB").resize((target_size, target_size))
        resized.save(path, quality=95)
        n += 1
    return n
