"""Synthetic ON-DISK corpus: real JPEG frames + subtitle JSONs + CSV.

Produces the reference's exact file layout (SURVEY §1 L0 artifacts:
all_in_one CSV, <subtitle_dir>/<query>/subtitle_<vid>.json,
<img_dir>/<vid>/%05d.jpg at 1 fps / 224x224) from nothing, so the real
pipeline — host JPEG decode, tokenization, H2D feed — can be exercised and
BENCHMARKED without network access (bench_pipeline.py; the reference's
analogue ran on real downloads, test_whole_pipeline_per_video.py:27-288).

Frames are smooth moving patterns + mild noise: JPEG decode cost is
realistic (libjpeg work scales with coefficient content), deterministic
per (vid, frame index).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..datasetkit.parsing import TIMESTAMP_DELIMITER

_WORDS = (
    "intro setup overview board game rules strategy tips tricks final "
    "thoughts review unboxing gameplay score win lose turn card dice move "
    "first second third because therefore example question answer detail"
).split()


def synth_frame(vid_seed: int, t: int, hw: int = 224) -> np.ndarray:
    """Deterministic uint8 [hw, hw, 3] frame: moving low-frequency pattern
    plus mild noise (realistic JPEG entropy, not pathological)."""
    rng = np.random.default_rng((vid_seed * 100003 + t) & 0x7FFFFFFF)
    y = np.linspace(0, 2 * np.pi, hw, dtype=np.float32)[:, None]
    x = np.linspace(0, 2 * np.pi, hw, dtype=np.float32)[None, :]
    phase = 0.1 * t
    base = np.stack([
        np.sin(2 * y + phase) * np.cos(x - phase),
        np.sin(y - 0.5 * phase) * np.cos(2 * x + phase),
        np.sin(3 * y + x + 0.3 * phase),
    ], axis=-1)
    img = (base * 0.5 + 0.5) * 200.0 + rng.normal(0, 8.0, (hw, hw, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _subtitles(rng, duration: int) -> List[Dict]:
    out = []
    for t in range(0, duration, 2):
        n = int(rng.integers(3, 8))
        words = [_WORDS[int(rng.integers(0, len(_WORDS)))] for _ in range(n)]
        out.append({"text": " ".join(words), "start": float(t)})
    return out


def make_synth_corpus_on_disk(
    root: str,
    n_videos: int = 8,
    video_sec: int = 300,
    n_chapters: int = 7,
    hw: int = 224,
    seed: int = 0,
    quality: int = 80,
    split: str = "test",
) -> Dict[str, str]:
    """Write a complete synthetic corpus under `root` and return the paths
    dict {img_dir, data_file, vid_file, subtitle_dir}. Idempotent: an
    existing corpus with a matching manifest is reused (JPEG encode of
    n_videos*video_sec frames is the expensive part)."""
    from PIL import Image

    manifest = {
        "n_videos": n_videos, "video_sec": video_sec, "hw": hw,
        "seed": seed, "quality": quality, "n_chapters": n_chapters,
    }
    man_path = os.path.join(root, "manifest.json")
    img_dir = os.path.join(root, "frames")
    data_file = os.path.join(root, "dataset", "all_in_one_with_subtitle.csv")
    vid_file = os.path.join(root, "dataset", f"{split}.txt")
    paths = {
        "img_dir": img_dir,
        "data_file": data_file,
        "vid_file": vid_file,
        "subtitle_dir": os.path.join(root, "dataset"),
    }
    if os.path.exists(man_path):
        with open(man_path) as f:
            if json.load(f) == manifest and os.path.exists(vid_file):
                return paths

    os.makedirs(os.path.join(root, "dataset", "synth query"), exist_ok=True)
    rows = []
    vids = []
    for v in range(n_videos):
        vid = f"synthvid{v:03d}"
        vids.append(vid)
        rng = np.random.default_rng(seed * 7919 + v)
        # chapter starts: spread over the timeline, first at 0:00 like real
        # descriptions; parse_timestamp_block needs "0:00" on the first line
        starts = [0] + sorted(
            int(s) for s in rng.choice(
                np.arange(10, video_sec - 10), size=n_chapters - 1,
                replace=False,
            )
        )
        lines = []
        for k, s in enumerate(starts):
            lines.append(f"{s // 60}:{s % 60:02d} chapter {k} "
                         f"{_WORDS[k % len(_WORDS)]}")
        rows.append((vid, f"synthetic video {v}", float(video_sec),
                     TIMESTAMP_DELIMITER.join(lines)))

        sub_path = os.path.join(root, "dataset", "synth query",
                                f"subtitle_{vid}.json")
        with open(sub_path, "w") as f:
            json.dump(_subtitles(rng, video_sec), f)

        vdir = os.path.join(img_dir, vid)
        os.makedirs(vdir, exist_ok=True)
        for t in range(1, video_sec + 1):  # 1-based %05d.jpg, 1 fps
            Image.fromarray(synth_frame(seed * 7919 + v, t, hw)).save(
                os.path.join(vdir, "%05d.jpg" % t), quality=quality,
            )

    import csv

    with open(data_file, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["videoId", "title", "duration", "timestamp"])
        w.writerows(rows)
    with open(vid_file, "w") as f:
        f.write("\n".join(vids) + "\n")
    with open(man_path, "w") as f:
        json.dump(manifest, f)
    return paths
