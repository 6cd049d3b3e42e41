"""Dataset acquisition: YouTube search, timestamp scraping, ASR fetch,
video download, frame extraction.

Ports of make_video_chapter_dataset.py / download_video_subtitle.py /
extract_video_to_frames.py. All network/binary-dependent steps are GATED:
they require the optional dependencies (requests + API key, yt_dlp,
ffmpeg) at call time and raise a clear error otherwise — the parsing and
orchestration logic is importable and tested everywhere.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

from .parsing import TIMESTAMP_DELIMITER, extract_timestamp

MAX_DURATION_SEC = 1800  # skip videos > 30 min (download_video_subtitle.py:26)
FRAME_SIZE = 224
FRAME_RATE = 1


def parse_description_timestamps(description: str) -> List[str]:
    """Extract chapter lines from a video description: lines containing a
    timestamp, joined downstream with TIMESTAMP_DELIMITER
    (make_video_chapter_dataset.py:46-64)."""
    lines = []
    for line in description.split("\n"):
        _, sec, si, _ = extract_timestamp(line)
        if sec >= 0:
            lines.append(line.strip())
    return lines


def timestamps_to_csv_cell(lines: Sequence[str]) -> str:
    return TIMESTAMP_DELIMITER.join(lines)


def is_chapter_video(description: str, min_chapters: int = 2) -> bool:
    return len(parse_description_timestamps(description)) >= min_chapters


# ---------------------------------------------------------------------------
# gated network/binary stages
# ---------------------------------------------------------------------------


def fetch_asr(vid: str, languages=("en",)) -> Optional[List[Dict]]:
    """Auto captions via youtube_transcript_api (gated)."""
    try:
        from youtube_transcript_api import YouTubeTranscriptApi  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            "youtube_transcript_api not installed — ASR fetch unavailable"
        ) from e
    try:
        return YouTubeTranscriptApi.get_transcript(vid, languages=languages)
    except Exception:
        return None


def download_video(vid: str, out_dir: str, fmt: str = "18") -> Optional[str]:
    """yt-dlp download, format 18 = 360p mp4 (download_video.py) (gated)."""
    try:
        import yt_dlp  # type: ignore
    except ImportError as e:
        raise RuntimeError("yt_dlp not installed — download unavailable") from e
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{vid}.mp4")
    opts = {"format": fmt, "outtmpl": out, "quiet": True}
    try:
        with yt_dlp.YoutubeDL(opts) as ydl:
            ydl.download([f"https://www.youtube.com/watch?v={vid}"])
        return out
    except Exception:
        return None


def extract_frames(video_path: str, out_dir: str, hw: int = FRAME_SIZE,
                   fps: int = FRAME_RATE) -> int:
    """ffmpeg -i vid.mp4 -s 224x224 -r 1 %05d.jpg
    (extract_video_to_frames.py:28) (gated on the ffmpeg binary)."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found — frame extraction unavailable")
    os.makedirs(out_dir, exist_ok=True)
    cmd = [
        "ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
        "-s", f"{hw}x{hw}", "-r", str(fps),
        os.path.join(out_dir, "%05d.jpg"),
    ]
    subprocess.run(cmd, check=True)
    return len([f for f in os.listdir(out_dir) if f.endswith(".jpg")])


def extract_frames_many(video_paths: Sequence[str], out_root: str,
                        n_workers: int = 8) -> Dict[str, int]:
    """Thread-pool fan-out over videos (extract_video_to_frames.py:47-55)."""
    results: Dict[str, int] = {}

    def work(path):
        vid = os.path.splitext(os.path.basename(path))[0]
        results[vid] = extract_frames(path, os.path.join(out_root, vid))

    with ThreadPoolExecutor(n_workers) as ex:
        list(ex.map(work, video_paths))
    return results
