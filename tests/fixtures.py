"""Synthetic in-memory video corpus for tests (no filesystem, no network)."""

from video_chapter_generation_tpu.data.corpus import VideoCorpus
from video_chapter_generation_tpu.data.tokenization import (
    UnigramTokenizer,
    WordPieceTokenizer,
)

WORDS = (
    "intro setup board game rules strategy tips tricks final thoughts "
    "review unboxing gameplay score win lose turn card dice move"
).split()


def make_video(vid: str, image_num: int, chapter_starts, titles=None):
    titles = titles or [f"chapter {k}" for k in range(len(chapter_starts))]
    lines = [
        f"{s // 60}:{s % 60:02d} {t}" for s, t in zip(chapter_starts, titles)
    ]
    subs = [
        {"text": WORDS[(i // 2) % len(WORDS)], "start": float(i)}
        for i in range(0, image_num, 2)
    ]
    return {
        "vid": vid,
        "title": f"video {vid}",
        "duration": float(image_num),
        "timestamp_lines": lines,
        "subtitles": subs,
        "image_num": image_num,
    }


def make_corpus(n_videos: int = 3, image_num: int = 120) -> VideoCorpus:
    videos = []
    for v in range(n_videos):
        starts = [24 + 10 * v, 60, 90]
        videos.append(make_video(f"vid{v}", image_num, starts))
    return VideoCorpus.from_memory(videos)


def make_wordpiece():
    corpus_texts = [" ".join(WORDS), "chapter 0 1 2 3 4"]
    return WordPieceTokenizer.build_from_corpus(corpus_texts)


def make_unigram():
    corpus_texts = [" ".join(WORDS), "chapter 0 1 2 3 4"]
    return UnigramTokenizer.build_from_corpus(corpus_texts)
