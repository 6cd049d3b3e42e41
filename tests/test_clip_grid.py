"""Golden tests for clip grid / IoU labeling / frame offsets / subtitle
windows (reference: data/youtube_dataset.py:92-192,
flat_video2clip_for_quick_infer.py:47-119)."""

import numpy as np

from video_chapter_generation_tpu.data import (
    build_clip_grid,
    chapter_spans,
    clip_iou_with_cut_point,
    flatten_video_to_clips,
    frame_indices_for_clip,
    label_clips,
    subtitle_text_for_window,
    valid_cut_points,
    window_clip_indices,
)


def test_build_clip_grid_matches_reference_range():
    image_num, N = 100, 16
    clips = build_clip_grid(image_num, N)
    expected = [
        [s, s + N] for s in range(0, image_num - N, 4)
    ]  # youtube_dataset.py:94
    assert [list(c) for c in clips] == expected
    assert clips[-1][1] <= image_num


def test_valid_cut_points_train_vs_infer():
    raw = [1, 3, 4, 50, 96, 97, 100, 120]
    # train mode: keep 4 <= sec <= image_num (youtube_dataset.py:82-87)
    assert valid_cut_points(raw, 100, mode="train") == [4, 50, 96, 97, 100]
    # infer mode: keep 4 <= sec <= image_num-4 (flat_video2clip:53-56)
    assert valid_cut_points(raw, 100, mode="infer") == [4, 50, 96]


def test_iou_labeling_threshold():
    N, off = 16, 2
    half = N // 2
    # clip exactly centered on cut point -> IoU 1
    assert clip_iou_with_cut_point(42, 42 + N, 42 + half, half) == 1.0
    # clip offset by exactly max_offset -> IoU == threshold (inclusive)
    iou = clip_iou_with_cut_point(40, 40 + N, 40 + half + off, half)
    assert abs(iou - (N - off) / (N + off)) < 1e-12
    labels = label_clips([(40, 56)], [40 + half + off], N, off)
    assert labels[0] == 1
    # one further second -> below threshold
    labels = label_clips([(40, 56)], [40 + half + off + 1], N, off)
    assert labels[0] == 0


def test_label_clips_small_video_golden():
    # image_num=40, N=16: clips start at 0,4,8,...,20
    clips = build_clip_grid(40, 16)
    assert [c[0] for c in clips] == [0, 4, 8, 12, 16, 20]
    labels = label_clips(clips, [16], 16, 2)
    # cut point 16 -> window [8,24]; positives need |start - 8| <= 2 -> start 8
    assert list(labels) == [0, 0, 1, 0, 0, 0]


def test_frame_offset_quirk():
    # interior clip: +3 offset; near-start or near-end clip: +1
    # (youtube_dataset.py:179-192)
    image_num, N = 100, 16
    assert frame_indices_for_clip(0, 16, image_num, N)[:3] == [1, 2, 3]
    assert frame_indices_for_clip(2, 18, image_num, N)[0] == 3  # start<=2 -> +1
    assert frame_indices_for_clip(4, 20, image_num, N)[0] == 7  # interior -> +3
    # start >= image_num - N - 2 = 82 -> +1 again
    assert frame_indices_for_clip(82, 98, image_num, N)[0] == 83
    assert frame_indices_for_clip(80, 96, image_num, N)[0] == 83  # still interior


def test_subtitle_window_strict_bounds():
    subs = [
        {"text": "a", "start": 9.0},
        {"text": "b", "start": 10.5},
        {"text": "c", "start": 26.9},
        {"text": "d", "start": 27.0},
    ]
    # window (start-1, end+1) exclusive both sides: (9, 27)
    assert subtitle_text_for_window(subs, 10, 26) == "b c"
    # early_stop halts the scan once past the window
    assert subtitle_text_for_window(subs, 10, 26, early_stop=True) == "b c"


def test_chapter_spans():
    assert chapter_spans([10, 50, 90], 120.0) == [(10, 50), (50, 90), (90, 120.0)]


def test_window_clip_indices_padding():
    assert window_clip_indices(0, 10, 2) == [-1, -1, 0, 1, 2]
    assert window_clip_indices(9, 10, 2) == [7, 8, 9, -1, -1]
    assert window_clip_indices(5, 10, 1) == [4, 5, 6]
    # reference skip_size semantics: neighbors are skip_size grid steps away
    # (clip_frame_num=16, max_offset=2 -> skip 4: non-overlapping clips)
    from video_chapter_generation_tpu.data.clip_grid import window_skip_size

    assert window_skip_size(16, 2) == 4
    assert window_clip_indices(8, 20, 1, skip_size=4) == [4, 8, 12]
    assert window_clip_indices(2, 20, 1, skip_size=4) == [-1, 2, 6]


def test_flatten_video_to_clips_schema():
    subs = [{"text": f"w{i}", "start": float(i)} for i in range(0, 60, 2)]
    infos = flatten_video_to_clips(
        vid="vidA",
        image_dir="/imgs",
        image_num=60,
        raw_cut_secs=[2, 24, 58],
        subtitles=subs,
        clip_frame_num=16,
    )
    # grid: starts 0..40 step 4 -> 11 clips
    assert len(infos) == 11
    first = infos[0]
    assert first.clip_start_end == (0, 16)
    assert len(first.image_paths) == 16
    assert first.image_paths[0] == "/imgs/vidA/00001.jpg"
    # cut 2 (<4) and 58 (>56) filtered; 24 kept
    assert first.cut_points == [24]
    # positive clips: cut 24 -> window [16,32], starts within ±2 of 16 -> 16 only
    labels = [c.clip_label for c in infos]
    assert labels == [0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0]
    # round-trip through json schema
    d = first.to_json()
    from video_chapter_generation_tpu.data import ClipInfo

    assert ClipInfo.from_json(d) == first
