"""Golden + differential tests for boundary metrics and ranking metrics."""

import numpy as np
import pytest

from video_chapter_generation_tpu.evalkit import (
    aggregate_pr_over_videos,
    average_precision_score,
    calculate_pr,
    convert_clip_label2cut_point,
    f1,
    roc_auc_score,
)


def test_convert_clip_label2cut_point_reference_example():
    # the clip array from eval_utils.py __main__, with N=16, max_offset=2
    arr = [1, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1, 0, 1, 0] + [0] * 12
    cps = convert_clip_label2cut_point(arr, 16, 2)
    # runs: [0], [4,5], [8..12], [14]
    # run1: begin=0,  end=0*4+16=16  -> round(15/2)  = 8
    # run2: begin=16, end=5*4+16=36  -> round(51/2)  = 26
    # run3: begin=32, end=12*4+16=64 -> round(95/2)  = 48
    # run4: begin=56, end=14*4+16=72 -> round(127/2) = 64
    assert cps == [8, 26, 48, 64]


def test_convert_trailing_run_is_dropped():
    # a run still open at the end of the array produces no cut point
    # (reference behaviour: needs a trailing 0 to close)
    assert convert_clip_label2cut_point([0, 0, 1, 1], 16, 2) == []


def test_calculate_pr_golden():
    r, r3, r5, p, p3, p5 = calculate_pr([10, 50, 100], [10, 47, 200])
    assert r == pytest.approx(1 / 3)  # only 10 exact
    assert r3 == pytest.approx(2 / 3)  # 10 and 50 (47 within 3)
    assert r5 == pytest.approx(2 / 3)
    assert p == pytest.approx(1 / 3)
    assert p3 == pytest.approx(2 / 3)
    assert p5 == pytest.approx(2 / 3)


def test_calculate_pr_no_predictions():
    r, r3, r5, p, p3, p5 = calculate_pr([10], [])
    assert (r, r3, r5) == (0, 0, 0)
    assert p is None and p3 is None and p5 is None


def test_aggregate_pr():
    res = aggregate_pr_over_videos(
        [([10, 50], [10]), ([20], []), ([], [5])]  # empty-GT video skipped
    )
    assert res["recall"] == pytest.approx((0.5 + 0.0) / 2)
    assert res["precision"] == pytest.approx(1.0)  # only first video has preds
    assert res["f1"] == pytest.approx(f1(1.0, 0.25))


def test_roc_auc_and_ap_match_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    for trial in range(5):
        y = rng.integers(0, 2, size=200)
        if y.sum() in (0, len(y)):
            continue
        # include ties: quantize scores
        s = np.round(rng.random(200), 2)
        assert roc_auc_score(y, s) == pytest.approx(
            sklearn.roc_auc_score(y, s), abs=1e-12
        )
        assert average_precision_score(y, s) == pytest.approx(
            sklearn.average_precision_score(y, s), abs=1e-12
        )


def test_auc_perfect_and_random():
    assert roc_auc_score([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert roc_auc_score([0, 1], [0.5, 0.5]) == 0.5
