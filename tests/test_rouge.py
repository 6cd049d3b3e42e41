"""ROUGE-1/2/L unit tests (matching the pypi `rouge` package semantics)."""

import pytest

from video_chapter_generation_tpu.evalkit import rouge_scores, rouge_scores_avg


def test_identical():
    s = rouge_scores("the quick brown fox", "the quick brown fox")
    for k in ("rouge-1", "rouge-2", "rouge-l"):
        assert s[k]["f"] == pytest.approx(1.0, abs=1e-6)
        assert s[k]["p"] == 1.0 and s[k]["r"] == 1.0


def test_disjoint():
    s = rouge_scores("aaa bbb", "ccc ddd")
    for k in ("rouge-1", "rouge-2", "rouge-l"):
        assert s[k]["f"] == 0.0


def test_partial_overlap_golden():
    # hyp: "the cat sat", ref: "the cat ran fast"
    s = rouge_scores("the cat sat", "the cat ran fast")
    # unigrams: overlap {the, cat} = 2; p=2/3, r=2/4
    assert s["rouge-1"]["p"] == pytest.approx(2 / 3)
    assert s["rouge-1"]["r"] == pytest.approx(0.5)
    # bigrams: overlap {(the,cat)} = 1; p=1/2, r=1/3
    assert s["rouge-2"]["p"] == pytest.approx(0.5)
    assert s["rouge-2"]["r"] == pytest.approx(1 / 3)
    # LCS = "the cat" len 2
    assert s["rouge-l"]["p"] == pytest.approx(2 / 3)
    assert s["rouge-l"]["r"] == pytest.approx(0.5)


def test_clipped_counts():
    # repeated hyp token only counts up to ref count
    s = rouge_scores("the the the", "the end")
    assert s["rouge-1"]["p"] == pytest.approx(1 / 3)
    assert s["rouge-1"]["r"] == pytest.approx(1 / 2)


def test_avg():
    avg = rouge_scores_avg(["a b", "x"], ["a b", "x"])
    assert avg["rouge-1"]["f"] == pytest.approx(1.0, abs=1e-6)


def test_empty_hypothesis():
    s = rouge_scores("", "a b")
    assert s["rouge-1"]["f"] == 0.0
    assert s["rouge-l"]["f"] == 0.0
