"""Task-metric impl A/B (CPU-cheap slice, asserted thresholds).

Drives tools/impl_ab_eval.py's harness on a small LEARNABLE synthetic
corpus: train the two-stream segment model through cli.train_segment to
non-trivial mAP, then A/B SERVING paths through the real
cli.eval_segment (bf16 vs f32 compute on the SAME checkpoint), and a
title model through cli.train_title + cli.eval_title (bf16 vs
--int8_titles). Training-impl pairs (tap3 vs xla vs the TPU trunk) and
the int8 vision trunk run in the tool itself (PARITY.md records those
tables); here we assert the serving-equivalence bands that must hold on
any platform.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytestmark = pytest.mark.slow  # two real trainings + four CLI evals


@pytest.fixture(scope="module")
def ab(tmp_path_factory):
    from tools.impl_ab_eval import (
        build_corpus,
        run_segment_ab,
        run_title_ab,
    )

    root = str(tmp_path_factory.mktemp("ab_corpus"))
    workdir = os.path.join(root, "work")
    os.makedirs(workdir, exist_ok=True)
    paths, hw = build_corpus(root, tpu=False, n_train=8, n_val=2, n_test=3,
                             video_sec=100, n_chapters=4)
    results = run_segment_ab(
        paths, workdir, hw, tpu=False, impls=["tap3"], epochs=80,
        serve_modes=[("f32", [], ['model.compute_dtype="float32"'])],
    )
    results.update(run_title_ab(paths, workdir, hw, tpu=False,
                                epochs=200))
    return results


def test_segment_training_reaches_nontrivial_map(ab):
    """The learnable corpus must be genuinely learnable through the real
    train CLI: ranking quality above the ~0.1-0.15 random-mAP floor.
    (Ceiling-level quality is the REAL-model TPU matrix's job —
    PARITY.md: trunk/tap3 mAP 0.99-1.0 at 224px; the tiny CPU model
    only has to beat chance.)"""
    assert ab["train:two_stream:tap3"]["mAP"] > 0.2, ab


def test_serving_dtype_equivalence(ab):
    """f32 vs bf16 serving of the SAME checkpoint through the real eval
    CLI: task metrics agree within a tight band."""
    a, b = ab["train:two_stream:tap3"], ab["serve:f32"]
    assert abs(a["mAP"] - b["mAP"]) < 0.03, (a, b)
    assert abs(a["f1_3"] - b["f1_3"]) < 0.1, (a, b)


def test_title_int8_serving_equivalence(ab):
    """--int8_titles vs bf16 on the SAME title checkpoint: token accuracy
    and ROUGE-1 agree within a band; teacher-forced loss close."""
    a, b = ab["title:bf16"], ab["title:int8"]
    assert abs(a["test_acc"] - b["test_acc"]) < 0.1, (a, b)
    assert abs(a["rouge-1"] - b["rouge-1"]) < 0.1, (a, b)
    assert abs(a["test_loss"] - b["test_loss"]) < 0.3, (a, b)


@pytest.fixture(scope="module")
def ab_window(tmp_path_factory):
    """FLAGSHIP-kind slice: the two_stream_window model through the same
    harness, with the reference's pretrained-stream recipe — train the
    base two_stream first, warm-start the window model's lang/vision
    streams from it (--init_streams; the deep 6-block window head does
    not bootstrap from fully random streams,
    train_video_segment_ddp.py:448-464), then f32-serve the same
    checkpoint."""
    from tools.impl_ab_eval import build_corpus, run_segment_ab

    root = str(tmp_path_factory.mktemp("ab_corpus_w"))
    workdir = os.path.join(root, "work")
    os.makedirs(workdir, exist_ok=True)
    paths, hw = build_corpus(root, tpu=False, n_train=8, n_val=2, n_test=3,
                             video_sec=100, n_chapters=4)
    run_segment_ab(paths, workdir, hw, tpu=False, impls=["tap3"],
                   epochs=80, kind="two_stream")
    return run_segment_ab(
        paths, workdir, hw, tpu=False, impls=["tap3"], epochs=120,
        kind="two_stream_window", window_size=1,
        init_streams=os.path.join(workdir, "ckpt_seg_two_stream_tap3"),
        serve_modes=[("f32", [], ['model.compute_dtype="float32"'])],
    )


def test_window_training_reaches_nontrivial_map(ab_window):
    """The FLAGSHIP two_stream_window model must also learn the corpus
    through the real CLIs (the TPU matrix at 224px is the real-scale
    evidence — IMPL_AB_TPU_WINDOW.json; this pins the harness path)."""
    assert ab_window["train:two_stream_window:tap3"]["mAP"] > 0.2, ab_window


def test_window_serving_dtype_equivalence(ab_window):
    """f32 vs bf16 serving of the SAME window checkpoint: task metrics
    within the same band asserted for the base model."""
    a = ab_window["train:two_stream_window:tap3"]
    b = ab_window["serve:f32"]
    assert abs(a["mAP"] - b["mAP"]) < 0.03, (a, b)
    assert abs(a["f1_3"] - b["f1_3"]) < 0.1, (a, b)
