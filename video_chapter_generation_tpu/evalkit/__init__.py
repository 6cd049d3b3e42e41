"""Evaluation: boundary metrics, ranking metrics, ROUGE, result writers."""

from .boundary import (
    aggregate_pr_over_videos,
    calculate_pr,
    convert_clip_label2cut_point,
    f1,
    random_guess_cut_points,
)
from .metrics import average_precision_score, roc_auc_score
from .rouge import rouge_scores, rouge_scores_avg

__all__ = [
    "aggregate_pr_over_videos",
    "calculate_pr",
    "convert_clip_label2cut_point",
    "f1",
    "random_guess_cut_points",
    "average_precision_score",
    "roc_auc_score",
    "rouge_scores",
    "rouge_scores_avg",
]
