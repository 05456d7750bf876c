"""Evaluation suite (reference utils.py:434-726)."""

from where2edit_tpu.eval.metrics import (
    frechet_distance,
    inception_score_from_probs,
    EditEvaluator,
)
from where2edit_tpu.eval.iou import attention_with_text, remap_celeba_labels

__all__ = ["frechet_distance", "inception_score_from_probs", "EditEvaluator",
           "attention_with_text", "remap_celeba_labels"]
