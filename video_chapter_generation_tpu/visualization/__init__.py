"""Interpretability tools (Grad-CAM, saliency, integrated gradients)."""

from .interpret import (
    grad_cam_vision,
    integrated_gradients_lang,
    saliency_lang,
)

__all__ = ["grad_cam_vision", "integrated_gradients_lang", "saliency_lang"]
