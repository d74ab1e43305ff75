"""User-facing workloads (reference: style.py, clip_vqgan.py, NCA_*.py)."""

from .img_img import img_img

__all__ = ["img_img"]
