"""TPU-friendly array ops: the XLA/Pallas equivalents of the torch-native ops
the reference leans on (SURVEY.md §2.3)."""

from .resize import resize_bilinear, scale_shape
from .gram import gram_matrix, batch_gram
from .gaussian import gaussian_blur
from .warp import grid_sample
from .histogram import match_histogram
from .colors import original_colors

__all__ = [
    "resize_bilinear",
    "scale_shape",
    "gram_matrix",
    "batch_gram",
    "gaussian_blur",
    "grid_sample",
    "match_histogram",
    "original_colors",
]
