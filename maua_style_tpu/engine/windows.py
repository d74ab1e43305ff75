"""Temporal window scheduling for video ("sequence-parallel" axis).

The reference optimises a T-frame pastiche in circular gram_frame_window-sized
windows, with window starts linearly spaced over each style video's length and
gradients frozen on frames overlapping previously-styled windows
(reference: optim.py:114-123, 149-156, 215-219).  These helpers reproduce that
schedule; the per-window gradient freeze becomes a multiplicative mask on the
gradient inside the jitted step.
"""

from __future__ import annotations

import math

import numpy as np


def compute_windows(pastiche_len: int, style_lens: list[int], gram_frame_window: int) -> list[list[int]]:
    """Window start indices for the pastiche (row 0) and each style video.

    Mirrors reference optim.py:114-123: num_windows = ceil(T / gfw); starts =
    ceil(framestep * n) with framestep = (len - gfw/2) / num_windows; tensors
    of length 1 pin to start 0.  Returns num_windows + 1 starts per row (the
    extra window wraps around and re-covers the seam).
    """
    num_windows = math.ceil(pastiche_len / gram_frame_window)
    lens = [pastiche_len] + list(style_lens)
    framestep = [(l - gram_frame_window / 2) / num_windows for l in lens]
    return [
        [math.ceil(framestep[idx] * n) for n in range(num_windows + 1)] if lens[idx] != 1 else [0] * (num_windows + 1)
        for idx in range(len(lens))
    ]


def window_overlaps(windows0: list[int], w: int, window_start: int, gfw: int, total: int) -> tuple[int, int]:
    """(front_overlap, end_overlap) frame counts for window w
    (reference optim.py:151-156)."""
    front_overlap = windows0[w - 1] + gfw - window_start  # w==0 never masked
    if window_start + gfw >= total:
        end_overlap = (window_start + gfw) % total
    else:
        end_overlap = 0
    return front_overlap, end_overlap


def overlap_grad_mask(gfw: int, w: int, front_overlap: int, end_overlap: int) -> np.ndarray:
    """(gfw, 1, 1, 1) multiplicative gradient mask: 0 on frames already styled
    by previous windows (reference zeroes pastiche.grad there, optim.py:215-219)."""
    mask = np.ones((gfw, 1, 1, 1), np.float32)
    if w != 0:
        fo = max(0, min(front_overlap, gfw))
        mask[:fo] = 0.0
        if end_overlap > 0:
            mask[-min(end_overlap, gfw):] = 0.0
    return mask


__all__ = ["compute_windows", "window_overlaps", "overlap_grad_mask"]
