"""Capacity autotuning (reference: max-sizes.py)."""

from .max_sizes import probe_max_sizes, estimate_step_bytes

__all__ = ["probe_max_sizes", "estimate_step_bytes"]
