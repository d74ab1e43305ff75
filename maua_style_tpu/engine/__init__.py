"""The optimisation engine: jit-compiled pixel/latent optimisation.

Equivalent of the reference's optim.py, redesigned for XLA: target capture,
loss evaluation, gradient computation and the optimiser update fuse into one
compiled step that runs as a ``lax.scan`` on device — no per-iteration host
round-trips (the reference syncs `.item()` every iteration, optim.py:210).
"""

from .lbfgs import lbfgs
from .optimize import StyleEngine

__all__ = ["lbfgs", "StyleEngine"]
