"""Structured run-state checkpointing (SURVEY.md §5).

The reference's only resume mechanism is artifact files — optimizer state is
lost on restart (optim.py never saves it).  Here long optimisations can
additionally checkpoint (pastiche, optimizer state, window index, iteration)
via orbax, so an interrupted L-BFGS run resumes with its curvature history
intact instead of re-warming from pixels alone.

Artifact-file resume (the reference-compatible mechanism) remains the
default; this is opt-in via StyleEngine.optimize(run_checkpoint=dir).
"""

from __future__ import annotations

import os
import shutil

import numpy as np


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer(), os.path.abspath(path)


def save_state(path: str, pastiche, opt_state, window: int, done_iters: int) -> None:
    checkpointer, path = _ckpt(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    state = {
        "pastiche": pastiche,
        "opt_state": opt_state,
        "window": np.int64(window),
        "done_iters": np.int64(done_iters),
    }
    checkpointer.save(tmp, state)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def load_state(path: str, like_pastiche, like_opt_state):
    """Restore (pastiche, opt_state, window, done_iters), or None if absent.

    ``like_*`` provide the target pytree structure/shapes."""
    if not os.path.exists(path):
        return None
    checkpointer, path = _ckpt(path)
    template = {
        "pastiche": like_pastiche,
        "opt_state": like_opt_state,
        "window": np.int64(0),
        "done_iters": np.int64(0),
    }
    try:
        state = checkpointer.restore(path, item=template)
    except Exception as e:
        print(f"Warning: could not restore run checkpoint {path}: {e}")
        return None
    return state["pastiche"], state["opt_state"], int(state["window"]), int(state["done_iters"])


__all__ = ["save_state", "load_state"]
