"""Feature-extractor model zoo (reference: models.py).

Models are *specs + parameter pytrees*, not stateful modules: ``apply`` is a
pure function returning a dict of named activations, which the loss layer and
the jitted optimisation engine consume.  No loss modules are spliced into the
network — that reference pattern (models.py:351-453) is replaced by pure
functions over the activation dict.
"""

from .extractor import ExtractorSpec, apply_extractor, init_params, truncate_spec
from .registry import select_model, load_params, MODEL_NAMES

__all__ = [
    "ExtractorSpec",
    "apply_extractor",
    "init_params",
    "truncate_spec",
    "select_model",
    "load_params",
    "MODEL_NAMES",
]
