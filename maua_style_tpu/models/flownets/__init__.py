"""Optical-flow estimators in JAX (replacing the reference's sniklaus
submodules, SURVEY.md §2.2): SPyNet, PWC-Net, UnFlow (FlowNetC), LiteFlowNet.

All are inference-only, NHWC, and consume RGB images in [0, 1].  Checkpoints:
native .npz pytrees or converted torch state dicts; without weights a
deterministic init keeps the pipeline runnable (flow quality then comes from
the multi-model ensemble average being ~zero — functional, not accurate).
"""

from .common import backward_warp
from .spynet import SPyNet
from .pwc import PWCNet
from .unflow import UnFlow
from .liteflownet import LiteFlowNet

__all__ = ["backward_warp", "SPyNet", "PWCNet", "UnFlow", "LiteFlowNet"]
