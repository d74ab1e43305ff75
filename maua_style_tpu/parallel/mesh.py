"""Mesh construction + sharding policies."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(devices=None, axes: list[tuple[str, int]] | None = None) -> Mesh:
    """Build a Mesh from a device list and ordered (axis, size) pairs.

    Defaults: all devices on a single "space" axis.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if axes is None:
        axes = [("space", len(devices))]
    names = tuple(a for a, _ in axes)
    sizes = tuple(s for _, s in axes)
    n = int(np.prod(sizes))
    return Mesh(np.asarray(devices[:n]).reshape(sizes), names)


def pastiche_sharding_for(args) -> NamedSharding | None:
    """NamedSharding for a (B, H, W, C) pastiche given parsed args, or None
    on a single device.

    Axis mapping: "frames" shards B (video frame parallelism), "space" shards
    H (spatial partitioning of the convs).  This is the policy knob the
    scaling tables use in place of the reference's gpu/multidevice fields.
    """
    devices = getattr(args, "devices", None)
    axes = getattr(args, "mesh_shape", None)
    if not devices or len(devices) < 2:
        return None
    mesh = build_mesh(devices, axes)
    spec_axes = {"frames": 0, "space": 1, "tensor": 3}
    dims: list = [None, None, None, None]
    for axis_name in mesh.axis_names:
        if axis_name in spec_axes and mesh.shape[axis_name] > 1:
            dims[spec_axes[axis_name]] = axis_name
    return NamedSharding(mesh, P(*dims))


def sharding_for_video(mesh: Mesh, frames_axis: str = "frames", space_axis: str | None = "space") -> NamedSharding:
    dims: list = [None, None, None, None]
    if frames_axis in mesh.axis_names:
        dims[0] = frames_axis
    if space_axis and space_axis in mesh.axis_names:
        dims[1] = space_axis
    return NamedSharding(mesh, P(*dims))


__all__ = ["build_mesh", "pastiche_sharding_for", "sharding_for_video"]
