"""Parallelism layer: device meshes + GSPMD shardings.

Replaces the reference's explicit model-parallel activation relays
(models.py:456-566) and hook-based decoder splits (clip_vqgan.py:379-418)
with sharding annotations over a ``jax.sharding.Mesh``:

- **spatial sharding** ("space" axis): the pastiche's H dimension is sharded;
  XLA spatially partitions every conv (inserting halo exchanges over ICI) and
  turns the Gram contraction into a psum — the TPU-native equivalent of the
  reference's pipeline-style layer split.
- **frame parallelism** ("frames" axis): video batches shard over frames —
  the data-parallel axis the reference never had.
- the scaling preset tables name a mesh per resolution instead of GPU ids.

All collectives are inserted by GSPMD from these annotations; nothing in the
framework issues explicit device-to-device copies.
"""

from .mesh import build_mesh, pastiche_sharding_for, sharding_for_video

__all__ = ["build_mesh", "pastiche_sharding_for", "sharding_for_video"]
