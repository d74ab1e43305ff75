"""Feasibility probe: AOT-compile the sharded style step for a multi-chip
TPU topology without owning the chips (jax.experimental.topologies).

If this works on a given box, configs/max-sizes-*-{2,4,8}chip.json can be
generated with REAL TPU memory analysis (method "analysis") instead of the
virtual-CPU-mesh fallback, whose layouts differ from the TPU backend's.

Usage: python tools/probe_aot_topology.py [--topology v5e:2x2] [--devices 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    from jax.experimental import topologies

    try:
        topo = topologies.get_topology_desc(args.topology, "tpu")
    except Exception as e:  # noqa: BLE001
        print(f"get_topology_desc({args.topology!r}) failed: {type(e).__name__}: {e}")
        for name in ("v5e:2x2", "v5litepod-4", "tpu_v5_lite", ""):
            try:
                topo = topologies.get_topology_desc(name, "tpu")
                print(f"  ...but {name!r} worked: {len(topo.devices)} devices")
                break
            except Exception as e2:  # noqa: BLE001
                print(f"  {name!r}: {type(e2).__name__}: {e2}")
        else:
            return
    print(f"topology: {len(topo.devices)} devices")

    from maua_style_tpu.tuning.max_sizes import _compiled_step_bytes

    n = min(args.devices, len(topo.devices))
    bytes_ = _compiled_step_bytes("vgg19", "adam", args.size, devices=n, topology=topo)
    print(f"vgg19+adam@{args.size} over {n} AOT devices: {bytes_ / 1024**3:.2f} GiB/chip")


if __name__ == "__main__":
    main()
