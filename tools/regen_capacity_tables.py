"""Regenerate configs/max-sizes-16GB-{1,2,4,8}chip.json in ANALYSIS mode.

Each safe/true size is verified by a real XLA TPU compile (AOT against a
v5e topology via jax.experimental.topologies — no chips needed) whose
buffer-assignment memory analysis is compared to the per-chip HBM budget.
A fresh analytic estimate seeds each probe bracket so most combos cost two
compiles (~25-60 s each at minimal scheduling effort).

The tables reflect the SERVING config: bf16 activations and bf16 L-BFGS
histories (engine/optimize.py), matching what bench.py measures.

Usage: python tools/regen_capacity_tables.py [--devices 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--hbm_gb", type=float, default=16.0)
    args = ap.parse_args()

    from jax.experimental import topologies

    from maua_style_tpu.tuning.max_sizes import probe_max_sizes

    topo = topologies.get_topology_desc(args.topology, "tpu")
    budget = int(args.hbm_gb * 1024 ** 3)

    for n in [int(d) for d in args.devices.split(",")]:
        t0 = time.time()
        seed = probe_max_sizes(method="estimate", devices=n, budget_bytes=budget, verbose=False)
        table = probe_max_sizes(
            method="analysis",
            devices=n,
            budget_bytes=budget,
            seed_table=seed,
            topology=topo,
            topology_name=args.topology,
            verbose=True,
        )
        out = f"configs/max-sizes-{round(args.hbm_gb)}GB-{n}chip.json"
        with open(out, "w") as f:
            json.dump(table, f, indent=2)
        print(f"wrote {out} in {(time.time() - t0) / 60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
