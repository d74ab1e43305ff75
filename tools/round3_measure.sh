#!/bin/bash
# Round-3 on-chip measurement battery (run on an IDLE machine when the TPU
# tunnel is up; concurrent CPU load contaminates tunnel-fed numbers 5-60x).
#
# Produces, in order:
#   /tmp/r3/bench.json          — both north-star metrics (adam/lbfgs MP-it/s + video fpm)
#   /tmp/r3/img_vid.json        — img_vid temporal-window MP-it/s (VERDICT r2 item 9)
#   /tmp/r3/startup_{1,2}.log   — CLIP+VQGAN time-to-first-iteration, cold process × 2
#                                  (2nd run is the warm-cache figure, target < 90 s)
#   /tmp/r3/nca.json            — NCA training steps/sec
# Each stage is bounded so a tunnel drop mid-battery doesn't wedge the run.
set -u
mkdir -p /tmp/r3
cd "$(dirname "$0")/.."

echo "=== bench.py (default: adam + lbfgs + video) ==="
timeout 3600 python bench.py | tee /tmp/r3/bench.json

echo "=== bench.py --img-vid --no-video ==="
timeout 3600 python bench.py --img-vid --no-video | tee /tmp/r3/img_vid.json

echo "=== CLIP+VQGAN startup (run 1: populates persistent cache) ==="
timeout 1800 python tools/bench_startup.py 2>&1 | tee /tmp/r3/startup_1.log
echo "=== CLIP+VQGAN startup (run 2: warm cache — the reported figure) ==="
timeout 1800 python tools/bench_startup.py 2>&1 | tee /tmp/r3/startup_2.log

echo "=== NCA training steps/sec ==="
timeout 1800 python tools/bench_nca.py | tee /tmp/r3/nca.json

echo "=== battery done ==="
