#!/bin/bash
# Round-4 TPU measurement sweep — run ON AN OTHERWISE-IDLE host, one TPU
# process at a time (CLAUDE.md: never bench while the CPU suite runs; never
# kill an active TPU process).
#
#   bash scripts/r4_tpu_sweep.sh [outdir]
#
# Produces, in order of importance:
#   bench_shelf.json       — the driver headline (Shelf 300f end-to-end)
#   bench_scaled.json      — scaled rigs + the r4 wide-rig IK levers
#   bench_detect.json      — detection paths incl. the new upload-overlap
#   bench_streaming.json   — micro-batched streaming (regression check)
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r4_tpu}"
mkdir -p "$OUT"

echo "=== bench.py (Shelf) ===" >&2
timeout 3000 python bench.py | tee "$OUT/bench_shelf.json"

echo "=== bench_scaled --ik-levers ===" >&2
timeout 5400 python scripts/bench_scaled.py --ik-levers \
    | tee "$OUT/bench_scaled.json"

echo "=== bench_detect ===" >&2
timeout 3000 python scripts/bench_detect.py | tee "$OUT/bench_detect.json"

echo "=== bench_streaming ===" >&2
timeout 3000 python scripts/bench_streaming.py \
    | tee "$OUT/bench_streaming.json"

echo "sweep done -> $OUT" >&2
