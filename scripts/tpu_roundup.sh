#!/usr/bin/env bash
# One-shot TPU validation sweep after the axon tunnel returns: parity gate,
# per-segment timings, the RMW-scatter feasibility experiment, and the
# headline bench — sequentially (only ONE process may hold the chip).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== 1/4 tpu_check (pallas-vs-xla parity + fused info) ==="
timeout 1200 python scripts/tpu_check.py --out scripts/tpu_check_last.json

echo "=== 2/4 bench_breakdown (per-segment ms) ==="
timeout 1200 python scripts/bench_breakdown.py

echo "=== 3/4 exp_vmem_scatter (fused-accum feasibility) ==="
timeout 900 python scripts/exp_vmem_scatter.py

echo "=== 4/4 bench (headline) ==="
timeout 1200 python bench.py
