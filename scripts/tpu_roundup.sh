#!/usr/bin/env bash
# One-shot TPU validation sweep after the axon tunnel returns: parity gate,
# per-segment timings (chained; bench_breakdown2), and the headline bench — sequentially (only ONE process may hold the chip).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== 1/3 tpu_check (pallas-vs-xla parity, bench config) ==="
timeout 1200 python scripts/tpu_check.py --out scripts/tpu_check_last.json

echo "=== 2/3 bench_breakdown2 (chained per-segment ms) ==="
timeout 1800 python scripts/bench_breakdown2.py

echo "=== 3/3 bench (headline) ==="
timeout 1200 python bench.py
