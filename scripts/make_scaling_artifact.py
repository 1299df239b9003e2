"""Assemble SCALING_r{N}.json from bench_sharded runs.

Usage:
    python scripts/make_scaling_artifact.py --round 3 \
        --cpu-log /tmp/sharded_cpu.log --tpu-log /tmp/sharded_tpu.log

Each log holds one JSON line per mesh layout (bench_sharded.py output).
The artifact records both the real-chip 1-device rate and the virtual
8-CPU-mesh overhead shape (BASELINE.md's >=2-host efficiency target has no
multi-chip hardware to run on in this environment; the virtual mesh
measures the sharding/collective overhead shape, not ICI bandwidth).
"""

import argparse
import json
from pathlib import Path


def parse_log(path):
    rows = []
    if not path or not Path(path).exists():
        return rows
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--cpu-log", default=None)
    ap.add_argument("--tpu-log", default=None)
    args = ap.parse_args()

    artifact = {
        "note": (
            "Single real TPU chip attached (axon tunnel): 'tpu' is the "
            "1-device mesh train-step rate; 'virtual_cpu_mesh' is the "
            "8-device forced-host-platform run measuring the shard_map/"
            "collective overhead SHAPE (virtual devices share one host's "
            "cores, so 'efficiency' there is not ICI efficiency). "
            "BASELINE.md's >=85%-at-2-hosts criterion needs real multi-"
            "chip hardware; the dryrun_multichip gate (MULTICHIP_r*.json) "
            "plus test_parallel.py's pmean-exact update checks validate "
            "the sharded program itself."
        ),
        "tpu": parse_log(args.tpu_log),
        "virtual_cpu_mesh": parse_log(args.cpu_log),
    }
    out = Path(f"SCALING_r{args.round:02d}.json")
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
