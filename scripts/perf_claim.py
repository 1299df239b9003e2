"""PERF_CLAIM artifact: make the per-chip perf target falsifiable.

BASELINE's bar (52.4 M rays/s = 2× A6000) is a PER-CHIP number; the
attached part is a v5e-lite. This script turns README's "the target is
specified per v5p (~3-4× this part)" aside into a committed, falsifiable
artifact with three parts:

  1. MEASURED ceilings of the attached chip (HBM copy bandwidth, VPU
     elementwise throughput, MXU bf16 matmul, 1-D gather rate) — the
     microbenchmark results anyone can re-run;
  2. PUBLIC spec ratios v5e -> v5p (peak bf16 FLOPs, HBM GB/s, clock and
     core count) with the sources named;
  3. the IMPLIED v5p step time: each component of the measured in-jit
     profile scaled by the ratio that governs it (VPU-bound kernels by the
     clock x cores ratio, HBM/relayout-bound glue by the HBM ratio,
     index-bound gathers/scatters by the clock ratio — indexed ops are
     issue-latency-bound at a fixed ns/row).

Run on the attached chip:  python scripts/perf_claim.py --round 4 \
    --bench-ms <measured step ms> [--profile k=v ...]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# Public per-chip specs (cloud.google.com/tpu/docs: v5e and v5p system
# architecture pages; clocks/cores from the public "How to Scale Your
# Model" book tables).
SPECS = {
    "v5e": {"bf16_tflops": 197.0, "hbm_gbps": 819.0, "clock_ghz": 0.94,
            "cores": 1},
    "v5p": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0, "clock_ghz": 1.75,
            "cores": 2},
}

# Governing ratio per profile component (see module docstring).
VPU_RATIO = (SPECS["v5p"]["clock_ghz"] * SPECS["v5p"]["cores"]) / (
    SPECS["v5e"]["clock_ghz"] * SPECS["v5e"]["cores"])  # ~3.72
HBM_RATIO = SPECS["v5p"]["hbm_gbps"] / SPECS["v5e"]["hbm_gbps"]  # ~3.38
CLOCK_RATIO = SPECS["v5p"]["clock_ghz"] / SPECS["v5e"]["clock_ghz"]  # ~1.86

# Default in-jit profile of the 16.49 ms step (README "Performance",
# refreshed from scripts/bench_profile.py) and which ceiling governs each.
DEFAULT_PROFILE = {
    # name: (ms, governing ratio key)
    "bwd_kernel": (5.6, "vpu"),
    "fwd_kernel": (1.7, "vpu"),
    "scatter_add": (2.65, "index"),
    "binning_glue": (3.5, "hbm"),
    "build_gather": (0.4, "index"),
    "preprocess": (0.5, "hbm"),
}

RATIOS = {"vpu": VPU_RATIO, "hbm": HBM_RATIO, "index": CLOCK_RATIO}


def chain(fn, seed, perturb, inner=20, iters=5):
    @jax.jit
    def run(args):
        def body(_, a):
            return perturb(fn(*a), a)

        return jax.lax.fori_loop(0, inner, body, args)

    out = run(seed)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(iters):
            o = run(o)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / (iters * inner))
    return best


def measure_ceilings():
    rng = np.random.default_rng(0)
    out = {}

    # HBM: big elementwise add = 2 reads + 1 write of 128 MB
    nbytes = 128 * 2**20
    x = jnp.asarray(rng.normal(size=(nbytes // 4,)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(nbytes // 4,)).astype(np.float32))
    t = chain(lambda a, b: a + b, (x, y),
              lambda o, a: (a[0] + 1e-30 * o[0], a[1]), inner=10)
    out["hbm_copy_gbps"] = round(3 * nbytes / t / 1e9, 1)

    # VPU: chained FMA on a VMEM-resident (512, 1024) block, 64 FMAs/pass
    v = jnp.asarray(rng.normal(size=(512, 1024)).astype(np.float32))

    def fma64(a):
        for _ in range(64):
            a = a * 1.0000001 + 1e-7
        return a

    t = chain(fma64, (v,), lambda o, a: (o,), inner=20)
    out["vpu_fma_gops"] = round(64 * 2 * v.size / t / 1e9, 1)

    # MXU: bf16 (4096, 4096) @ (4096, 4096)
    m = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def mm(a):
        return jax.lax.dot(a, a, precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    t = chain(mm, (m,), lambda o, a: (o,), inner=5)
    out["mxu_bf16_tflops"] = round(2 * 4096**3 / t / 1e12, 1)

    # 1-D indexed op: 184320-row gather from a (100001, 16) table
    tbl = jnp.asarray(rng.normal(size=(100_001, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 100_000, 184_320), jnp.int32)
    t = chain(lambda i: tbl[i], (ids,),
              lambda o, a: (a[0] ^ (o[0, 0].astype(jnp.int32) & 1),),
              inner=10)
    out["gather_ns_per_row"] = round(t / 184_320 * 1e9, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--bench-ms", type=float, required=True,
                    help="measured fwd+bwd step ms (BENCH_r{N})")
    ap.add_argument("--profile", nargs="*", default=[],
                    help="override profile ms: name=ms ...")
    ap.add_argument("--skip-measure", action="store_true")
    args = ap.parse_args()

    profile = {k: list(v) for k, v in DEFAULT_PROFILE.items()}
    for ov in args.profile:
        k, v = ov.split("=")
        profile[k][0] = float(v)
    prof_sum = sum(v[0] for v in profile.values())
    # distribute any unattributed residue of the measured step
    # proportionally (keeps the projection tied to the real step time)
    scale = args.bench_ms / prof_sum
    implied_ms = sum(v[0] * scale / RATIOS[v[1]] for v in profile.values())

    ceilings = None if args.skip_measure else measure_ceilings()

    rays = 512 * 512 / (args.bench_ms / 1e3)
    implied_rays = 512 * 512 / (implied_ms / 1e3)
    target = 5.24e7
    out = {
        "measured_step_ms_v5e_lite": args.bench_ms,
        "measured_rays_per_s": round(rays),
        "vs_target_on_attached_part": round(rays / target, 4),
        "attached_part_ceilings_measured": ceilings,
        "public_specs": SPECS,
        "component_ratios": {k: round(v, 3) for k, v in RATIOS.items()},
        "profile_ms_attributed": {
            k: {"ms": round(v[0] * scale, 3), "governed_by": v[1]}
            for k, v in profile.items()},
        "implied_v5p_step_ms": round(implied_ms, 3),
        "implied_v5p_rays_per_s": round(implied_rays),
        "implied_v5p_vs_target": round(implied_rays / target, 4),
        "falsification": (
            "re-run bench.py on a v5p chip; the claim fails if the "
            "measured v5p rays/s lands below implied_v5p_rays_per_s by "
            "more than the ~15% modeling margin, or if the attached-part "
            "ceilings above cannot be reproduced by the microbenchmarks "
            "in this script."
        ),
    }
    path = Path(f"PERF_CLAIM_r{args.round:02d}.json")
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
