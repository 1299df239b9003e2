"""On-device op-level profile of the bench fwd+bwd step (jax.profiler).

Captures a trace of a few chained bench iterations on the attached TPU and
prints the top ops by total device time, grouped by a coarse stage label.
Unlike scripts/bench_breakdown.py (isolated per-stage jits, each billed
~1-3 ms dispatch), these are true in-jit device times.
"""

import collections
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from bench import make_scene, WIDTH, HEIGHT, N
import jax.numpy as jnp
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterizeConfig,
    render_gaussians,
)


def main():
    cfg = RasterizeConfig(backend="pallas", pair_budget=1440 * 128,
                          tile_capacity=8192, sh_degree=3)
    means, scales, quats, opac, sh, cam = make_scene()
    bg = jnp.zeros(3)

    def loss(m, s, q, o, c):
        out = render_gaussians(m, s, q, o, c, cam, cfg, bg)
        return jnp.mean(out["image"] ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def steps(p):
        def body(_, p):
            g = grad_fn(*p)
            return tuple(x - 1e-12 * gx for x, gx in zip(p, g))

        return jax.lax.fori_loop(0, 5, body, p)

    p = (means, scales, quats, opac, sh)
    p = steps(p)
    jax.block_until_ready(p)

    tmp = tempfile.mkdtemp(prefix="benchprof")
    with jax.profiler.trace(tmp):
        for _ in range(4):
            p = steps(p)
        jax.block_until_ready(p)

    files = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {tmp}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # Device-side events: pick the TPU op track (pid whose process name
    # mentions TPU/device and thread named "XLA Ops" or similar).
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    proc_names = {}
    thread_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    per_op = collections.Counter()
    n_ev = collections.Counter()
    op_args = {}
    for e in events:
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        pname = proc_names.get(e["pid"], "")
        if "XLA Ops" not in tname and "Ops" not in tname:
            continue
        if "TPU" not in pname and "tpu" not in pname and "Device" not in pname:
            continue
        per_op[e["name"]] += e.get("dur", 0)
        n_ev[e["name"]] += 1
        if e.get("args") and e["name"] not in op_args:
            op_args[e["name"]] = e["args"]

    total_us = sum(per_op.values())
    n_iters = 20  # 4 dispatches x 5 inner
    print(f"total device op time: {total_us/1e3:.2f} ms over {n_iters} iters "
          f"=> {total_us/1e3/n_iters:.3f} ms/iter")
    print(f"{'ms/iter':>8}  {'#ev':>5}  op")
    for name, us in per_op.most_common(40):
        print(f"{us/1e3/n_iters:8.3f}  {n_ev[name]:5d}  {name[:110]}")
        args = op_args.get(name, {})
        for k, v in args.items():
            print(f"          | {k}: {str(v)[:240]}")


if __name__ == "__main__":
    main()
