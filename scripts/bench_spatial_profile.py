"""Op-level device profile of the stage-1 edit step (see bench_spatial.py).

Builds the production-scale trainer once, warms both step variants, then
traces a few steps and prints the top device ops by time with their HLO
long names + source lines — the same methodology as bench_profile.py.
"""

import collections
import glob
import gzip
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# Persistent compile cache: the production-scale step compiles for ~10 min
# over the tunnel; cache serialized executables so reruns start in seconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import bench_spatial as bs  # noqa: E402  (reuses the exact bench wiring)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from youreditableavatar_tpu.data.camera_sampler import (  # noqa: E402
    RandomCameraConfig,
)
from youreditableavatar_tpu.guidance import (  # noqa: E402
    SDSConfig,
    SDSGuidance,
    StubDiffusionPrior,
    StubPromptEncoder,
)
from youreditableavatar_tpu.guidance.prompts import PromptProcessor  # noqa: E402
from youreditableavatar_tpu.models.geometry import TetGeometry  # noqa: E402
from youreditableavatar_tpu.models.sdf import (  # noqa: E402
    SDFField,
    SDFFieldConfig,
)
from youreditableavatar_tpu.ops.mesh_raster import MeshRasterConfig  # noqa: E402
from youreditableavatar_tpu.stages.spatial import (  # noqa: E402
    HumanEditConfig,
    HumanEditTrainer,
)


def main():
    field = SDFField(SDFFieldConfig(sdf_bias="sphere", sdf_bias_radius=0.45))
    params = field.init_params(jax.random.PRNGKey(0))
    geometry = TetGeometry(field, bs.GRID_RES)
    bs.log("field + geometry built")
    mt = geometry.isosurface(params)
    bs.log(f"isosurface: {int(mt.num_verts)} verts")
    fc = np.asarray(mt.verts)[np.asarray(mt.faces)].mean(1)
    edit_faces = jnp.asarray(fc[:, 2] > 0.1) & mt.faces_valid
    part = geometry.partition_init(params, edit_faces, frozen_mt=mt)
    bs.log("partition_init done")

    guidance = SDSGuidance(StubDiffusionPrior(), SDSConfig(guidance_scale=7.5))
    prompts = PromptProcessor(
        "a red down jacket", "low quality", StubPromptEncoder(),
        cache_dir="/tmp/bench_prompt_cache", model_name="stub-bench",
    )
    trainer = HumanEditTrainer(
        field, geometry, part, params, guidance, prompts, prompts,
        HumanEditConfig(camera=RandomCameraConfig(height=bs.HW, width=bs.HW)),
        MeshRasterConfig(),
    )
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    for k in range(6):
        trainer.train_step(keys[k])
        bs.log(f"warm step {k} done")

    tmp = tempfile.mkdtemp(prefix="spatialprof")
    n_prof = 3
    t0 = time.perf_counter()
    with jax.profiler.trace(tmp):
        for k in range(n_prof):
            trainer.train_step(keys[6 + k])
    wall = (time.perf_counter() - t0) / n_prof
    bs.log(f"traced {n_prof} steps, {wall * 1e3:.0f} ms/step wall")

    files = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {tmp}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    proc, thr = {}, {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thr[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    per, n_ev, op_args = collections.Counter(), collections.Counter(), {}
    for e in events:
        tname = thr.get((e["pid"], e.get("tid")), "")
        pname = proc.get(e["pid"], "")
        if "Ops" not in tname:
            continue
        if "TPU" not in pname and "Device" not in pname:
            continue
        per[e["name"]] += e.get("dur", 0)
        n_ev[e["name"]] += 1
        if e.get("args") and e["name"] not in op_args:
            op_args[e["name"]] = e["args"]
    total = sum(per.values())
    print(f"total device op time: {total/1e3/n_prof:.1f} ms/step")
    for name, us in per.most_common(30):
        print(f"{us/1e3/n_prof:9.3f} ms  n={n_ev[name]:4d}  {name[:90]}")
        a = op_args.get(name, {})
        for k in ("long_name", "source"):
            if k in a:
                print(f"           | {k}: {str(a[k])[:220]}")


if __name__ == "__main__":
    main()
