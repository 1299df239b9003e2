"""Scaling benchmark: sharded render train-step rays/s vs device count.

BASELINE.md's scaling metric (rays/s at 1 chip / 1 host / >=2 hosts, >=85%
efficiency) measured with whatever devices are attached: on the single-chip
axon tunnel this times the 1-device mesh; with
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8` it
measures virtual-mesh scaling shape (compile/collective overheads, not real
ICI bandwidth); on a real pod slice, run per host after
`parallel.distributed_init()`.

Prints one JSON line per mesh layout with rays/s and efficiency vs the
1-device run.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# The image's sitecustomize force-registers the remote axon TPU backend and
# overrides JAX_PLATFORMS from the environment — re-apply the env choice so
# `JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`
# really runs the virtual CPU mesh (and doesn't steal the TPU claim).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from youreditableavatar_tpu.models.optimizer import (
    OptimizationParams,
    make_tetgs_optimizer,
)
from youreditableavatar_tpu.models.tetgs import build_tetgs, gaussian_arrays
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
    render_gaussians,
)
from youreditableavatar_tpu.ops.marching_tets import make_tet_grid, marching_tets
from youreditableavatar_tpu.parallel import (
    distributed_init,
    make_mesh,
    make_sharded_render_train_step,
)

def scene(res=16):
    gv, gt = make_tet_grid(res)
    pos = jnp.asarray(gv)
    sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
    mt = marching_tets(pos, sdf, jnp.asarray(gt), 16384, 32768)
    nv, nf = int(mt.num_verts), int(mt.num_faces)
    verts = np.asarray(mt.verts)[:nv]
    faces = np.asarray(mt.faces)[np.asarray(mt.faces_valid)][:nf]
    colors = np.clip(0.5 + 0.4 * verts / 0.35, 0, 1)
    return build_tetgs(verts, faces, colors, sh_levels=2)


def main():
    global H, W, ITERS
    distributed_init()
    n_dev = jax.device_count()
    on_tpu = jax.default_backend() == "tpu"
    # CPU (virtual-mesh shape check): small config so the scan backend
    # finishes in seconds; TPU: realistic sizes.
    H = W = 256 if on_tpu else 64
    ITERS = 10 if on_tpu else 3
    binding, params = scene(16 if on_tpu else 10)
    cfg = RasterizeConfig(
        backend="pallas" if on_tpu else "xla",
        pallas_interpret=False,
        pair_budget=1 << (16 if on_tpu else 13),
        tile_capacity=2048 if on_tpu else 512, sh_degree=1,
    )
    tx = make_tetgs_optimizer(OptimizationParams(), 1.0)

    def batch_for(nviews):
        cams = []
        for k in range(nviews):
            vm = np.eye(4, dtype=np.float32)
            az = 2 * np.pi * k / nviews
            vm[:3, :3] = np.array(
                [[np.cos(az), 0, np.sin(az)], [0, 1, 0],
                 [-np.sin(az), 0, np.cos(az)]], np.float32)
            vm[2, 3] = 2.0
            cams.append(RasterCamera.from_fov(vm, 0.8, 0.8, W, H))
        means, scales, quats, opac, sh = gaussian_arrays(binding, params)
        imgs = [
            np.asarray(render_gaussians(
                means, scales, quats, opac, sh, c, cfg, jnp.zeros(3)
            )["image"]) * 0.7 + 0.1
            for c in cams
        ]
        return {
            "viewmats": jnp.stack([c.viewmat for c in cams]),
            "fx": jnp.stack([c.fx for c in cams]),
            "fy": jnp.stack([c.fy for c in cams]),
            "cx": jnp.stack([c.cx for c in cams]),
            "cy": jnp.stack([c.cy for c in cams]),
            "images": jnp.asarray(np.stack(imgs)),
        }

    layouts = [(1, 1)]
    if n_dev >= 2:
        # 2-device points isolate the first collective hop (the marginal
        # cost of going sharded at all) from the full-mesh points.
        layouts += [(2, 1), (1, 2)]
    if n_dev >= 4:
        layouts += [(n_dev // 2, 2), (n_dev, 1)]
    base_rate = None
    for data, tile in layouts:
        if data * tile > n_dev:
            continue
        mesh = make_mesh((data, tile))
        # NOTE: make_sharded_render_train_step returns an already-jitted
        # step; re-wrapping it in jax.jit forces the inner executable to be
        # re-dispatched through the outer trace every call (~500× slower on
        # the remote-TPU path).
        step = make_sharded_render_train_step(
            binding, tx, cfg, mesh, H, W, bg=jnp.zeros(3))
        # Commit inputs with the step's own in/out shardings BEFORE warmup:
        # otherwise the first post-warmup call sees host-committed arrays
        # (different shardings → a SECOND compile lands inside the timed
        # loop — ~100 s over the axon tunnel, swamping the average).
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        p2 = jax.device_put(params, rep)
        opt = jax.device_put(tx.init(params), rep)
        batch = jax.device_put(
            batch_for(data), NamedSharding(mesh, P("data")))
        # Two warmup steps: the first compiles for the device_put inputs,
        # the second for the step's own outputs (their layouts/shardings can
        # differ from the host-committed arrays → a second executable; over
        # the axon tunnel that compile is ~45 s and must not be timed).
        p2, opt, loss, _ = step(p2, opt, batch)
        p2, opt, loss, _ = step(p2, opt, batch)
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p2, opt, loss, _ = step(p2, opt, batch)
        jax.block_until_ready(p2)
        dt = (time.perf_counter() - t0) / ITERS
        rays = data * H * W / dt
        if base_rate is None:
            base_rate = rays
        print(json.dumps({
            "mesh": {"data": data, "tile": tile},
            "rays_per_s": rays,
            "step_ms": dt * 1e3,
            "efficiency_vs_1dev": rays / (base_rate * data * tile),
            "devices": n_dev,
            "backend": cfg.backend,
        }))


if __name__ == "__main__":
    main()
