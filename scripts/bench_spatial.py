"""Stage-1 (HumanEdit) train-step benchmark at production scale.

Constructs the spatial geometry-edit trainer at the reference's operating
point — 512×512 renders, grid_res 64, production field/budget defaults,
`geometry-edit.yaml` hyperparameters — with the stub diffusion prior (the
SDS UNet is a frozen external model whose cost depends on the mounted
weights; this measures the FRAMEWORK's per-step cost: partitioned
isosurface extraction through the live hash-grid field, compaction + 8×
subdivision, differentiable mesh raster at 512² local+global, SDS loss
plumbing, recon/control SDF losses over 30k sampled points, AdamW).

The reference runs this loop 10,000 times per edit (`geometry-edit.yaml:76`)
on an A6000; steps/s here bounds the stage-1 wall clock on TPU.

`--guidance sd15-random-full` swaps in a production-shape SD1.5
(random weights, bf16) so the UNet-inclusive step cost is also on record.

Prints one JSON line (same shape as bench.py); the committed artifact is
SPATIAL_BENCH_r{N}.json.
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

from youreditableavatar_tpu.data.camera_sampler import RandomCameraConfig
from youreditableavatar_tpu.guidance import (
    SDSConfig,
    SDSGuidance,
    StubDiffusionPrior,
    StubPromptEncoder,
)
from youreditableavatar_tpu.guidance.prompts import PromptProcessor
from youreditableavatar_tpu.models.geometry import TetGeometry
from youreditableavatar_tpu.models.sdf import SDFField, SDFFieldConfig
from youreditableavatar_tpu.ops.mesh_raster import MeshRasterConfig
from youreditableavatar_tpu.stages.spatial import (
    HumanEditConfig,
    HumanEditTrainer,
)

GRID_RES = 64
HW = 512
WARM_STEPS = 6  # compiles both the local and global step functions
TIME_STEPS = 30


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def make_prior(name: str):
    """Guidance backends for the bench.

    "stub" measures the FRAMEWORK step (UNet excluded — the reference's
    frozen SD1.5 is an external model). "sd15-random-full" instantiates the
    PRODUCTION-SHAPE SD1.5 (SD15_UNET + SD_VAE + SD15_CLIP, random weights,
    bf16 — the TPU analog of the reference's fp16 guidance,
    `tetgs_spatial/models/guidance/sds_du_guidance.py:49-74` weights_dtype)
    so the UNet-inclusive per-step cost is measured on-chip even
    though real checkpoints cannot be mounted in this zero-egress
    environment (weights don't change FLOPs).
    """
    if name == "stub":
        return StubDiffusionPrior(), StubPromptEncoder(), "stub (UNet cost excluded)"
    assert name == "sd15-random-full"
    from youreditableavatar_tpu.guidance.clip_text import (
        SD15_CLIP,
        init_clip_text_params,
    )
    from youreditableavatar_tpu.guidance.sd15 import (
        CLIPPromptEncoder,
        SD15Prior,
    )
    from youreditableavatar_tpu.guidance.sd_unet import (
        SD15_UNET,
        init_unet_params,
    )
    from youreditableavatar_tpu.guidance.sd_vae import SD_VAE, init_vae_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    log("initializing full-size SD1.5 (random weights, bf16)")
    prior = SD15Prior(
        init_unet_params(k1, SD15_UNET),
        init_vae_params(k2, SD_VAE),
        SD15_UNET,
        SD_VAE,
        dtype=jnp.bfloat16,
    )
    enc = CLIPPromptEncoder(init_clip_text_params(k3, SD15_CLIP), SD15_CLIP)
    return prior, enc, "sd15-random-full (production-shape UNet+VAE, bf16)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--guidance",
        choices=["stub", "sd15-random-full"],
        default="stub",
    )
    ap.add_argument("--steps", type=int, default=TIME_STEPS)
    ap.add_argument(
        "--start-step", type=int, default=0,
        help="measure from this global step (the progressive level "
        "curriculum makes step cost step-dependent: 8 active hash levels "
        "at step 0, all 16 from step 8000 of the reference's 10k budget)")
    args = ap.parse_args()

    field = SDFField(SDFFieldConfig(sdf_bias="sphere", sdf_bias_radius=0.45))
    params = field.init_params(jax.random.PRNGKey(0))
    geometry = TetGeometry(field, GRID_RES)
    log("field + geometry built")

    mt = geometry.isosurface(params)
    log(f"isosurface: {int(mt.num_verts)} verts {int(mt.num_faces)} faces")
    fc = np.asarray(mt.verts)[np.asarray(mt.faces)].mean(1)
    edit_faces = jnp.asarray(fc[:, 2] > 0.1) & mt.faces_valid
    part = geometry.partition_init(params, edit_faces, frozen_mt=mt)
    log("partition_init done")

    prior, enc, guidance_desc = make_prior(args.guidance)
    guidance = SDSGuidance(prior, SDSConfig(guidance_scale=7.5))
    prompts = PromptProcessor(
        "a red down jacket", "low quality", enc,
        cache_dir="/tmp/bench_prompt_cache",
        model_name=f"bench-{args.guidance}",
    )
    cfg = HumanEditConfig(
        camera=RandomCameraConfig(height=HW, width=HW),
    )
    trainer = HumanEditTrainer(
        field, geometry, part, params, guidance, prompts, prompts, cfg,
        MeshRasterConfig(),
    )
    trainer.global_step = args.start_step
    log(f"trainer built (start step {args.start_step})")

    time_steps = args.steps
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, WARM_STEPS + time_steps)
    for k in range(WARM_STEPS):
        trainer.train_step(keys[k])
        log(f"warm step {k} done")

    t0 = time.perf_counter()
    for k in range(time_steps):
        trainer.train_step(keys[WARM_STEPS + k])
    dt = (time.perf_counter() - t0) / time_steps

    losses = [m["loss"] for m in trainer.metrics[-time_steps:]]
    assert all(np.isfinite(v) for v in losses), "non-finite loss in bench"
    print(
        json.dumps(
            {
                "metric": "spatial_edit_steps_per_s_512",
                "value": 1.0 / dt,
                "unit": "steps/s",
                "detail": {
                    "step_ms": dt * 1e3,
                    "start_step": args.start_step,
                    "grid_res": GRID_RES,
                    "image_hw": HW,
                    "guidance": guidance_desc,
                    "mesh_raster_backend": MeshRasterConfig().backend,
                    "reference_budget_steps": 10000,
                    "projected_stage1_minutes": 10000 * dt / 60.0,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
