#!/usr/bin/env python
"""Spatial-stage CLI (reference surface: `train_spatial.py:57-248`).

Modes (mirroring the reference's --train/--validate/--test/--export
dispatch):
  --train with a geometry-init config: SDF shape initialization from the
    body mesh (reference `configs/geometry-init.yaml`, max_steps=0) and
    `init_mesh.npy` export.
  --train with a geometry-edit config (+ --region editing_region_info.npy):
    localized SDS editing; --export writes `edit_mesh.npy`.
  --validate / --test: turntable normal renders of a checkpoint
    (reference `train_spatial.py:205-210` val/test splits; --test renders
    the full 60-view circle, --validate a sparser 8-view probe).

Guidance backend (--guidance): "stub" runs weight-free, "sd15-random" runs
the full JAX SD1.5 code path with tiny random weights, "sd15" loads real
diffusers-format weights from --sd-weights.
"""

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--validate", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--export", action="store_true")
    p.add_argument("--region", default=None,
                   help="editing_region_info.npy for the edit mode")
    p.add_argument("--mesh", default=None,
                   help="body mesh (.npy dict or .ply) for shape init")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir for --validate/--test")
    p.add_argument("--guidance", default="stub",
                   choices=["stub", "sd15", "sd15-random"])
    p.add_argument("--sd-weights", default=None,
                   help="diffusers layout dir (unet/ vae/ text_encoder/)")
    p.add_argument("--out", default="outputs/spatial")
    p.add_argument("--typecheck", action="store_true",
                   help="runtime checks: nan-debugging + jax checks "
                        "(reference --typecheck, train_spatial.py:83-86)")
    p.add_argument("--gradio", action="store_true",
                   help="write a single-line progress file for UI "
                        "frontends (reference --gradio progress callback)")
    p.add_argument("--init-debug", action="store_true",
                   help="export the SDF-init meshes for inspection "
                        "(reference init_debug, implicit_sdf.py:332-361)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from youreditableavatar_tpu.utils.misc import apply_platform_env

    apply_platform_env()
    if args.typecheck:
        import jax

        # The reference installs a jaxtyping+typeguard import hook; the JAX
        # equivalents are tracer-level: fail fast on NaNs and enable the
        # internal invariant checks (torch.autograd anomaly-mode analog).
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_enable_checks", True)

    from youreditableavatar_tpu.cli.pipeline import (
        PipelineScale,
        run_spatial_stage,
        run_spatial_validate,
    )
    from youreditableavatar_tpu.stages.export import load_editing_region_info
    from youreditableavatar_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    from youreditableavatar_tpu.utils.saving import snapshot_run

    snapshot_run(args.out, dict(cfg.system) if cfg.system else None)
    scale_kw = dict(cfg.system.get("scale", {}))
    scale = (
        PipelineScale.tiny() if scale_kw.pop("tiny", False)
        else PipelineScale()
    )
    for k, v in scale_kw.items():
        # Strict: unknown scale keys are config bugs, not no-ops.
        if not hasattr(scale, k):
            p.error(f"unknown system.scale key {k!r} "
                    f"(valid: {sorted(vars(scale))})")
        object.__setattr__(scale, k, v)

    if args.validate or args.test:
        if args.ckpt is None:
            p.error("--validate/--test requires --ckpt")
        vdir = run_spatial_validate(
            args.out, args.ckpt, scale,
            num_views=60 if args.test else 8,
            subdir="test" if args.test else "validation",
        )
        print({"renders": vdir})
        return

    if args.mesh is None:
        p.error("--mesh is required (body mesh artifact)")
    if args.mesh.endswith(".npy"):
        data = np.load(args.mesh, allow_pickle=True).item()
        verts = np.asarray(data["vertices"], np.float32)
        faces = np.asarray(data["faces"], np.int64)
    else:
        raise SystemExit("only .npy mesh dicts supported in this build")

    region = (
        load_editing_region_info(args.region) if args.region else None
    )
    arts = run_spatial_stage(
        args.out, verts, faces,
        cfg.system.get("prompt", "an avatar"), scale,
        seed=cfg.seed, editing_region_info=region,
        guidance_backend=args.guidance, sd_weights=args.sd_weights,
        system_cfg=dict(cfg.system),
        progress_path=(
            f"{args.out}/progress.txt" if args.gradio else None
        ),
        init_debug=args.init_debug,
    )
    print(arts)


if __name__ == "__main__":
    main()
