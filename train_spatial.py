#!/usr/bin/env python
"""Spatial-stage CLI (reference surface: `train_spatial.py:57-248`).

Modes:
  --train with a geometry-init config: SDF shape initialization from the
    body mesh (reference `configs/geometry-init.yaml`, max_steps=0) and
    `init_mesh.npy` export.
  --train with a geometry-edit config (+ --region editing_region_info.npy):
    localized SDS editing; --export writes `edit_mesh.npy`.

Config: YAML + `key.sub=value` dotlist overrides (same shape as the
reference's OmegaConf CLI). Guidance backend: "stub" runs weight-free; a
real SD1.5 port plugs in behind `guidance.base.DiffusionPrior`.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--export", action="store_true")
    p.add_argument("--region", default=None,
                   help="editing_region_info.npy for the edit mode")
    p.add_argument("--mesh", default=None,
                   help="body mesh (.npy dict or .ply) for shape init")
    p.add_argument("--out", default="outputs/spatial")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from youreditableavatar_tpu.cli.pipeline import (
        PipelineScale,
        run_spatial_stage,
    )
    from youreditableavatar_tpu.stages.export import load_editing_region_info
    from youreditableavatar_tpu.utils.config import load_config

    cfg = load_config(args.config, args.overrides)
    scale_kw = dict(cfg.system.get("scale", {}))
    scale = (
        PipelineScale.tiny() if scale_kw.pop("tiny", False)
        else PipelineScale()
    )
    for k, v in scale_kw.items():
        object.__setattr__(scale, k, v) if hasattr(scale, k) else None

    if args.mesh is None:
        p.error("--mesh is required (body mesh artifact)")
    if args.mesh.endswith(".npy"):
        data = np.load(args.mesh, allow_pickle=True).item()
        verts = np.asarray(data["vertices"], np.float32)
        faces = np.asarray(data["faces"], np.int64)
    else:
        from youreditableavatar_tpu.utils.saving import save_obj  # noqa

        raise SystemExit("only .npy mesh dicts supported in this build")

    region = (
        load_editing_region_info(args.region) if args.region else None
    )
    arts = run_spatial_stage(
        args.out, verts, faces,
        cfg.system.get("prompt", "an avatar"), scale,
        seed=cfg.seed, editing_region_info=region,
    )
    print(arts)


if __name__ == "__main__":
    main()
