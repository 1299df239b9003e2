#!/usr/bin/env python
"""Edit-texture CLI (reference surface: `train_edit_texture.py:8-53`):
progressive inpainting + 3D refinement over the edited region."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--edit_mesh", required=True)
    p.add_argument("--tetgs_init", required=True,
                   help="stage-2 checkpoint (tetgs_init_last.npz)")
    p.add_argument("--prompt", required=True)
    p.add_argument("--out", default="outputs/edit_texture")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--sample-type", default="full",
                   choices=["full", "upper", "lower"],
                   help="garment framing for probe/turntable views "
                        "(reference run_pg.sh sample_type)")
    p.add_argument("--inpainter", default="stub",
                   choices=["stub", "sdxl", "sdxl-random"])
    p.add_argument("--sdxl-weights", default=None,
                   help="diffusers layout dir (unet/ vae/ controlnet/ ...)")
    args = p.parse_args(argv)

    from youreditableavatar_tpu.utils.misc import apply_platform_env

    apply_platform_env()

    from youreditableavatar_tpu.cli.pipeline import (
        PipelineScale,
        run_edit_texture_stage,
    )
    from youreditableavatar_tpu.guidance.factory import (
        make_inpainter_backend,
    )

    scale = PipelineScale.tiny() if args.tiny else PipelineScale()
    inpainter = make_inpainter_backend(args.inpainter, args.sdxl_weights)
    arts = run_edit_texture_stage(
        args.out, args.edit_mesh, args.tetgs_init, args.prompt, scale,
        inpainter=inpainter, sample_type=args.sample_type,
    )
    print(arts)


if __name__ == "__main__":
    main()
