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
    args = p.parse_args(argv)

    from youreditableavatar_tpu.cli.pipeline import (
        PipelineScale,
        run_edit_texture_stage,
    )

    scale = PipelineScale.tiny() if args.tiny else PipelineScale()
    arts = run_edit_texture_stage(
        args.out, args.edit_mesh, args.tetgs_init, args.prompt, scale
    )
    print(arts)


if __name__ == "__main__":
    main()
