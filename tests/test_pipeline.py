"""Full-pipeline integration smoke: all 4 stages chained via the same .npy
artifacts as the reference's run.sh, on synthetic data with stub priors."""

import os

import numpy as np
import pytest

from youreditableavatar_tpu.cli.pipeline import (
    PipelineScale,
    run_synthetic_pipeline,
)


def test_synthetic_pipeline(tmp_path):
    out = run_synthetic_pipeline(str(tmp_path / "run"))
    # Artifacts exist with the reference schemas.
    assert os.path.exists(out["init_mesh"])
    assert os.path.exists(out["editing_region_info"])
    assert os.path.exists(out["edit_mesh"])
    init = np.load(out["init_mesh"], allow_pickle=True).item()["mesh"]
    assert init["faces"].max() < len(init["vertices"])
    edit = np.load(out["edit_mesh"], allow_pickle=True).item()["mesh"]
    assert edit["keep_vertices_num"] > 0
    assert edit["editing_mask"].sum() > 0
    # Final renders produced.
    finals = sorted(os.listdir(out["final_dir"]))
    assert len(finals) >= 2
    import imageio.v2 as imageio

    img = imageio.imread(os.path.join(out["final_dir"], finals[0]))
    assert img.shape[0] > 0 and np.isfinite(img).all()
