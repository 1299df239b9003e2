#!/usr/bin/env bash
# Full text-guided avatar-editing pipeline (reference surface: run.sh:1-99).
# Demo invocation on synthetic data (no external weights / datasets needed):
#   ./run.sh demo outputs/demo
# Real-data invocation mirrors the reference's 4 stages with the same
# file-mediated artifacts (init_mesh.npy, editing_region_info.npy,
# edit_mesh.npy, blend_images/).
set -euo pipefail

MODE="${1:-demo}"
OUT="${2:-outputs/demo}"

if [ "$MODE" = "demo" ]; then
  python -c "
import os
# Some images force-register a TPU backend and ignore JAX_PLATFORMS from the
# environment; re-pin explicitly so 'JAX_PLATFORMS=cpu ./run.sh demo' works.
import jax
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
from youreditableavatar_tpu.cli.pipeline import run_synthetic_pipeline, PipelineScale
arts = run_synthetic_pipeline('$OUT', PipelineScale.tiny())
for k, v in arts.items():
    print(f'{k}: {v}')
"
  exit 0
fi

# Real-data flow (paths per comm_config.yaml):
CONFIG_DIR="configs"
DATA="${DATA:?set DATA to the COLMAP dataset root}"
BODY_MESH="${BODY_MESH:?set BODY_MESH to the reconstructed body mesh .npy}"
PROMPT="${PROMPT:-a red jacket}"

# Stage 0: SDF shape init + init mesh export.
python train_spatial.py --config "$CONFIG_DIR/geometry-init.yaml" --train \
  --mesh "$BODY_MESH" --out "$OUT/spatial"

# Stage 2: appearance fit + localization.
python train_init_texture.py --init_mesh "$OUT/spatial/init_mesh.npy" \
  --source_path "$DATA" --out "$OUT/init_texture"

# Stage 1: localized geometry editing + edit mesh export.
python train_spatial.py --config "$CONFIG_DIR/geometry-edit.yaml" --train \
  --export --mesh "$BODY_MESH" \
  --region "$OUT/init_texture/editing_region_info.npy" --out "$OUT/spatial" \
  "system.prompt=$PROMPT"

# Stage 4: progressive inpaint + refine.
python train_edit_texture.py --edit_mesh "$OUT/spatial/edit_mesh.npy" \
  --tetgs_init "$OUT/init_texture/tetgs_init_last.npz" \
  --prompt "$PROMPT" --out "$OUT/edit_texture"
