#!/usr/bin/env bash
# Second example case (reference surface: run_pg.sh) — garment editing on
# the "pg" capture with the UPPER-body framing: segment the shirt, edit it
# into a denim jacket, probe/turntable cameras cropped to the torso band
# (sample_type=upper; the first two inpaint views stay full-body for the
# joint front/back step).
#
#   DATA=/path/to/pg BODY_MESH=/path/to/full_body.npy ./run_pg.sh outputs/pg
set -euo pipefail

OUT="${1:-outputs/pg_denim}"
DATA="${DATA:?set DATA to the COLMAP dataset root (pg capture)}"
BODY_MESH="${BODY_MESH:?set BODY_MESH to the reconstructed body mesh .npy}"

SEG_PROMPT="${SEG_PROMPT:-shirt}"
EDIT_PROMPT="${EDIT_PROMPT:-denim jacket with a faded wash}"
LOCAL_PROMPT="A DSLR photo of a $EDIT_PROMPT"
GLOBAL_PROMPT="A DSLR photo of a man wearing a $EDIT_PROMPT, full body"
SAMPLE_TYPE="${SAMPLE_TYPE:-upper}"   # upper | lower | full

# Stage 0: SDF shape init + init mesh export.
python train_spatial.py --config configs/geometry-init.yaml --train \
  --mesh "$BODY_MESH" --out "$OUT/spatial"

# Stage 2: appearance fit + localization (segment the garment).
python train_init_texture.py --init_mesh "$OUT/spatial/init_mesh.npy" \
  --source_path "$DATA" --out "$OUT/init_texture" \
  --seg_prompt "$SEG_PROMPT"

# Stage 1: localized geometry editing + edit mesh export.
python train_spatial.py --config configs/geometry-edit.yaml --train \
  --export --mesh "$BODY_MESH" \
  --region "$OUT/init_texture/editing_region_info.npy" --out "$OUT/spatial" \
  "system.prompt=$LOCAL_PROMPT" "system.prompt_global=$GLOBAL_PROMPT"

# Stage 4: progressive inpaint + refine with the upper-body framing.
python train_edit_texture.py --edit_mesh "$OUT/spatial/edit_mesh.npy" \
  --tetgs_init "$OUT/init_texture/tetgs_init_last.npz" \
  --prompt "$LOCAL_PROMPT" --out "$OUT/edit_texture" \
  --sample-type "$SAMPLE_TYPE"
