"""Stage 3 — text-prompted 3D region localization.

Capability parity with `Edit_core/mesh_localization.py:21-199`
(LocalMeshEditingModel): render the stage-2 probe views, segment each with a
text-prompted segmenter (LangSAM = GroundingDINO + SAM ViT-H in the
reference, any `Segmenter` here), back-project the 2D masks onto the mesh,
refine the selection with mesh morphology (dilate 8 / erode 10,
`mesh_localization.py:134-148`), drop floaters, and emit
`editing_region_info.npy` (vertex + face masks).

TPU re-design: back-projection reads the mesh rasterizer's primitive ids
(pixel → triangle) instead of casting open3d rays (`:124-131`) — the raster
pass already knows every hit triangle.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol, Sequence

import jax.numpy as jnp
import numpy as np

from youreditableavatar_tpu.models.cameras import GSCamera
from youreditableavatar_tpu.ops.mesh_raster import (
    MeshRasterConfig,
    rasterize_mesh,
)
from youreditableavatar_tpu.ops.morphology import (
    dilate_face_region,
    erode_face_region,
    face_mask_from_vertices,
    vertex_mask_from_faces,
)
from youreditableavatar_tpu.stages.export import (
    export_editing_region_info,
    remove_floaters,
)
from youreditableavatar_tpu.utils.registry import register


class Segmenter(Protocol):
    """Text-prompted image segmentation (LangSAM role)."""

    def segment(self, image: np.ndarray, prompt: str) -> np.ndarray:
        """(H, W, 3) float image + prompt → (H, W) bool mask."""
        ...


class HeuristicSegmenter:
    """Weight-free stand-in: segments by region heuristics for smoke tests.

    Modes: "upper"/"lower"/"center" select image bands over the foreground
    (non-background pixels); real deployments plug a SAM-family backend in.
    """

    def __init__(self, mode: str = "upper", bg_threshold: float = 0.95):
        self.mode = mode
        self.bg_threshold = bg_threshold

    def segment(self, image: np.ndarray, prompt: str) -> np.ndarray:
        img = np.asarray(image)
        fg = ~(img > self.bg_threshold).all(-1)
        h = img.shape[0]
        band = np.zeros_like(fg)
        rows = np.where(fg.any(1))[0]
        if len(rows) == 0:
            return band
        top, bot = rows[0], rows[-1]
        third = (bot - top) // 3
        if self.mode == "upper":
            band[top : top + third + 1] = True
        elif self.mode == "lower":
            band[bot - third : bot + 1] = True
        else:
            band[top + third : bot - third + 1] = True
        return fg & band


@dataclasses.dataclass(frozen=True)
class LocalizationConfig:
    dilate_iters: int = 8
    erode_iters: int = 10
    min_views: int = 2  # a face must be segmented in ≥ this many views
    floater_min_fraction: float = 0.1
    mesh_cfg: MeshRasterConfig = dataclasses.field(
        default_factory=lambda: MeshRasterConfig()
    )


@register("mesh-localization")
class LocalMeshEditing:
    def __init__(
        self,
        verts: np.ndarray,
        faces: np.ndarray,
        segmenter: Segmenter,
        cfg: LocalizationConfig = LocalizationConfig(),
    ):
        self.verts = np.asarray(verts, np.float32)
        self.faces = np.asarray(faces, np.int64)
        self.segmenter = segmenter
        self.cfg = cfg

    def localize(
        self,
        cameras: Sequence[GSCamera],
        images: Sequence[np.ndarray],
        prompt: str,
        output_path: Optional[str] = None,
    ) -> dict:
        """Segment each probe view, back-project, refine, export masks.

        Returns dict(editing_mask (V,), editing_mask_faces (F,)).
        """
        votes = np.zeros(len(self.faces), np.int32)
        seen = np.zeros(len(self.faces), np.int32)
        vj = jnp.asarray(self.verts)
        fj = jnp.asarray(self.faces, jnp.int32)
        for cam, img in zip(cameras, images):
            mask2d = self.segmenter.segment(np.asarray(img), prompt)
            out = rasterize_mesh(
                vj, fj, cam.raster_camera(), self.cfg.mesh_cfg
            )
            fid = np.asarray(out.face_id)
            vis = fid >= 0
            seen_faces = np.unique(fid[vis])
            seen[seen_faces] += 1
            hit = np.unique(fid[vis & mask2d])
            votes[hit] += 1

        fmask = votes >= np.minimum(self.cfg.min_views, np.maximum(seen, 1))
        fmask = dilate_face_region(self.faces, fmask, self.cfg.dilate_iters)
        fmask = erode_face_region(self.faces, fmask, self.cfg.erode_iters)

        # Floater removal on the selected sub-mesh.
        sel = np.flatnonzero(fmask)
        if len(sel):
            keep_sel = remove_floaters(
                self.verts, self.faces[sel], self.cfg.floater_min_fraction
            )
            fmask = np.zeros_like(fmask)
            fmask[sel[keep_sel]] = True

        vmask = vertex_mask_from_faces(self.faces, fmask, len(self.verts))
        info = {
            "editing_mask": vmask.astype(np.int64),
            "editing_mask_faces": fmask.astype(np.float64),
        }
        if output_path is not None:
            export_editing_region_info(
                output_path, info["editing_mask"], info["editing_mask_faces"]
            )
        return info


def region_info_to_face_mask(
    info: dict, faces: np.ndarray
) -> np.ndarray:
    """editing_region_info → per-face bool mask (reference consumers read
    the vertex mask and AND over face vertices, `mesh_exporter_part.py`)."""
    if "editing_mask_faces" in info and len(info["editing_mask_faces"]) == len(
        faces
    ):
        return np.asarray(info["editing_mask_faces"]) > 0.5
    return face_mask_from_vertices(faces, info["editing_mask"] > 0, "all")
