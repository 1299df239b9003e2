"""Mask/normal projection model for progressive inpainting.

Capability parity with `tetgs_inpainter/mask_mesh_0822.py:41-391`
(TexturedMeshModel): renders the editable-vertex mask and normals from a
camera, applies the view-angle cull (faces seen at grazing angles don't count
as painted, 70°/68° thresholds `:111-123`), the erode/dilate/blur mask
algebra for inpainting inputs (`prepare_mask_proj` `:162-199`), and the mask
back-projection that marks newly painted vertices (`back_project`
`:209-270`).

TPU re-design: back-projection uses the mesh rasterizer's primitive ids
(pixels → visible faces → vertices) instead of the reference's open3d BVH
raycast — the rasterizer already knows the hit triangle per pixel
(SURVEY §2.7 N8's preferred plan).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera
from youreditableavatar_tpu.ops.mesh_raster import (
    MeshRasterConfig,
    compute_vertex_normals,
    interpolate_attributes,
    rasterize_mesh,
)
from youreditableavatar_tpu.ops.morphology import (
    box_blur,
    dilate,
    dilate_face_region,
    erode,
    erode_face_region,
    vertex_mask_from_faces,
)


class TexturedMeshModel:
    def __init__(
        self,
        verts: np.ndarray,
        faces: np.ndarray,
        editable_verts_mask: np.ndarray,
        mesh_cfg: MeshRasterConfig = MeshRasterConfig(),
        view_angle_thresh_deg: float = 70.0,
    ):
        self.verts = jnp.asarray(verts, jnp.float32)
        self.faces = jnp.asarray(faces, jnp.int32)
        self.editable = np.asarray(editable_verts_mask, bool)
        self.painted = np.zeros_like(self.editable)  # grows view by view
        self.mesh_cfg = mesh_cfg
        self.angle_thresh = view_angle_thresh_deg

    # ---- per-view rendering ------------------------------------------------

    def render_view(self, camera: RasterCamera) -> Dict[str, Array]:
        """Raster masks + camera-space normals for one camera."""
        out = rasterize_mesh(self.verts, self.faces, camera, self.mesh_cfg)
        vn = compute_vertex_normals(self.verts, self.faces)
        r = camera.viewmat[:3, :3]
        vn_cam = vn @ r.T
        normal_img = interpolate_attributes(
            out, self.faces, vn_cam, background=0.0, perspective=False
        )
        # View-angle cull: pixels whose surface faces away beyond the
        # threshold never count as painted (`mask_mesh_0822.py:111-123`).
        cos_view = -normal_img[..., 2]  # camera looks down +z
        good_angle = cos_view > np.cos(np.deg2rad(self.angle_thresh))

        editable_img = interpolate_attributes(
            out, self.faces,
            jnp.asarray(self.editable, jnp.float32)[:, None],
            background=0.0,
        )[..., 0]
        painted_img = interpolate_attributes(
            out, self.faces,
            jnp.asarray(self.painted, jnp.float32)[:, None],
            background=0.0,
        )[..., 0]
        mask_cov = out.face_id >= 0
        return {
            "face_id": out.face_id,
            "mask": mask_cov,
            "normal": normal_img,
            "comp_normal": jnp.where(
                mask_cov[..., None], normal_img * 0.5 + 0.5, 1.0
            ),
            "good_angle": good_angle & mask_cov,
            "editable": editable_img,
            "painted": painted_img,
        }

    def prepare_inpaint_masks(
        self, view: Dict[str, Array], blur_size: int = 5
    ) -> Dict[str, Array]:
        """Mask algebra for the inpainting input (`prepare_mask_proj`):
        inpaint = editable ∧ not-yet-painted, eroded then blurred; keep =
        complement over coverage."""
        editable = (view["editable"] > 0.5) & view["mask"]
        todo = editable & ~(view["painted"] > 0.5)
        m = erode(todo, 1)
        m = dilate(m, 2)
        soft = box_blur(m, blur_size)
        return {
            "inpaint_mask": m,
            "inpaint_mask_soft": jnp.clip(soft, 0, 1),
            "keep_mask": view["mask"] & ~(m > 0.5),
        }

    # ---- back-projection ---------------------------------------------------

    def back_project(
        self,
        view: Dict[str, Array],
        painted_pixels: Array,
        dilate_iters: int = 2,
        erode_iters: int = 3,
    ) -> np.ndarray:
        """Mark vertices under painted pixels as painted (`back_project`).

        Uses the rasterizer's face ids (pixels → faces), refines the face
        region with mesh dilate/erode (replacing the pymeshlab calls
        `:249-266`), intersects with the editable region, and folds into the
        persistent painted set. Returns the face mask of NEWLY painted faces.
        """
        fid = np.asarray(view["face_id"])
        ok = np.asarray(painted_pixels) & np.asarray(view["good_angle"])
        hit = np.unique(fid[ok & (fid >= 0)])
        faces_np = np.asarray(self.faces)
        fmask = np.zeros(len(faces_np), bool)
        fmask[hit] = True
        fmask = dilate_face_region(faces_np, fmask, dilate_iters)
        fmask = erode_face_region(faces_np, fmask, erode_iters)
        fmask = fmask | np.isin(np.arange(len(faces_np)), hit)
        vmask = vertex_mask_from_faces(faces_np, fmask, len(self.verts))
        vmask = vmask & self.editable
        self.painted = self.painted | vmask
        return fmask

    # ---- blend masks -------------------------------------------------------

    def concat_blend_masks(
        self, camera: RasterCamera, blur_size: int = 9
    ) -> Dict[str, Array]:
        """Per-pixel edit/keep blend masks for `prepare_refine_guidance`
        (`get_concat_mask`, `mask_mesh_0822.py:337-391`)."""
        view = self.render_view(camera)
        edit = (view["editable"] > 0.5) & view["mask"]
        soft = jnp.clip(box_blur(edit, blur_size), 0, 1)
        return {
            "edit_mask": edit,
            "edit_mask_soft": soft,
            "keep_mask_soft": jnp.where(view["mask"], 1.0 - soft, 0.0),
            "coverage": view["mask"],
        }
