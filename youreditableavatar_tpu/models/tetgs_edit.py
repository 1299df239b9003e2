"""Edit-region Gaussian models: 2D inpainting disks + 3D refinement.

Capability parity with `tetgs_scene/tetgs_edit_2d.py:20-798` (EditTetGS) and
`tetgs_scene/tetgs_edit_3d.py:24-724` (Edit3DTetGS):

  * keep Gaussians (extracted from the stage-2 TetGS by tet-id intersection)
    are FROZEN — they live in the binding, not in the learnable params;
  * 2D stage: edit Gaussians are flat disks on the edit-mesh faces —
    quaternion from the face frame (normal, v1, v2 columns,
    `tetgs_edit_2d.py:176-197`), scales (ε, d, d) with d = min distance from
    the anchor point to the face's vertices (`:199-208`), SH from seed
    colors; positions fixed at the barycentric anchors;
  * 3D stage: edit positions re-parameterized as scalar offsets along the
    interpolated edit-mesh normals (`tetgs_edit_3d.py:112-144`), with
    scales/quats/SH warm-started from the finished 2D stage (`:180-217`);
  * per-part rendering: keep ∥ edit concatenated for the rasterizer, with
    optional per-part color override (`tetgs_edit_2d.py:552-586`) and
    rollback of edit params outside a face set (`paint_2dgs.py:538-557`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.models.tetgs import _vertex_normals_np
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
    render_gaussians,
)
from youreditableavatar_tpu.ops.quaternion import matrix_to_quat
from youreditableavatar_tpu.ops.sh import rgb_to_sh_dc
from youreditableavatar_tpu.utils.graphics import inverse_sigmoid

BARY_1 = np.array([[1 / 3, 1 / 3, 1 / 3]], np.float32)
BARY_3 = np.array(
    [[2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6], [1 / 6, 1 / 6, 2 / 3]],
    np.float32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EditParams:
    """Learnable edit-part parameters (keep part is frozen in the binding).

    `delta` is used by the 3D stage only (2D disks have fixed positions);
    it is always present so one optimizer covers both stages.
    """

    delta: Array  # (Ne, 1)
    log_scales: Array  # (Ne, 3)
    quats: Array  # (Ne, 4)
    opacity_raw: Array  # (Ne, 1)
    sh_dc: Array  # (Ne, 1, 3)
    sh_rest: Array  # (Ne, K−1, 3)


@dataclasses.dataclass(frozen=True)
class EditBinding:
    # Edit part anchors
    edit_ori: Array  # (Ne, 3)
    edit_normals: Array  # (Ne, 3)
    edit_face_indices: Array  # (Ne,) into edit-mesh faces
    edit_mesh_verts: Array
    edit_mesh_faces: Array
    # Frozen keep Gaussians
    keep_xyz: Array
    keep_log_scales: Array
    keep_quats: Array
    keep_opacity_raw: Array
    keep_sh_dc: Array
    keep_sh_rest: Array
    sh_levels: int
    use_delta: bool  # False = 2D disks (fixed positions), True = 3D refine

    @property
    def n_edit(self) -> int:
        return self.edit_ori.shape[0]

    @property
    def n_keep(self) -> int:
        return self.keep_xyz.shape[0]


def _bary_points(
    verts: np.ndarray, faces: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """1-per-face barycentric anchors + face ids (edit part uses 1 Gaussian
    per face at the centroid, plus the 3-point set for larger faces — the
    reference reuses `calculate_attr_by_bary_coords`; we mirror TetGS's
    area rule)."""
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
    three = area >= area.mean()
    fa = verts[faces]  # (F, 3, 3)
    one = np.einsum("gk,fkc->fgc", BARY_1, fa)
    trip = np.einsum("gk,fkc->fgc", BARY_3, fa)
    pts = np.concatenate(
        [one[~three].reshape(-1, 3), trip[three].reshape(-1, 3)]
    )
    face_ids = np.concatenate(
        [np.flatnonzero(~three), np.repeat(np.flatnonzero(three), 3)]
    ).astype(np.int32)
    return pts.astype(np.float32), face_ids


def build_edit_tetgs(
    edit_mesh_verts: np.ndarray,
    edit_mesh_faces: np.ndarray,
    keep_gaussians: Dict[str, np.ndarray],
    edit_colors: Optional[np.ndarray] = None,
    sh_levels: int = 1,
    opacity_init: float = 0.9999,
) -> Tuple[EditBinding, EditParams]:
    """2D-disk edit model over the edit mesh + frozen keep Gaussians.

    `keep_gaussians` is the dict from
    `youreditableavatar_tpu.models.tetgs.extract_keep_gaussians`.
    """
    verts = np.asarray(edit_mesh_verts, np.float32)
    faces = np.asarray(edit_mesh_faces, np.int64)
    pts, face_ids = _bary_points(verts, faces)
    ne = len(pts)

    tri = verts[faces[face_ids]]  # (Ne, 3, 3)
    eps = 1e-8
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    v0 = n / (np.linalg.norm(n, axis=-1, keepdims=True) + eps)
    v1 = tri[:, 1] - tri[:, 0]
    v1 = v1 / (np.linalg.norm(v1, axis=-1, keepdims=True) + eps)
    v2 = np.cross(v0, v1)
    v2 = v2 / (np.linalg.norm(v2, axis=-1, keepdims=True) + eps)
    rot = np.stack([v0, v1, v2], axis=-1)  # columns = frame
    quats = np.asarray(matrix_to_quat(jnp.asarray(rot)))

    # Disk radius: min distance from the anchor to the face's vertices
    # (`calculate_distances`, `graphics_utils.py:124-136`).
    d = np.minimum(
        np.minimum(
            np.linalg.norm(pts - tri[:, 0], axis=-1),
            np.linalg.norm(pts - tri[:, 1], axis=-1),
        ),
        np.linalg.norm(pts - tri[:, 2], axis=-1),
    )
    d = np.maximum(d, 1e-7)
    scales = np.stack([np.full(ne, 1e-8, np.float32), d, d], axis=-1)

    if edit_colors is None:
        edit_colors = np.full((ne, 3), 0.5, np.float32)
    elif edit_colors.shape[0] == len(verts):
        # Per-vertex colors → per-gaussian via face mean.
        edit_colors = verts_colors_to_points(
            edit_colors, faces, face_ids, pts, verts
        )

    vn = _vertex_normals_np(verts, faces)
    fnorm = vn[faces[face_ids]].mean(1)
    fnorm /= np.maximum(np.linalg.norm(fnorm, axis=-1, keepdims=True), 1e-12)

    binding = EditBinding(
        edit_ori=jnp.asarray(pts),
        edit_normals=jnp.asarray(fnorm.astype(np.float32)),
        edit_face_indices=jnp.asarray(face_ids),
        edit_mesh_verts=jnp.asarray(verts),
        edit_mesh_faces=jnp.asarray(faces, jnp.int32),
        keep_xyz=jnp.asarray(keep_gaussians["xyz"], jnp.float32),
        keep_log_scales=jnp.asarray(keep_gaussians["log_scales"], jnp.float32),
        keep_quats=jnp.asarray(keep_gaussians["quats"], jnp.float32),
        keep_opacity_raw=jnp.asarray(
            keep_gaussians["opacity_raw"], jnp.float32
        ),
        keep_sh_dc=jnp.asarray(keep_gaussians["sh_dc"], jnp.float32),
        keep_sh_rest=jnp.asarray(keep_gaussians["sh_rest"], jnp.float32),
        sh_levels=sh_levels,
        use_delta=False,
    )
    params = EditParams(
        delta=jnp.zeros((ne, 1), jnp.float32),
        log_scales=jnp.asarray(np.log(scales)),
        quats=jnp.asarray(quats, jnp.float32),
        opacity_raw=jnp.full(
            (ne, 1), float(inverse_sigmoid(jnp.asarray(opacity_init)))
        ),
        sh_dc=jnp.asarray(
            rgb_to_sh_dc(jnp.asarray(np.clip(edit_colors, 0, 1)))
        )[:, None, :],
        sh_rest=jnp.zeros((ne, max(sh_levels**2 - 1, 0), 3), jnp.float32),
    )
    return binding, params


def verts_colors_to_points(vcolors, faces, face_ids, pts, verts):
    fc = vcolors[faces[face_ids]].mean(1)
    return fc.astype(np.float32)


def promote_to_3d(
    binding: EditBinding,
    params: EditParams,
    sh_levels: int = 4,
) -> Tuple[EditBinding, EditParams]:
    """2D inpainted disks → 3D refine model (`tetgs_edit_3d.py:112-217`):
    positions become normal-offset deltas from the (unchanged) anchors,
    scales/quats/SH warm-start from the 2D stage, SH budget grows."""
    ne = binding.n_edit
    old_k = params.sh_rest.shape[1]
    new_k = sh_levels**2 - 1
    sh_rest = jnp.zeros((ne, new_k, 3), jnp.float32)
    if old_k > 0:
        sh_rest = sh_rest.at[:, :old_k].set(params.sh_rest)
    binding3 = dataclasses.replace(
        binding, use_delta=True, sh_levels=sh_levels
    )
    params3 = EditParams(
        delta=jnp.zeros((ne, 1), jnp.float32),
        log_scales=params.log_scales,
        quats=params.quats,
        opacity_raw=params.opacity_raw,
        sh_dc=params.sh_dc,
        sh_rest=sh_rest,
    )
    return binding3, params3


def edit_gaussian_arrays(
    binding: EditBinding, params: EditParams
) -> Tuple[Array, Array, Array, Array, Array]:
    """Edit-part (means, scales, quats, opac, sh)."""
    if binding.use_delta:
        means = binding.edit_ori + binding.edit_normals * params.delta
    else:
        means = binding.edit_ori
    scales = jnp.exp(params.log_scales)
    opac = jax.nn.sigmoid(params.opacity_raw)[:, 0]
    k = binding.sh_levels**2
    sh = jnp.concatenate(
        [params.sh_dc, params.sh_rest[:, : k - 1]], axis=1
    )
    return means, scales, params.quats, opac, sh


def full_gaussian_arrays(
    binding: EditBinding,
    params: EditParams,
    keep_color_override: Optional[Array] = None,
    edit_color_override: Optional[Array] = None,
):
    """keep ∥ edit concatenated arrays for the rasterizer.

    Color overrides implement the per-part color renders used for the
    edit/keep blend masks (`tetgs_edit_2d.py:552-586`): pass (3,) colors to
    paint each part flat (returned as a colors_override array).
    """
    em, es, eq, eo, esh = edit_gaussian_arrays(binding, params)
    km = binding.keep_xyz
    ks = jnp.exp(binding.keep_log_scales)
    kq = binding.keep_quats
    ko = jax.nn.sigmoid(binding.keep_opacity_raw)[:, 0]
    kk = binding.sh_levels**2
    ksh_rest = binding.keep_sh_rest[:, : kk - 1]
    if ksh_rest.shape[1] < kk - 1:
        pad = jnp.zeros(
            (binding.n_keep, kk - 1 - ksh_rest.shape[1], 3), jnp.float32
        )
        ksh_rest = jnp.concatenate([ksh_rest, pad], axis=1)
    ksh = jnp.concatenate([binding.keep_sh_dc, ksh_rest], axis=1)

    means = jnp.concatenate([km, em])
    scales = jnp.concatenate([ks, es])
    quats = jnp.concatenate([kq, eq])
    opac = jnp.concatenate([ko, eo])
    sh = jnp.concatenate([ksh, esh])

    colors_override = None
    if keep_color_override is not None or edit_color_override is not None:
        kc = (
            jnp.broadcast_to(keep_color_override, (binding.n_keep, 3))
            if keep_color_override is not None
            else jnp.full((binding.n_keep, 3), 0.0)
        )
        ec = (
            jnp.broadcast_to(edit_color_override, (binding.n_edit, 3))
            if edit_color_override is not None
            else jnp.full((binding.n_edit, 3), 0.0)
        )
        colors_override = jnp.concatenate([kc, ec])
    return means, scales, quats, opac, sh, colors_override


def render_edit_tetgs(
    binding: EditBinding,
    params: EditParams,
    camera: RasterCamera,
    cfg: RasterizeConfig,
    bg: Optional[Array] = None,
    keep_color_override: Optional[Array] = None,
    edit_color_override: Optional[Array] = None,
) -> Dict[str, Array]:
    means, scales, quats, opac, sh, colors = full_gaussian_arrays(
        binding, params, keep_color_override, edit_color_override
    )
    cfg = dataclasses.replace(cfg, sh_degree=binding.sh_levels - 1)
    return render_gaussians(
        means, scales, quats, opac, sh, camera, cfg, bg,
        colors_override=colors,
    )


def rollback_outside_faces(
    binding: EditBinding,
    params: EditParams,
    prev_params: EditParams,
    painted_faces: Array,
) -> EditParams:
    """Revert edit Gaussians whose face is NOT newly painted
    (`paint_2dgs.py:538-557`): parameters outside the painted set return to
    their pre-fit values.

    Args:
      painted_faces: (F,) bool over edit-mesh faces.
    """
    keep_new = painted_faces[binding.edit_face_indices]  # (Ne,)

    def mix(new, old):
        mask = keep_new.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)

    return EditParams(
        delta=mix(params.delta, prev_params.delta),
        log_scales=mix(params.log_scales, prev_params.log_scales),
        quats=mix(params.quats, prev_params.quats),
        opacity_raw=mix(params.opacity_raw, prev_params.opacity_raw),
        sh_dc=mix(params.sh_dc, prev_params.sh_dc),
        sh_rest=mix(params.sh_rest, prev_params.sh_rest),
    )
