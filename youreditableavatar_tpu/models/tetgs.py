"""TetGS: 3D Gaussians bound to a (tet-extracted) surface mesh.

Capability parity with `tetgs_scene/tetgs_model.py:57-727` (SuGaR-derived),
re-designed as an explicit (static binding, learnable params) split that fits
JAX's functional model:

  * binding (host-built, frozen): per-Gaussian barycentric anchors on mesh
    faces — 1 Gaussian at (1/3,1/3,1/3) for below-mean-area faces, 3 at
    (2/3,1/6,1/6) rotations otherwise (`surface_n_gaussians`,
    `calculate_attr_by_bary_coords`, `tetgs_model.py:328-380`) — interpolated
    base points/normals, face indices, per-Gaussian circumcircle radii (the
    scaling-regularizer target, `tetgs_model.py:299-310`), and the
    face→global-tet map.
  * params (learnable pytree): scalar normal offsets δ (positions =
    ori + n̂·δ, `tetgs_model.py:253-258`), log-scales (exp activation),
    quaternions, raw opacities (sigmoid; init inverse_sigmoid(0.1)), SH
    (dc from bound vertex colors via RGB2SH + zero rest,
    `tetgs_model.py:225-241`).

Scale init follows `_initialize_radiuses_gauss_rasterizer`
(`tetgs_model.py:21-55`): log of the min distance to the 3 nearest Gaussians
(sqrt of knn4 sq-dists, self excluded), identity quaternions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
    render_gaussians,
)
from youreditableavatar_tpu.ops.knn import knn_squared_distances
from youreditableavatar_tpu.ops.sh import rgb_to_sh_dc
from youreditableavatar_tpu.utils.graphics import (
    circumcircle_radius,
    inverse_sigmoid,
    triangle_area,
)

BARY_1 = np.array([[1 / 3, 1 / 3, 1 / 3]], np.float32)
BARY_3 = np.array(
    [[2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6], [1 / 6, 1 / 6, 2 / 3]],
    np.float32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TetGSParams:
    """Learnable per-Gaussian parameters (optax-ready pytree)."""

    delta: Array  # (N, 1) offset along the anchor normal
    log_scales: Array  # (N, 3)
    quats: Array  # (N, 4) wxyz
    opacity_raw: Array  # (N, 1) pre-sigmoid
    sh_dc: Array  # (N, 1, 3)
    sh_rest: Array  # (N, K−1, 3)


@dataclasses.dataclass(frozen=True)
class TetGSBinding:
    """Frozen mesh binding (host numpy → device constants)."""

    ori_points: Array  # (N, 3) barycentric anchor positions
    normals: Array  # (N, 3) interpolated unit normals
    face_indices: Array  # (N,) face id per gaussian
    radii: Array  # (N,) circumcircle radius of the parent face
    mesh_verts: Array  # (V, 3)
    mesh_faces: Array  # (F, 3)
    face_to_global_tet_idx: Optional[Array]  # (F,) or None
    sh_levels: int

    @property
    def n_gaussians(self) -> int:
        return self.ori_points.shape[0]


def _vertex_normals_np(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    vn = np.zeros_like(verts)
    np.add.at(vn, faces[:, 0], fn)
    np.add.at(vn, faces[:, 1], fn)
    np.add.at(vn, faces[:, 2], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def build_tetgs(
    mesh_verts: np.ndarray,
    mesh_faces: np.ndarray,
    vertex_colors: Optional[np.ndarray] = None,
    face_to_global_tet_idx: Optional[np.ndarray] = None,
    sh_levels: int = 4,
    opacity_init: float = 0.1,
) -> Tuple[TetGSBinding, TetGSParams]:
    """Bind Gaussians to a surface mesh (host-side; data-dependent count)."""
    verts = np.asarray(mesh_verts, np.float32)
    faces = np.asarray(mesh_faces, np.int64)
    if vertex_colors is None:
        vertex_colors = np.full((len(verts), 3), 0.5, np.float32)
    vertex_colors = np.clip(np.asarray(vertex_colors, np.float32), 0, 1)

    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
    three = area >= area.mean()  # big faces get 3 gaussians

    vnormals = _vertex_normals_np(verts, faces)

    def bary_attr(attr_per_vertex: np.ndarray) -> np.ndarray:
        fa = attr_per_vertex[faces]  # (F, 3, C)
        one = np.einsum("gk,fkc->fgc", BARY_1, fa)  # (F, 1, C)
        trip = np.einsum("gk,fkc->fgc", BARY_3, fa)  # (F, 3, C)
        return np.concatenate(
            [one[~three].reshape(-1, fa.shape[-1]),
             trip[three].reshape(-1, fa.shape[-1])]
        )

    face_ids = np.concatenate(
        [
            np.flatnonzero(~three),
            np.repeat(np.flatnonzero(three), 3),
        ]
    ).astype(np.int32)

    ori = bary_attr(verts)
    nrm = bary_attr(vnormals)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    colors = bary_attr(vertex_colors)

    n = len(ori)
    # Scale init: min distance to 3 nearest neighbors (knn4 minus self).
    d2 = np.asarray(knn_squared_distances(jnp.asarray(ori), k=3))
    r = np.maximum(np.sqrt(d2).min(-1), 1e-7)
    log_scales = np.log(r)[:, None].repeat(3, axis=1).astype(np.float32)

    ca = verts[faces[:, 0]]
    cb = verts[faces[:, 1]]
    cc = verts[faces[:, 2]]
    face_radii = np.asarray(
        circumcircle_radius(jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(cc))
    )

    binding = TetGSBinding(
        ori_points=jnp.asarray(ori),
        normals=jnp.asarray(nrm),
        face_indices=jnp.asarray(face_ids),
        radii=jnp.asarray(face_radii[face_ids], jnp.float32),
        mesh_verts=jnp.asarray(verts),
        mesh_faces=jnp.asarray(faces, jnp.int32),
        face_to_global_tet_idx=(
            None if face_to_global_tet_idx is None
            else jnp.asarray(face_to_global_tet_idx, jnp.int32)
        ),
        sh_levels=sh_levels,
    )
    params = TetGSParams(
        delta=jnp.zeros((n, 1), jnp.float32),
        log_scales=jnp.asarray(log_scales),
        quats=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
        opacity_raw=jnp.full(
            (n, 1), float(inverse_sigmoid(jnp.asarray(opacity_init)))
        ),
        sh_dc=jnp.asarray(rgb_to_sh_dc(jnp.asarray(colors)))[:, None, :],
        sh_rest=jnp.zeros((n, sh_levels**2 - 1, 3), jnp.float32),
    )
    return binding, params


def gaussian_arrays(
    binding: TetGSBinding, params: TetGSParams
) -> Tuple[Array, Array, Array, Array, Array]:
    """(means3d, scales, quats, opacities, sh) — differentiable."""
    means = binding.ori_points + binding.normals * params.delta
    scales = jnp.exp(params.log_scales)
    quats = params.quats
    opac = jax.nn.sigmoid(params.opacity_raw)[:, 0]
    sh = jnp.concatenate([params.sh_dc, params.sh_rest], axis=1)
    return means, scales, quats, opac, sh


def render_tetgs(
    binding: TetGSBinding,
    params: TetGSParams,
    camera: RasterCamera,
    cfg: RasterizeConfig,
    bg: Optional[Array] = None,
    sh_degree: Optional[int] = None,
) -> Dict[str, Array]:
    """Render the bound Gaussians (reference:
    `render_image_gaussian_rasterizer`, `tetgs_model.py:445-633`)."""
    means, scales, quats, opac, sh = gaussian_arrays(binding, params)
    if sh_degree is not None and sh_degree != cfg.sh_degree:
        cfg = dataclasses.replace(cfg, sh_degree=sh_degree)
    return render_gaussians(means, scales, quats, opac, sh, camera, cfg, bg)


def scaling_regularizer(
    binding: TetGSBinding,
    params: TetGSParams,
    ratio_thresh: float = 10.0,
    radius_mult: float = 1.0,
) -> Array:
    """Mean of max-scales that exceed the face circumcircle and are highly
    anisotropic (`refine.py:307-317` semantics)."""
    scales = jnp.exp(params.log_scales)
    max_v = jnp.max(scales, axis=-1)
    min_v = jnp.min(scales, axis=-1)
    ratio = max_v / jnp.maximum(min_v, 1e-12)
    bad = (max_v > binding.radii * radius_mult) & (ratio > ratio_thresh)
    count = jnp.sum(bad)
    return jnp.where(
        count > 0, jnp.sum(jnp.where(bad, max_v, 0.0)) / jnp.maximum(count, 1),
        0.0,
    )


def extract_keep_gaussians(
    binding: TetGSBinding,
    params: TetGSParams,
    edit_face_to_global_tet_idx: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Frozen "keep" Gaussians whose parent face maps into the given tet set
    (`convert_refined_tetgs_into_masked_gaussians`, `tetgs_model.py:679-727`).
    Host-side (runs once between pipeline stages)."""
    if binding.face_to_global_tet_idx is None:
        raise ValueError("binding has no face_to_global_tet_idx")
    f2t = np.asarray(binding.face_to_global_tet_idx)
    face_mask = np.isin(f2t, np.asarray(edit_face_to_global_tet_idx))
    keep_faces = np.flatnonzero(face_mask)
    gmask = np.isin(np.asarray(binding.face_indices), keep_faces)
    idx = np.flatnonzero(gmask)

    means, scales, quats, opac, sh = gaussian_arrays(binding, params)
    return {
        "xyz": np.asarray(means)[idx],
        "opacity_raw": np.asarray(params.opacity_raw)[idx],
        "log_scales": np.asarray(params.log_scales)[idx],
        "quats": np.asarray(quats)[idx],
        "sh_dc": np.asarray(params.sh_dc)[idx],
        "sh_rest": np.asarray(params.sh_rest)[idx],
        "face_indices": np.asarray(binding.face_indices)[idx],
        "sh_levels": binding.sh_levels,
    }


def save_tetgs(path: str, binding: TetGSBinding, params: TetGSParams,
               **extra) -> None:
    """Checkpoint (npz; reference uses `torch.save` dicts,
    `tetgs_model.py:635-640`)."""
    np.savez(
        path,
        ori_points=np.asarray(binding.ori_points),
        normals=np.asarray(binding.normals),
        face_indices=np.asarray(binding.face_indices),
        radii=np.asarray(binding.radii),
        mesh_verts=np.asarray(binding.mesh_verts),
        mesh_faces=np.asarray(binding.mesh_faces),
        face_to_global_tet_idx=(
            np.asarray(binding.face_to_global_tet_idx)
            if binding.face_to_global_tet_idx is not None else np.zeros(0)
        ),
        sh_levels=binding.sh_levels,
        delta=np.asarray(params.delta),
        log_scales=np.asarray(params.log_scales),
        quats=np.asarray(params.quats),
        opacity_raw=np.asarray(params.opacity_raw),
        sh_dc=np.asarray(params.sh_dc),
        sh_rest=np.asarray(params.sh_rest),
        **extra,
    )


def load_tetgs(path: str) -> Tuple[TetGSBinding, TetGSParams, Dict]:
    z = np.load(path, allow_pickle=False)
    f2t = z["face_to_global_tet_idx"]
    binding = TetGSBinding(
        ori_points=jnp.asarray(z["ori_points"]),
        normals=jnp.asarray(z["normals"]),
        face_indices=jnp.asarray(z["face_indices"]),
        radii=jnp.asarray(z["radii"]),
        mesh_verts=jnp.asarray(z["mesh_verts"]),
        mesh_faces=jnp.asarray(z["mesh_faces"]),
        face_to_global_tet_idx=(
            jnp.asarray(f2t, jnp.int32) if f2t.size else None
        ),
        sh_levels=int(z["sh_levels"]),
    )
    params = TetGSParams(
        delta=jnp.asarray(z["delta"]),
        log_scales=jnp.asarray(z["log_scales"]),
        quats=jnp.asarray(z["quats"]),
        opacity_raw=jnp.asarray(z["opacity_raw"]),
        sh_dc=jnp.asarray(z["sh_dc"]),
        sh_rest=jnp.asarray(z["sh_rest"]),
    )
    extras = {
        k: z[k] for k in z.files
        if k not in {
            "ori_points", "normals", "face_indices", "radii", "mesh_verts",
            "mesh_faces", "face_to_global_tet_idx", "sh_levels", "delta",
            "log_scales", "quats", "opacity_raw", "sh_dc", "sh_rest",
        }
    }
    return binding, params, extras
