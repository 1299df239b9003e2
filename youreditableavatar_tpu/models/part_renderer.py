"""Partitioned-surface renderer: local/global normal, opacity, depth maps.

Capability parity with `tetgs_spatial/models/renderers/part_nvdiff_rasterizer.py`
(PartNVDiffRasterizer): the LOCAL view rasterizes keep (gradient-detached) ∥
update meshes and emits camera-space normal, opacity and depth maps of the
edit region; the GLOBAL view rasterizes the union for the full-body normal
map (`:32-208`). Built on the framework mesh rasterizer — the visibility pass
is discrete, and normals/silhouette re-attach differentiably.

Also provides the budgeted-mesh `normal_consistency` loss
(`models/mesh.py:265-281` / pytorch3d semantics): mean over interior edges of
(1 − cos) between adjacent face normals, computed statically via the same
sort-rank edge dedup used by marching tets.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.models.geometry import concat_meshes
from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera
from youreditableavatar_tpu.ops.marching_tets import MTOutput, unique_edge_slots
from youreditableavatar_tpu.ops.mesh_raster import (
    MeshRasterConfig,
    compute_vertex_normals,
    interpolate_attributes,
    rasterize_mesh,
)
from youreditableavatar_tpu.ops.mesh_raster.interpolate import silhouette_alpha


def render_geometry_maps(
    verts: Array,
    faces: Array,
    faces_valid: Array,
    camera: RasterCamera,
    cfg: MeshRasterConfig,
    bg_normal: float = 0.5,
) -> Dict[str, Array]:
    """Camera-space normal (+[0,1] encoded), opacity, depth for one mesh."""
    out = rasterize_mesh(verts, faces, camera, cfg, faces_valid=faces_valid)
    vn = compute_vertex_normals(verts, faces, faces_valid)
    # Camera-space normals: n_cam = R_w2c @ n.
    r = camera.viewmat[:3, :3]
    vn_cam = vn @ r.T
    normal_img = interpolate_attributes(
        out, faces, vn_cam, background=0.0, perspective=False
    )
    normal_img = normal_img * jax.lax.rsqrt(
        jnp.sum(normal_img * normal_img, axis=-1, keepdims=True) + 1e-12
    )
    alpha = silhouette_alpha(out, faces)
    mask = (out.face_id >= 0).astype(jnp.float32)
    normal_01 = jnp.where(
        mask[..., None] > 0, normal_img * 0.5 + 0.5, bg_normal
    )
    depth = jnp.where(out.face_id >= 0, out.depth, 0.0)
    return {
        "normal": normal_img,
        "comp_normal": normal_01,
        "opacity": alpha,
        "mask": mask,
        "depth": depth,
        "face_id": out.face_id,
        # () int32 true (face, tile) pair total — budget-overflow probe
        "num_pairs": out.num_pairs,
    }


def render_part_maps(
    keep_mesh: MTOutput,
    update_mesh: MTOutput,
    camera_local: RasterCamera,
    camera_global: Optional[RasterCamera],
    cfg: MeshRasterConfig,
) -> Dict[str, Array]:
    """LOCAL maps over keep(frozen) ∥ update, GLOBAL normal over the union.

    The keep mesh arrives pre-stop_gradiented (cached partition surface), so
    only the update region back-propagates — matching the reference's
    detached keep concat (`part_nvdiff_rasterizer.py:87-93`).
    """
    verts, faces, valid = concat_meshes(keep_mesh, update_mesh)
    local = render_geometry_maps(verts, faces, valid, camera_local, cfg)
    # Which local pixels show the update region (face ids past the keep part).
    n_keep_faces = keep_mesh.faces.shape[0]
    local["update_mask"] = (
        (local["face_id"] >= n_keep_faces).astype(jnp.float32)
    )
    out = {f"local_{k}": v for k, v in local.items()}
    if camera_global is not None:
        glob = render_geometry_maps(verts, faces, valid, camera_global, cfg)
        out.update({f"global_{k}": v for k, v in glob.items()})
    return out


def normal_consistency(mesh: MTOutput) -> Array:
    """Mean (1 − cos) between unit normals of edge-adjacent faces."""
    f = mesh.faces
    p0 = mesh.verts[f[:, 0]]
    p1 = mesh.verts[f[:, 1]]
    p2 = mesh.verts[f[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-20)
    n = jnp.where(mesh.faces_valid[:, None], n, 0.0)

    # Each face contributes its normal to its 3 edges; interior edges receive
    # exactly two unit normals: 1 − cos = 2 − |n_a + n_b|²/2 ... computed from
    # the scatter-added edge sums.
    e_lo = jnp.stack([f[:, 0], f[:, 1], f[:, 2]], -1)
    e_hi = jnp.stack([f[:, 1], f[:, 2], f[:, 0]], -1)
    lo = jnp.minimum(e_lo, e_hi)
    hi = jnp.maximum(e_lo, e_hi)
    valid3 = jnp.broadcast_to(mesh.faces_valid[:, None], lo.shape)
    budget = f.shape[0] * 2  # interior edges of a closed mesh: E = 3F/2
    slot, _, _, num_edges = unique_edge_slots(lo, hi, valid3, budget)

    sums = jnp.zeros((budget + 1, 3))
    counts = jnp.zeros((budget + 1,))
    tgt = jnp.minimum(slot, budget)
    sums = sums.at[tgt].add(jnp.broadcast_to(n[:, None, :], lo.shape + (3,)))
    counts = counts.at[tgt].add(jnp.where(valid3, 1.0, 0.0))
    sums = sums[:budget]
    counts = counts[:budget]

    interior = counts == 2.0
    sq = jnp.sum(sums * sums, axis=-1)
    # |a+b|² = 2 + 2·a·b for unit a, b  ⇒  1 − a·b = 2 − |a+b|²/2.
    one_minus_cos = jnp.where(interior, 2.0 - sq / 2.0, 0.0)
    denom = jnp.maximum(jnp.sum(interior), 1)
    return jnp.sum(one_minus_cos) / denom
