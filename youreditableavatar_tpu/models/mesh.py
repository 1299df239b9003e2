"""Triangle-mesh container: lazy normals, tangents, UV atlas, cleanup.

Capability parity with the reference's `Mesh`
(`tetgs_spatial/models/mesh.py:12-315`): v_pos/t_pos_idx container with
cached vertex normals, xatlas UV unwrap (`_unwrap_uv` :215-255), tangent
frames from the UV parameterization (`_compute_vertex_tangent` :257-300),
trimesh outlier removal (`remove_outlier` :80-110) and the
normal-consistency regularizer.

TPU build notes: xatlas is not available in this image, so `unwrap_uv` is a
self-contained "smart projection" atlas — faces are clustered by dominant
normal axis (6 bins), each cluster is planar-projected and the charts are
packed into the unit square on a grid. Charts are seam-correct (vertices
are duplicated per chart) and the parameterization supports the same
tangent-frame math; swap in xatlas via the same method seam when available.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


@dataclasses.dataclass
class Mesh:
    v_pos: np.ndarray  # (V, 3) float32
    t_pos_idx: np.ndarray  # (F, 3) int64
    _v_nrm: Optional[np.ndarray] = None
    _v_tex: Optional[np.ndarray] = None  # (Vt, 2)
    _t_tex_idx: Optional[np.ndarray] = None  # (F, 3)
    _v_tng: Optional[np.ndarray] = None

    # ------------------------------------------------------------ normals

    @property
    def v_nrm(self) -> np.ndarray:
        if self._v_nrm is None:
            self._v_nrm = self._compute_vertex_normals()
        return self._v_nrm

    def _compute_vertex_normals(self) -> np.ndarray:
        v, f = self.v_pos, self.t_pos_idx
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        vn = np.zeros_like(v)
        for k in range(3):
            np.add.at(vn, f[:, k], fn)
        n = np.linalg.norm(vn, axis=-1, keepdims=True)
        return (vn / np.maximum(n, 1e-20)).astype(np.float32)

    # ------------------------------------------------------------ UV atlas

    @property
    def v_tex(self) -> np.ndarray:
        if self._v_tex is None:
            self.unwrap_uv()
        return self._v_tex

    @property
    def t_tex_idx(self) -> np.ndarray:
        if self._t_tex_idx is None:
            self.unwrap_uv()
        return self._t_tex_idx

    def unwrap_uv(self, padding: float = 0.02) -> None:
        """Normal-axis projection atlas (xatlas role, `mesh.py:215-255`)."""
        v, f = self.v_pos, self.t_pos_idx
        fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True),
                             1e-20)
        axis = np.argmax(np.abs(fn), axis=-1)  # 0/1/2
        sign = (fn[np.arange(len(f)), axis] >= 0).astype(np.int64)
        chart = axis * 2 + sign  # 6 charts
        # in-plane coordinate axes per chart
        plane = {0: (1, 2), 1: (1, 2), 2: (0, 2), 3: (0, 2),
                 4: (0, 1), 5: (0, 1)}

        charts_present = [c for c in range(6) if (chart == c).any()]
        cols = int(np.ceil(np.sqrt(len(charts_present))))
        rows = int(np.ceil(len(charts_present) / cols))
        cell = 1.0 / max(cols, rows)

        uvs, tidx = [], np.zeros_like(f)
        for slot, c in enumerate(charts_present):
            fsel = np.where(chart == c)[0]
            used, inv = np.unique(f[fsel].reshape(-1), return_inverse=True)
            a0, a1 = plane[c]
            p2 = v[used][:, (a0, a1)].astype(np.float64)
            p2 -= p2.min(0)
            p2 /= max(p2.max(), 1e-12)
            ox = (slot % cols) * cell
            oy = (slot // cols) * cell
            span = cell * (1.0 - 2 * padding)
            p2 = p2 * span + np.array([ox, oy]) + cell * padding
            base = sum(u.shape[0] for u in uvs)
            uvs.append(p2.astype(np.float32))
            tidx[fsel] = inv.reshape(-1, 3) + base
        self._v_tex = np.concatenate(uvs, axis=0)
        self._t_tex_idx = tidx.astype(np.int64)
        self._v_tng = None  # tangents depend on the parameterization

    # ------------------------------------------------------------ tangents

    @property
    def v_tng(self) -> np.ndarray:
        if self._v_tng is None:
            self._v_tng = self._compute_vertex_tangents()
        return self._v_tng

    def _compute_vertex_tangents(self) -> np.ndarray:
        """Per-vertex tangent of the UV parameterization
        (`mesh.py:257-300`): solve dP = T·du + B·dv per face, average onto
        vertices, Gram-Schmidt against the normal."""
        v, f = self.v_pos, self.t_pos_idx
        uv, ft = self.v_tex, self.t_tex_idx
        p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        t0, t1, t2 = uv[ft[:, 0]], uv[ft[:, 1]], uv[ft[:, 2]]
        e1, e2 = p1 - p0, p2 - p0
        d1, d2 = t1 - t0, t2 - t0
        det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        det = np.where(np.abs(det) < 1e-12, 1e-12, det)
        tang = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) / det[:, None]
        vt = np.zeros_like(v)
        for k in range(3):
            np.add.at(vt, f[:, k], tang)
        n = self.v_nrm
        vt = vt - n * np.sum(vt * n, axis=-1, keepdims=True)
        l = np.linalg.norm(vt, axis=-1, keepdims=True)
        fallback = np.cross(n, np.array([0.0, 0.0, 1.0], np.float32))
        fb_l = np.linalg.norm(fallback, axis=-1, keepdims=True)
        fallback = np.where(fb_l > 1e-6, fallback / np.maximum(fb_l, 1e-20),
                            np.array([1.0, 0.0, 0.0], np.float32))
        return np.where(l > 1e-8, vt / np.maximum(l, 1e-20),
                        fallback).astype(np.float32)

    # ------------------------------------------------------------ cleanup

    def remove_outliers(self, min_fraction: float = 0.1) -> "Mesh":
        """Keep face components ≥ min_fraction of the largest (trimesh
        outlier removal role, `mesh.py:80-110`)."""
        from youreditableavatar_tpu.stages.export import remove_floaters

        keep = remove_floaters(self.v_pos, self.t_pos_idx,
                               min_fraction=min_fraction)
        f = self.t_pos_idx[keep]
        used, inv = np.unique(f.reshape(-1), return_inverse=True)
        return Mesh(self.v_pos[used].copy(),
                    inv.reshape(-1, 3).astype(np.int64))

    # ------------------------------------------------------------ losses

    def normal_consistency(self) -> Array:
        from youreditableavatar_tpu.models.part_renderer import (
            normal_consistency as nc,
        )
        from youreditableavatar_tpu.ops.marching_tets import MTOutput

        nv, nf = len(self.v_pos), len(self.t_pos_idx)
        mt = MTOutput(
            verts=jnp.asarray(self.v_pos),
            verts_valid=jnp.ones((nv,), bool),
            faces=jnp.asarray(self.t_pos_idx, jnp.int32),
            faces_valid=jnp.ones((nf,), bool),
            face_to_tet=jnp.zeros((nf,), jnp.int32),
            num_verts=jnp.int32(nv),
            num_faces=jnp.int32(nf),
            edge_lo=jnp.zeros((nv,), jnp.int32),
            edge_hi=jnp.zeros((nv,), jnp.int32),
        )
        return nc(mt)
