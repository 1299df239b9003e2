"""Winding-number shape-guidance loss.

Capability parity with the reference's `ShapeLoss`
(`tetgs_spatial/utils/ops.py:389-427`, igl fast winding numbers): a guide
mesh defines target occupancy; the field's occupancy is pulled toward the
winding-number indicator with a binary cross-entropy, down-weighted near the
guide surface by a Gaussian of the point-to-mesh distance.

TPU re-design: the exact generalized winding number is evaluated in JAX via
the van Oosterom–Strackee solid-angle formula summed over triangles (a dense
(P, F) computation — batched MXU-friendly einsums, `lax.map`-chunked over
points), replacing libigl's CPU BVH approximation; the proximity weight uses
the native `MeshSDF` distance (host-side, precomputed per batch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def winding_number(
    points: Array, verts: Array, faces: Array, chunk: int = 2048
) -> Array:
    """Generalized winding number of each point w.r.t. the mesh.

    points: (P, 3); verts: (V, 3); faces: (F, 3) int. Returns (P,) — ≈1
    inside a watertight mesh, ≈0 outside.
    """
    tri = verts[faces]  # (F, 3, 3)

    def solid_angles(p):
        a = tri[:, 0] - p
        b = tri[:, 1] - p
        c = tri[:, 2] - p
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        det = jnp.einsum("fi,fi->f", a, jnp.cross(b, c))
        denom = (
            la * lb * lc
            + jnp.einsum("fi,fi->f", a, b) * lc
            + jnp.einsum("fi,fi->f", b, c) * la
            + jnp.einsum("fi,fi->f", c, a) * lb
        )
        return jnp.sum(2.0 * jnp.arctan2(det, denom))

    def chunk_fn(block):
        return jax.vmap(solid_angles)(block)

    p = points.shape[0]
    pad = (-p) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    blocks = pts.reshape(-1, chunk, 3)
    omega = jax.lax.map(chunk_fn, blocks).reshape(-1)[:p]
    return omega / (4.0 * np.pi)


class ShapeLoss:
    """BCE between field occupancy and guide-mesh winding occupancy.

    Mirrors `ShapeLoss.forward` (`ops.py:409-427`): indicator = w > 0.5,
    nerf_occ = 1 − exp(−δ·σ), weight = 1 − exp(−d²/(2·s²)) so points near
    the guide surface are unconstrained (σ there is supervised by rendering).
    """

    def __init__(
        self,
        verts: np.ndarray,
        faces: np.ndarray,
        mesh_scale: float = 0.7,
        proximal_surface: float = 0.3,
        delta: float = 0.2,
    ):
        v = np.asarray(verts, np.float32)
        center = 0.5 * (v.max(0) + v.min(0))
        scale = mesh_scale / max(np.abs(v - center).max(), 1e-9)
        self.verts = jnp.asarray((v - center) * scale)
        self.faces = jnp.asarray(np.asarray(faces, np.int64), jnp.int32)
        self.proximal_surface = proximal_surface
        self.delta = delta
        self._meshsdf = None
        if proximal_surface > 0:
            from youreditableavatar_tpu.native import MeshSDF

            self._meshsdf = MeshSDF(np.asarray(self.verts),
                                    np.asarray(faces, np.int64))

    def proximity_weight(self, points: np.ndarray) -> np.ndarray:
        """Host-side: 1 − gaussian(distance) (`ops.py:411-416`)."""
        if self._meshsdf is None:
            return np.ones(len(points), np.float32)
        d = np.abs(self._meshsdf(np.asarray(points, np.float32)))
        s = self.proximal_surface
        return (1.0 - np.exp(-(d * d) / (2.0 * s * s))).astype(np.float32)

    def __call__(
        self, points: Array, sigmas: Array,
        weight: Optional[Array] = None,
    ) -> Array:
        """points (P, 3), sigmas (P,) densities → scalar BCE loss."""
        w = winding_number(points, self.verts, self.faces)
        indicator = (w > 0.5).astype(jnp.float32)
        occ = jnp.clip(1.0 - jnp.exp(-self.delta * sigmas), 0.0, 1.1)
        ce = -(
            indicator * jnp.log(jnp.clip(occ, 1e-6, 1.0))
            + (1.0 - indicator) * jnp.log(jnp.clip(1.0 - occ, 1e-6, 1.0))
        )
        if weight is not None:
            ce = ce * weight
        return jnp.mean(ce)
