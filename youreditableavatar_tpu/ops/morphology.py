"""Mask morphology: image-space (dilate/erode/blur) + mesh-region variants.

Image ops replace the reference's cv2 calls (`mask_mesh_0822.py:162-199`);
mesh-region ops replace pymeshlab's dilate/erode selection morphology
(`mesh_localization.py:51-62`) with vertex/face adjacency sweeps — integer
id bookkeeping instead of coordinate matching, host numpy (runs between
stages, not per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def dilate(mask: Array, iterations: int = 1, size: int = 3) -> Array:
    """Binary dilation of an (H, W) mask with a size×size square kernel."""
    m = mask.astype(jnp.float32)[None, ..., None]
    for _ in range(iterations):
        m = jax.lax.reduce_window(
            m, -jnp.inf, jax.lax.max, (1, size, size, 1), (1, 1, 1, 1),
            "SAME",
        )
    return m[0, ..., 0]


def erode(mask: Array, iterations: int = 1, size: int = 3) -> Array:
    m = mask.astype(jnp.float32)
    return 1.0 - dilate(1.0 - m, iterations, size)


def box_blur(img: Array, size: int = 5) -> Array:
    """(H, W) or (H, W, C) box blur."""
    img = img.astype(jnp.float32)
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    x = x[None]
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size, 1), (1, 1, 1, 1), "SAME"
    ) / (size * size)
    x = x[0]
    return x[..., 0] if squeeze else x


def face_adjacency(faces: np.ndarray) -> np.ndarray:
    """(F, 3) int32: neighbor face id across each edge (−1 boundary)."""
    f = np.asarray(faces)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges_sorted = np.sort(edges, axis=1)
    keys = edges_sorted[:, 0].astype(np.int64) * (1 << 31) + edges_sorted[:, 1]
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    face_of = order % len(f)
    nbr = np.full(len(keys), -1, np.int64)
    same = ks[1:] == ks[:-1]
    i = np.flatnonzero(same)
    nbr[order[i]] = face_of[i + 1]
    nbr[order[i + 1]] = face_of[i]
    return nbr.reshape(3, len(f)).T.astype(np.int32)


def dilate_face_region(
    faces: np.ndarray, face_mask: np.ndarray, iterations: int = 1
) -> np.ndarray:
    """Grow a face selection across shared edges (pymeshlab dilate)."""
    adj = face_adjacency(faces)
    m = np.asarray(face_mask, bool).copy()
    for _ in range(iterations):
        nbr_sel = np.zeros_like(m)
        for k in range(3):
            valid = adj[:, k] >= 0
            nbr_sel[valid] |= m[adj[valid, k]]
        m = m | nbr_sel
    return m


def erode_face_region(
    faces: np.ndarray, face_mask: np.ndarray, iterations: int = 1
) -> np.ndarray:
    return ~dilate_face_region(faces, ~np.asarray(face_mask, bool), iterations)


def vertex_mask_from_faces(
    faces: np.ndarray, face_mask: np.ndarray, num_verts: int
) -> np.ndarray:
    m = np.zeros(num_verts, bool)
    m[np.unique(np.asarray(faces)[np.asarray(face_mask, bool)])] = True
    return m


def face_mask_from_vertices(
    faces: np.ndarray, vert_mask: np.ndarray, mode: str = "any"
) -> np.ndarray:
    vm = np.asarray(vert_mask, bool)[np.asarray(faces)]
    return vm.any(1) if mode == "any" else vm.all(1)
