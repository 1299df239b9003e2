"""Marching tetrahedra + tet-grid machinery, static-shape (XLA-native).

Capability parity with the reference's pure-torch MT stack
(`tetgs_spatial/models/isosurface.py:15-345`: `_forward` MT, `mark_part_tets`,
`compact_tets`, `batch_subdivide_volume`) and kaolin's CUDA
`marching_tetrahedra` (`geometry/base.py:350-354,465-469`) — re-designed for
XLA's static-shape model:

  * Data-dependent vertex/face counts become fixed budgets + validity masks;
    overflow is reported, never silently truncated inside the budget.
  * Vertex deduplication (one vertex per cut grid edge) is a lexicographic
    `lax.sort` over (lo, hi, slot) int32 triples + first-occurrence ranking —
    no 64-bit composite keys (TPU-friendly, no x64), no dynamic uniques.
  * The reference's CPU set-intersection for overlap vertices
    (`isosurface.py:253-255`, float-coordinate Python sets) becomes exact
    integer vertex-id bookkeeping.
  * The tet grid itself is generated (6-tets-per-cube lattice) instead of
    shipping the quartet-sampled `512_tets.npz` (`load/download_tets.sh`).

The triangle/edge tables are the standard DMTet/kaolin marching-tets
constants (mathematical lookup tables, not code).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.ops.segments import range_owner

# Standard marching-tetrahedra tables. Occupancy code bit i = (sdf[v_i] > 0).
# Edge order: (0,1) (0,2) (0,3) (1,2) (1,3) (2,3).
TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)
NUM_TRIANGLES_TABLE = np.array(
    [0, 1, 1, 2, 1, 2, 2, 1, 1, 2, 2, 1, 2, 1, 1, 0], np.int32
)
TRIANGLE_TABLE = np.array(
    [
        [-1, -1, -1, -1, -1, -1],
        [1, 0, 2, -1, -1, -1],
        [4, 0, 3, -1, -1, -1],
        [1, 4, 2, 1, 3, 4],
        [3, 1, 5, -1, -1, -1],
        [2, 3, 0, 2, 5, 3],
        [1, 4, 0, 1, 5, 4],
        [4, 2, 5, -1, -1, -1],
        [4, 5, 2, -1, -1, -1],
        [4, 1, 0, 4, 5, 1],
        [3, 2, 0, 3, 5, 2],
        [1, 3, 5, -1, -1, -1],
        [4, 1, 2, 4, 3, 1],
        [3, 0, 4, -1, -1, -1],
        [2, 0, 1, -1, -1, -1],
        [-1, -1, -1, -1, -1, -1],
    ],
    np.int32,
)


def build_tet_grid(
    verts: np.ndarray,
    faces: np.ndarray,
    resolution: int = 64,
    band: float = 0.15,
    margin: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray]:
    """Custom tet grid fitted to a mesh (reference `tet_utils.py:8-45` role:
    pymeshlab resample + TetGen → here a lattice masked to the mesh's SDF
    band, which is what the marching domain actually needs).

    Keeps only tets whose cell lies within `band` (in normalized units) of
    the mesh surface, compacting vertices. The native `MeshSDF` BVH supplies
    the distance; geometry is normalized to [-0.5, 0.5]³ with `margin`.

    Returns (verts (V', 3) float32 in the MESH's original frame scale...
    normalized grid frame, tets (T', 4) int32) — same convention as
    `make_tet_grid` (the caller scales field queries, not the grid).
    """
    from youreditableavatar_tpu.native import MeshSDF

    v = np.asarray(verts, np.float32)
    center = 0.5 * (v.max(0) + v.min(0))
    half = max(np.abs(v - center).max(), 1e-9) / (0.5 - margin)
    v_n = (v - center) / half  # fits in [-0.5+margin, 0.5-margin]

    gverts, gtets = make_tet_grid(resolution)
    sdf = MeshSDF(v_n, np.asarray(faces, np.int64))(gverts)
    near = np.abs(sdf) <= band
    keep = near[gtets].any(axis=1)
    tets = gtets[keep]
    used, inv = np.unique(tets.reshape(-1), return_inverse=True)
    return gverts[used].copy(), inv.reshape(-1, 4).astype(np.int32)


def make_tet_grid(resolution: int) -> Tuple[np.ndarray, np.ndarray]:
    """Regular tetrahedral grid over [-0.5, 0.5]³ (host-side, numpy).

    Each lattice cube splits into 6 tetrahedra sharing the main diagonal.
    Replaces the downloaded `load/tets/512_tets.npz` grid — same role
    (vertices + tet indices for the SDF's marching domain), deterministic
    generation instead of a shipped asset.

    Returns:
      verts: ((R+1)³, 3) float32 in [-0.5, 0.5].
      tets: (6·R³, 4) int32.
    """
    r = resolution
    grid = np.stack(
        np.meshgrid(np.arange(r + 1), np.arange(r + 1), np.arange(r + 1),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    verts = grid.astype(np.float32) / r - 0.5

    def vid(i, j, k):
        return (i * (r + 1) + j) * (r + 1) + k

    i, j, k = np.meshgrid(np.arange(r), np.arange(r), np.arange(r),
                          indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    c = np.stack(
        [
            vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k),
            vid(i + 1, j + 1, k), vid(i, j, k + 1), vid(i + 1, j, k + 1),
            vid(i, j + 1, k + 1), vid(i + 1, j + 1, k + 1),
        ],
        axis=-1,
    )  # (R³, 8) cube corners
    # 6 tets per cube around the 0-7 diagonal.
    tet_corners = np.array(
        [
            [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
            [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7],
        ],
        np.int64,
    )
    tets = c[:, tet_corners].reshape(-1, 4)
    return verts, tets.astype(np.int32)


def unique_edge_slots(
    lo: Array, hi: Array, valid: Array, budget: int
) -> Tuple[Array, Array, Array, Array]:
    """Deduplicate undirected edges (lo ≤ hi) into ≤ budget slots.

    Pure int32: lexicographic sort of (lo, hi) with the flat position as
    payload, first-occurrence ranking, and a scatter of ranks back to the
    original positions. Invalid entries sort to the end and get slot = budget.

    Returns:
      slot: same shape as lo, int32 slot id per input edge (budget if invalid
        or overflowed).
      uniq_lo, uniq_hi: (budget,) endpoint ids per slot (0 where unused).
      num: () int32 true number of unique valid edges.
    """
    shape = lo.shape
    lo_f = jnp.where(valid, lo, jnp.iinfo(jnp.int32).max).reshape(-1)
    hi_f = jnp.where(valid, hi, jnp.iinfo(jnp.int32).max).reshape(-1)
    pos = jnp.arange(lo_f.shape[0], dtype=jnp.int32)
    lo_s, hi_s, pos_s = jax.lax.sort((lo_f, hi_f, pos), num_keys=2)

    valid_s = lo_s != jnp.iinfo(jnp.int32).max
    first = jnp.concatenate(
        [
            valid_s[:1],
            valid_s[1:]
            & ((lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])),
        ]
    )
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1  # unique index in sorted order
    num = jnp.where(jnp.any(valid_s), jnp.max(rank) + 1, 0)
    slot_sorted = jnp.where(valid_s & (rank < budget), rank, budget)
    slot = jnp.zeros((lo_f.shape[0],), jnp.int32).at[pos_s].set(slot_sorted)

    write = first & (rank < budget)
    tgt = jnp.where(write, rank, budget)
    uniq_lo = jnp.zeros((budget + 1,), jnp.int32).at[tgt].set(
        jnp.where(write, lo_s, 0)
    )[:budget]
    uniq_hi = jnp.zeros((budget + 1,), jnp.int32).at[tgt].set(
        jnp.where(write, hi_s, 0)
    )[:budget]
    return slot.reshape(shape), uniq_lo, uniq_hi, num


class MTOutput(NamedTuple):
    """Budgeted marching-tets surface."""

    verts: Array  # (max_verts, 3) float32; invalid slots = 0
    verts_valid: Array  # (max_verts,) bool
    faces: Array  # (max_faces, 3) int32 into verts; invalid = 0
    faces_valid: Array  # (max_faces,) bool
    face_to_tet: Array  # (max_faces,) int32 source tet index (−1 invalid)
    num_verts: Array  # () int32 true count (may exceed budget → overflow)
    num_faces: Array  # () int32 true count
    edge_lo: Array  # (max_verts,) int32 grid-edge endpoint a per vertex
    edge_hi: Array  # (max_verts,) int32 grid-edge endpoint b per vertex


def marching_tets(
    pos: Array,
    sdf: Array,
    tets: Array,
    max_verts: int,
    max_faces: int,
    tet_valid: Array | None = None,
) -> MTOutput:
    """Extract the sdf=0 surface of a tet grid (differentiable w.r.t. pos/sdf).

    Args:
      pos: (Nv, 3) grid vertex positions.
      sdf: (Nv,) signed distances.
      tets: (Nt, 4) int32 tet vertex ids.
      max_verts / max_faces: static output budgets.
      tet_valid: optional (Nt,) mask restricting extraction to a tet subset
        (the keep/update partition path).
    """
    nv = pos.shape[0]
    nt = tets.shape[0]
    occ = sdf > 0.0  # (Nv,)
    tet_occ = occ[tets]  # (Nt, 4)
    code = (
        tet_occ[:, 0].astype(jnp.int32)
        + tet_occ[:, 1].astype(jnp.int32) * 2
        + tet_occ[:, 2].astype(jnp.int32) * 4
        + tet_occ[:, 3].astype(jnp.int32) * 8
    )
    surf = (code > 0) & (code < 15)
    if tet_valid is not None:
        surf = surf & tet_valid

    edges = jnp.asarray(TET_EDGES)
    ev0 = tets[:, edges[:, 0]]  # (Nt, 6)
    ev1 = tets[:, edges[:, 1]]
    cut = occ[ev0] != occ[ev1]  # (Nt, 6)
    cut = cut & surf[:, None]

    lo = jnp.minimum(ev0, ev1)
    hi = jnp.maximum(ev0, ev1)
    edge_slot, va, vb, num_verts = unique_edge_slots(lo, hi, cut, max_verts)
    verts_valid = jnp.arange(max_verts) < jnp.minimum(num_verts, max_verts)

    sa = sdf[va]
    sb = sdf[vb]
    denom = sb - sa
    safe = jnp.abs(denom) >= 1e-10
    denom = jnp.where(safe, denom, 1.0)
    # Weight of endpoint a; 0.5 on degenerate/invalid edges keeps the
    # division's gradient finite (0·inf = NaN otherwise).
    t = jnp.where(safe & verts_valid, sb / denom, 0.5)
    verts = pos[va] * t[:, None] + pos[vb] * (1.0 - t[:, None])
    verts = jnp.where(verts_valid[:, None], verts, 0.0)

    tri_table = jnp.asarray(TRIANGLE_TABLE)
    ntri_table = jnp.asarray(NUM_TRIANGLES_TABLE)
    local = tri_table[code]  # (Nt, 6) local edge ids (−1 pad)
    local_safe = jnp.maximum(local, 0)
    global_vid = jnp.take_along_axis(edge_slot, local_safe, axis=1)  # (Nt, 6)

    ntri = jnp.where(surf, ntri_table[code], 0)  # (Nt,) 0..2
    num_faces = jnp.sum(ntri)

    # Face slot → owning tet via the scatter+cummax range-owner helper.
    g_safe, lf, fvalid = range_owner(ntri.astype(jnp.int32), max_faces)
    tri = global_vid[g_safe]  # (max_faces, 6)
    f0 = jnp.take_along_axis(tri, (lf * 3)[:, None], axis=1)[:, 0]
    f1 = jnp.take_along_axis(tri, (lf * 3 + 1)[:, None], axis=1)[:, 0]
    f2 = jnp.take_along_axis(tri, (lf * 3 + 2)[:, None], axis=1)[:, 0]
    faces = jnp.stack([f0, f1, f2], axis=-1)
    # Clamp guards the vertex-budget-overflow case (detectable via num_verts).
    faces = jnp.clip(jnp.where(fvalid[:, None], faces, 0), 0, max_verts - 1)
    face_to_tet = jnp.where(fvalid, g_safe, -1)

    return MTOutput(
        verts=verts,
        verts_valid=verts_valid,
        faces=faces,
        faces_valid=fvalid,
        face_to_tet=face_to_tet,
        num_verts=num_verts,
        num_faces=num_faces,
        edge_lo=va,
        edge_hi=vb,
    )


def compact_tets(
    pos: Array,
    sdf: Array,
    tets: Array,
    budget: int,
    threshold: float = 0.02,
    tet_mask: Array | None = None,
    corner_threshold: float = 0.0,
) -> Tuple[Array, Array, Array]:
    """Select near-surface tets: |mean vertex sdf| ≤ threshold, OR sign
    change, OR any corner within `corner_threshold` of the surface.

    Static-budget version of `isosurface.py:264-284`. `tet_mask` restricts
    selection (e.g. to the update partition) BEFORE the budget applies, so
    the budget is spent only on relevant tets. `corner_threshold` (typically
    one grid spacing) is the safety margin for the fine midpoint RE-QUERY:
    the true field can cross zero inside a tet whose corners are all one
    sign, and an unselected (unsubdivided) neighbor would leave a hole in
    the fine surface.

    Returns:
      idx: (budget,) int32 selected tet indices (clamped fill for invalid).
      valid: (budget,) bool.
      num: () int32 true count (> budget ⇒ overflow: tets were dropped).
    """
    tsdf = sdf[tets]  # (Nt, 4)
    near = jnp.abs(jnp.mean(tsdf, axis=-1)) <= threshold
    sign_change = (jnp.min(tsdf, -1) < 0) & (jnp.max(tsdf, -1) > 0)
    mask = near | sign_change
    if corner_threshold > 0.0:
        mask = mask | (jnp.min(jnp.abs(tsdf), -1) <= corner_threshold)
    if tet_mask is not None:
        mask = mask & tet_mask
    idx = jnp.nonzero(mask, size=budget, fill_value=0)[0].astype(jnp.int32)
    num = jnp.sum(mask)
    valid = jnp.arange(budget) < jnp.minimum(num, budget)
    return idx, valid, num


# make_tet_grid's 6-tets-per-cube split around the 0–7 diagonal; corner id
# n has lattice offset (n&1, n>>1&1, n>>2&1).
_TET_CORNERS = ((0, 1, 3, 7), (0, 3, 2, 7), (0, 2, 6, 7),
                (0, 6, 4, 7), (0, 4, 5, 7), (0, 5, 1, 7))


def compact_tets_lattice(
    sdf: Array,
    resolution: int,
    budget: int,
    threshold: float = 0.02,
    tet_mask: Array | None = None,
    corner_threshold: float = 0.0,
) -> Tuple[Array, Array, Array]:
    """`compact_tets` specialized to the `make_tet_grid` lattice.

    The generic version gathers every tet's 4 corner values (6.25M indexed
    rows at grid 64 — 33 ms/step on a v5e, pure index-issue cost); on the
    REGULAR 6-tet lattice each corner value is a shifted 3-D view of the
    (R+1)³ SDF volume, so the per-tet stats become elementwise slicing the
    TPU vector units chew through. Selection is identical: the flat tet
    order (cube-raveled · 6 + type) matches `make_tet_grid`, pinned by
    `test_geometry.py::TestCompactSubdivide::test_compact_lattice_matches_generic`.

    Returns (idx, valid, num) with idx indexing the FULL grid tet list.
    """
    r = resolution
    v = sdf.reshape(r + 1, r + 1, r + 1)
    corner = [
        v[n & 1:(n & 1) + r,
          (n >> 1) & 1:((n >> 1) & 1) + r,
          (n >> 2) & 1:((n >> 2) & 1) + r]
        for n in range(8)
    ]
    masks = []
    for cs in _TET_CORNERS:
        c0, c1, c2, c3 = (corner[c] for c in cs)
        mn = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
        mx = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
        mean = (c0 + c1 + c2 + c3) * 0.25
        m = (jnp.abs(mean) <= threshold) | ((mn < 0) & (mx > 0))
        if corner_threshold > 0.0:
            amn = jnp.minimum(
                jnp.minimum(jnp.abs(c0), jnp.abs(c1)),
                jnp.minimum(jnp.abs(c2), jnp.abs(c3)),
            )
            m = m | (amn <= corner_threshold)
        masks.append(m)
    mask = jnp.stack(masks, axis=-1).reshape(-1)  # (R³·6,) = flat tet order
    if tet_mask is not None:
        mask = mask & tet_mask
    idx = jnp.nonzero(mask, size=budget, fill_value=0)[0].astype(jnp.int32)
    num = jnp.sum(mask)
    valid = jnp.arange(budget) < jnp.minimum(num, budget)
    return idx, valid, num


def subdivide_tets(
    pos: Array,
    sdf: Array,
    tets: Array,
    tet_valid: Array,
    max_mid: int,
) -> Tuple[Array, Array, Array, Array, Array]:
    """1→8 midpoint subdivision of a tet subset (`isosurface.py:287-345`).

    Midpoints are deduplicated per grid edge via static-size unique. New
    vertices are appended after the parent vertex array; new vertex sdf is the
    edge-endpoint mean (callers typically re-query the field instead).

    Args:
      pos: (Nv, 3); sdf: (Nv,); tets: (M, 4) the subset (already gathered);
      tet_valid: (M,) mask; max_mid: static midpoint budget.
    Returns:
      new_pos: (Nv + max_mid, 3); new_sdf: (Nv + max_mid,);
      child_tets: (8·M, 4) int32 into new_pos;
      child_valid: (8·M,) bool; num_mid: () int32 true midpoint count.
    """
    nv = pos.shape[0]
    edges = jnp.asarray(TET_EDGES)
    ev0 = tets[:, edges[:, 0]]  # (M, 6)
    ev1 = tets[:, edges[:, 1]]
    lo = jnp.minimum(ev0, ev1)
    hi = jnp.maximum(ev0, ev1)
    valid6 = jnp.broadcast_to(tet_valid[:, None], lo.shape)
    slot, ma, mb, num_mid = unique_edge_slots(lo, hi, valid6, max_mid)
    mid_valid = jnp.arange(max_mid) < jnp.minimum(num_mid, max_mid)

    mid_pos = 0.5 * (pos[ma] + pos[mb])
    mid_sdf = 0.5 * (sdf[ma] + sdf[mb])
    new_pos = jnp.concatenate([pos, jnp.where(mid_valid[:, None], mid_pos, 0.0)])
    new_sdf = jnp.concatenate([sdf, jnp.where(mid_valid, mid_sdf, 0.0)])

    mid_slot = nv + jnp.minimum(slot, max_mid - 1)  # (M, 6)

    a, b, c, d = tets[:, 0], tets[:, 1], tets[:, 2], tets[:, 3]
    ab, ac, ad = mid_slot[:, 0], mid_slot[:, 1], mid_slot[:, 2]
    bc, bd, cd = mid_slot[:, 3], mid_slot[:, 4], mid_slot[:, 5]
    # 4 corner children + 4 octahedron children (split along ac–bd diagonal;
    # same decomposition as `batch_subdivide_volume`).
    children = jnp.stack(
        [
            jnp.stack([a, ab, ac, ad], -1),
            jnp.stack([b, bc, ab, bd], -1),
            jnp.stack([c, ac, bc, cd], -1),
            jnp.stack([d, ad, cd, bd], -1),  # ordered to keep parent parity
            jnp.stack([ab, ac, ad, bd], -1),
            jnp.stack([ab, bc, ac, bd], -1),
            jnp.stack([cd, ac, bc, bd], -1),
            jnp.stack([cd, ad, ac, bd], -1),
        ],
        axis=1,
    )  # (M, 8, 4)
    child_tets = children.reshape(-1, 4)
    child_valid = jnp.repeat(tet_valid, 8)
    return new_pos, new_sdf, child_tets, child_valid, num_mid


def mark_part_tets(
    tets: Array,
    face_to_tet: Array,
    faces_valid: Array,
    edit_face_mask: Array,
    num_tets: int | None = None,
) -> Tuple[Array, Array]:
    """Partition tets into frozen ("keep") and editable ("update") sets.

    Static re-design of `isosurface.py:208-261`: KEEP tets are those whose
    extracted surface faces are NOT editable (the frozen surface shell);
    UPDATE tets are the entire complement — including empty space, so edited
    geometry is free to grow/shrink anywhere outside the frozen shell
    (`mark_part_tets`: `keep_tet_idx = face_to_tet_idx[edit_mask == 0]`,
    update = unmapped). The reference's CPU float-set intersection for
    overlap vertices is replaced by :func:`overlap_vertex_mask` (integer id
    math).

    Args:
      tets: (Nt, 4); face_to_tet: (F,) tet id per MT face (−1 invalid);
      faces_valid: (F,) bool; edit_face_mask: (F,) bool editable faces.
    Returns:
      update_mask: (Nt,) bool; keep_mask: (Nt,) bool (= ~update).
    """
    nt = tets.shape[0] if num_tets is None else num_tets
    keep_hit = faces_valid & (~edit_face_mask) & (face_to_tet >= 0)
    tgt = jnp.where(keep_hit, face_to_tet, nt)  # sentinel row
    keep = jnp.zeros((nt + 1,), bool).at[tgt].set(True)[:nt]
    return ~keep, keep


def overlap_vertex_mask(
    tets: Array, update_mask: Array, num_verts: int
) -> Array:
    """(Nv,) bool: grid vertices used by both keep and update tets."""
    nv = num_verts
    in_update = jnp.zeros((nv,), bool).at[
        jnp.where(update_mask[:, None], tets, 0)
    ].set(True)
    # Correct for vertex 0 spuriously set when masked rows write index 0.
    v0_real = jnp.any(update_mask[:, None] & (tets == 0))
    in_update = in_update.at[0].set(v0_real)
    in_keep = jnp.zeros((nv,), bool).at[
        jnp.where(~update_mask[:, None], tets, 0)
    ].set(True)
    k0_real = jnp.any(~update_mask[:, None] & (tets == 0))
    in_keep = in_keep.at[0].set(k0_real)
    return in_update & in_keep
