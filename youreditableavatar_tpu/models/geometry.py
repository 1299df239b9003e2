"""Partitioned tet-grid geometry: full/keep/update isosurface orchestration.

Capability parity with `tetgs_spatial/models/geometry/base.py:14-527`
(BaseImplicitGeometry): full-grid marching tets, the frozen/editable tet
partition (`part_isosurface_init` :231-306), cached fine keep-region SDF, and
the per-step partitioned extraction (`_part_isosurface` :308-485) where keep
vertices read the frozen field and update vertices the live one.

TPU re-design (SURVEY §7 P1/§5.7): all data-dependent steps live behind
static budgets —

  * the keep region is subdivided ONCE at partition time with the frozen
    field (its SDF never changes), and its marching-tets surface is cached —
    the reference re-extracts the identical mesh every step;
  * the per-step update path is fully jittable: scatter live SDF over the
    update-exclusive vertices (overlap vertices stay frozen — the reference's
    CPU set-intersection becomes an int mask), budgeted near-surface
    compaction, one midpoint subdivision with live re-query, marching tets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from youreditableavatar_tpu.models.sdf import SDFField
from youreditableavatar_tpu.ops.marching_tets import (
    MTOutput,
    compact_tets,
    compact_tets_lattice,
    make_tet_grid,
    marching_tets,
    mark_part_tets,
    overlap_vertex_mask,
    subdivide_tets,
)


@dataclasses.dataclass(frozen=True)
class GeometryBudgets:
    """Static shape budgets (overflow is detectable via num_* fields)."""

    mt_verts: int = 1 << 16
    mt_faces: int = 1 << 17
    compact: int = 1 << 14  # near-surface update tets kept for subdivision
    subdiv_mid: int = 1 << 16  # midpoint vertices for the 8× subdivision
    fine_mt_verts: int = 1 << 16
    fine_mt_faces: int = 1 << 17


class Partition(NamedTuple):
    """Frozen partition state produced at `partition_init`."""

    update_tet_mask: Array  # (Nt,) bool
    keep_tet_mask: Array  # (Nt,) bool
    overlap_verts: Array  # (Nv,) bool — frozen even inside the update region
    live_vert_mask: Array  # (Nv,) bool — vertices that read the live field
    frozen_sdf: Array  # (Nv,) frozen field at all grid vertices
    keep_mesh: MTOutput  # cached fine keep-region surface
    keep_fine_pos: Array  # subdivided keep vertices (diagnostics/export)
    keep_fine_sdf: Array
    # Exact-size index forms of the masks (host-computed once at
    # partition_init; static shapes for the jitted step). The per-step
    # surface extraction touches O(update region), not O(grid): at the
    # production scale (grid 64 → 275k verts / 1.6M tets) evaluating the
    # live hash-grid field over all vertices and compacting over all tets
    # cost several seconds per step.
    live_vert_idx: Array  # (Lv,) int32 — vertices that read the live field
    update_tet_idx: Array  # (Lt,) int32 — tets in the update region


class TetGeometry:
    """Field + tet grid + budgets."""

    def __init__(
        self,
        field: SDFField,
        resolution: int = 64,
        budgets: GeometryBudgets = GeometryBudgets(),
        grid_scale: float = 2.0,
    ):
        self.field = field
        self.budgets = budgets
        verts, tets = make_tet_grid(resolution)
        # Grid spans [-scale/2, scale/2]³ (reference grids live in the
        # isosurface bbox of radius `field.cfg.radius`).
        self.grid_pos = jnp.asarray(verts * grid_scale)
        self.grid_tets = jnp.asarray(tets)
        self.resolution = resolution
        self.spacing = grid_scale / resolution

    # ---- full-grid surface -------------------------------------------------

    def isosurface(
        self, params: Dict[str, Any], level_mask: Optional[Array] = None
    ) -> MTOutput:
        """Full-grid marching tets of the live field."""
        sdf = self.field.forward_sdf_chunked(
            params, self.grid_pos, level_mask=level_mask
        )
        return marching_tets(
            self.grid_pos, sdf, self.grid_tets,
            self.budgets.mt_verts, self.budgets.mt_faces,
        )

    # ---- partition ---------------------------------------------------------

    def partition_init(
        self,
        frozen_params: Dict[str, Any],
        edit_face_mask: Array,
        frozen_mt: Optional[MTOutput] = None,
    ) -> Partition:
        """Split the grid into keep/update from an editable-face mask.

        Args:
          frozen_params: the previous-stage field (frozen).
          edit_face_mask: (max_faces,) bool over `frozen_mt` faces (from
            `editing_region_info.npy` remapping).
          frozen_mt: surface of the frozen field (recomputed if omitted).
        """
        if frozen_mt is None:
            frozen_mt = self.isosurface(frozen_params)
        frozen_sdf = self.field.forward_sdf_chunked(
            frozen_params, self.grid_pos
        )

        update_mask, keep_mask = mark_part_tets(
            self.grid_tets, frozen_mt.face_to_tet, frozen_mt.faces_valid,
            edit_face_mask,
        )
        overlap = overlap_vertex_mask(
            self.grid_tets, update_mask, self.grid_pos.shape[0]
        )
        # Vertices of update tets, minus overlap, read the live field.
        nv = self.grid_pos.shape[0]
        in_update = jnp.zeros((nv,), bool).at[
            jnp.where(update_mask[:, None], self.grid_tets, 0)
        ].set(True)
        v0_real = jnp.any(update_mask[:, None] & (self.grid_tets == 0))
        in_update = in_update.at[0].set(v0_real)
        live_mask = in_update & (~overlap)

        # Fine keep region: compact near-surface keep tets with the frozen
        # field, subdivide once, re-query frozen field at midpoints, extract.
        keep_sdf = frozen_sdf
        idx, valid, _ = compact_tets(
            self.grid_pos, keep_sdf, self.grid_tets, self.budgets.compact,
            tet_mask=keep_mask, corner_threshold=self.spacing,
        )
        sel_keep = valid
        sub_tets = self.grid_tets[idx]
        fine_pos, fine_sdf_approx, child_tets, child_valid, _ = subdivide_tets(
            self.grid_pos, keep_sdf, sub_tets, sel_keep,
            self.budgets.subdiv_mid,
        )
        # Re-query the frozen field at the true midpoints (the reference
        # caches exact fine keep-SDF, `geometry/base.py:282-306`).
        n_base = self.grid_pos.shape[0]
        mids = fine_pos[n_base:]
        mid_sdf = self.field.forward_sdf_chunked(frozen_params, mids)
        fine_sdf = jnp.concatenate([keep_sdf, mid_sdf])
        keep_mesh = marching_tets(
            fine_pos, fine_sdf, child_tets,
            self.budgets.fine_mt_verts, self.budgets.fine_mt_faces,
            tet_valid=child_valid,
        )
        # Exact-size index sets (partition_init runs eagerly, so the sizes
        # can be data-dependent here while staying static for the step jit).
        live_idx = np.flatnonzero(np.asarray(live_mask)).astype(np.int32)
        upd_idx = np.flatnonzero(np.asarray(update_mask)).astype(np.int32)
        return Partition(
            update_tet_mask=update_mask,
            keep_tet_mask=keep_mask,
            overlap_verts=overlap,
            live_vert_mask=live_mask,
            frozen_sdf=frozen_sdf,
            keep_mesh=jax.tree_util.tree_map(jax.lax.stop_gradient, keep_mesh),
            keep_fine_pos=fine_pos,
            keep_fine_sdf=fine_sdf,
            live_vert_idx=jnp.asarray(live_idx),
            update_tet_idx=jnp.asarray(upd_idx),
        )

    # ---- per-step update surface (jittable) --------------------------------

    def part_isosurface(
        self,
        params: Dict[str, Any],
        part: Partition,
        level_mask: Optional[Array] = None,
        n_active: Optional[int] = None,
    ) -> MTOutput:
        """Update-region surface from the live field (differentiable).

        Composite SDF: frozen values everywhere, live values scattered on the
        update-exclusive vertices (`_part_isosurface` dual-MLP semantics,
        `geometry/base.py:376-456`); then budgeted compaction + one live
        subdivision + marching tets restricted to update tets.

        Work scales with the UPDATE REGION, not the grid: the live field is
        evaluated only at `part.live_vert_idx` and compaction scans only
        `part.update_tet_idx`.

        Gradient sparsity (TPU-critical): the loss reads SDF values only at
        vertices of the SELECTED (near-surface) tets — marching tets never
        consumes the rest — so the update-region sweep runs under
        stop_gradient (selection only) and a second, sparse forward over the
        ≤4·compact selected-tet corners carries the gradient. Without this,
        the hash-grid gather's scatter-add VJP runs over every live vertex
        (update = complement of the keep shell, i.e. ~the whole grid:
        `mark_part_tets`), measured 2.2M scatter rows/level — 1.3 s of the
        3.0 s stage-1 step at grid 64/512². The sparse requery is exact, not
        approximate: same params ⇒ same values; only the grad path changes.
        """
        live_idx = part.live_vert_idx
        live_vals = jax.lax.stop_gradient(
            self.field.forward_sdf(
                params, self.grid_pos[live_idx], level_mask=level_mask,
                n_active=n_active,
            )
        )
        sdf0 = part.frozen_sdf.at[live_idx].set(live_vals)
        mt, _ = self._part_core(params, part, sdf0, level_mask, n_active)
        return mt

    def part_isosurface_cached(
        self,
        params: Dict[str, Any],
        part: Partition,
        sdf_cache: Array,
        refresh_idx: Array,
        level_mask: Optional[Array] = None,
        n_active: Optional[int] = None,
    ) -> Tuple[MTOutput, Array]:
        """`part_isosurface` with a carried selection cache (jittable).

        The full live-vertex sweep exists only to pick near-surface tets
        (compact_tets); its values carry no gradient and change slowly far
        from the surface. This variant reads the carried composite SDF
        `sdf_cache` instead, refreshing (a) a rotating no-grad slice
        `refresh_idx` of the live vertices (staleness bound: every vertex
        refreshes every K steps) and (b) every selected-tet corner, fresh
        each step via the sparse grad requery — so vertices AT the moving
        surface front are never stale (a tet the surface moves into shares
        corners with currently-selected tets). Selection may differ from the
        uncached path only where a >K-step-old far-field value straddles the
        compaction threshold; the extracted surface itself always uses
        this-step values. Eliminates the ~2.2M-row/level hash gathers of the
        full sweep (measured 334 ms of the 1.7 s stage-1 step at grid 64).

        Returns (mt, new_cache); carry new_cache into the next step.
        """
        refresh_vals = jax.lax.stop_gradient(
            self.field.forward_sdf(
                params, self.grid_pos[refresh_idx], level_mask=level_mask,
                n_active=n_active,
            )
        )
        sdf0 = sdf_cache.at[refresh_idx].set(refresh_vals)
        return self._part_core(params, part, sdf0, level_mask, n_active)

    def _part_core(
        self,
        params: Dict[str, Any],
        part: Partition,
        sdf0: Array,
        level_mask: Optional[Array],
        n_active: Optional[int] = None,
    ) -> Tuple[MTOutput, Array]:
        """Selection on `sdf0` (stop-grad composite), sparse grad requery,
        subdivision + marching tets. Returns (mt, new_cache) where new_cache
        is sdf0 with this step's fresh values written at selected corners."""
        # Lattice-specialized selection: shifted-volume stats + the update
        # mask instead of gathering 4 corners of every update tet (the two
        # gathers it replaces measured ~60 ms/step at grid 64 on a v5e).
        idx, valid, _ = compact_tets_lattice(
            sdf0, self.resolution, self.budgets.compact,
            tet_mask=part.update_tet_mask,
            corner_threshold=self.spacing,
        )
        sel = valid
        sub_tets = self.grid_tets[idx]

        # Sparse grad-enabled requery at selected-tet corners. Each unique
        # vertex gets exactly ONE owner row so the scatter-add VJP does not
        # multi-count duplicate corners; non-owners add an exact zero. The
        # owner row's add replaces the (possibly cache-stale) value with the
        # fresh one: sdf0[v] + (fresh − sdf0[v]) = fresh, with gradient
        # d(fresh) (sdf0 is stop-grad by construction).
        nv = self.grid_pos.shape[0]
        live_sel = part.live_vert_mask[
            jnp.where(valid[:, None], sub_tets, 0)
        ] & valid[:, None]
        live_flat = live_sel.reshape(-1)
        sv = jnp.where(live_flat, sub_tets.reshape(-1), 0)
        fresh = self.field.forward_sdf(
            params, self.grid_pos[sv], level_mask=level_mask,
            n_active=n_active,
        )
        # Owner bookkeeping routes non-live rows to a sentinel slot `nv`
        # (NOT vertex 0): if grid vertex 0 is itself a live selected corner,
        # aliasing padding rows to 0 could let a padding row win the
        # duplicate-index scatter, leaving vertex 0 ownerless (stale value,
        # zero gradient).
        sv_own = jnp.where(live_flat, sv, nv)
        rows = jnp.arange(sv.shape[0], dtype=jnp.int32)
        owner = jnp.full((nv + 1,), -1, jnp.int32).at[sv_own].set(rows)
        is_owner = (owner[sv_own] == rows) & live_flat
        delta = jnp.where(is_owner, fresh - sdf0[sv], 0.0)
        sdf = sdf0.at[sv].add(delta)
        new_cache = jax.lax.stop_gradient(sdf)
        fine_pos, _, child_tets, child_valid, _ = subdivide_tets(
            self.grid_pos, sdf, sub_tets, sel, self.budgets.subdiv_mid
        )
        n_base = self.grid_pos.shape[0]
        mids = fine_pos[n_base:]
        mid_live = self.field.forward_sdf_chunked(
            params, mids, level_mask=level_mask, n_active=n_active
        )
        fine_sdf = jnp.concatenate([sdf, mid_live])
        mt = marching_tets(
            fine_pos, fine_sdf, child_tets,
            self.budgets.fine_mt_verts, self.budgets.fine_mt_faces,
            tet_valid=child_valid,
        )
        return mt, new_cache


def concat_meshes(a: MTOutput, b: MTOutput) -> Tuple[Array, Array, Array]:
    """(verts, faces, faces_valid) of two budgeted meshes concatenated
    (keep ∥ update, as `part_nvdiff_rasterizer.py:87-99` concatenates for the
    local render)."""
    nva = a.verts.shape[0]
    verts = jnp.concatenate([a.verts, b.verts])
    faces = jnp.concatenate([a.faces, b.faces + nva])
    valid = jnp.concatenate([a.faces_valid, b.faces_valid])
    return verts, faces, valid
