"""Tile binning: fixed-budget (gaussian, tile) pair expansion + lexicographic sort.

TPU-native re-design of the CUDA binning stage (`rasterizer_impl.cu:262-319`):

  cub InclusiveSum(tiles_touched)  →  jnp.cumsum
  duplicateWithKeys (scatter)      →  gather formulation: every pair slot p
                                      finds its gaussian via searchsorted on
                                      the cumsum, and its tile via the slot's
                                      offset within the gaussian's rectangle —
                                      no scatter, fully static shapes.
  cub RadixSort (tileID ‖ depth)   →  jax.lax.sort on (tile, depth, gauss)
                                      (lexicographic, deterministic).
  identifyTileRanges               →  searchsorted over the sorted tile ids.

The pair budget P is static; overflow pairs (beyond the budget) are assigned
the sentinel tile and dropped — `num_pairs` reports the true total so callers
can detect overflow and re-render with a larger budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.gaussian_raster.types import (
    GaussiansProjected,
    TileBinning,
)


def bin_gaussians(
    proj: GaussiansProjected,
    num_tiles_x: int,
    num_tiles_y: int,
    pair_budget: int,
) -> TileBinning:
    """Build depth-sorted per-tile pair lists with a static pair budget."""
    n = proj.depth.shape[0]
    num_tiles = num_tiles_x * num_tiles_y
    sentinel = num_tiles

    counts = proj.tiles_touched.astype(jnp.int32)  # (N,)
    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1]
    offsets = cum - counts  # exclusive prefix

    # Pair slot p ∈ [0, P) belongs to gaussian g(p) = first g with cum[g] > p.
    slots = jnp.arange(pair_budget, dtype=jnp.int32)
    g = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    valid = (slots < total) & (g < n)
    g_safe = jnp.clip(g, 0, n - 1)

    # Offset of the slot inside its gaussian's tile rectangle (row-major).
    local = slots - offsets[g_safe]
    rect_w = jnp.maximum(proj.rect_max[g_safe, 0] - proj.rect_min[g_safe, 0], 1)
    tx = proj.rect_min[g_safe, 0] + local % rect_w
    ty = proj.rect_min[g_safe, 1] + local // rect_w
    tile = ty * num_tiles_x + tx
    tile = jnp.where(valid, tile, sentinel).astype(jnp.int32)

    depth = jnp.where(valid, proj.depth[g_safe], jnp.inf).astype(jnp.float32)

    # Lexicographic sort by (tile, depth, gaussian) — deterministic.
    tile_s, _, gauss_s = jax.lax.sort(
        (tile, depth, g_safe.astype(jnp.int32)), num_keys=3
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)

    return TileBinning(
        pair_gauss=gauss_s,
        pair_tile=tile_s,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_pairs=total,
    )
