"""Sharded photometric train step: views over `data`, raster tiles over `tile`.

One `shard_map` spans both axes:

  * each data-shard owns `views_per_shard` cameras (+ GT frames);
  * within a view, per-Gaussian preprocess/binning is replicated (cheap, and
    identical across devices by construction), while the compositing tile
    grid splits over the `tile` axis — each device composites its tile rows
    and the full image is re-assembled with an `all_gather` over ICI;
  * the full-image loss (l1 + D-SSIM, exact SSIM semantics — windows never
    cross devices because every device evaluates the gathered image) is
    identical on all tile-shards, so `pmean` over ("data", "tile") yields
    exact combined gradients: the 1/K of the tile-pmean cancels the K-fold
    cotangent amplification of the all-gather transpose (psum-scatter of K
    identical cotangents).

This is the TPU-native replacement for the reference's Lightning DDP over
views (§5.8) plus the CUDA thread-block tile grid.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from youreditableavatar_tpu.models.tetgs import (
    TetGSBinding,
    TetGSParams,
    gaussian_arrays,
)
from youreditableavatar_tpu.ops.gaussian_raster.binning import bin_gaussians
from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import (
    assemble_image,
    composite_tiles_xla,
    gather_pair_data,
)
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.render import RasterizeConfig
from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera
from youreditableavatar_tpu.ops.image_losses import l1_dssim


def _shard_proj_rows(proj, row_lo, rows_loc: int, tile_size: int):
    """Restrict a projection to a contiguous band of tile rows.

    Clips every Gaussian's tile rect to rows [row_lo, row_lo + rows_loc) and
    shifts both the rect and the screen mean into the band's local frame, so
    the unmodified `bin_gaussians` + Pallas compositing pipeline runs on the
    band as if it were the whole screen. Gaussians whose rect misses the band
    get tiles_touched = 0 and drop out of the pair expansion — the per-shard
    P-sized binning work (expansion, sort, scatter/gather, kernels) scales
    with the shard's own pair count, not the global one.
    """
    y_shift = (row_lo * tile_size).astype(jnp.float32)
    rmin_y = jnp.clip(proj.rect_min[:, 1] - row_lo, 0, rows_loc)
    rmax_y = jnp.clip(proj.rect_max[:, 1] - row_lo, 0, rows_loc)
    w_t = jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 0)
    h_t = jnp.maximum(rmax_y - rmin_y, 0)
    tiles = jnp.where(proj.tiles_touched > 0, w_t * h_t, 0)
    mean2d = proj.mean2d - jnp.stack(
        [jnp.zeros_like(y_shift), y_shift]
    )[None, :]
    return proj._replace(
        mean2d=mean2d,
        rect_min=jnp.stack([proj.rect_min[:, 0], rmin_y], axis=-1),
        rect_max=jnp.stack([proj.rect_max[:, 0], rmax_y], axis=-1),
        tiles_touched=tiles,
    )


def _render_tile_sharded(
    means, scales, quats, opac, sh, camera: RasterCamera,
    cfg: RasterizeConfig, bg: Array, tile_axis: str, tile_axis_size: int,
):
    """Render one view with the compositing grid sharded over `tile_axis`.

    Per-Gaussian preprocess is replicated across the tile axis (N-sized,
    sub-ms, and identical by construction — cheaper than an all-gather of
    the projected rows); everything P-sized — pair expansion, tile sort,
    chunk-aligned layout, and the compositing kernels — runs on the shard's
    own tile rows only. `cfg.pair_budget` is the PER-SHARD pair budget here.
    """
    ts = cfg.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)
    num_tiles = ntx * nty
    backend = "xla" if cfg.backend == "auto" and \
        jax.default_backend() != "tpu" else (
            "pallas" if cfg.backend == "auto" else cfg.backend)

    proj = preprocess_gaussians(
        means, scales, quats, opac, sh, camera, cfg.sh_degree, ts,
        cfg.scale_mod, rect_mode=cfg.rect_mode,
    )

    if backend == "pallas":
        from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
            composite_tiles_pallas,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.render import (
            build_pallas_pair_rows,
        )

        if nty % tile_axis_size != 0:
            raise ValueError(
                f"{nty} tile rows not divisible by tile axis "
                f"{tile_axis_size} (pallas shards whole tile rows)"
            )
        rows_loc = nty // tile_axis_size
        row_lo = jax.lax.axis_index(tile_axis) * rows_loc
        proj_loc = _shard_proj_rows(proj, row_lo, rows_loc, ts)
        binning = bin_gaussians(proj_loc, ntx, rows_loc, cfg.pair_budget, ts)
        binning = jax.tree_util.tree_map(jax.lax.stop_gradient, binning)
        pair_rows, astart = build_pallas_pair_rows(
            proj_loc, binning, ntx, rows_loc, cfg.pair_budget
        )
        rgb_loc, t_loc_arr, _ = composite_tiles_pallas(
            pair_rows, astart, binning.tile_count,
            ntx, rows_loc, ts, cfg.pallas_interpret,
        )
        tile_overflow = jnp.int32(0)  # pallas path composites uncapped
    elif backend == "xla":
        if num_tiles % tile_axis_size != 0:
            raise ValueError(
                f"{num_tiles} tiles not divisible by tile axis "
                f"{tile_axis_size}"
            )
        t_loc = num_tiles // tile_axis_size
        binning = bin_gaussians(proj, ntx, nty, cfg.pair_budget, ts)
        binning = jax.tree_util.tree_map(jax.lax.stop_gradient, binning)
        my = jax.lax.axis_index(tile_axis) * t_loc + jnp.arange(
            t_loc, dtype=jnp.int32
        )
        # Tiles beyond tile_capacity silently lose their deepest pairs —
        # count them (same diagnostic as render.py's num_tile_overflow) so
        # the train step can surface truncation instead of diverging from
        # the uncapped Pallas path without a trace.
        tile_overflow = jnp.sum(
            (binning.tile_count[my] > cfg.tile_capacity).astype(jnp.int32)
        )
        pair_local = gather_pair_data(
            proj.mean2d, proj.conic, proj.color, proj.opacity,
            binning.pair_gauss,
            binning.tile_start[my],
            jnp.minimum(binning.tile_count[my], cfg.tile_capacity),
            cfg.tile_capacity,
        )
        rgb_loc, t_loc_arr, _ = composite_tiles_xla(
            pair_local, ntx, nty, ts, cfg.chunk, tile_ids=my
        )
    else:
        raise ValueError(f"unknown rasterizer backend {backend!r}")

    rgb = jax.lax.all_gather(rgb_loc, tile_axis, axis=0, tiled=True)
    t_all = jax.lax.all_gather(t_loc_arr, tile_axis, axis=0, tiled=True)
    img, final_t = assemble_image(
        rgb, t_all, ntx, nty, ts, camera.width, camera.height
    )
    return img + final_t[..., None] * bg, tile_overflow


def make_sharded_render_train_step(
    binding: TetGSBinding,
    tx: optax.GradientTransformation,
    cfg: RasterizeConfig,
    mesh: Mesh,
    height: int,
    width: int,
    bg: Array | None = None,
    dssim_factor: float = 0.2,
    data_axis: str = "data",
    tile_axis: str = "tile",
):
    """Build a jitted multi-chip train step.

    The returned step takes (params, opt_state, batch) where batch holds
    stacked per-view arrays sharded over `data_axis` on axis 0:
      viewmats (B, 4, 4), fx/fy/cx/cy (B,), images (B, H, W, 3);
    B = data-axis size × views-per-shard. Returns (params, opt_state, loss,
    num_tile_overflow) — the last is the () int32 count of tiles truncated
    by `tile_capacity` this step (xla backend only; always 0 on pallas).
    """
    if bg is None:
        bg = jnp.zeros(3)
    tile_size_axis = mesh.shape[tile_axis]

    def per_device(params, opt_state, viewmats, fx, fy, cx, cy, images):
        def view_loss(params, i):
            cam = RasterCamera(
                viewmat=viewmats[i], fx=fx[i], fy=fy[i], cx=cx[i], cy=cy[i],
                width=width, height=height,
            )
            means, scales, quats, opac, sh = gaussian_arrays(binding, params)
            img, overflow = _render_tile_sharded(
                means, scales, quats, opac, sh, cam, cfg, bg,
                tile_axis, tile_size_axis,
            )
            return l1_dssim(img, images[i], dssim_factor), overflow

        def total_loss(params):
            n_local = viewmats.shape[0]
            losses, overflows = zip(
                *(view_loss(params, i) for i in range(n_local))
            )
            return jnp.mean(jnp.stack(losses)), sum(overflows)

        (loss, overflow), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, (data_axis, tile_axis))
        loss = jax.lax.pmean(loss, (data_axis, tile_axis))
        # Total capacity-truncated tiles this step, across all views and
        # tile shards (tile shards count disjoint tiles — sum, not mean).
        overflow = jax.lax.psum(
            jax.lax.psum(overflow, tile_axis), data_axis
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, overflow

    from jax import shard_map

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(), P(),  # params, opt_state replicated
            P(data_axis), P(data_axis), P(data_axis), P(data_axis),
            P(data_axis), P(data_axis),
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, batch: Dict[str, Array]):
        return sharded(
            params, opt_state, batch["viewmats"], batch["fx"], batch["fy"],
            batch["cx"], batch["cy"], batch["images"],
        )

    return step
