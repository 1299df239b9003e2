"""Public differentiable rendering entry point.

Equivalent surface to the reference's `GaussianRasterizer.__call__`
(`diff_gaussian_rasterization/__init__.py:171-224`): takes Gaussian parameters
+ camera, returns the composited image, per-Gaussian screen radii, and the
alpha/transmittance map. Backend selection:

  "xla"    — pure-JAX chunked scan (runs anywhere, autodiff backward).
  "pallas" — Pallas TPU kernels with hand-written backward (custom_vjp).
  "auto"   — pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import Array

from youreditableavatar_tpu.ops.gaussian_raster.binning import bin_gaussians
from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import (
    NUM_FIELDS,
    assemble_image,
    composite_tiles_xla,
    gather_pair_data,
)
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer configuration (all fields shape-affecting)."""

    tile_size: int = 32  # pixel tile edge; 32×32 = 1024 px = 8×128 f32 VMEM tile
    pair_budget: int = 1 << 19  # max (gaussian, tile) duplicated pairs
    tile_capacity: int = 2048  # max depth-sorted pairs composited per tile
    chunk: int = 32  # gaussians per scan step (xla backend)
    sh_degree: int = 3
    scale_mod: float = 1.0
    backend: str = "auto"
    pallas_interpret: bool = False  # run pallas kernels in interpreter mode
    # "support" = exact α ≥ 1/255 support bbox (default; renders the full
    # tail). "3sigma" = reference-faithful getRect square from the integer
    # 3σ radius (forward.cu:336-374) — hard-clips the tail beyond 3σ
    # exactly like the CUDA rasterizer. See RECT_DIVERGENCE.json for the
    # measured image/grad divergence between the modes.
    rect_mode: str = "support"


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def build_pallas_pair_rows(proj, binning, ntx: int, nty: int, pair_budget: int):
    """Chunk-aligned pair-row layout + aligned starts for the Pallas kernels.

    Index-side padding: scatter (gaussian+1) ids into the chunk-aligned
    layout (cheap 1-D scatter), then ONE row gather from fields with a zero
    row prepended — padding slots hit row 0 (inert: alpha 0), and the
    gather's VJP is ONE row scatter-add whose padding-slot garbage lands in
    the zero row and is sliced off by concatenate's VJP. Gather/scatter run
    ~3 GB/s on TPU regardless of row width, so the design minimizes the
    NUMBER of row-indexed ops (one per direction). The kernels consume the
    row-major layout through a flat (P·16/128, 128) view — no transpose is
    ever materialized.

    Returns (pair_rows (P_pad, NUM_FIELDS), aligned_starts (T,)).
    """
    fields_ext, pg_padded, astart = build_pallas_pair_layout(
        proj, binning, ntx, nty, pair_budget
    )
    # One row gather: indexed-op cost scales with the NUMBER of rows, and
    # the VJP becomes one row scatter-add whose padding-slot garbage lands
    # in the discarded zero row. (The fused path instead keeps this gather
    # inside composite_tiles_pallas_fused's VJP boundary and its backward
    # kernel returns per-gaussian grads directly.)
    pair_rows = fields_ext[pg_padded]
    return pair_rows, astart


def build_pallas_pair_layout(proj, binning, ntx: int, nty: int,
                             pair_budget: int):
    """(fields_ext (N+1, 16), pg_padded (P_pad,), aligned_starts (T,)).

    fields_ext column 9 holds the ROW ID (exact in f32 for N < 2^24) —
    the fused backward kernel reads it per pair from SMEM to route that
    pair's gradient into the per-gaussian accumulator."""
    from youreditableavatar_tpu.ops.gaussian_raster.binning import (
        pad_tile_ranges,
    )
    from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
        CHUNK,
    )

    padded_size = pair_budget + ntx * nty * CHUNK
    dst, astart, _total = pad_tile_ranges(binning, CHUNK, padded_size)
    fields_ext = _build_fields_ext(proj)
    pg_padded = jnp.zeros((padded_size,), jnp.int32).at[dst].set(
        binning.pair_gauss + 1, mode="drop"
    )
    return fields_ext, pg_padded, astart


def _build_fields_ext(proj):
    n = proj.opacity.shape[0]
    row_id = jax.lax.stop_gradient(
        jnp.arange(n, dtype=jnp.float32) + 1.0
    )
    fields = jnp.stack(
        [
            proj.mean2d[:, 0], proj.mean2d[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            proj.opacity,
            proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
            row_id,
        ],
        axis=1,
    )
    # Pad the N-sized table to the kernel's 16-field row width (plus the
    # zero row 0) BEFORE the P-sized gather: the pad is an N-row pass and
    # the gather then emits kernel-ready (P_pad, 16) rows directly — padding
    # the gathered result instead measured ~0.5 ms of extra P-row traffic.
    return jnp.pad(fields, ((1, 0), (0, NUM_FIELDS - 10)))


def build_pallas_pair_layout_counting(proj, ntx: int, nty: int,
                                      pair_budget: int, tile_size: int,
                                      interpret: bool = False):
    """Sort-free Pallas pair layout via the counting-sort kernels.

    Same products as `bin_gaussians` + `build_pallas_pair_layout` —
    bit-identical pg_padded/aligned starts (pinned by
    `test_raster_pallas.py::test_counting_layout_matches_sort`) — but the
    stable tile sort, the searchsorted range scan, and the scatter+cummax
    chunk alignment are all replaced by two O(P) Pallas passes
    (`ops/gaussian_raster/counting.py`).

    Returns (fields_ext, pg_padded, astart, tile_count, num_pairs).
    """
    import os

    from youreditableavatar_tpu.ops.gaussian_raster.binning import (
        expand_pairs,
        pack_depth_ordered,
    )
    from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
        CHUNK,
    )
    from youreditableavatar_tpu.ops.gaussian_raster.counting import (
        counting_layout,
    )
    from youreditableavatar_tpu.ops.gaussian_raster.expand_pallas import (
        BLK as EXPAND_BLK,
        expand_pairs_pallas,
    )

    padded_size = pair_budget + ntx * nty * CHUNK
    if (pair_budget % EXPAND_BLK == 0
            and os.environ.get("YEA_EXPAND", "pallas") != "xla"):
        packed = jax.lax.stop_gradient(pack_depth_ordered(proj))
        tile, gauss, total = expand_pairs_pallas(
            packed, pair_budget, ntx, nty, tile_size, interpret
        )
    else:
        tile, gauss, total = expand_pairs(
            proj, ntx, nty, pair_budget, tile_size
        )
    dst, astart, tile_count = counting_layout(
        tile, ntx * nty, CHUNK, padded_size, interpret
    )
    pg_padded = jnp.zeros((padded_size,), jnp.int32).at[dst].set(
        gauss + 1, mode="drop"
    )
    return _build_fields_ext(proj), pg_padded, astart, tile_count, total


def render_gaussians_checked(
    means3d, scales, quats, opacities, sh, camera,
    cfg: RasterizeConfig = RasterizeConfig(),
    bg=None, colors_override=None,
    snapshot_path: str = "snapshot_fw.npz",
) -> Dict[str, Array]:
    """`render_gaussians` + host-side non-finite check with input snapshot.

    Equivalent of the reference rasterizer's `debug` mode
    (`diff_gaussian_rasterization/__init__.py:83-90`): on a CUDA exception it
    dumps all kernel inputs to `snapshot_fw.dump` for offline repro. JAX has
    no device exception to catch, so the check is output finiteness: if the
    rendered image or alpha holds NaN/Inf, every input is saved to
    `snapshot_path` (npz) and a RuntimeError names it. Not jittable — use
    around isolated renders when debugging, not in the train step.
    """
    import numpy as np

    out = render_gaussians(
        means3d, scales, quats, opacities, sh, camera, cfg, bg,
        colors_override,
    )
    img = np.asarray(out["image"])
    alp = np.asarray(out["alpha"])
    if not (np.isfinite(img).all() and np.isfinite(alp).all()):
        np.savez(
            snapshot_path,
            means3d=np.asarray(means3d), scales=np.asarray(scales),
            quats=np.asarray(quats), opacities=np.asarray(opacities),
            sh=np.asarray(sh) if sh is not None else np.zeros(0),
            colors_override=(
                np.asarray(colors_override)
                if colors_override is not None else np.zeros(0)
            ),
            viewmat=np.asarray(camera.viewmat),
            fx=camera.fx, fy=camera.fy, cx=camera.cx, cy=camera.cy,
            width=camera.width, height=camera.height,
            bg=np.asarray(bg) if bg is not None else np.zeros(3),
        )
        raise RuntimeError(
            f"non-finite render output; inputs saved to {snapshot_path} "
            f"(reference debug-mode snapshot semantics)"
        )
    return out


def render_gaussians(
    means3d: Array,
    scales: Array,
    quats: Array,
    opacities: Array,
    sh: Optional[Array],
    camera: RasterCamera,
    cfg: RasterizeConfig = RasterizeConfig(),
    bg: Optional[Array] = None,
    colors_override: Optional[Array] = None,
) -> Dict[str, Array]:
    """Differentiably render N Gaussians to an image.

    Args:
      means3d: (N, 3); scales: (N, 3); quats: (N, 4) wxyz;
      opacities: (N,) in [0, 1]; sh: (N, K, 3) SH coefficients (or None with
      colors_override); camera: pinhole camera; bg: (3,) background color.
      colors_override: (N, 3) precomputed colors (bypasses SH).

    Returns dict with:
      image: (H, W, 3); alpha: (H, W) = 1 − final transmittance;
      final_t: (H, W); radii: (N,) int32; num_pairs: () int32 diagnostic.
    """
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    bg = jnp.asarray(bg, jnp.float32)

    ts = cfg.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)

    proj = preprocess_gaussians(
        means3d, scales, quats, opacities,
        sh if sh is not None else jnp.zeros((means3d.shape[0], 1, 3)),
        camera, cfg.sh_degree, ts, cfg.scale_mod, colors_override,
        rect_mode=cfg.rect_mode,
    )

    backend = _resolve_backend(cfg.backend)
    if backend == "xla":
        binning = bin_gaussians(proj, ntx, nty, cfg.pair_budget, ts)
        # Binning is index bookkeeping — no gradients flow through it.
        binning = jax.tree_util.tree_map(jax.lax.stop_gradient, binning)
        pair_data = gather_pair_data(
            proj.mean2d, proj.conic, proj.color, proj.opacity,
            binning.pair_gauss, binning.tile_start,
            jnp.minimum(binning.tile_count, cfg.tile_capacity),
            cfg.tile_capacity,
        )
        rgb_tiles, t_tiles, cnt_tiles = composite_tiles_xla(
            pair_data, ntx, nty, ts, cfg.chunk
        )
        tile_count = binning.tile_count
        num_pairs = binning.num_pairs
    elif backend == "pallas":
        from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
            composite_tiles_pallas_fused,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.counting import (
            MAX_BINS,
        )

        if ntx * nty <= MAX_BINS and cfg.pair_budget % 1024 == 0:
            # Sort-free counting-sort layout (ops/gaussian_raster/counting.py).
            fields_ext, pg_padded, astart, tile_count, num_pairs = (
                build_pallas_pair_layout_counting(
                    proj, ntx, nty, cfg.pair_budget, ts,
                    cfg.pallas_interpret,
                )
            )
        else:
            binning = bin_gaussians(proj, ntx, nty, cfg.pair_budget, ts)
            binning = jax.tree_util.tree_map(
                jax.lax.stop_gradient, binning
            )
            fields_ext, pg_padded, astart = build_pallas_pair_layout(
                proj, binning, ntx, nty, cfg.pair_budget
            )
            tile_count = binning.tile_count
            num_pairs = binning.num_pairs
        rgb_tiles, t_tiles, cnt_tiles = composite_tiles_pallas_fused(
            fields_ext, pg_padded, astart, tile_count,
            ntx, nty, ts, cfg.pallas_interpret,
        )
    else:
        raise ValueError(f"unknown rasterizer backend {backend!r}")
    # Tiles whose pair list exceeds tile_capacity lose their deepest pairs
    # in the XLA backend (the Pallas path has no cap) — surface the count so
    # callers can detect truncation and raise the capacity.
    tile_overflow = jnp.sum(tile_count > cfg.tile_capacity)

    rgb, final_t = assemble_image(
        rgb_tiles, t_tiles, ntx, nty, ts, camera.width, camera.height
    )
    # Per-pixel contributor *count* (cf. the reference's last-contributor
    # *rank* diagnostic, forward.cu:330-371 — they diverge when prefix
    # pairs fail the α test) — assembled like final_t.
    cnt = cnt_tiles.reshape(nty, ntx, ts, ts)
    cnt = jnp.transpose(cnt, (0, 2, 1, 3)).reshape(nty * ts, ntx * ts)
    cnt = jax.lax.stop_gradient(
        cnt[: camera.height, : camera.width].astype(jnp.int32))
    image = rgb + final_t[..., None] * bg
    return {
        "image": image,
        "alpha": 1.0 - final_t,
        "final_t": final_t,
        "n_contrib": cnt,
        "radii": proj.radius,
        "mean2d": proj.mean2d,
        "depth": proj.depth,
        "num_pairs": num_pairs,
        # () int32: tiles truncated by tile_capacity (xla backend only;
        # always report so the diagnostic is backend-independent).
        "num_tile_overflow": tile_overflow,
    }
