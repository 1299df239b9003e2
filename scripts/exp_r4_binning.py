"""R4 binning experiments: attack the pair-expansion cull column-extraction
tax (profiled ~1.13 ms of the 3.5 ms binning at 512²/100k).

Variants measured (same chain() methodology as exp_r3_*: INNER-chained
fori_loops per dispatch, RTT-free):

  base      — production bin_gaussians (ONE (P,11) row gather, then ~10
              column extracts feeding the tile + exact ellipse-rect cull).
  transposed— same gather, then ONE (P,11)→(11,P) transpose and free row
              reads (tests whether one relayout beats 10 column extracts).
  feature   — lane-parallel cull: a handful of (P,16)×(16,8) MXU matmuls
              build edge-aligned (P,8) feature arrays (DX/AF/AFREE/LO/HI/…),
              ALL cull arithmetic stays lane-parallel on (P,8), and only
              TWO cross-lane ops remain (a lane-min/all reduction and the
              final tile/keep extraction).

All variants must produce identical (tile, gauss) pair lists — checked
before timing.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import RasterizeConfig
from youreditableavatar_tpu.ops.gaussian_raster.binning import bin_gaussians
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.segments import range_owner

INNER = 20
ITERS = 6
P = 1440 * 128
N = 100_000


def chain(fn, seed, perturb):
    @jax.jit
    def run(args):
        def body(_, args):
            return perturb(fn(*args), args)

        return jax.lax.fori_loop(0, INNER, body, args)

    out = run(seed)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(ITERS):
            o = run(o)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / (ITERS * INNER))
    return best * 1e3


def nf(x, v):
    return x + 1e-30 * v


# ---------------------------------------------------------------- variants


def _packed(proj, n):
    two_l = 2.0 * jnp.log(jnp.maximum(255.0 * proj.opacity, 1e-6))
    return jnp.stack(
        [
            proj.tiles_touched.astype(jnp.float32),
            proj.rect_min[:, 0].astype(jnp.float32),
            proj.rect_min[:, 1].astype(jnp.float32),
            jnp.maximum(
                proj.rect_max[:, 0] - proj.rect_min[:, 0], 1
            ).astype(jnp.float32),
            jnp.arange(n, dtype=jnp.int32).astype(jnp.float32),
            proj.mean2d[:, 0],
            proj.mean2d[:, 1],
            proj.conic[:, 0],
            proj.conic[:, 1],
            proj.conic[:, 2],
            two_l,
        ],
        axis=1,
    )


def _depth_order(proj, n):
    bits = jax.lax.bitcast_convert_type(proj.depth, jnp.int32)
    key = jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)
    _, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True)
    return order


def _edge_m(dx_fix, lo, hi, a_fix, a_free, b):
    dfree = jnp.clip(-b * dx_fix / jnp.maximum(a_free, 1e-12), lo, hi)
    return a_fix * dx_fix * dx_fix + 2.0 * b * dx_fix * dfree \
        + a_free * dfree * dfree


def bin_transposed(proj, ntx, nty, pair_budget, tile_size):
    """Variant: one transpose after the row gather, then row reads."""
    n = proj.depth.shape[0]
    num_tiles = ntx * nty
    sentinel = num_tiles
    order = _depth_order(proj, n)
    packed = _packed(proj, n)[order]
    counts = packed[:, 0].astype(jnp.int32)
    d_safe, local, valid = range_owner(counts, pair_budget)
    pr_t = packed[d_safe].T  # (11, P) — ONE relayout

    rect_w = pr_t[3]
    local_f = local.astype(jnp.float32)
    row = jnp.floor(local_f / rect_w)
    tx = pr_t[1] + local_f - row * rect_w
    ty = pr_t[2] + row
    tile = (ty * ntx + tx).astype(jnp.int32)
    g_safe = pr_t[4].astype(jnp.int32)

    mx, my = pr_t[5], pr_t[6]
    ca, cb, cc = pr_t[7], pr_t[8], pr_t[9]
    two_l = pr_t[10]
    ts_f = jnp.float32(tile_size)
    x0 = tx * ts_f - mx
    x1 = x0 + (ts_f - 1.0)
    y0 = ty * ts_f - my
    y1 = y0 + (ts_f - 1.0)
    m_edges = jnp.minimum(
        jnp.minimum(_edge_m(x0, y0, y1, ca, cc, cb),
                    _edge_m(x1, y0, y1, ca, cc, cb)),
        jnp.minimum(_edge_m(y0, x0, x1, cc, ca, cb),
                    _edge_m(y1, x0, x1, cc, ca, cb)),
    )
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
    keep = inside | (m_edges <= two_l)
    tile = jnp.where(valid & keep, tile, sentinel)
    tile_s, gauss_s = jax.lax.sort((tile, g_safe), num_keys=1,
                                   is_stable=True)
    return tile_s, gauss_s


def bin_feature(proj, ntx, nty, pair_budget, tile_size):
    """Variant: MXU feature matmuls; cull stays lane-parallel on (P, 8).

    Edge order e ∈ {0: x0-edge, 1: x1-edge, 2: y0-edge, 3: y1-edge}.
    Lanes 4..7 carry the `inside` sign tests (x0, −x1, y0, −y1).
    """
    n = proj.depth.shape[0]
    num_tiles = ntx * nty
    sentinel = num_tiles
    order = _depth_order(proj, n)
    packed = _packed(proj, n)[order]  # (N, 11)
    counts = packed[:, 0].astype(jnp.int32)
    d_safe, local, valid = range_owner(counts, pair_budget)
    R = packed[d_safe]  # (P, 11) — gathered ONCE; consumed ONLY by matmuls
    ts_f = float(tile_size)

    # 1-D per-pair basics (each one cross-lane extract or pure 1-D math)
    w = R[:, 3]
    g_safe = R[:, 4].astype(jnp.int32)
    local_f = local.astype(jnp.float32)
    row = jnp.floor(local_f / w)
    lm = local_f - row * w  # x offset within the rect

    cols = 11

    def sel(weights):  # (11, 8) selector
        m = np.zeros((cols, 8), np.float32)
        for c, e, v in weights:
            m[c, e] = v
        return jnp.asarray(m)

    # x0 = ts·(rect_min_x + lm) − mx; x1 = x0 + ts−1
    # y0 = ts·(rect_min_y + row) − my; y1 = y0 + ts−1
    # DX lanes: [x0, x1, y0, y1, x0, x1, y0, y1]
    # NOTE: TPU MXU multiplies in bf16 at default precision — these
    # features feed EXACT integer tile ids and boundary-sensitive cull
    # decisions, so every feature dot runs at HIGHEST (the matmuls are
    # K=11 and bandwidth-bound; extra passes are ~free).
    def dot(a, b):
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)

    m_dx = sel([(1, 0, ts_f), (5, 0, -1.0),
                (1, 1, ts_f), (5, 1, -1.0),
                (2, 2, ts_f), (6, 2, -1.0),
                (2, 3, ts_f), (6, 3, -1.0),
                (1, 4, ts_f), (5, 4, -1.0),
                (1, 5, ts_f), (5, 5, -1.0),
                (2, 6, ts_f), (6, 6, -1.0),
                (2, 7, ts_f), (6, 7, -1.0)])
    base = dot(R, m_dx)  # (P, 8)
    off_lane = jnp.asarray(
        [0.0, ts_f - 1.0, 0.0, ts_f - 1.0, 0.0, ts_f - 1.0, 0.0, ts_f - 1.0],
        jnp.float32)
    lm_lane = jnp.asarray([ts_f, ts_f, 0, 0, ts_f, ts_f, 0, 0], jnp.float32)
    row_lane = jnp.asarray([0, 0, ts_f, ts_f, 0, 0, ts_f, ts_f], jnp.float32)
    DX = base + off_lane + lm[:, None] * lm_lane + row[:, None] * row_lane

    # per-edge coefficient arrays (pure selectors)
    m_af = sel([(7, 0, 1), (7, 1, 1), (9, 2, 1), (9, 3, 1)])  # a_fix
    m_afree = sel([(9, 0, 1), (9, 1, 1), (7, 2, 1), (7, 3, 1)])  # a_free
    m_b = sel([(8, 0, 1), (8, 1, 1), (8, 2, 1), (8, 3, 1)])
    m_2l = sel([(10, e, 1) for e in range(4)])
    AF = dot(R, m_af)
    AFREE = dot(R, m_afree)
    B = dot(R, m_b)
    TWO_L = dot(R, m_2l)

    # free-coordinate range per edge: x-edges clip over [y0, y1], y-edges
    # over [x0, x1] — built with their own selectors + rank-1 terms.
    m_lo = sel([(2, 0, ts_f), (6, 0, -1.0),
                (2, 1, ts_f), (6, 1, -1.0),
                (1, 2, ts_f), (5, 2, -1.0),
                (1, 3, ts_f), (5, 3, -1.0)])
    lo_lm = jnp.asarray([0, 0, ts_f, ts_f, 0, 0, 0, 0], jnp.float32)
    lo_row = jnp.asarray([ts_f, ts_f, 0, 0, 0, 0, 0, 0], jnp.float32)
    LO = dot(R, m_lo) + lm[:, None] * lo_lm + row[:, None] * lo_row
    HI = LO + (ts_f - 1.0)

    e4 = slice(0, 4)
    dfree = jnp.clip(
        -B[:, e4] * DX[:, e4] / jnp.maximum(AFREE[:, e4], 1e-12),
        LO[:, e4], HI[:, e4])
    M = AF[:, e4] * DX[:, e4] * DX[:, e4] \
        + 2.0 * B[:, e4] * DX[:, e4] * dfree \
        + AFREE[:, e4] * dfree * dfree
    pass_edge = M <= TWO_L[:, e4]  # (P, 4)
    # inside: x0<=0, x1>=0, y0<=0, y1>=0 → lanes 4..7 sign pattern
    sgn = jnp.asarray([1.0, -1.0, 1.0, -1.0], jnp.float32)
    inside4 = (DX[:, 4:8] * sgn) <= 0.0
    keep = jnp.any(pass_edge, axis=1) | jnp.all(inside4, axis=1)

    # tile id: ty·ntx + tx = linear(R) + lm + ntx·row
    m_tile = sel([(2, 0, float(ntx)), (1, 0, 1.0)])
    tile_base = dot(R, m_tile)[:, 0]
    tile = (tile_base + lm + float(ntx) * row).astype(jnp.int32)
    tile = jnp.where(valid & keep, tile, sentinel)
    tile_s, gauss_s = jax.lax.sort((tile, g_safe), num_keys=1,
                                   is_stable=True)
    return tile_s, gauss_s


def main():
    cfg = RasterizeConfig(backend="pallas", pair_budget=P,
                          tile_capacity=8192, sh_degree=3)
    means, scales, quats, opac, sh, cam = make_scene()
    ts = cfg.tile_size
    ntx, nty = -(-cam.width // ts), -(-cam.height // ts)
    proj = jax.jit(lambda m: preprocess_gaussians(
        m, scales, quats, opac, sh, cam, cfg.sh_degree, ts,
        cfg.scale_mod, None))(means)

    # equivalence check first (feature variant reassociates the x0/y0
    # arithmetic — allow ulp-boundary cull flips, report the count)
    ref = jax.jit(lambda p: bin_gaussians(p, ntx, nty, P, ts))(proj)
    tt, gt_ = jax.jit(lambda p: bin_transposed(p, ntx, nty, P, ts))(proj)
    ft, fg = jax.jit(lambda p: bin_feature(p, ntx, nty, P, ts))(proj)
    np.testing.assert_array_equal(np.asarray(ref.pair_tile), np.asarray(tt))
    np.testing.assert_array_equal(np.asarray(ref.pair_gauss),
                                  np.asarray(gt_))
    mism = int((np.asarray(ref.pair_tile) != np.asarray(ft)).sum()) + \
        int((np.asarray(ref.pair_gauss) != np.asarray(fg)).sum())
    total = 2 * ref.pair_tile.shape[0]
    print(f"equivalence: transposed exact; feature {mism}/{total} "
          f"mismatched entries (ulp cull flips)", flush=True)
    assert mism <= total * 1e-3, "feature variant diverges beyond ulp noise"

    t = chain(lambda m2: bin_gaussians(
        proj._replace(mean2d=m2), ntx, nty, P, ts),
        (proj.mean2d,),
        lambda o, a: (nf(a[0], o.pair_gauss[0].astype(jnp.float32)),))
    print(f"base bin_gaussians:   {t:7.3f} ms", flush=True)

    t = chain(lambda m2: bin_transposed(
        proj._replace(mean2d=m2), ntx, nty, P, ts),
        (proj.mean2d,),
        lambda o, a: (nf(a[0], o[1][0].astype(jnp.float32)),))
    print(f"transposed variant:   {t:7.3f} ms", flush=True)

    t = chain(lambda m2: bin_feature(
        proj._replace(mean2d=m2), ntx, nty, P, ts),
        (proj.mean2d,),
        lambda o, a: (nf(a[0], o[1][0].astype(jnp.float32)),))
    print(f"feature variant:      {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
