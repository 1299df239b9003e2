"""Triangle visibility rasterization: tile binning + z-buffer resolve.

The geometry pipeline mirrors the Gaussian rasterizer's: per-face screen-space
preprocess (XLA), fixed-budget (face, tile) pair expansion + stable tile sort
(reusing `gaussian_raster.binning` machinery via the same `range_owner`
helper), then a per-tile resolve loop — Pallas on TPU, `lax.scan` fallback
elsewhere. Outputs per pixel: visible face id (−1 = background), affine
barycentrics (l1, l2), and NDC depth. All outputs are non-differentiable by
construction (visibility is a discrete argmin); see `interpolate.py` for the
differentiable re-attach.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera
from youreditableavatar_tpu.ops.segments import range_owner

# Per-face field rows in the (16, P) pair layout:
# 0..5: x0,y0,x1,y1,x2,y2 (screen px)  6..8: z0,z1,z2 (ndc)  9: face id (+1)
F_X0, F_Y0, F_X1, F_Y1, F_X2, F_Y2, F_Z0, F_Z1, F_Z2, F_FID = range(10)
NUM_FIELDS = 16
CHUNK = 128
SUB, LANE = 8, 128
Z_FAR = 3.4e38  # empty-pixel depth sentinel


@dataclasses.dataclass(frozen=True)
class MeshRasterConfig:
    tile_size: int = 32
    pair_budget: int = 1 << 18
    tile_capacity: int = 2048  # xla-fallback per-tile face bound
    backface_cull: bool = False  # reference nvdiffrast does not cull
    near: float = 1e-4
    backend: str = "auto"
    pallas_interpret: bool = False


class RasterOutput(NamedTuple):
    face_id: Array  # (H, W) int32, −1 background
    bary: Array  # (H, W, 2) affine (l1, l2) of the visible face
    depth: Array  # (H, W) ndc z of the visible face (Z_FAR background)
    verts_screen: Array  # (V, 2) screen positions (for downstream reuse)
    verts_zw: Array  # (V, 2) (z_ndc, inv_w) per vertex
    num_pairs: Array  # () int32 true (face, tile) pair total — compare
    #   against cfg.pair_budget to detect truncation (the CUDA reference
    #   sizes buffers exactly, rasterizer_impl.cu:277-303; we must detect)


def project_vertices(
    verts: Array, camera: RasterCamera, near: float
) -> Tuple[Array, Array, Array]:
    """World → (screen xy, ndc z, 1/w). Differentiable."""
    w = camera.viewmat
    x = verts[:, 0] * w[0, 0] + verts[:, 1] * w[0, 1] + verts[:, 2] * w[0, 2] + w[0, 3]
    y = verts[:, 0] * w[1, 0] + verts[:, 1] * w[1, 1] + verts[:, 2] * w[1, 2] + w[1, 3]
    z = verts[:, 0] * w[2, 0] + verts[:, 1] * w[2, 1] + verts[:, 2] * w[2, 2] + w[2, 3]
    z_safe = jnp.maximum(z, near)
    sx = camera.fx * x / z_safe + camera.cx
    sy = camera.fy * y / z_safe + camera.cy
    inv_w = 1.0 / z_safe
    # "ndc z": monotone in view z; screen-affine per triangle. Use 1 − 1/z
    # (bounded, increasing with distance) as the depth key.
    zndc = 1.0 - inv_w
    valid = z > near
    return jnp.stack([sx, sy], -1), jnp.stack([zndc, inv_w], -1), valid


def _face_fields(
    verts_screen: Array, verts_zw: Array, vert_valid: Array, faces: Array,
    faces_valid: Array | None, camera: RasterCamera, cfg: MeshRasterConfig,
):
    """Per-face screen data + tile rectangles (mirrors gaussian preprocess)."""
    f = faces
    p0 = verts_screen[f[:, 0]]
    p1 = verts_screen[f[:, 1]]
    p2 = verts_screen[f[:, 2]]
    z0 = verts_zw[f[:, 0], 0]
    z1 = verts_zw[f[:, 1], 0]
    z2 = verts_zw[f[:, 2], 0]

    ok = vert_valid[f[:, 0]] & vert_valid[f[:, 1]] & vert_valid[f[:, 2]]
    if faces_valid is not None:
        ok = ok & faces_valid
    area = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
        p1[:, 1] - p0[:, 1]
    ) * (p2[:, 0] - p0[:, 0])
    if cfg.backface_cull:
        ok = ok & (area > 0.0)
    else:
        ok = ok & (jnp.abs(area) > 1e-12)

    ts = cfg.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)
    xmin = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
    xmax = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
    ymin = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
    ymax = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
    rect_min_x = jnp.clip(jnp.floor(xmin / ts), 0, ntx).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor(ymin / ts), 0, nty).astype(jnp.int32)
    rect_max_x = jnp.clip(jnp.floor(xmax / ts) + 1, 0, ntx).astype(jnp.int32)
    rect_max_y = jnp.clip(jnp.floor(ymax / ts) + 1, 0, nty).astype(jnp.int32)
    offscreen = (xmax < 0) | (xmin >= camera.width) | (ymax < 0) | (
        ymin >= camera.height
    )
    ok = ok & (~offscreen)
    w_t = jnp.maximum(rect_max_x - rect_min_x, 0)
    h_t = jnp.maximum(rect_max_y - rect_min_y, 0)
    tiles = jnp.where(ok, w_t * h_t, 0).astype(jnp.int32)

    nf = faces.shape[0]
    fields = jnp.stack(
        [
            p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1],
            z0, z1, z2,
            (jnp.arange(nf, dtype=jnp.int32) + 1).astype(jnp.float32),
        ]
        + [jnp.zeros((nf,), jnp.float32)] * (NUM_FIELDS - 10),
        axis=1,
    )  # (F, 16)
    rect = (rect_min_x, rect_min_y, rect_max_x)
    return fields, tiles, rect, ntx, nty


def _expand_pairs(tiles, rect, ntx, nty, pair_budget):
    """(face, tile) pair expansion + stable tile sort (chunk-aligned)."""
    rect_min_x, rect_min_y, rect_max_x = rect
    owner, local, valid = range_owner(tiles, pair_budget)
    rect_w = jnp.maximum(rect_max_x[owner] - rect_min_x[owner], 1)
    row = jnp.floor(
        local.astype(jnp.float32) / rect_w.astype(jnp.float32)
    ).astype(jnp.int32)
    tx = rect_min_x[owner] + local - row * rect_w
    ty = rect_min_y[owner] + row
    num_tiles = ntx * nty
    tile = jnp.where(valid, ty * ntx + tx, num_tiles).astype(jnp.int32)
    tile_s, face_s = jax.lax.sort(
        (tile, owner.astype(jnp.int32)), num_keys=1, is_stable=True
    )
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tile_s, tids, side="right").astype(jnp.int32)
    return face_s, start, end - start


def _resolve_xla(pair_cols, starts, counts, ntx, nty, ts, capacity):
    """Scan-based z-buffer resolve (CPU/fallback). pair_cols: (16, P)."""
    num_tiles = ntx * nty
    pix = ts * ts
    t = jnp.arange(num_tiles, dtype=jnp.int32)
    base_x = (t % ntx) * ts
    base_y = (t // ntx) * ts
    p = jnp.arange(pix, dtype=jnp.int32)
    px = (base_x[:, None] + p[None, :] % ts).astype(jnp.float32)
    py = (base_y[:, None] + p[None, :] // ts).astype(jnp.float32)

    max_chunks = (capacity + CHUNK - 1) // CHUNK  # static per-tile bound

    def step(carry, c):
        best_z, best_f, best_u, best_v = carry
        sl = starts[:, None] + c * CHUNK + jnp.arange(CHUNK)[None, :]
        ok_slot = (c * CHUNK + jnp.arange(CHUNK)[None, :]) < counts[:, None]
        sl = jnp.clip(sl, 0, pair_cols.shape[1] - 1)
        fc = pair_cols[:, sl]  # (16, T, CHUNK)
        x0 = fc[F_X0][..., None]
        y0 = fc[F_Y0][..., None]
        x1 = fc[F_X1][..., None]
        y1 = fc[F_Y1][..., None]
        x2 = fc[F_X2][..., None]
        y2 = fc[F_Y2][..., None]
        z0 = fc[F_Z0][..., None]
        z1 = fc[F_Z1][..., None]
        z2 = fc[F_Z2][..., None]
        fid = fc[F_FID][..., None]

        pxb = px[:, None, :]
        pyb = py[:, None, :]
        d = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 0.0)
        l1 = ((pxb - x0) * (y2 - y0) - (pyb - y0) * (x2 - x0)) * inv_d
        l2 = ((pyb - y0) * (x1 - x0) - (pxb - x0) * (y1 - y0)) * inv_d
        l0 = 1.0 - l1 - l2
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & (jnp.abs(d) > 1e-12)
        inside = inside & ok_slot[..., None] & (fid > 0)
        z = z0 * l0 + z1 * l1 + z2 * l2
        z = jnp.where(inside, z, Z_FAR)
        zmin = jnp.min(z, axis=1)  # (T, PIX)
        amin = jnp.argmin(z, axis=1)
        upd = zmin < best_z
        take = lambda a: jnp.take_along_axis(a, amin[:, None, :], axis=1)[:, 0]
        best_f = jnp.where(upd, take(fid), best_f)
        best_u = jnp.where(upd, take(l1), best_u)
        best_v = jnp.where(upd, take(l2), best_v)
        best_z = jnp.where(upd, zmin, best_z)
        return (best_z, best_f, best_u, best_v), None

    init = (
        jnp.full((num_tiles, pix), Z_FAR),
        jnp.zeros((num_tiles, pix)),
        jnp.zeros((num_tiles, pix)),
        jnp.zeros((num_tiles, pix)),
    )
    (bz, bf, bu, bv), _ = jax.lax.scan(
        step, init, jnp.arange(max_chunks, dtype=jnp.int32)
    )
    return bz, bf, bu, bv


def _resolve_kernel(
    starts_ref, counts_ref, pair_hbm, out_ref, *, num_tiles_x: int,
    tile_size: int, unroll: int = 1,
):
    """Pallas z-buffer resolve. out rows: z, face_id(+1 as f32), l1, l2."""
    tile_id = pl.program_id(0)
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    base_x = (tile_id % num_tiles_x) * tile_size
    base_y = (tile_id // num_tiles_x) * tile_size
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    p = r * LANE + c2
    px = (base_x + p % tile_size).astype(jnp.float32)
    py = (base_y + p // tile_size).astype(jnp.float32)
    nchunks = pl.cdiv(count, CHUNK)

    def scoped(smem, sems):
        def start_dma(c, slot):
            off = pl.multiple_of(start + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                pair_hbm.at[:, pl.ds(off, CHUNK)], smem.at[slot],
                sems.at[slot],
            )

        @pl.when(nchunks > 0)
        def _():
            start_dma(0, 0).start()

        def face_body(g, carry, c):
            bz, bf, bu, bv = carry
            slot = jax.lax.rem(c, 2)
            i = c * CHUNK + g
            x0 = smem[slot, F_X0, g]
            y0 = smem[slot, F_Y0, g]
            x1 = smem[slot, F_X1, g]
            y1 = smem[slot, F_Y1, g]
            x2 = smem[slot, F_X2, g]
            y2 = smem[slot, F_Y2, g]
            d = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 0.0)
            l1 = ((px - x0) * (y2 - y0) - (py - y0) * (x2 - x0)) * inv_d
            l2 = ((py - y0) * (x1 - x0) - (px - x0) * (y1 - y0)) * inv_d
            l0 = 1.0 - l1 - l2
            fid = smem[slot, F_FID, g]
            inside = (
                (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                & (jnp.abs(d) > 1e-12) & (i < count) & (fid > 0.0)
            )
            z = smem[slot, F_Z0, g] * l0 + smem[slot, F_Z1, g] * l1 \
                + smem[slot, F_Z2, g] * l2
            upd = inside & (z < bz)
            return (
                jnp.where(upd, z, bz),
                jnp.where(upd, fid, bf),
                jnp.where(upd, l1, bu),
                jnp.where(upd, l2, bv),
            )

        def chunk_body(c, state):
            slot = jax.lax.rem(c, 2)
            start_dma(c, slot).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                start_dma(c + 1, jax.lax.rem(c + 1, 2)).start()

            return jax.lax.fori_loop(
                0, CHUNK, functools.partial(face_body, c=c), state,
                unroll=unroll,
            )

        init = (
            jnp.full((SUB, LANE), Z_FAR, jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
            jnp.zeros((SUB, LANE), jnp.float32),
        )
        bz, bf, bu, bv = jax.lax.fori_loop(0, nchunks, chunk_body, init)
        out_ref[0, 0] = bz
        out_ref[0, 1] = bf
        out_ref[0, 2] = bu
        out_ref[0, 3] = bv

    pl.run_scoped(
        scoped,
        smem=pltpu.SMEM((2, NUM_FIELDS, CHUNK), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def rasterize_mesh(
    verts: Array,
    faces: Array,
    camera: RasterCamera,
    cfg: MeshRasterConfig = MeshRasterConfig(),
    faces_valid: Array | None = None,
) -> RasterOutput:
    """Resolve per-pixel visibility of a triangle mesh.

    Args:
      verts: (V, 3) world positions.
      faces: (F, 3) int32.
      faces_valid: optional (F,) mask (budgeted meshes from marching tets).
    """
    ts = cfg.tile_size
    ntx = -(-camera.width // ts)
    nty = -(-camera.height // ts)

    verts_screen, verts_zw, vert_valid = project_vertices(
        verts, camera, cfg.near
    )
    # Visibility is discrete — freeze its inputs.
    vs = jax.lax.stop_gradient(verts_screen)
    vz = jax.lax.stop_gradient(verts_zw)
    fields, tiles, rect, ntx, nty = _face_fields(
        vs, vz, vert_valid, faces, faces_valid, camera, cfg
    )

    face_s, starts, counts = _expand_pairs(
        tiles, rect, ntx, nty, cfg.pair_budget
    )

    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    if backend == "pallas":
        # Chunk-aligned padded layout (same scheme as the gaussian path).
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            TileBinning,
            pad_tile_ranges,
        )

        binning = TileBinning(
            pair_gauss=face_s,
            pair_tile=jnp.zeros_like(face_s),
            tile_start=starts,
            tile_count=counts,
            num_pairs=jnp.sum(counts),
        )
        padded = cfg.pair_budget + ntx * nty * CHUNK
        dst, astart, _ = pad_tile_ranges(binning, CHUNK, padded)
        # Index-side padding + one row gather (see gaussian_raster.render).
        fields_ext = jnp.concatenate(
            [jnp.zeros((1, fields.shape[1]), fields.dtype), fields], axis=0
        )
        pf_padded = jnp.zeros((padded,), jnp.int32).at[dst].set(
            face_s + 1, mode="drop"
        )
        pair_cols = fields_ext[pf_padded].T

        num_t = ntx * nty
        kernel = functools.partial(
            _resolve_kernel, num_tiles_x=ntx, tile_size=ts,
            unroll=1 if cfg.pallas_interpret else CHUNK,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_t,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 4, SUB, LANE), lambda t, s, c: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        packed = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_t, 4, SUB, LANE), jnp.float32),
            interpret=cfg.pallas_interpret,
        )(astart, counts, pair_cols)
        pix = ts * ts
        bz = packed[:, 0].reshape(num_t, pix)
        bf = packed[:, 1].reshape(num_t, pix)
        bu = packed[:, 2].reshape(num_t, pix)
        bv = packed[:, 3].reshape(num_t, pix)
    else:
        # Simple global sweep: re-gather per chunk, capacity-bounded.
        pair_cols = fields[face_s].T  # (16, P)
        bz, bf, bu, bv = _resolve_xla(
            pair_cols, starts, jnp.minimum(counts, cfg.tile_capacity),
            ntx, nty, ts, cfg.tile_capacity,
        )

    def untile(x):
        x = x.reshape(nty, ntx, ts, ts)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(nty * ts, ntx * ts)
        return x[: camera.height, : camera.width]

    face_id = untile(bf).astype(jnp.int32) - 1  # −1 background
    bary = jnp.stack([untile(bu), untile(bv)], axis=-1)
    depth = untile(bz)
    return RasterOutput(
        face_id=face_id,
        bary=bary,
        depth=depth,
        verts_screen=verts_screen,
        verts_zw=verts_zw,
        num_pairs=jax.lax.stop_gradient(jnp.sum(counts)),
    )
