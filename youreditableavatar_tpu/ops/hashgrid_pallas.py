"""Pallas TPU scatter-accumulate for the hash-grid backward.

The multiresolution hash encoding's VJP is a scatter-add of per-corner
gradient rows into the (L, T, F) feature table. XLA's TPU scatter runs at
~41 ns/row (measured, `scripts/exp_r5_scatter.py`) and is the stage-1
spatial step's dominant cost; gathers run at ~5-6 ns/row. This kernel
replaces ONLY the scatter: the table gradient for one level is accumulated
into a VMEM-resident packed accumulator — (T·F/128, 128) f32, 4 MB at the
production 2^19×2 table — with a serial read-modify-write row loop whose
(index, value, value) streams double-buffer HBM→SMEM, the same streaming
discipline as the Gaussian rasterizer's compositing kernel
(`composite_pallas.py`). One HBM write per level at the end (the pipelined
block writeback) instead of 41 ns/row of XLA scatter traffic.

Reference being replaced: tiny-cuda-nn's fused hash-grid backward
(atomicAdd into the table; `tetgs_spatial/models/networks.py:55-64`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
F = 2  # features per level (production config; asserted by callers)
CHUNK = 256  # (idx, v0, v1) rows streamed per SMEM chunk (fully unrolled)


def _scatter_kernel(
    idx_hbm,  # (L, NCH, 1, CHUNK) int32, padded rows point at `table_size`
    v0_hbm,  # (L, NCH, 1, CHUNK) f32
    v1_hbm,  # (L, NCH, 1, CHUNK) f32
    out_ref,  # (1, PRPAD, LANE) VMEM accumulator block for this level
    *,
    nchunks: int,
    prpad: int,
    unroll: int,
):
    lvl = pl.program_id(0)
    out_ref[0] = jnp.zeros((prpad, LANE), jnp.float32)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def scoped(idx_s, v0_s, v1_s, sems):
        def dmas(c, slot):
            return (
                pltpu.make_async_copy(
                    idx_hbm.at[lvl, c], idx_s.at[slot], sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    v0_hbm.at[lvl, c], v0_s.at[slot], sems.at[slot, 1]
                ),
                pltpu.make_async_copy(
                    v1_hbm.at[lvl, c], v1_s.at[slot], sems.at[slot, 2]
                ),
            )

        for d in dmas(0, 0):
            d.start()

        def row_body(r, carry, slot):
            i = idx_s[slot, 0, r]
            v0 = v0_s[slot, 0, r]
            v1 = v1_s[slot, 0, r]
            hi = i >> 6  # 64 table rows (×F lanes) per packed row
            lane = (i & 63) * 2
            contrib = jnp.where(
                lane_iota == lane,
                v0,
                jnp.where(lane_iota == lane + 1, v1, 0.0),
            )
            out_ref[0, pl.ds(hi, 1), :] = (
                out_ref[0, pl.ds(hi, 1), :] + contrib
            )
            return carry

        def chunk_body(c, carry):
            slot = jax.lax.rem(c, 2)
            for d in dmas(c, slot):
                d.wait()

            @pl.when(c + 1 < nchunks)
            def _():
                for d in dmas(c + 1, jax.lax.rem(c + 1, 2)):
                    d.start()

            # Mosaic's for-loop lowering supports only full unroll or none;
            # full (the rasterizer kernels do the same at CHUNK=128).
            return jax.lax.fori_loop(
                0,
                CHUNK,
                functools.partial(row_body, slot=slot),
                carry,
                unroll=CHUNK,
            )

        jax.lax.fori_loop(0, nchunks, chunk_body, 0)

    pl.run_scoped(
        scoped,
        idx_s=pltpu.SMEM((2, 1, CHUNK), jnp.int32),
        v0_s=pltpu.SMEM((2, 1, CHUNK), jnp.float32),
        v1_s=pltpu.SMEM((2, 1, CHUNK), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 3)),
    )


def hash_scatter_add(
    idx: Array,
    v0: Array,
    v1: Array,
    table_size: int,
    *,
    interpret: bool = False,
    unroll: int = 8,
) -> Array:
    """Accumulate rows into per-level tables: out[l, idx[l,r], :] += v[l,r].

    Args:
      idx: (L, R) int32 table-row ids in [0, table_size]; rows equal to
        `table_size` are dumped (padding sentinel).
      v0, v1: (L, R) f32 feature-0 / feature-1 update values.
      table_size: rows per level table (multiple of 64).
    Returns: (L, table_size, 2) f32.
    """
    L, R = idx.shape
    assert table_size % 64 == 0, "packed layout needs table_size % 64 == 0"
    # Off-TPU (CPU tests, virtual meshes) the kernel runs interpreted.
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    rp = -(-R // CHUNK) * CHUNK
    if rp != R:
        idx = jnp.pad(idx, ((0, 0), (0, rp - R)),
                      constant_values=table_size)
        v0 = jnp.pad(v0, ((0, 0), (0, rp - R)))
        v1 = jnp.pad(v1, ((0, 0), (0, rp - R)))
    nchunks = rp // CHUNK
    pr = table_size * F // LANE
    prpad = pr + 8  # dump rows for the padding sentinel

    idx3 = idx.reshape(L, nchunks, 1, CHUNK)
    v03 = v0.reshape(L, nchunks, 1, CHUNK)
    v13 = v1.reshape(L, nchunks, 1, CHUNK)

    out = pl.pallas_call(
        functools.partial(
            _scatter_kernel, nchunks=nchunks, prpad=prpad, unroll=unroll
        ),
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, prpad, LANE), lambda l: (l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((L, prpad, LANE), jnp.float32),
        interpret=interpret,
    )(idx3, v03, v13)
    return out[:, :pr, :].reshape(L, table_size, F)
