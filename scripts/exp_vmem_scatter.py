"""Feasibility micro-bench: in-kernel VMEM row scatter-accumulate on TPU.

Decides whether the backward kernel should accumulate per-pair gradient rows
directly into a per-gaussian VMEM table (replacing the XLA scatter-add pass,
~2.5 ms at 512²/100k) or whether the 128 sequential read-modify-write row
updates per chunk serialize on VMEM latency and lose.

The kernel mimics the real shape of the work: grid of T steps ("tiles"),
each DMA'ing a (CHUNK,) id block + (CHUNK, 16) row block from HBM and doing
    acc[id] += row
for each of the 128 rows, double-buffered. Compares against the XLA
`.at[].add` scatter on identical data. Prints ms per pass and effective
rows/s. Run on the attached TPU only (Mosaic path; interpret mode would be
meaningless for perf).
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
NF = 16
N = 100_001  # accumulator rows (gaussians + zero row)
P = 1440 * CHUNK  # pairs (the bench scene's padded pair count)
T = P // CHUNK  # grid steps


def _kernel(ids_hbm, rows_hbm, acc_ref, *, nsteps):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def scoped(ids_s, rows_s, sems, rsems):
        def dma(c, slot):
            i = pltpu.make_async_copy(
                ids_hbm.at[pl.ds(c * CHUNK, CHUNK)], ids_s.at[slot],
                sems.at[slot],
            )
            r = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(c * CHUNK, CHUNK)], rows_s.at[slot],
                rsems.at[slot],
            )
            return i, r

        for m in dma(step, 0):
            m.start()
        for m in dma(step, 0):
            m.wait()

        def body(g, _):
            gid = ids_s[0, g]
            acc_ref[gid] = acc_ref[gid] + rows_s[0, g]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0, unroll=CHUNK)

    pl.run_scoped(
        scoped,
        ids_s=pltpu.SMEM((1, CHUNK), jnp.int32),
        rows_s=pltpu.VMEM((1, CHUNK, NF), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((1,)),
        rsems=pltpu.SemaphoreType.DMA((1,)),
    )


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, P), jnp.int32)
    rows = jnp.asarray(rng.normal(size=(P, NF)), jnp.float32)

    kernel = functools.partial(_kernel, nsteps=T)
    scatter_pallas = jax.jit(
        lambda i, r: pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, NF), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=["arbitrary"],
            ),
        )(i, r)
    )
    scatter_xla = jax.jit(
        lambda i, r: jnp.zeros((N, NF), jnp.float32).at[i].add(r)
    )

    def timeit(fn):
        out = fn(ids, rows)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fn(ids, rows)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 20 * 1e3, out

    tx, ox = timeit(scatter_xla)
    print(f"xla scatter-add:    {tx:7.3f} ms")
    try:
        tp, op = timeit(scatter_pallas)
        err = float(jnp.max(jnp.abs(ox - op)))
        print(f"pallas RMW scatter: {tp:7.3f} ms   max|diff|={err:.2e}")
        print("verdict:", "WIN" if tp < 0.8 * tx else "LOSS/WASH")
    except Exception as e:  # Mosaic lowering may reject dynamic RMW
        print(f"pallas RMW scatter: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
