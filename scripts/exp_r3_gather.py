"""Feasibility + throughput of a Pallas row-gather kernel on TPU.

XLA's row gather runs at ~9-10 ns/row regardless of width — 1.7 ms for the
184k-pair layout build. Candidate kernel: per output chunk of 128 rows, DMA
the 128 indices to SMEM (contiguous), then for each row read the packed
field table resident in VMEM:

  table layout (ceil(N/8), 128): 8 gaussians per 128-lane row, 16 f32 each
  row read:  tbl[idx // 8]            (dynamic SUBLANE index — 1 vreg load)
  extract:   pltpu.roll(row, -16*(idx % 8), axis=1)[:, :16] (dynamic shift)

Measures ns/row vs the XLA gather on identical data; validates outputs.
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

P = 1440 * 128
N = 100_000
NF = 16
CHUNK = 128
ROWS8 = (N + 8) // 8 + 1  # packed rows (incl. a zero row 0 for id 0)


def gather_kernel(ids_hbm, tbl_ref, out_hbm):
    c = pl.program_id(0)

    def scoped(ids_s, stage, sems, osem):
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(c, 1)], ids_s, sems.at[0]
        ).start()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(c, 1)], ids_s, sems.at[0]
        ).wait()

        def body(g, _):
            idx = ids_s[0, g]
            row = tbl_ref[pl.ds(idx // 8, 1), :]  # (1, 128) dyn sublane
            rolled = pltpu.roll(row, -NF * (idx % 8), axis=1)
            stage[pl.ds(g, 1), :] = rolled
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0, unroll=CHUNK)
        cp = pltpu.make_async_copy(stage, out_hbm.at[c], osem)
        cp.start()
        cp.wait()

    pl.run_scoped(
        scoped,
        ids_s=pltpu.SMEM((1, CHUNK), jnp.int32),
        stage=pltpu.VMEM((CHUNK, 128), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((1,)),
        osem=pltpu.SemaphoreType.DMA(()),
    )


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, N, P), jnp.int32)
    tbl_rows = jnp.asarray(
        rng.normal(size=(ROWS8 * 8, NF)), jnp.float32)
    tbl_packed = tbl_rows.reshape(ROWS8, 8 * NF)  # (rows, 128)

    def pallas_gather(ids, tbl):
        return pl.pallas_call(
            gather_kernel,
            grid=(P // CHUNK,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (P // CHUNK, CHUNK, 128), jnp.float32),
        )(ids.reshape(P // CHUNK, CHUNK), tbl)

    try:
        out = jax.jit(pallas_gather)(ids, tbl_packed)
        out = jax.block_until_ready(out)
    except Exception as e:
        print(f"pallas gather FAILED: {e}")
        return

    ref = np.asarray(tbl_rows)[np.asarray(ids)]
    got = np.asarray(out).reshape(P, 128)[:, :NF]
    err = np.abs(got - ref).max()
    print(f"max|diff| = {err:.2e}")

    INNER, ITERS = 20, 6

    def chain(fn, seed, perturb):
        @jax.jit
        def run(args):
            return jax.lax.fori_loop(
                0, INNER, lambda _, a: perturb(fn(*a), a), args)

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

    t = chain(pallas_gather, (ids, tbl_packed),
              lambda o, a: (a[0] ^ (o[0, 0, 0].astype(jnp.int32) & 1),
                            a[1]))
    print(f"pallas gather: {t:7.3f} ms  ({t * 1e6 / P:.2f} ns/row)")

    t = chain(lambda i, tb: tb[i], (ids, tbl_rows),
              lambda o, a: (a[0] ^ (o[0, 0].astype(jnp.int32) & 1), a[1]))
    print(f"xla gather:    {t:7.3f} ms  ({t * 1e6 / P:.2f} ns/row)")


if __name__ == "__main__":
    main()
