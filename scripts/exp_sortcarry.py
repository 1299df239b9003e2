"""A/B microbench: sort-carry pair layout vs id-scatter + row-gather.

Current fwd layout path (per render):
  A: stable lax.sort((tile, g), 2 ops)  +  1-D id scatter to padded layout
     +  (P, 9) row gather fields_ext[pg_padded]
Candidate:
  B: stable lax.sort((tile, 10 f32 columns))  +  10-wide row scatter to the
     padded layout (carries gaussian id as a column; no row gather at all)

Both chained 10× per dispatch with a data dependency so XLA cannot CSE or
dead-code the iterations; timings are per-iteration.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

P = 1 << 18
N = 100_000
PAD = P + 256 * 128
INNER = 10
ITERS = 10


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (ITERS * INNER) * 1e3


def main():
    rng = np.random.default_rng(0)
    tile = jnp.asarray(rng.integers(0, 257, P).astype(np.int32))
    g = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
    fields = jnp.asarray(rng.normal(size=(N + 1, 9)).astype(np.float32))
    cols10 = jnp.asarray(rng.normal(size=(10, P)).astype(np.float32))
    dst = jnp.asarray(
        (rng.permutation(PAD)[:P]).astype(np.int32)
    )  # padded destinations (approximation: random unique slots)

    @jax.jit
    def variant_a(tile, g, fields):
        def body(_, carry):
            tile, g, acc = carry
            tile_s, g_s = jax.lax.sort((tile, g), num_keys=1, is_stable=True)
            pg = jnp.zeros((PAD,), jnp.int32).at[dst].set(g_s + 1, mode="drop")
            rows = fields[pg]
            acc = acc + rows[0, 0]
            tile = tile ^ (acc.astype(jnp.int32) & 1)
            return tile, g, acc
        return jax.lax.fori_loop(
            0, INNER, body, (tile, g, jnp.float32(0.0)))[2]

    @jax.jit
    def variant_b(tile, cols10):
        def body(_, carry):
            tile, acc = carry
            sorted_all = jax.lax.sort(
                (tile,) + tuple(cols10), num_keys=1, is_stable=True
            )
            rows = jnp.stack(sorted_all[1:], axis=1)  # (P, 10)
            padded = jnp.zeros((PAD, 10), jnp.float32).at[dst].set(
                rows, mode="drop"
            )
            acc = acc + padded[0, 0]
            tile = tile ^ (acc.astype(jnp.int32) & 1)
            return tile, acc
        return jax.lax.fori_loop(0, INNER, body, (tile, jnp.float32(0.0)))[1]

    # piecewise: sort2, sort11, scatter1d, scatter10w, gather9w
    @jax.jit
    def p_sort2(tile, g):
        def body(_, c):
            t, acc = c
            ts, gs = jax.lax.sort((t, g), num_keys=1, is_stable=True)
            acc = acc + gs[0]
            return t ^ (acc & 1), acc
        return jax.lax.fori_loop(0, INNER, body, (tile, jnp.int32(0)))[1]

    @jax.jit
    def p_sort11(tile, cols10):
        def body(_, c):
            t, acc = c
            s = jax.lax.sort((t,) + tuple(cols10), num_keys=1, is_stable=True)
            acc = acc + s[1][0]
            return t ^ (acc.astype(jnp.int32) & 1), acc
        return jax.lax.fori_loop(0, INNER, body, (tile, jnp.float32(0)))[1]

    @jax.jit
    def p_scat1(g):
        def body(_, c):
            gg, acc = c
            pg = jnp.zeros((PAD,), jnp.int32).at[dst].set(gg, mode="drop")
            acc = acc + pg[0]
            return gg ^ (acc & 1), acc
        return jax.lax.fori_loop(0, INNER, body, (g, jnp.int32(0)))[1]

    @jax.jit
    def p_scat10(cols10):
        rows0 = jnp.stack(cols10, axis=1)
        def body(_, c):
            rows, acc = c
            padded = jnp.zeros((PAD, 10), jnp.float32).at[dst].set(
                rows, mode="drop")
            acc = acc + padded[0, 0]
            return rows + acc * 0, acc
        return jax.lax.fori_loop(0, INNER, body, (rows0, jnp.float32(0)))[1]

    @jax.jit
    def p_gath9(g, fields):
        def body(_, c):
            gg, acc = c
            rows = fields[gg]
            acc = acc + rows[0, 0]
            return gg ^ (acc.astype(jnp.int32) & 1), acc
        return jax.lax.fori_loop(0, INNER, body, (g, jnp.float32(0)))[1]

    print(f"P={P} N={N} PAD={PAD}  (ms/iter, {INNER}x chained, {ITERS} disp)")
    print(f"A total (sort2 + scat1d + gather9): {timeit(variant_a, tile, g, fields):.3f}")
    print(f"B total (sort11 + scat10w):         {timeit(variant_b, tile, cols10):.3f}")
    print(f"  sort 2-operand :  {timeit(p_sort2, tile, g):.3f}")
    print(f"  sort 11-operand:  {timeit(p_sort11, tile, cols10):.3f}")
    print(f"  scatter 1-D    :  {timeit(p_scat1, g):.3f}")
    print(f"  scatter 10-wide:  {timeit(p_scat10, cols10):.3f}")
    print(f"  gather 9-wide  :  {timeit(p_gath9, g, fields):.3f}")


if __name__ == "__main__":
    main()
