"""Round-5 hash-grid cost decomposition on the attached TPU.

Measures, at the stage-1 production operating point (N points, 16 levels,
2^19 table, F=2), with chained-iteration timing (data-dependent fori_loop
inside one jit — no dispatch/RTT noise):

  1. hashgrid_encode forward (current XLA path)
  2. forward + full VJP (table grad scatter-add + point grad)
  3. isolated pieces: the (N,8)-index gather per level, the scatter-add
  4. index-math-only (hash + trilerp weights, no table access)
  5. variants: flat single-gather across levels; window-2 pair gather
     (x-linear hash); bf16 table

Prints one line per config; run on TPU only.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from youreditableavatar_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    init_hashgrid_params,
)

N = 65536
CFG = HashGridConfig()
INNER, ITERS = 8, 4


def chain(fn, *seed_args):
    """Median of chained runs; fn(*args) -> array. Args are perturbed by a
    data-dependent epsilon so the loop can't collapse."""

    @jax.jit
    def run(x, args):
        def body(_, carry):
            x, args = carry
            out = fn(x, *args)
            # Consume EVERY output element so XLA can't dead-code or
            # narrow the computation; 1e-38 keeps x numerically unchanged.
            s = sum(
                jnp.sum(o.astype(jnp.float32))
                for o in jax.tree_util.tree_leaves(out)
            )
            return (x + (s * 1e-38).astype(x.dtype), args)

        return jax.lax.fori_loop(0, INNER, body, (x, args))

    x0, rest = seed_args[0], seed_args[1:]
    out = jax.block_until_ready(run(x0, rest))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = out
        for _ in range(ITERS):
            o = run(*o)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / (ITERS * INNER))
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = init_hashgrid_params(key, CFG)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (N, 3)), jnp.float32)

    L, T, F = CFG.n_levels, CFG.table_size, CFG.n_features_per_level
    rows = N * 8 * L

    # 1. forward
    t = chain(lambda x, p: hashgrid_encode(p, x, CFG), x, params)
    print(f"fwd  encode          : {t:8.3f} ms  ({t*1e6/rows:.2f} ns/row)")

    # 2. fwd+bwd (grads wrt params and x)
    def loss(p, x):
        return jnp.sum(hashgrid_encode(p, x, CFG) ** 2)

    g = jax.grad(loss, argnums=(0, 1))
    t = chain(lambda x, p: g(p, x)[0], x, params)
    print(f"fwd+bwd encode       : {t:8.3f} ms  ({t*1e6/(2*rows):.2f} ns/row eff)")

    # table-grad only
    gt = jax.grad(loss, argnums=0)
    t = chain(lambda x, p: gt(p, x), x, params)
    print(f"fwd+bwd table-only   : {t:8.3f} ms")

    # 3a. isolated gather: (L*N*8,) random rows from (L*T, F)
    flat_tbl = params.reshape(L * T, F)
    idx = jnp.asarray(rng.integers(0, L * T, (L, N, 8)), jnp.int32)

    t = chain(lambda i, tb: tb.reshape(L * T, F)[i], idx, flat_tbl)
    print(f"gather (L,N,8) rows  : {t:8.3f} ms  ({t*1e6/rows:.2f} ns/row)")

    # 3b. isolated scatter-add of same rows
    vals = jnp.asarray(rng.normal(size=(L, N, 8, F)), jnp.float32)

    def scat(i, tb, v):
        return jnp.zeros((L * T, F), jnp.float32).at[i].add(v)

    t = chain(lambda i, tb: scat(i, tb, vals), idx, flat_tbl)
    print(f"scatter-add same rows: {t:8.3f} ms  ({t*1e6/rows:.2f} ns/row)")

    # 4. index math only (no table access): hash + weights, summed
    def index_math(x, p):
        out = 0.0
        for lvl, res in enumerate(CFG.level_resolutions()):
            xs = x * res
            x0 = jnp.floor(xs).astype(jnp.int32)
            w = xs - x0.astype(jnp.float32)
            c = x0.astype(jnp.uint32)
            idx = (
                c[..., 0]
                ^ c[..., 1] * jnp.uint32(2654435761)
                ^ c[..., 2] * jnp.uint32(805459861)
            ) % jnp.uint32(T)
            out = out + jnp.sum(idx.astype(jnp.float32)) + jnp.sum(w)
        return jnp.asarray(out)[None]

    t = chain(index_math, x, params)
    print(f"index math only      : {t:8.3f} ms")

    # 5a. bf16 table gather
    t = chain(lambda i, tb: tb[i], idx, flat_tbl.astype(jnp.bfloat16))
    print(f"gather bf16 rows     : {t:8.3f} ms  ({t*1e6/rows:.2f} ns/row)")

    # 5b. window-2 pair gather: (L,N,4) starts, slice 2 rows each.
    starts = jnp.asarray(rng.integers(0, L * T - 2, (L, N, 4)), jnp.int32)

    def pair_gather(s, tb):
        return jax.vmap(
            lambda st: jax.lax.gather(
                tb,
                st.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2),
                    collapsed_slice_dims=(),
                    start_index_map=(0,),
                ),
                slice_sizes=(2, F),
            ),
            in_axes=0,
        )(s.reshape(L, N * 4)).reshape(L, N, 4, 2, F)

    t = chain(lambda s, tb: pair_gather(s, tb), starts, flat_tbl)
    print(f"pair-gather (2,F) win: {t:8.3f} ms  ({t*1e6/(rows//2):.2f} ns/row)")

    # 5c. window-2 scatter-add
    pvals = jnp.asarray(rng.normal(size=(L * N * 4, 2, F)), jnp.float32)

    def pair_scatter(s, tb):
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )
        return jax.lax.scatter_add(
            jnp.zeros((L * T, F), jnp.float32),
            s.reshape(-1, 1),
            pvals,
            dn,
        )

    t = chain(lambda s, tb: pair_scatter(s, tb), starts, flat_tbl)
    print(f"pair-scatter-add win : {t:8.3f} ms  ({t*1e6/(rows//2):.2f} ns/row)")

    # 6. per-level loop gathers (the current code shape: 16 separate (N,8))
    def per_level(i, tb):
        outs = []
        for lvl in range(L):
            outs.append(tb.reshape(L, T, F)[lvl][i[lvl] % T])
        return jnp.stack(outs)

    t = chain(lambda i, tb: per_level(i, tb), idx, flat_tbl)
    print(f"16 separate gathers  : {t:8.3f} ms  ({t*1e6/rows:.2f} ns/row)")


if __name__ == "__main__":
    main()
