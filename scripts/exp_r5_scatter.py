"""Round-5: map the TPU scatter/gather cost landscape for the hash-grid VJP.

METHODOLOGY (critical on the axon tunnel): the remote runtime dedupes
content-identical executions, so every timed iteration must change input
content. All measurements run INNER chained iterations inside ONE jitted
fori_loop whose carry genuinely changes (index rotation + value scaling),
timed over ITERS dispatches.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

INNER = 8
ITERS = 3


def chain(make_body, carry):
    """make_body: carry -> carry (content must change every call)."""

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(
            0, INNER, lambda _, c: make_body(c), carry
        )

    o = jax.block_until_ready(run(carry))
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.perf_counter()
        o = jax.block_until_ready(run(o))
        best = min(best, time.perf_counter() - t0)
    return best / INNER * 1e3


def main():
    rng = np.random.default_rng(0)
    T = 1 << 19  # 512k rows, F=2 -> 4MB
    F = 2
    R = 4_194_304

    idx0 = jnp.asarray(rng.integers(0, T, R), jnp.int32)
    vals0 = jnp.asarray(rng.normal(size=(R, F)), jnp.float32)

    def rot(i, t_size):
        return (i + 1) % t_size

    # -- gather from 4MB table
    tbl = jnp.asarray(rng.normal(size=(T, F)), jnp.float32)

    def g_body(c):
        i, acc = c
        out = tbl[i]
        return (rot(i, T), acc + jnp.sum(out))

    t = chain(g_body, (idx0, jnp.float32(0)))
    print(f"gather 4.2M from 4MB tbl       : {t:9.3f} ms ({t*1e6/R:.2f} ns/row)", flush=True)

    # -- gather from 64MB table
    T8 = 1 << 23
    tbl8 = jnp.asarray(rng.normal(size=(T8, F)), jnp.float32)
    idx8 = jnp.asarray(rng.integers(0, T8, R), jnp.int32)

    def g8_body(c):
        i, acc = c
        out = tbl8[i]
        return (rot(i, T8), acc + jnp.sum(out))

    t = chain(g8_body, (idx8, jnp.float32(0)))
    print(f"gather 4.2M from 64MB tbl      : {t:9.3f} ms ({t*1e6/R:.2f} ns/row)", flush=True)

    # -- scatter-add 4.2M -> 512k x F
    def s_body(c):
        i, acc = c
        out = jnp.zeros((T, F), jnp.float32).at[i].add(vals0)
        return (rot(i, T), acc + out[0, 0])

    t = chain(s_body, (idx0, jnp.float32(0)))
    print(f"scatter-add 4.2M -> 4MB        : {t:9.3f} ms ({t*1e6/R:.2f} ns/row)", flush=True)

    # -- scatter-add with (N,8) indices / (N,8,F) updates (the VJP shape)
    n = R // 8
    idx2 = idx0.reshape(n, 8)
    vals2 = vals0.reshape(n, 8, F)

    def s2_body(c):
        i, acc = c
        out = jnp.zeros((T, F), jnp.float32).at[i].add(vals2)
        return ((i + 1) % T, acc + out[0, 0])

    t = chain(s2_body, (idx2, jnp.float32(0)))
    print(f"scatter-add (N,8) shape        : {t:9.3f} ms ({t*1e6/R:.2f} ns/row)", flush=True)

    # -- segment_sum sorted (the sort-free part: assumes ids presorted)
    ids_sorted = jnp.sort(idx0)

    def seg_body(c):
        i, acc = c
        out = jax.ops.segment_sum(
            vals0, i, num_segments=T, indices_are_sorted=True
        )
        return (i, acc + out[0, 0] + acc * 0 + 1e-7 * jnp.sum(vals0[0]))

    # ids constant here would be deduped; rotate values instead
    def seg_body2(c):
        v, acc = c
        out = jax.ops.segment_sum(
            v, ids_sorted, num_segments=T, indices_are_sorted=True
        )
        return (v * 1.0000001, acc + out[0, 0])

    t = chain(seg_body2, (vals0, jnp.float32(0)))
    print(f"segment_sum sorted 4.2M->512k  : {t:9.3f} ms ({t*1e6/R:.2f} ns/row)", flush=True)

    # -- sort + argsort cost at 4.2M
    def sort_body(c):
        i, acc = c
        s = jnp.sort(i)
        return ((i + 1) % T, acc + s[0].astype(jnp.float32))

    t = chain(sort_body, (idx0, jnp.float32(0)))
    print(f"sort 4.2M int32                : {t:9.3f} ms", flush=True)

    def argsort_body(c):
        i, acc = c
        s = jnp.argsort(i)
        return ((i + 1) % T, acc + s[0].astype(jnp.float32))

    t = chain(argsort_body, (idx0, jnp.float32(0)))
    print(f"argsort 4.2M int32             : {t:9.3f} ms", flush=True)

    # -- one-hot matmul partial: (R/512 chunks) skipped: FLOPs prohibitive.

    # -- unique-index scatter-add (owner-style), 512k unique rows into 512k
    perm = jnp.asarray(rng.permutation(T).astype(np.int32))
    uvals = vals0[:T]

    def su_body(c):
        i, acc = c
        out = jnp.zeros((T, F), jnp.float32).at[i].add(
            uvals, unique_indices=True
        )
        return ((i + 1) % T, acc + out[0, 0])

    t = chain(su_body, (perm, jnp.float32(0)))
    print(f"scatter-add 512k UNIQUE -> 512k: {t:9.3f} ms ({t*1e6/T:.2f} ns/row)", flush=True)

    # -- production hashgrid fwd and fwd+bwd
    from youreditableavatar_tpu.ops.hashgrid import (
        HashGridConfig,
        hashgrid_encode,
        init_hashgrid_params,
    )

    CFG = HashGridConfig()
    params = init_hashgrid_params(jax.random.PRNGKey(0), CFG)
    for n_pts in (65536, 262144):
        x0 = jnp.asarray(
            rng.uniform(0.02, 0.98, (n_pts, 3)), jnp.float32
        )
        rows = n_pts * 8 * CFG.n_levels

        def fwd_body(c):
            x, acc = c
            out = hashgrid_encode(params, x, CFG)
            x2 = jnp.roll(x, 1, axis=0)
            return (x2, acc + jnp.sum(out))

        t = chain(fwd_body, (x0, jnp.float32(0)))
        print(f"hashgrid fwd N={n_pts:7d}       : {t:9.3f} ms ({t*1e6/rows:.2f} ns/row)", flush=True)

        lossg = jax.grad(
            lambda p, x: jnp.sum(hashgrid_encode(p, x, CFG) ** 2),
            argnums=(0, 1),
        )

        def bwd_body(c):
            x, acc = c
            gp, gx = lossg(params, x)
            x2 = jnp.roll(x, 1, axis=0)
            return (x2, acc + gp[0, 0, 0] + jnp.sum(gx[0]))

        t = chain(bwd_body, (x0, jnp.float32(0)))
        print(f"hashgrid fwd+bwd N={n_pts:7d}   : {t:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
