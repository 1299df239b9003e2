"""Backward-kernel ablations against the CURRENT (r3) source.

Variants (timing only — outputs of ablated variants are wrong):
  full        — production kernel
  no-reduce   — reduce_chunk writes a constant (isolates the 3-split matmul
                + sublane sums)
  2-store     — only planes 0 and 6 stored (isolates 7 stores + ~10
                integrand ops per pair)
  no-dalpha   — dalpha chain replaced with alpha (isolates the suffix-dot
                gradient math)
"""

import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import make_scene
from youreditableavatar_tpu.ops.gaussian_raster import RasterizeConfig
from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
    preprocess_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.binning import bin_gaussians
from youreditableavatar_tpu.ops.gaussian_raster.render import (
    build_pallas_pair_rows,
)
from youreditableavatar_tpu.ops.gaussian_raster import composite_pallas as cp

INNER = 20
ITERS = 6
P = 1440 * 128

STORES = """            dpdx = dpower * dx
            dpdy = dpower * dy
            pl_s[0, g] = ca * dpdx + cb_c * dpdy  # d mean_x
            pl_s[1, g] = cb_c * dpdx + cc * dpdy  # d mean_y"""

STORES2 = """            pl_s[2, g] = dpdx * dx  # −2 · d conic_a
            pl_s[3, g] = dpdx * dy  # −1 · d conic_b
            pl_s[4, g] = dpdy * dy  # −2 · d conic_c
            pl_s[5, g] = dalpha * gauss  # d opacity"""

STORES3 = """            pl_s[6, g] = w * gr
            pl_s[7, g] = w * gg
            pl_s[8, g] = w * gb"""

REDUCE_TAIL = """            sums = (
                jax.lax.dot_general(
                    hi, wb, dims, preferred_element_type=jnp.float32
                )
                + jax.lax.dot_general(
                    mid, wb, dims, preferred_element_type=jnp.float32
                )
                + jax.lax.dot_general(
                    lo, wb, dims, preferred_element_type=jnp.float32
                )
            )  # (CHUNK, 16); cols 9..15 are zero by wmat
            out_s[slot, :, 0:16] = sums"""

DALPHA = """            dot_cg = cr * gr + cg * gg + cb_ * gb
            pg_dot = pg_dot + w * dot_cg  # running P·g (inclusive)
            inv_om = 1.0 / (1.0 - a_eff)  # α ≤ 0.99 ⇒ safe
            dalpha = jnp.where(
                contrib,
                trans * dot_cg - (cg_img_dot - pg_dot + gt_tf) * inv_om,
                0.0,
            )"""


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


def patched(new_src):
    mod = types.ModuleType("cp_patched")
    mod.__dict__["__file__"] = cp.__file__
    exec(compile(new_src, cp.__file__, "exec"), mod.__dict__)
    return mod


def main():
    cfg = RasterizeConfig(backend="pallas", pair_budget=P,
                          tile_capacity=8192, sh_degree=3)
    means, scales, quats, opac, sh, cam = make_scene()
    ts = cfg.tile_size
    ntx, nty = -(-cam.width // ts), -(-cam.height // ts)
    proj = jax.jit(lambda m: preprocess_gaussians(
        m, scales, quats, opac, sh, cam, cfg.sh_degree, ts, cfg.scale_mod,
        None))(means)
    binning = jax.jit(lambda p: bin_gaussians(p, ntx, nty, P, ts))(proj)
    pair_rows, astart = jax.jit(lambda p, b: build_pallas_pair_rows(
        p, b, ntx, nty, P))(proj, binning)
    counts = binning.tile_count
    packed = jax.jit(lambda pr: cp._forward_call(
        pr, astart, counts, ntx, nty, ts, False))(pair_rows)
    cot = jnp.ones_like(packed)[:, :4]

    def nudge(x, v):
        return x + 1e-30 * v

    src = Path(cp.__file__).read_text()
    for s in (STORES, STORES2, STORES3, REDUCE_TAIL, DALPHA):
        assert s in src, s[:60]

    variants = {
        "full       ": src,
        "no-reduce  ": src.replace(
            REDUCE_TAIL,
            "            out_s[slot, :, 0:16] = hi.astype(jnp.float32)"
            "[:, 0:16]",
        ),
        "2-store    ": src
        .replace(STORES, "            dpdx = dpower * dx\n"
                         "            dpdy = dpower * dy\n"
                         "            pl_s[0, g] = ca * dpdx + cb_c * dpdy"
                         "  # d mean_x")
        .replace(STORES2, "")
        .replace(STORES3, "            pl_s[6, g] = w * gr"),
        "no-dalpha  ": src.replace(
            DALPHA,
            "            pg_dot = pg_dot + w\n"
            "            dalpha = alpha",
        ),
    }
    for tag, s in variants.items():
        mod = patched(s)
        t = chain(
            lambda pr, m=mod: m._backward_call(
                pr, astart, counts, packed, cot, ntx, nty, ts, False),
            (pair_rows,),
            lambda o, a: (nudge(a[0], o[0, 0]),),
        )
        print(f"bwd {tag}: {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
