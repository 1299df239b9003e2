"""Pallas compositing backend vs XLA backend: forward + gradient parity.

Runs the Pallas kernels in interpreter mode on CPU (exact same kernel code
path as TPU, minus Mosaic lowering). The real-hardware check is
`scripts/tpu_check.py` + bench.py, run on the TPU chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
    render_gaussians,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    n = 300
    return dict(
        means=jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        scales=jnp.asarray(rng.uniform(0.01, 0.08, (n, 3)), jnp.float32),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        opac=jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        bg=jnp.asarray([0.1, 0.2, 0.3]),
    )


def _cams():
    vm = np.eye(4, dtype=np.float32)
    vm[2, 3] = 3.0
    return RasterCamera.from_fov(vm, 0.8, 0.6, 96, 64)


def test_pallas_forward_matches_xla(scene):
    cam = _cams()
    cfg_x = RasterizeConfig(backend="xla", pair_budget=1 << 13,
                            tile_capacity=512)
    cfg_p = RasterizeConfig(backend="pallas", pair_budget=1 << 13,
                            pallas_interpret=True)
    ox = render_gaussians(
        scene["means"], scene["scales"], scene["quats"], scene["opac"],
        None, cam, cfg_x, scene["bg"], colors_override=scene["colors"],
    )
    op = render_gaussians(
        scene["means"], scene["scales"], scene["quats"], scene["opac"],
        None, cam, cfg_p, scene["bg"], colors_override=scene["colors"],
    )
    # Tolerance note: the Pallas forward evaluates the falloff via the
    # expanded tile-local polynomial on the MXU (see composite_pallas.py
    # "Numerics") — fp32 reassociation vs the XLA backend's direct quadratic.
    # Observed divergence ≤ ~2e-5 abs on this scene; rare rim pixels whose
    # alpha sits within ~1e-6 of the 1/255 cull can flip between backends
    # (bounded by 1/255·color ≈ 4e-3), so a tight mean bound guards the bulk
    # while the max bound allows isolated flips.
    di = np.abs(np.asarray(ox["image"]) - np.asarray(op["image"]))
    assert di.max() < 5e-3 and di.mean() < 5e-6, (di.max(), di.mean())
    dt = np.abs(np.asarray(ox["final_t"]) - np.asarray(op["final_t"]))
    assert dt.max() < 5e-3 and dt.mean() < 5e-6, (dt.max(), dt.mean())


def test_pallas_grads_match_xla(scene):
    cam = _cams()

    def lossf(cfg):
        def loss(m, s, q, o, c):
            out = render_gaussians(
                m, s, q, o, None, cam, cfg, scene["bg"], colors_override=c
            )
            return jnp.mean(out["image"] ** 2) + 0.1 * jnp.mean(out["alpha"])

        return loss

    args = (scene["means"], scene["scales"], scene["quats"], scene["opac"],
            scene["colors"])
    gx = jax.grad(
        lossf(RasterizeConfig(backend="xla", pair_budget=1 << 13,
                              tile_capacity=512)),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    gp = jax.grad(
        lossf(RasterizeConfig(backend="pallas", pair_budget=1 << 13,
                              pallas_interpret=True)),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    # Tolerance note: the Pallas backward recovers per-pair mean/conic grads
    # from tile-local pixel MOMENTS (expanded quadratics, joint tree
    # reduction, MXU falloff) rather than per-pair direct sums — same math,
    # different fp32 evaluation order. Observed divergence vs the XLA
    # backend is ≤ ~7e-5 relative on this scene; 3e-4·max|g| bounds it with
    # margin.
    for a, b in zip(gx, gp):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4 * max(scale, 1e-3)
        )


def test_unpadded_chunk_boundaries_exact():
    """Deterministic boundary check of the unpadded pair layout: tiles with
    counts exactly at/around the 128-pair chunk edge, nonzero neighbors, and
    a trailing sentinel block. The forward must match a per-tile NumPy
    reference exactly and the backward must leave sentinel pairs and the
    next tile's boundary rows with the OWNER tile's gradients."""
    from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
        CHUNK,
        composite_tiles_pallas,
    )

    ntx, nty, ts = 2, 1, 32
    rng = np.random.default_rng(5)
    # Tile 0: 127 pairs, tile 1: 129 pairs (straddles one chunk), then 3
    # sentinel pairs at the end. Total P = 259.
    counts = np.array([127, 129], np.int32)
    starts = np.array([0, 127], np.int32)
    n_sent = 3
    p_total = int(counts.sum()) + n_sent
    tiles = np.concatenate(
        [np.zeros(127, np.int32), np.ones(129, np.int32),
         np.full(n_sent, ntx * nty, np.int32)]
    )
    rows = np.zeros((p_total, 9), np.float32)
    # Means inside each pair's own tile; PD conics; mid alphas.
    bx = (tiles % ntx) * ts
    rows[:, 0] = bx + rng.uniform(4, 28, p_total)  # mean_x (abs coords)
    rows[:, 1] = rng.uniform(4, 28, p_total)  # mean_y
    rows[:, 2] = rng.uniform(0.05, 0.3, p_total)  # conic a
    rows[:, 3] = rng.uniform(-0.02, 0.02, p_total)  # conic b
    rows[:, 4] = rng.uniform(0.05, 0.3, p_total)  # conic c
    rows[:, 5] = rng.uniform(0.3, 0.9, p_total)  # opacity
    rows[:, 6:9] = rng.uniform(0, 1, (p_total, 3))

    rgb, final_t = composite_tiles_pallas(
        jnp.asarray(rows), jnp.asarray(tiles), jnp.asarray(starts),
        jnp.asarray(counts), ntx, nty, ts, True,
    )

    # Per-tile NumPy reference (front-to-back alpha compositing).
    for t in range(2):
        px = np.arange(ts * ts) % ts + (t % ntx) * ts
        py = np.arange(ts * ts) // ts
        trans = np.ones(ts * ts)
        img = np.zeros((3, ts * ts))
        for p in range(starts[t], starts[t] + counts[t]):
            dx = px - rows[p, 0]
            dy = py - rows[p, 1]
            power = -0.5 * (rows[p, 2] * dx * dx + rows[p, 4] * dy * dy) \
                - rows[p, 3] * dx * dy
            a = np.minimum(0.99, rows[p, 5] * np.exp(power))
            a = np.where((power <= 0) & (a >= 1.0 / 255.0), a, 0.0)
            test_t = trans * (1 - a)
            live = (a > 0) & (test_t >= 1e-4)
            w = np.where(live, a * trans, 0.0)
            img += w[None] * rows[p, 6:9, None]
            trans = np.where(live, test_t, trans)
        # Same divergence envelope as the backend-parity tests: the kernel
        # evaluates the falloff via the expanded tile-local polynomial, the
        # NumPy reference directly — rim pixels near the α cull differ.
        di = np.abs(np.asarray(rgb[t]) - img)
        assert di.max() < 5e-3 and di.mean() < 5e-6, (di.max(), di.mean())
        dt_ = np.abs(np.asarray(final_t[t]) - trans)
        assert dt_.max() < 5e-3 and dt_.mean() < 5e-6

    # Backward: grads must flow for real pairs and be exactly zero for
    # sentinel pairs (their rows are real-valued but masked by tile id).
    def loss(r):
        rgb_, t_ = composite_tiles_pallas(
            r, jnp.asarray(tiles), jnp.asarray(starts),
            jnp.asarray(counts), ntx, nty, ts, True,
        )
        return jnp.sum(rgb_ ** 2) + jnp.sum(t_)

    g = np.asarray(jax.grad(loss)(jnp.asarray(rows)))
    assert np.isfinite(g).all()
    assert np.abs(g[: counts.sum()]).max() > 0
    np.testing.assert_array_equal(g[counts.sum():], 0.0)


def test_fused_bwd_accum_matches_unfused(scene):
    """The fused in-kernel gradient accumulation (per-gaussian VMEM table)
    must reproduce the unfused path's grads up to fp32 accumulation order
    (same moments, same map; only the scatter order differs)."""
    cam = _cams()
    base = dict(backend="pallas", pair_budget=1 << 13, pallas_interpret=True)
    cfg_u = RasterizeConfig(**base)
    cfg_f = RasterizeConfig(**base, fused_bwd_accum=True)

    def lossf(cfg):
        def loss(m, s, q, o, c):
            out = render_gaussians(
                m, s, q, o, None, cam, cfg, scene["bg"], colors_override=c
            )
            return jnp.mean(out["image"] ** 2) + 0.1 * jnp.mean(out["alpha"])

        return loss

    args = (scene["means"], scene["scales"], scene["quats"], scene["opac"],
            scene["colors"])
    ou = render_gaussians(
        *args[:4], None, cam, cfg_u, scene["bg"], colors_override=args[4]
    )
    of = render_gaussians(
        *args[:4], None, cam, cfg_f, scene["bg"], colors_override=args[4]
    )
    np.testing.assert_allclose(
        np.asarray(ou["image"]), np.asarray(of["image"]), atol=1e-6
    )
    gu = jax.grad(lossf(cfg_u), argnums=(0, 1, 2, 3, 4))(*args)
    gf = jax.grad(lossf(cfg_f), argnums=(0, 1, 2, 3, 4))(*args)
    # Identical moments and map; only the per-gaussian accumulation ORDER
    # differs (XLA scatter-add tree vs sequential in-kernel RMW) — observed
    # ≤ ~1e-6 abs / ~1e-4 rel on this scene.
    for a, b in zip(gu, gf):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4 * max(scale, 1e-3)
        )
