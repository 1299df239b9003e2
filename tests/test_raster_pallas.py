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
    np.testing.assert_allclose(
        np.asarray(ox["image"]), np.asarray(op["image"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ox["final_t"]), np.asarray(op["final_t"]), atol=1e-6
    )


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
    # reduction) rather than per-pair direct sums — same math, different fp32
    # summation order. Observed divergence vs the XLA backend is ≤ ~1e-6 abs
    # (≤ ~2e-4 rel) on this scene; 5e-5·max|g| bounds it with margin.
    for a, b in zip(gx, gp):
        scale = float(jnp.abs(a).max()) + 1e-12
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5 * max(scale, 1e-3)
        )
