"""Gaussian rasterizer: XLA backend vs the sequential NumPy oracle.

This is BASELINE config 1: synthetic random Gaussians, small image, forward
parity + gradient sanity, CPU-runnable.
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
from youreditableavatar_tpu.ops.gaussian_raster.oracle import render_oracle


def make_scene(rng, n=500, width=128, height=96):
    means = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.01, 0.08, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    viewmat = np.eye(4, dtype=np.float32)
    viewmat[2, 3] = 3.0  # camera at z=-3 looking +z
    cam = RasterCamera.from_fov(
        viewmat, fovx=0.8, fovy=0.6, width=width, height=height
    )
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    return means, scales, quats, opac, colors, viewmat, cam, bg


@pytest.fixture(scope="module")
def scene():
    return make_scene(np.random.default_rng(42))


def run_xla(scene, **cfg_kwargs):
    means, scales, quats, opac, colors, viewmat, cam, bg = scene
    cfg = RasterizeConfig(
        backend="xla",
        pair_budget=1 << 14,
        tile_capacity=1024,
        **cfg_kwargs,
    )
    out = render_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), None, cam, cfg, jnp.asarray(bg),
        colors_override=jnp.asarray(colors),
    )
    return jax.tree_util.tree_map(np.asarray, out)


class TestForwardParity:
    def test_matches_oracle(self, scene):
        means, scales, quats, opac, colors, viewmat, cam, bg = scene
        got = run_xla(scene)
        ref = render_oracle(
            means.astype(np.float64), scales.astype(np.float64),
            quats.astype(np.float64), opac.astype(np.float64),
            colors.astype(np.float64), viewmat.astype(np.float64),
            float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
            cam.width, cam.height, bg,
        )
        assert int(got["num_pairs"]) > 0
        np.testing.assert_allclose(got["radii"], ref["radii"])
        np.testing.assert_allclose(
            got["image"], ref["image"], atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            got["final_t"], ref["final_t"], atol=2e-4, rtol=1e-4
        )

    def test_empty_scene_is_background(self, scene):
        means, scales, quats, opac, colors, viewmat, cam, bg = scene
        cfg = RasterizeConfig(backend="xla", pair_budget=1024, tile_capacity=64)
        out = render_gaussians(
            jnp.zeros((4, 3)) + 100.0,  # far outside frustum
            jnp.ones((4, 3)) * 0.01,
            jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (4, 1)),
            jnp.ones((4,)) * 0.5,
            None, cam, cfg, jnp.asarray(bg),
            colors_override=jnp.ones((4, 3)),
        )
        np.testing.assert_allclose(
            np.asarray(out["image"]),
            np.broadcast_to(bg, (cam.height, cam.width, 3)),
            atol=1e-6,
        )

    def test_single_opaque_gaussian_center(self):
        # One big gaussian at the image center: center pixel ≈ its color.
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[2, 3] = 2.0
        cam = RasterCamera.from_fov(viewmat, 0.8, 0.8, 64, 64)
        cfg = RasterizeConfig(backend="xla", pair_budget=256, tile_capacity=32)
        out = render_gaussians(
            jnp.zeros((1, 3)),
            jnp.full((1, 3), 0.3),
            jnp.asarray([[1.0, 0, 0, 0]]),
            jnp.asarray([0.99]),
            None, cam, cfg, jnp.zeros(3),
            colors_override=jnp.asarray([[0.0, 1.0, 0.0]]),
        )
        img = np.asarray(out["image"])
        center = img[32, 32]
        assert center[1] > 0.9 and center[0] < 1e-3


class TestGradients:
    def test_grads_finite_and_nonzero(self, scene):
        means, scales, quats, opac, colors, viewmat, cam, bg = scene
        cfg = RasterizeConfig(backend="xla", pair_budget=1 << 14,
                              tile_capacity=1024)

        def loss(m, s, q, o, c):
            out = render_gaussians(
                m, s, q, o, None, cam, cfg, jnp.asarray(bg),
                colors_override=c,
            )
            return jnp.mean(out["image"] ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(colors),
        )
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()
        # At least means/colors/opacity must receive signal.
        assert float(jnp.abs(grads[0]).sum()) > 0
        assert float(jnp.abs(grads[3]).sum()) > 0
        assert float(jnp.abs(grads[4]).sum()) > 0

    def test_color_grad_matches_finite_difference(self):
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[2, 3] = 2.0
        cam = RasterCamera.from_fov(viewmat, 0.8, 0.8, 32, 32)
        cfg = RasterizeConfig(backend="xla", pair_budget=256, tile_capacity=32)
        m = jnp.zeros((1, 3))
        s = jnp.full((1, 3), 0.2)
        q = jnp.asarray([[1.0, 0, 0, 0]])
        o = jnp.asarray([0.8])

        def loss(c):
            out = render_gaussians(
                m, s, q, o, None, cam, cfg, jnp.zeros(3), colors_override=c
            )
            return jnp.sum(out["image"])

        c0 = jnp.asarray([[0.5, 0.5, 0.5]])
        g = jax.grad(loss)(c0)
        eps = 1e-3
        for ch in range(3):
            fd = (
                loss(c0.at[0, ch].add(eps)) - loss(c0.at[0, ch].add(-eps))
            ) / (2 * eps)
            np.testing.assert_allclose(g[0, ch], fd, rtol=2e-2)

    def test_opacity_grad_matches_finite_difference(self):
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[2, 3] = 2.0
        cam = RasterCamera.from_fov(viewmat, 0.8, 0.8, 32, 32)
        cfg = RasterizeConfig(backend="xla", pair_budget=1024,
                              tile_capacity=64)
        rng = np.random.default_rng(3)
        n = 6
        m = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32)
        s = jnp.full((n, 3), 0.15)
        q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
        c = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

        def loss(o):
            out = render_gaussians(
                m, s, q, o, None, cam, cfg, jnp.zeros(3), colors_override=c
            )
            return jnp.sum(out["image"] ** 2)

        o0 = jnp.asarray(rng.uniform(0.3, 0.7, (n,)), jnp.float32)
        g = np.asarray(jax.grad(loss)(o0))
        eps = 1e-3
        for i in range(n):
            fd = (loss(o0.at[i].add(eps)) - loss(o0.at[i].add(-eps))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=1e-4)


class TestSHRendering:
    def test_sh_degree0_equals_color_override(self, scene):
        means, scales, quats, opac, colors, viewmat, cam, bg = scene
        from youreditableavatar_tpu.ops.sh import rgb_to_sh_dc

        cfg = RasterizeConfig(
            backend="xla", pair_budget=1 << 14, tile_capacity=1024, sh_degree=0
        )
        sh = rgb_to_sh_dc(jnp.asarray(colors))[:, None, :]
        out_sh = render_gaussians(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), sh, cam, cfg, jnp.asarray(bg),
        )
        out_c = run_xla((means, scales, quats, opac, colors, viewmat, cam, bg))
        np.testing.assert_allclose(
            np.asarray(out_sh["image"]), out_c["image"], atol=1e-5
        )


class TestCheckedRender:
    def test_clean_scene_passes_and_nan_scene_snapshots(self, scene, tmp_path):
        from youreditableavatar_tpu.ops.gaussian_raster import (
            render_gaussians_checked,
        )

        means, scales, quats, opac, colors, viewmat, cam, bg = scene
        cfg = RasterizeConfig(
            backend="xla", pair_budget=1 << 14, tile_capacity=1024
        )
        out = render_gaussians_checked(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), None, cam, cfg, jnp.asarray(bg),
            colors_override=jnp.asarray(colors),
            snapshot_path=str(tmp_path / "snap.npz"),
        )
        assert np.isfinite(np.asarray(out["image"])).all()
        assert not (tmp_path / "snap.npz").exists()

        # NaN-poisoned colors → RuntimeError + input snapshot on disk
        # (reference rasterizer debug-mode semantics, __init__.py:83-90).
        bad = np.asarray(colors).copy()
        bad[0] = np.nan
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="snapshot"):
            render_gaussians_checked(
                jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac), None, cam, cfg, jnp.asarray(bg),
                colors_override=jnp.asarray(bad),
                snapshot_path=str(tmp_path / "snap.npz"),
            )
        snap = np.load(tmp_path / "snap.npz")
        assert snap["means3d"].shape == means.shape
        assert np.isnan(snap["colors_override"][0]).any()


class TestRectModes:
    """The reference-faithful 3σ getRect mode (`forward.cu:336-374`)."""

    def test_3sigma_matches_oracle(self, scene):
        means, scales, quats, opac, colors, viewmat, cam, bg = scene
        got = run_xla(scene, rect_mode="3sigma")
        ref = render_oracle(
            means, scales, quats, opac, colors, viewmat,
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height, bg,
            rect_mode="3sigma",
        )
        np.testing.assert_allclose(
            got["image"], ref["image"], atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(
            got["final_t"], ref["final_t"], atol=1e-5, rtol=1e-4)

    def test_mode_divergence_is_tail_only(self, scene):
        """support vs 3sigma differ only where the α-support extends past
        the 3σ rect — a small, bounded tail contribution."""
        got_s = run_xla(scene)
        got_3 = run_xla(scene, rect_mode="3sigma")
        d = np.abs(got_s["image"] - got_3["image"])
        # Bounded: tail pixels have α ∈ [1/255, op·e^{-4.5}); with op ≤ .95
        # a single splat's clipped tail contributes < ~1.5e-2 to a pixel.
        assert float(d.max()) < 5e-2
        # And the modes DO differ somewhere (the clip is real).
        assert float(d.max()) > 0.0
