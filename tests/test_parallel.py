"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates the (data, tile) sharded train step against the single-device
reference: identical loss, identical parameter updates (the reference's
rank-consistency broadcast becomes this replication invariant, §5.8).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from youreditableavatar_tpu.models.optimizer import (
    OptimizationParams,
    make_tetgs_optimizer,
)
from youreditableavatar_tpu.models.tetgs import (
    build_tetgs,
    gaussian_arrays,
)
from youreditableavatar_tpu.ops.gaussian_raster import (
    RasterCamera,
    RasterizeConfig,
    render_gaussians,
)
from youreditableavatar_tpu.ops.image_losses import l1_dssim
from youreditableavatar_tpu.ops.marching_tets import make_tet_grid, marching_tets
from youreditableavatar_tpu.parallel import make_mesh, make_sharded_render_train_step

H = W = 64
RCFG = RasterizeConfig(
    backend="xla", pair_budget=1 << 12, tile_capacity=256, tile_size=32
)


@pytest.fixture(scope="module")
def scene():
    gverts, gtets = make_tet_grid(8)
    pos = jnp.asarray(gverts)
    sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
    mt = marching_tets(pos, sdf, jnp.asarray(gtets), 2048, 4096)
    nv = int(mt.num_verts)
    nf = int(mt.num_faces)
    verts = np.asarray(mt.verts)[:nv]
    faces = np.asarray(mt.faces)[:nf]
    colors = 0.5 + 0.4 * verts / 0.35
    binding, params = build_tetgs(verts, faces, np.clip(colors, 0, 1),
                                  sh_levels=2)

    cams, images = [], []
    rng = np.random.default_rng(0)
    for k in range(4):
        vm = np.eye(4, dtype=np.float32)
        az = k * np.pi / 2
        rot = np.array(
            [[np.cos(az), 0, np.sin(az)], [0, 1, 0],
             [-np.sin(az), 0, np.cos(az)]], np.float32,
        )
        vm[:3, :3] = rot
        vm[2, 3] = 2.0
        cam = RasterCamera.from_fov(vm, 0.8, 0.8, W, H)
        cams.append(cam)
        means, scales, quats, opac, sh = gaussian_arrays(binding, params)
        cfg2 = dataclasses.replace(RCFG, sh_degree=1)
        img = render_gaussians(means, scales, quats, opac, sh, cam, cfg2,
                               jnp.ones(3))["image"]
        # Perturbed target so gradients are non-trivial.
        images.append(np.asarray(img) * 0.7 + 0.1)
    return binding, params, cams, images


def make_batch(cams, images):
    return {
        "viewmats": jnp.stack([c.viewmat for c in cams]),
        "fx": jnp.stack([c.fx for c in cams]),
        "fy": jnp.stack([c.fy for c in cams]),
        "cx": jnp.stack([c.cx for c in cams]),
        "cy": jnp.stack([c.cy for c in cams]),
        "images": jnp.asarray(np.stack(images)),
    }


class TestShardedTrainStep:
    def test_matches_single_device(self, scene):
        binding, params, cams, images = scene
        cfg = dataclasses.replace(RCFG, sh_degree=1)
        tx = make_tetgs_optimizer(OptimizationParams(), 1.0)

        # Single-device reference: mean loss over the 4 views.
        def ref_loss(p):
            means, scales, quats, opac, sh = gaussian_arrays(binding, p)
            losses = []
            for cam, gt in zip(cams, images):
                img = render_gaussians(
                    means, scales, quats, opac, sh, cam, cfg, jnp.zeros(3)
                )["image"]
                losses.append(l1_dssim(img, jnp.asarray(gt), 0.2))
            return jnp.mean(jnp.stack(losses))

        ref_l, ref_g = jax.value_and_grad(ref_loss)(params)
        opt_ref = tx.init(params)
        upd, _ = tx.update(ref_g, opt_ref, params)
        ref_params = optax.apply_updates(params, upd)

        mesh = make_mesh((4, 2), ("data", "tile"))
        step = make_sharded_render_train_step(
            binding, tx, cfg, mesh, H, W, bg=jnp.zeros(3)
        )
        batch = make_batch(cams, images)
        p2, _, loss, _overflow = step(params, tx.init(params), batch)

        np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_params),
            jax.tree_util.tree_leaves(p2),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            )

    def test_pallas_backend_matches_single_device(self, scene):
        """The sharded step running the PALLAS kernels (interpret mode on the
        CPU mesh) reproduces the single-device pallas render's updates —
        the flagship kernels are the multi-chip path, not a fallback."""
        binding, params, cams, images = scene
        cfg = dataclasses.replace(
            RCFG, sh_degree=1, backend="pallas", pallas_interpret=True
        )
        tx = make_tetgs_optimizer(OptimizationParams(), 1.0)

        def ref_loss(p):
            means, scales, quats, opac, sh = gaussian_arrays(binding, p)
            losses = []
            for cam, gt in zip(cams[:2], images[:2]):
                img = render_gaussians(
                    means, scales, quats, opac, sh, cam, cfg, jnp.zeros(3)
                )["image"]
                losses.append(l1_dssim(img, jnp.asarray(gt), 0.2))
            return jnp.mean(jnp.stack(losses))

        ref_l, ref_g = jax.value_and_grad(ref_loss)(params)

        # 64×64 at tile_size 32 → 2 tile rows; tile axis 2 = one row each.
        mesh = make_mesh((2, 2), ("data", "tile"))
        step = make_sharded_render_train_step(
            binding, tx, cfg, mesh, H, W, bg=jnp.zeros(3)
        )
        batch = make_batch(cams[:2], images[:2])
        p2, _, loss, _overflow = step(params, tx.init(params), batch)

        np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
        opt_ref = tx.init(params)
        upd, _ = tx.update(ref_g, opt_ref, params)
        ref_params = optax.apply_updates(params, upd)
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_params),
            jax.tree_util.tree_leaves(p2),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            )

    def test_loss_decreases(self, scene):
        binding, params, cams, images = scene
        cfg = dataclasses.replace(RCFG, sh_degree=1)
        tx = make_tetgs_optimizer(OptimizationParams(), 1.0)
        mesh = make_mesh((2, 4), ("data", "tile"))
        step = make_sharded_render_train_step(
            binding, tx, cfg, mesh, H, W, bg=jnp.zeros(3)
        )
        batch = make_batch(cams[:2], images[:2])
        opt_state = tx.init(params)
        losses = []
        p = params
        for _ in range(5):
            p, opt_state, loss, _ = step(p, opt_state, batch)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_params_replicated_after_step(self, scene):
        binding, params, cams, images = scene
        cfg = dataclasses.replace(RCFG, sh_degree=1)
        tx = make_tetgs_optimizer(OptimizationParams(), 1.0)
        mesh = make_mesh((4, 2), ("data", "tile"))
        step = make_sharded_render_train_step(
            binding, tx, cfg, mesh, H, W, bg=jnp.zeros(3)
        )
        p2, _, _, _ = step(params, tx.init(params), make_batch(cams, images))
        for leaf in jax.tree_util.tree_leaves(p2):
            assert np.isfinite(np.asarray(leaf)).all()


def test_mesh_construction():
    mesh = make_mesh((2, 4))
    assert mesh.shape == {"data": 2, "tile": 4}
    mesh2 = make_mesh((2, -1))
    assert mesh2.shape["tile"] == 4
