"""Spatial stage tests: SDF field, shape init, partition, SDS edit smoke.

SURVEY §4(d): pipeline smoke tests with a stub guidance backend so stage
wiring runs without diffusion weights. Sizes are tiny; budgets small.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.guidance import (
    SDSConfig,
    SDSGuidance,
    StubDiffusionPrior,
    StubPromptEncoder,
)
from youreditableavatar_tpu.guidance.prompts import PromptProcessor
from youreditableavatar_tpu.models.geometry import GeometryBudgets, TetGeometry
from youreditableavatar_tpu.models.sdf import SDFField, SDFFieldConfig
from youreditableavatar_tpu.ops.hashgrid import HashGridConfig
from youreditableavatar_tpu.ops.marching_tets import make_tet_grid, marching_tets
from youreditableavatar_tpu.ops.mesh_raster import MeshRasterConfig
from youreditableavatar_tpu.stages.export import (
    export_edit_mesh,
    export_editing_region_info,
    export_init_mesh,
    load_edit_mesh,
    load_init_mesh,
    remove_floaters,
)
from youreditableavatar_tpu.stages.spatial import (
    HumanEditConfig,
    HumanEditTrainer,
    ShapeInitConfig,
    ShapeInitializer,
    align_anchor_mesh,
)
from youreditableavatar_tpu.data.camera_sampler import RandomCameraConfig


def small_field():
    return SDFField(
        SDFFieldConfig(
            grid=HashGridConfig(
                n_levels=4, n_features_per_level=2, log2_hashmap_size=13,
                base_resolution=4, per_level_scale=1.5,
            ),
            n_neurons=32,
            sdf_bias="sphere",
            sdf_bias_radius=0.4,
        )
    )


SMALL_BUDGETS = GeometryBudgets(
    mt_verts=4096, mt_faces=8192, compact=2048, subdiv_mid=8192,
    fine_mt_verts=8192, fine_mt_faces=16384,
)

MESH_CFG = MeshRasterConfig(pair_budget=1 << 14, tile_capacity=1024,
                            backend="xla")


class TestSDFField:
    def test_sphere_bias_gives_sphere_surface(self):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=12, budgets=SMALL_BUDGETS)
        mt = geom.isosurface(params)
        v = np.asarray(mt.verts)[np.asarray(mt.verts_valid)]
        r = np.linalg.norm(v, axis=-1)
        # Near-zero-init MLP + sphere bias ⇒ surface ≈ sphere of radius 0.4.
        assert int(mt.num_faces) > 100
        np.testing.assert_allclose(r.mean(), 0.4, atol=0.08)

    def test_fd_normals_radial(self):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        pts = jnp.asarray(
            np.random.default_rng(0).normal(size=(64, 3)), jnp.float32
        )
        pts = 0.4 * pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        sdf, normals = field.forward_with_normal(params, pts)
        dots = np.einsum(
            "ij,ij->i", np.asarray(normals),
            np.asarray(pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)),
        )
        assert dots.mean() > 0.9  # outward radial

    def test_chunked_matches_direct(self):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(1))
        pts = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (1000, 3)), jnp.float32
        )
        a = field.forward_sdf(params, pts)
        b = field.forward_sdf_chunked(params, pts, chunk=256)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestShapeInit:
    def test_fits_sphere_mesh(self):
        # GT mesh: marching-tets sphere; tiny iteration counts.
        gverts, gtets = make_tet_grid(10)
        pos = jnp.asarray(gverts)
        sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
        mt = marching_tets(pos, sdf, jnp.asarray(gtets), 2048, 4096)
        nv, nf = int(mt.num_verts), int(mt.num_faces)
        verts = np.asarray(mt.verts)[:nv]
        faces = np.asarray(mt.faces)[np.asarray(mt.faces_valid)][:nf]

        field = small_field()
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        cfg = ShapeInitConfig(
            sdf_iters=150, sdf_points_per_iter=4096, sdf_pool_size=50_000,
            normal_iters=3, normal_height=64, normal_width=64,
            normal_points_per_iter=4096,
            camera=RandomCameraConfig(
                height=64, width=64, camera_distance_range=(1.6, 1.8),
                elevation_range=(-10, 10), fovy_range=(40, 45),
            ),
        )
        init = ShapeInitializer(field, geom, cfg)
        params, info = init.run(
            verts, faces, jax.random.PRNGKey(0), MESH_CFG
        )
        # Field ≈ sphere sdf on probe points.
        rng = np.random.default_rng(2)
        probe = rng.uniform(-0.8, 0.8, (512, 3)).astype(np.float32)
        pred = np.asarray(field.forward_sdf(params, jnp.asarray(probe)))
        gt = np.linalg.norm(probe, axis=-1) - 0.35
        corr = np.corrcoef(pred, gt)[0, 1]
        assert corr > 0.97


def make_partitioned(field, geom, params):
    mt = geom.isosurface(params)
    fc = np.asarray(mt.verts)[np.asarray(mt.faces)].mean(1)
    edit_faces = jnp.asarray(fc[:, 2] > 0.1) & mt.faces_valid
    part = geom.partition_init(params, edit_faces, frozen_mt=mt)
    return mt, edit_faces, part


class TestPartition:
    def test_partition_surfaces(self):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=12, budgets=SMALL_BUDGETS)
        mt, edit_faces, part = make_partitioned(field, geom, params)

        assert bool(jnp.any(part.update_tet_mask))
        assert bool(jnp.any(part.keep_tet_mask))
        # Cached keep mesh exists and lies in the keep region (z below cut).
        kv = np.asarray(part.keep_mesh.verts)[
            np.asarray(part.keep_mesh.verts_valid)
        ]
        assert len(kv) > 0
        assert np.quantile(kv[:, 2], 0.9) < 0.35

        # Live update surface initially matches the frozen field's update
        # region (same field): on-surface verts near radius 0.4.
        upd = geom.part_isosurface(params, part)
        uv = np.asarray(upd.verts)[np.asarray(upd.verts_valid)]
        assert len(uv) > 0
        np.testing.assert_allclose(
            np.linalg.norm(uv, axis=-1).mean(), 0.4, atol=0.1
        )

    def test_update_region_differentiable(self):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        _, _, part = make_partitioned(field, geom, params)

        def loss(p):
            upd = geom.part_isosurface(p, part)
            r = jnp.linalg.norm(upd.verts, axis=-1)
            return jnp.sum(jnp.where(upd.verts_valid, r, 0.0))

        g = jax.grad(loss)(params)
        total = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
        )
        assert np.isfinite(total) and total > 0

    def test_sparse_grad_matches_dense(self):
        """part_isosurface's sparse grad requery (selection under stop_grad,
        grad-enabled forward only at selected-tet corners) must produce the
        SAME gradients as the dense formulation that evaluates every live
        vertex differentiably — the sparsity is exact, not approximate."""
        from youreditableavatar_tpu.ops.marching_tets import (
            compact_tets,
            subdivide_tets,
        )

        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        _, _, part = make_partitioned(field, geom, params)

        def dense_part_isosurface(p):
            live_idx = part.live_vert_idx
            live_vals = field.forward_sdf(p, geom.grid_pos[live_idx])
            sdf = part.frozen_sdf.at[live_idx].set(live_vals)
            upd_tets = geom.grid_tets[part.update_tet_idx]
            idx, valid, _ = compact_tets(
                geom.grid_pos, sdf, upd_tets, geom.budgets.compact,
                corner_threshold=geom.spacing,
            )
            sub_tets = upd_tets[idx]
            fine_pos, _, child_tets, child_valid, _ = subdivide_tets(
                geom.grid_pos, sdf, sub_tets, valid, geom.budgets.subdiv_mid
            )
            mids = fine_pos[geom.grid_pos.shape[0]:]
            mid_live = field.forward_sdf_chunked(p, mids)
            fine_sdf = jnp.concatenate([sdf, mid_live])
            return marching_tets(
                fine_pos, fine_sdf, child_tets,
                geom.budgets.fine_mt_verts, geom.budgets.fine_mt_faces,
                tet_valid=child_valid,
            )

        def loss_of(iso_fn):
            def loss(p):
                upd = iso_fn(p)
                r = jnp.linalg.norm(upd.verts, axis=-1)
                return jnp.sum(jnp.where(upd.verts_valid, r * r, 0.0))

            return loss

        l_sparse, g_sparse = jax.value_and_grad(
            loss_of(lambda p: geom.part_isosurface(p, part))
        )(params)
        l_dense, g_dense = jax.value_and_grad(loss_of(dense_part_isosurface))(
            params
        )
        np.testing.assert_allclose(
            float(l_sparse), float(l_dense), rtol=1e-6
        )
        for ks, kd in zip(
            jax.tree_util.tree_leaves_with_path(g_sparse),
            jax.tree_util.tree_leaves_with_path(g_dense),
        ):
            np.testing.assert_allclose(
                np.asarray(ks[1]), np.asarray(kd[1]), rtol=1e-4, atol=1e-6,
                err_msg=str(ks[0]),
            )


class TestHumanEditSmoke:
    def test_few_steps_run(self):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        _, _, part = make_partitioned(field, geom, params)

        prior = StubDiffusionPrior()
        guidance = SDSGuidance(prior, SDSConfig(guidance_scale=7.5))
        enc = StubPromptEncoder()
        prompts = PromptProcessor(
            "a red jacket", "low quality", enc,
            cache_dir="/tmp/test_prompt_cache", model_name="stub-test",
        )
        cfg = HumanEditConfig(
            max_steps=4,
            camera=RandomCameraConfig(
                height=64, width=64, camera_distance_range=(1.6, 1.8),
                elevation_range=(-5, 10), fovy_range=(40, 45),
            ),
            recon_points=2048,
            start_sdf_loss_step=2,
        )
        trainer = HumanEditTrainer(
            field, geom, part, params, guidance, prompts, prompts,
            cfg, MESH_CFG,
        )
        out = trainer.train(jax.random.PRNGKey(1), num_steps=4)
        assert trainer.global_step == 4
        for rec in trainer.metrics:
            assert np.isfinite(rec["loss"])
        # Params moved.
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(out),
                jax.tree_util.tree_leaves(params),
            )
        )
        assert moved > 0

    def test_du_mode_steps(self):
        """`use_sds: false` multi-step "du" editing drives the trainer
        (`sds_du_guidance.py:40-42,276-314`): the edited-image cache fills
        per azimuth bucket, refreshes on the per_editing_step cadence, and
        the du losses (latent MSE + L1) optimize the field."""
        from youreditableavatar_tpu.guidance.sds import (
            SDSDUConfig,
            SDSDUGuidance,
        )

        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        _, _, part = make_partitioned(field, geom, params)

        prior = StubDiffusionPrior()
        guidance = SDSDUGuidance(
            prior, SDSDUConfig(guidance_scale=7.5, per_editing_step=2)
        )
        enc = StubPromptEncoder()
        prompts = PromptProcessor(
            "a red jacket", "low quality", enc,
            cache_dir="/tmp/test_prompt_cache", model_name="stub-test",
        )
        cfg = HumanEditConfig(
            max_steps=3,
            use_sds=False,
            camera=RandomCameraConfig(
                height=64, width=64, camera_distance_range=(1.6, 1.8),
                elevation_range=(-5, 10), fovy_range=(40, 45),
            ),
            recon_points=1024,
            start_sdf_loss_step=2,
        )
        trainer = HumanEditTrainer(
            field, geom, part, params, guidance, prompts, prompts,
            cfg, MESH_CFG,
        )
        out = trainer.train(jax.random.PRNGKey(1), num_steps=3)
        assert trainer.global_step == 3
        assert len(guidance.edited_images) >= 1  # cache populated
        for rec in trainer.metrics:
            assert np.isfinite(rec["loss"])
            assert "du_f" in rec and "du_l1" in rec
        moved = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(out),
                jax.tree_util.tree_leaves(params),
            )
        )
        assert moved > 0

    def test_sdf_cache_matches_full_sweep(self):
        """With the selection cache on (sdf_cache_refresh=2) training must
        match the uncached full-sweep path: selected-tet corners are fresh
        every step, so on a slowly-moving surface the tet selection — and
        therefore every loss and update — is identical."""

        def run(refresh):
            field = small_field()
            params = field.init_params(jax.random.PRNGKey(0))
            geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
            _, _, part = make_partitioned(field, geom, params)
            prior = StubDiffusionPrior()
            guidance = SDSGuidance(prior, SDSConfig(guidance_scale=7.5))
            enc = StubPromptEncoder()
            prompts = PromptProcessor(
                "a red jacket", "low quality", enc,
                cache_dir="/tmp/test_prompt_cache", model_name="stub-test",
            )
            cfg = HumanEditConfig(
                max_steps=5,
                camera=RandomCameraConfig(
                    height=64, width=64, camera_distance_range=(1.6, 1.8),
                    elevation_range=(-5, 10), fovy_range=(40, 45),
                ),
                recon_points=2048,
                start_sdf_loss_step=2,
                sdf_cache_refresh=refresh,
            )
            trainer = HumanEditTrainer(
                field, geom, part, params, guidance, prompts, prompts,
                cfg, MESH_CFG,
            )
            out = trainer.train(jax.random.PRNGKey(1), num_steps=5)
            return out, trainer.metrics

        p_cache, m_cache = run(2)
        p_full, m_full = run(0)
        for a, b in zip(m_cache, m_full):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_cache),
            jax.tree_util.tree_leaves(p_full),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            )

    def test_resume_matches_uninterrupted(self, tmp_path):
        """Checkpoint at step 2 (mid-curriculum, past the control-SDF
        snapshot boundary), restore into a FRESH trainer, finish training:
        final params must match the uninterrupted run exactly (step-replay
        on restore: level mask, schedules, control snapshot, RNG streams
        all re-derived from the restored step)."""

        def make_trainer():
            field = small_field()
            params = field.init_params(jax.random.PRNGKey(0))
            geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
            _, _, part = make_partitioned(field, geom, params)
            prior = StubDiffusionPrior()
            guidance = SDSGuidance(prior, SDSConfig(guidance_scale=7.5))
            enc = StubPromptEncoder()
            prompts = PromptProcessor(
                "a red jacket", "low quality", enc,
                cache_dir="/tmp/test_prompt_cache", model_name="stub-test",
            )
            cfg = HumanEditConfig(
                max_steps=4,
                camera=RandomCameraConfig(
                    height=64, width=64, camera_distance_range=(1.6, 1.8),
                    elevation_range=(-5, 10), fovy_range=(40, 45),
                ),
                recon_points=2048,
                start_sdf_loss_step=1,
            )
            return HumanEditTrainer(
                field, geom, part, params, guidance, prompts, prompts,
                cfg, MESH_CFG,
            )

        key = jax.random.PRNGKey(1)
        ref = make_trainer()
        ref.train(key, num_steps=4)

        a = make_trainer()
        a.train(key, num_steps=2)
        assert a.control_sdf is not None  # snapshot taken at step 1
        ckpt = str(tmp_path / "resume_ckpt")
        a.save_checkpoint(ckpt)

        b = make_trainer()
        b.restore_checkpoint(ckpt)
        assert b.global_step == 2 and b.control_sdf is not None
        b.train(key, num_steps=2)

        for x, y in zip(jax.tree_util.tree_leaves(ref.params),
                        jax.tree_util.tree_leaves(b.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6, rtol=1e-5)

    def test_restore_like_nonalphabetical_namedtuple(self):
        """Orbax restores NamedTuple optimizer states as dicts iterated in
        sorted-key order; restore_like must rebuild by FIELD NAME so states
        whose field order is not alphabetical round-trip correctly (a
        flattened-order unflatten would permute `zeta` and `alpha` here)."""
        import collections
        from youreditableavatar_tpu.utils.checkpoint import restore_like

        St = collections.namedtuple("St", ["zeta", "alpha"])
        live = St(zeta=jnp.zeros((2,)), alpha=jnp.zeros((3,)))
        # what orbax hands back: a plain dict (sorted-key iteration order
        # alpha, zeta — the reverse of field order)
        restored = {"zeta": np.full((2,), 7.0), "alpha": np.full((3,), 9.0)}
        out = restore_like(live, restored)
        assert isinstance(out, St)
        np.testing.assert_array_equal(np.asarray(out.zeta), 7.0)
        np.testing.assert_array_equal(np.asarray(out.alpha), 9.0)

    def test_image_guided_and_nc_sub(self, tmp_path):
        """use_additional_input losses + NC-sub switch + visual
        checkpoints + progressive level mask (VERDICT r1 items 6/7/9)."""
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        _, _, part = make_partitioned(field, geom, params)
        # Progressive curriculum must actually gate levels at step 0.
        assert field.cfg.grid.progressive
        lm0 = np.asarray(field.level_mask(0))
        assert lm0.sum() < field.cfg.grid.n_levels or \
            field.cfg.grid.start_level >= field.cfg.grid.n_levels

        prior = StubDiffusionPrior()
        guidance = SDSGuidance(prior, SDSConfig(guidance_scale=7.5))
        enc = StubPromptEncoder()
        prompts = PromptProcessor(
            "a red jacket", "low quality", enc,
            cache_dir="/tmp/test_prompt_cache", model_name="stub-test",
        )
        cfg = HumanEditConfig(
            max_steps=3,
            camera=RandomCameraConfig(
                height=64, width=64, camera_distance_range=(1.6, 1.8),
                elevation_range=(-5, 10), fovy_range=(40, 45),
            ),
            recon_points=1024,
            start_sdf_loss_step=2,
            sub_step=2,  # NC-sub weight from step 2
            lambda_normal_consistency=1000.0,
            lambda_normal_consistency_sub=10.0,
            use_additional_input=True,
            image_every=1,
        )
        trainer = HumanEditTrainer(
            field, geom, part, params, guidance, prompts, prompts,
            cfg, MESH_CFG,
        )
        trainer.save_dir = str(tmp_path)
        trainer.input_images = {
            "front_normal": np.full((64, 64, 3), 0.5, np.float32),
            "back_normal": np.full((64, 64, 3), 0.5, np.float32),
            "front_mask": np.ones((64, 64), np.float32),
        }
        trainer.train(jax.random.PRNGKey(1), num_steps=3)
        recs = trainer.metrics
        assert all("img_normal" in r for r in recs)
        assert all(np.isfinite(r["img_normal"]) for r in recs)
        import os

        dumps = os.listdir(tmp_path / "train-normal")
        assert len(dumps) >= 3


class TestExporters:
    def test_init_mesh_roundtrip(self, tmp_path):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        mt = geom.isosurface(params)
        path = str(tmp_path / "init_mesh.npy")
        export_init_mesh(path, mt)
        data = load_init_mesh(path)
        assert data["vertices"].shape[1] == 3
        assert data["faces"].shape[1] == 3
        assert len(data["face_to_global_tet_idx"]) == len(data["faces"])
        assert data["faces"].max() < len(data["vertices"])

    def test_edit_mesh_roundtrip(self, tmp_path):
        field = small_field()
        params = field.init_params(jax.random.PRNGKey(0))
        geom = TetGeometry(field, resolution=10, budgets=SMALL_BUDGETS)
        mt, edit_faces, part = make_partitioned(field, geom, params)
        upd = geom.part_isosurface(params, part)
        path = str(tmp_path / "edit_mesh.npy")
        export_edit_mesh(path, part.keep_mesh, upd)
        d = load_edit_mesh(path)
        assert d["keep_vertices_num"] > 0 and d["keep_faces_num"] > 0
        assert len(d["editing_mask"]) == len(d["vertices"])
        assert d["editing_mask"][: d["keep_vertices_num"]].sum() == 0
        assert d["editing_mask"].sum() > 0

    def test_remove_floaters(self):
        # Two components: a big fan and a lone triangle.
        verts = np.random.default_rng(0).normal(size=(10, 3))
        faces = np.array(
            [[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 5], [0, 5, 6],
             [7, 8, 9]]
        )
        keep = remove_floaters(verts, faces, min_fraction=0.34)
        assert keep[:5].all() and not keep[5]

    def test_editing_region_info(self, tmp_path):
        path = str(tmp_path / "editing_region_info.npy")
        vm = np.array([1, 0, 1, 1])
        fm = np.array([1.0, 0.0])
        export_editing_region_info(path, vm, fm)
        info = np.load(path, allow_pickle=True).item()
        np.testing.assert_array_equal(info["editing_mask"], vm)
        np.testing.assert_array_equal(info["editing_mask_faces"], fm)


class TestAlignment:
    def test_align_anchor_mesh(self):
        rng = np.random.default_rng(0)
        verts = rng.normal(size=(100, 3)) * 2 + 5
        v, meta = align_anchor_mesh(verts, shape_init_params=0.9)
        assert np.abs(v).max() <= 0.9 + 1e-5
        assert meta["scale"] > 0
