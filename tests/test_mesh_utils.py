"""Tests for the long-tail reference-parity utilities added in round 2:
Mesh (UV unwrap / tangents / outlier removal), winding-number ShapeLoss,
perp-neg prompt interpolation, tet-grid builder, prompt library, saving
extras. Reference anchors in each module's docstring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from youreditableavatar_tpu.models.mesh import Mesh
from youreditableavatar_tpu.ops.marching_tets import (
    build_tet_grid,
    make_tet_grid,
    marching_tets,
)
from youreditableavatar_tpu.ops.shape_loss import ShapeLoss, winding_number


def _sphere(res=10, radius=0.35):
    gv, gt = make_tet_grid(res)
    pos = jnp.asarray(gv)
    mt = marching_tets(pos, jnp.linalg.norm(pos, axis=-1) - radius,
                       jnp.asarray(gt), 2048, 4096)
    nv, nf = int(mt.num_verts), int(mt.num_faces)
    verts = np.asarray(mt.verts)[:nv]
    faces = np.asarray(mt.faces)[np.asarray(mt.faces_valid)][:nf]
    return verts, faces.astype(np.int64)


class TestMesh:
    def test_normals_unit_and_outward(self):
        verts, faces = _sphere()
        mesh = Mesh(verts, faces)
        n = mesh.v_nrm
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0,
                                   atol=1e-5)
        # sphere normals point away from center
        dots = np.sum(n * verts, -1) / np.linalg.norm(verts, axis=-1)
        assert (dots > 0.5).mean() > 0.95

    def test_uv_unwrap_in_unit_square_no_overlap_between_charts(self):
        verts, faces = _sphere()
        mesh = Mesh(verts, faces)
        uv = mesh.v_tex
        assert uv.min() >= 0.0 and uv.max() <= 1.0
        assert mesh.t_tex_idx.shape == faces.shape
        # every face's uv triangle is non-degenerate
        t = uv[mesh.t_tex_idx]
        area = np.abs(
            (t[:, 1, 0] - t[:, 0, 0]) * (t[:, 2, 1] - t[:, 0, 1])
            - (t[:, 1, 1] - t[:, 0, 1]) * (t[:, 2, 0] - t[:, 0, 0])
        )
        assert (area > 1e-12).mean() > 0.95

    def test_uv_atlas_globally_overlap_free(self):
        """xatlas-quality requirement (VERDICT r4 #9): no two triangles of
        the WHOLE atlas — within or across charts — overlap. A closed
        sphere folds in every axis, so a naive projection would overlap."""
        from youreditableavatar_tpu.models.mesh import _chart_self_overlaps

        verts, faces = _sphere()
        mesh = Mesh(verts, faces)
        uv, ft = mesh.v_tex.astype(np.float64), mesh.t_tex_idx
        assert not _chart_self_overlaps(uv, ft, res=768)

    def test_uv_charts_uniform_texel_density(self):
        """All charts share ONE world→uv scale: each face's uv area over
        world area is constant across the atlas (planar distortion aside)."""
        verts, faces = _sphere()
        mesh = Mesh(verts, faces)
        uv, ft = mesh.v_tex, mesh.t_tex_idx
        t = uv[ft]
        uv_area = 0.5 * np.abs(
            (t[:, 1, 0] - t[:, 0, 0]) * (t[:, 2, 1] - t[:, 0, 1])
            - (t[:, 1, 1] - t[:, 0, 1]) * (t[:, 2, 0] - t[:, 0, 0])
        )
        w = verts[faces]
        world_area = 0.5 * np.linalg.norm(
            np.cross(w[:, 1] - w[:, 0], w[:, 2] - w[:, 0]), axis=-1
        )
        ratio = uv_area / np.maximum(world_area, 1e-18)
        med = np.median(ratio)
        # planar projection under a 60° normal cone compresses areas by at
        # most cos(60°) = 0.5
        assert (np.abs(ratio / med - 1.0) < 0.6).mean() > 0.95

    def test_tangents_orthogonal_to_normals(self):
        verts, faces = _sphere()
        mesh = Mesh(verts, faces)
        t = mesh.v_tng
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0,
                                   atol=1e-4)
        dots = np.abs(np.sum(t * mesh.v_nrm, -1))
        assert dots.max() < 1e-3

    def test_remove_outliers(self):
        verts, faces = _sphere()
        # add a tiny floating triangle far away
        v2 = np.concatenate(
            [verts, np.array([[2, 2, 2], [2.1, 2, 2], [2, 2.1, 2]],
                             np.float32)])
        f2 = np.concatenate(
            [faces, np.array([[len(verts), len(verts) + 1,
                               len(verts) + 2]])])
        clean = Mesh(v2, f2).remove_outliers()
        assert len(clean.t_pos_idx) == len(faces)


class TestShapeLoss:
    def test_winding_number_inside_outside(self):
        verts, faces = _sphere()
        pts = jnp.asarray([[0, 0, 0], [0.9, 0.9, 0.9], [0.2, 0, 0]],
                          jnp.float32)
        w = winding_number(pts, jnp.asarray(verts),
                           jnp.asarray(faces, jnp.int32))
        assert float(w[0]) > 0.9  # center: inside
        assert abs(float(w[1])) < 0.1  # far: outside
        assert float(w[2]) > 0.9  # inside near surface

    def test_shape_loss_prefers_matching_occupancy(self):
        verts, faces = _sphere()
        sl = ShapeLoss(verts, faces, proximal_surface=0.0)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, (256, 3)), jnp.float32)
        w = winding_number(pts, sl.verts, sl.faces)
        inside = np.asarray(w) > 0.5
        good = jnp.where(jnp.asarray(inside), 50.0, 0.0)  # dense inside
        bad = jnp.where(jnp.asarray(inside), 0.0, 50.0)
        assert float(sl(pts, good)) < float(sl(pts, bad))


class TestPerpNeg:
    def test_interpolation_and_weights(self):
        from youreditableavatar_tpu.guidance.prompts import PromptProcessor
        from youreditableavatar_tpu.guidance.stub import StubPromptEncoder

        pp = PromptProcessor(
            "a red jacket", "low quality", StubPromptEncoder(),
            cache_dir="/tmp/test_prompt_cache_pn", model_name="stub-pn",
        )
        e = np.array([0.0, 0.0, 0.0])
        a = np.array([0.0, 45.0, 170.0])
        pos, unc, neg, wts = pp.get_text_embeddings_perp_neg(e, a)
        assert pos.shape[0] == 3 and neg.shape[1] == 2
        # pure front view: pos == front embedding
        np.testing.assert_allclose(pos[0], pp.cond[1], atol=1e-6)
        # interpolated view: strictly between front and side
        assert not np.allclose(pos[1], pp.cond[1])
        assert not np.allclose(pos[1], pp.cond[2])
        assert np.isfinite(wts).all()

    def test_perp_neg_guidance_runs(self):
        from youreditableavatar_tpu.guidance.sds import (
            PerpNegSDSGuidance,
            SDSConfig,
        )
        from youreditableavatar_tpu.guidance.stub import StubDiffusionPrior

        g = PerpNegSDSGuidance(StubDiffusionPrior(), SDSConfig())
        img = jnp.ones((1, 32, 32, 3)) * 0.5
        emb = jnp.ones((1, 8, 64))
        neg = jnp.ones((1, 2, 8, 64)) * 0.5
        wts = jnp.asarray([[-0.5, -0.3]])
        out = jax.jit(
            lambda im: g(im, emb, emb * 0.1, jax.random.PRNGKey(0), 20,
                         900, neg, wts)["loss_sds"]
        )(img)
        assert np.isfinite(float(out))


class TestTetGridBuilder:
    def test_band_masked_grid(self):
        verts, faces = _sphere()
        gv, gt = build_tet_grid(verts, faces, resolution=16, band=0.1)
        full_tets = 6 * 16 ** 3
        assert 0 < len(gt) < full_tets  # masked, non-empty
        assert gt.max() < len(gv)  # compacted indexing
        # all kept tets near the (normalized) surface
        r = np.linalg.norm(gv, axis=-1)
        centers = r[gt].mean(1)
        assert centers.min() > 0.1 and centers.max() < 0.75


class TestPromptLibraryAndSaving:
    def test_library_roundtrip(self, tmp_path):
        from youreditableavatar_tpu.guidance.prompt_library import (
            build_library,
            filename_to_prompt,
            load_library,
            sample_prompts,
            save_library,
        )

        assert filename_to_prompt("a_bald_eagle.mp4") == "a bald eagle"
        lib = build_library({"extra": ["a_blue_car.mp4"]})
        p = save_library(str(tmp_path / "lib.json"), lib)
        lib2 = load_library(p)
        assert lib2["extra"] == ["a blue car"]
        assert len(sample_prompts(lib2, "dreamfusion", 3)) == 3

    def test_saving_extras(self, tmp_path):
        from youreditableavatar_tpu.utils.saving import (
            WandbLogger,
            save_grayscale,
            save_uv_layout,
            snapshot_run,
        )

        depth = np.linspace(0, 1, 64 * 64).reshape(64, 64)
        save_grayscale(str(tmp_path / "d.png"), depth, cmap="jet")
        verts, faces = _sphere()
        from youreditableavatar_tpu.models.mesh import Mesh

        m = Mesh(verts, faces)
        save_uv_layout(str(tmp_path / "uv.png"), m.v_tex, m.t_tex_idx,
                       size=128)
        wb = WandbLogger(enable=False)
        wb.log({"x": 1.0}); wb.finish()  # no-op path
        snapshot_run(str(tmp_path), {"a": 1})
        assert (tmp_path / "cmd.txt").exists()
        assert (tmp_path / "parsed_config.json").exists()
        import imageio.v2 as imageio

        assert imageio.imread(tmp_path / "d.png").shape == (64, 64, 3)


class TestPromptDebiasing:
    def test_biased_word_dropped_per_view(self):
        from youreditableavatar_tpu.guidance.prompts import (
            get_debiased_prompts,
        )

        # A word is view-biased for view v when REMOVING it raises v's
        # probability (PMI = full / lerp(part, full, ½) < 0.95): the word was
        # pulling probability away from that view. Here "frontal" suppresses
        # view 0 only → dropped from view 0's prompt, kept for views 1-3
        # (whose distribution is unchanged, PMI = 1).
        def probe(text):
            if "frontal" in text:
                return np.array([0.1, 0.2, 0.2, 0.2])
            return np.array([0.4, 0.2, 0.2, 0.2])

        out = get_debiased_prompts("a frontal jacket", probe)
        assert out[0] == "a jacket"
        assert out[1] == "a frontal jacket"
        assert out[2] == "a frontal jacket"
        assert out[3] == "a frontal jacket"

    def test_neutral_prompt_untouched(self):
        from youreditableavatar_tpu.guidance.prompts import (
            get_debiased_prompts,
        )

        probe = lambda text: np.array([0.25, 0.25, 0.25, 0.25])  # noqa: E731
        out = get_debiased_prompts("a red jacket", probe)
        assert out == ["a red jacket"] * 4

    def test_processor_uses_debiased_bases(self):
        from youreditableavatar_tpu.guidance.prompts import PromptProcessor
        from youreditableavatar_tpu.guidance.stub import StubPromptEncoder

        def probe(text):
            if "frontal" in text:
                return np.array([0.1, 0.2, 0.2, 0.2])
            return np.array([0.4, 0.2, 0.2, 0.2])

        pp = PromptProcessor(
            "a frontal jacket", "low quality", StubPromptEncoder(),
            cache_dir="/tmp/test_prompt_cache_db", model_name="stub-db",
            debias_probe=probe,
        )
        plain = PromptProcessor(
            "a frontal jacket", "low quality", StubPromptEncoder(),
            cache_dir="/tmp/test_prompt_cache_db2", model_name="stub-db2",
        )
        # front-view embedding differs (debiased base), side view unchanged
        assert not np.allclose(pp.cond[1], plain.cond[1])
        np.testing.assert_allclose(pp.cond[2], plain.cond[2])
