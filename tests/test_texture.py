"""Texture-edit stage tests: edit models, mask pipeline, inpaint/refine smoke.

SURVEY §4(d): the full stage-4 wiring runs with the stub inpainter — no
diffusion weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.data.camera_sampler import (
    RandomCameraConfig,
    RandomCameraSampler,
)
from youreditableavatar_tpu.guidance.stub import StubInpainter
from youreditableavatar_tpu.models.cameras import GSCamera
from youreditableavatar_tpu.models.tetgs import build_tetgs, extract_keep_gaussians
from youreditableavatar_tpu.models.tetgs_edit import (
    build_edit_tetgs,
    edit_gaussian_arrays,
    full_gaussian_arrays,
    promote_to_3d,
    render_edit_tetgs,
    rollback_outside_faces,
)
from youreditableavatar_tpu.models.textured_mesh import TexturedMeshModel
from youreditableavatar_tpu.ops.gaussian_raster import RasterizeConfig
from youreditableavatar_tpu.ops.marching_tets import make_tet_grid, marching_tets
from youreditableavatar_tpu.ops.mesh_raster import MeshRasterConfig
from youreditableavatar_tpu.ops.morphology import (
    dilate,
    dilate_face_region,
    erode,
    erode_face_region,
    face_adjacency,
)
from youreditableavatar_tpu.stages.edit_texture import (
    InpaintConfig,
    InpaintTrainer,
    RefineConfig,
    RefineTrainer,
)
from youreditableavatar_tpu.stages.localization import (
    HeuristicSegmenter,
    LocalizationConfig,
    LocalMeshEditing,
)

RCFG = RasterizeConfig(backend="xla", pair_budget=1 << 13, tile_capacity=512)
MCFG = MeshRasterConfig(backend="xla", pair_budget=1 << 14, tile_capacity=2048)


def sphere_mesh(res=10, radius=0.35):
    gv, gt = make_tet_grid(res)
    pos = jnp.asarray(gv)
    sdf = jnp.linalg.norm(pos, axis=-1) - radius
    mt = marching_tets(pos, sdf, jnp.asarray(gt), 2048, 4096)
    nv, nf = int(mt.num_verts), int(mt.num_faces)
    verts = np.asarray(mt.verts)[:nv]
    faces = np.asarray(mt.faces)[np.asarray(mt.faces_valid)][:nf]
    f2t = np.asarray(mt.face_to_tet)[np.asarray(mt.faces_valid)][:nf]
    return verts, faces, f2t


@pytest.fixture(scope="module")
def edit_scene():
    verts, faces, f2t = sphere_mesh()
    binding, params = build_tetgs(verts, faces, None, f2t, sh_levels=2)
    # "Edit region" = top cap; keep gaussians = those on faces outside it.
    fc = verts[faces].mean(1)
    keep_face_tets = f2t[fc[:, 2] <= 0.1]
    keep = extract_keep_gaussians(binding, params, keep_face_tets)
    # Edit mesh = the top-cap faces, re-indexed.
    edit_faces_mask = fc[:, 2] > 0.1
    sub_faces = faces[edit_faces_mask]
    used = np.unique(sub_faces)
    remap = np.zeros(len(verts), np.int64)
    remap[used] = np.arange(len(used))
    edit_verts = verts[used]
    edit_faces = remap[sub_faces]
    eb, ep = build_edit_tetgs(edit_verts, edit_faces, keep, sh_levels=1)
    return dict(
        verts=verts, faces=faces, binding=eb, params=ep,
        edit_verts=edit_verts, edit_faces=edit_faces, keep=keep,
    )


def make_cam(az=0.0, h=64, w=64, dist=1.6):
    el = np.deg2rad(5.0)
    azr = np.deg2rad(az)
    pos = dist * np.array(
        [np.cos(el) * np.cos(azr), np.cos(el) * np.sin(azr), np.sin(el)]
    )
    lookat = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(lookat, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, lookat)
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([right, up2, -lookat], -1)
    c2w[:3, 3] = pos
    from youreditableavatar_tpu.models.cameras import c2w_to_gs_camera

    return c2w_to_gs_camera(c2w, 80.0, w, h)


class TestMorphology:
    def test_image_dilate_erode(self):
        m = jnp.zeros((16, 16)).at[8, 8].set(1.0)
        d = dilate(m, 1)
        assert float(d.sum()) == 9.0
        e = erode(d, 1)
        assert float(e.sum()) == 1.0 and float(e[8, 8]) == 1.0

    def test_face_adjacency_closed_mesh(self):
        verts, faces, _ = sphere_mesh(res=6)
        adj = face_adjacency(faces)
        assert (adj >= 0).all()  # watertight: every edge has a neighbor

    def test_region_dilate_erode_roundtrip(self):
        verts, faces, _ = sphere_mesh(res=6)
        fc = verts[faces].mean(1)
        m = fc[:, 2] > 0.2
        d = dilate_face_region(faces, m, 2)
        assert d.sum() > m.sum()
        e = erode_face_region(faces, d, 2)
        assert abs(e.sum() - m.sum()) < 0.3 * max(m.sum(), 1)


class TestEditModels:
    def test_disk_init_shapes(self, edit_scene):
        eb, ep = edit_scene["binding"], edit_scene["params"]
        assert eb.n_edit > 0 and eb.n_keep > 0
        scales = np.asarray(jnp.exp(ep.log_scales))
        # Disks: first axis tiny, other two equal.
        np.testing.assert_allclose(scales[:, 0], 1e-8, rtol=1e-3)
        np.testing.assert_allclose(scales[:, 1], scales[:, 2], rtol=1e-5)

    def test_disk_normal_alignment(self, edit_scene):
        # The quaternion's first frame axis = face normal.
        from youreditableavatar_tpu.ops.quaternion import quat_to_matrix

        eb, ep = edit_scene["binding"], edit_scene["params"]
        rot = np.asarray(quat_to_matrix(ep.quats))
        v0 = rot[:, :, 0]  # first column
        ev = edit_scene["edit_verts"]
        ef = edit_scene["edit_faces"]
        tri = ev[ef[np.asarray(eb.edit_face_indices)]]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
        dots = np.abs(np.einsum("ij,ij->i", v0, n))
        assert dots.min() > 0.99

    def test_render_keep_and_edit(self, edit_scene):
        eb, ep = edit_scene["binding"], edit_scene["params"]
        cam = make_cam().raster_camera()
        out = render_edit_tetgs(eb, ep, cam, RCFG, jnp.ones(3))
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        assert float(np.asarray(out["alpha"]).mean()) > 0.02

    def test_color_override_parts(self, edit_scene):
        eb, ep = edit_scene["binding"], edit_scene["params"]
        cam = make_cam(az=0.0).raster_camera()
        out = render_edit_tetgs(
            eb, ep, cam, RCFG, jnp.zeros(3),
            keep_color_override=jnp.asarray([1.0, 0, 0]),
            edit_color_override=jnp.asarray([0.0, 1.0, 0]),
        )
        img = np.asarray(out["image"])
        assert (img[..., 0] > 0.5).any()  # keep part visible in red
        assert (img[..., 1] > 0.5).any()  # edit part visible in green

    def test_promote_to_3d(self, edit_scene):
        eb, ep = edit_scene["binding"], edit_scene["params"]
        b3, p3 = promote_to_3d(eb, ep, sh_levels=2)
        assert b3.use_delta and b3.sh_levels == 2
        assert p3.sh_rest.shape == (eb.n_edit, 3, 3)
        np.testing.assert_array_equal(
            np.asarray(p3.quats), np.asarray(ep.quats)
        )
        # Delta moves positions along normals.
        p3b = dataclasses.replace(p3, delta=jnp.ones((eb.n_edit, 1)) * 0.1)
        m0 = edit_gaussian_arrays(b3, p3)[0]
        m1 = edit_gaussian_arrays(b3, p3b)[0]
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(m1 - m0, axis=-1)), 0.1, atol=1e-5
        )

    def test_rollback(self, edit_scene):
        eb, ep = edit_scene["binding"], edit_scene["params"]
        changed = dataclasses.replace(
            ep, sh_dc=ep.sh_dc + 1.0, opacity_raw=ep.opacity_raw - 2.0
        )
        nf = edit_scene["edit_faces"].shape[0]
        painted = jnp.zeros((nf,), bool).at[: nf // 2].set(True)
        rolled = rollback_outside_faces(eb, changed, ep, painted)
        fi = np.asarray(eb.edit_face_indices)
        inside = fi < nf // 2
        dc = np.asarray(rolled.sh_dc)
        np.testing.assert_allclose(
            dc[inside], np.asarray(changed.sh_dc)[inside]
        )
        np.testing.assert_allclose(
            dc[~inside], np.asarray(ep.sh_dc)[~inside]
        )


class TestTexturedMesh:
    def test_render_view_masks(self, edit_scene):
        verts, faces = edit_scene["verts"], edit_scene["faces"]
        vmask = verts[:, 2] > 0.1
        tm = TexturedMeshModel(verts, faces, vmask, MCFG)
        cam = make_cam().raster_camera()
        view = tm.render_view(cam)
        assert bool(jnp.any(view["mask"]))
        assert bool(jnp.any(view["editable"] > 0.5))
        masks = tm.prepare_inpaint_masks(view)
        assert bool(jnp.any(masks["inpaint_mask"]))

    def test_back_project_marks_painted(self, edit_scene):
        verts, faces = edit_scene["verts"], edit_scene["faces"]
        vmask = verts[:, 2] > 0.1
        tm = TexturedMeshModel(verts, faces, vmask, MCFG)
        cam = make_cam().raster_camera()
        view = tm.render_view(cam)
        painted_px = np.asarray(view["editable"] > 0.5)
        assert tm.painted.sum() == 0
        tm.back_project(view, painted_px)
        assert tm.painted.sum() > 0
        assert (tm.painted <= tm.editable).all()


class TestInpaintRefineSmoke:
    def test_stage4_with_random_sdxl(self, edit_scene):
        """InpaintTrainer drives the REAL SDXL+ControlNet-Union pipeline
        (tiny random weights): joint front/back views 0/1, dual union
        controls, DDIM mask-pinned inpainting (VERDICT r1 item 4)."""
        import jax

        from youreditableavatar_tpu.guidance.sdxl_pipeline import (
            SDXLControlNetUnionPipeline,
        )

        eb, ep = edit_scene["binding"], edit_scene["params"]
        verts, faces = edit_scene["verts"], edit_scene["faces"]
        vmask = verts[:, 2] > 0.1
        tm = TexturedMeshModel(verts, faces, vmask, MCFG)
        cams = [make_cam(az) for az in (0.0, 180.0, 90.0)]
        cfg = InpaintConfig(
            iters_first=3, iters_second=2, iters_rest=2,
            first_group=1, second_group=1, raster=RCFG,
            inpaint_steps=2, fb_res=32,
        )
        from youreditableavatar_tpu.stages.localization import (
            HeuristicSegmenter,
        )

        pipe = SDXLControlNetUnionPipeline.random_init(jax.random.PRNGKey(9))
        # Segmenter present → the joint views run the person-mask edge fix
        # (`inpaint_utils.py:207-218`).
        trainer = InpaintTrainer(
            eb, ep, tm, cams, pipe, "a red hat", "bad", cfg,
            segmenter=HeuristicSegmenter("center"),
        )
        trainer.inpaint_training(jax.random.PRNGKey(0))
        assert len(trainer.history) == 3
        assert all(np.isfinite(h["loss"]) for h in trainer.history)

    def test_full_stage4_smoke(self, edit_scene):
        eb, ep = edit_scene["binding"], edit_scene["params"]
        verts, faces = edit_scene["verts"], edit_scene["faces"]
        vmask = verts[:, 2] > 0.1
        tm = TexturedMeshModel(verts, faces, vmask, MCFG)
        cams = [make_cam(az) for az in (0.0, 180.0, 90.0)]
        cfg = InpaintConfig(
            iters_first=5, iters_second=4, iters_rest=3,
            first_group=1, second_group=1, raster=RCFG,
        )
        trainer = InpaintTrainer(
            eb, ep, tm, cams, StubInpainter(), "a red hat", "bad", cfg
        )
        p_in = trainer.inpaint_training(jax.random.PRNGKey(0))
        assert len(trainer.history) == 3
        assert all(np.isfinite(h["loss"]) for h in trainer.history)

        # Refine guidance + refine stage.
        turn = [make_cam(az) for az in (0.0, 120.0, 240.0)]
        blends = trainer.prepare_refine_guidance(
            turn, jax.random.PRNGKey(1)
        )
        assert len(blends) == 3 and blends[0].shape == (64, 64, 3)

        rcfg = RefineConfig(
            num_iterations=5, key_views=(0,), raster=RCFG, sh_levels=2
        )
        refine = RefineTrainer(eb, p_in, turn, blends, rcfg)
        p_ref = refine.refined_editing(seed=0, num_iterations=5)
        assert np.isfinite(refine.losses[0])
        final = refine.validate(turn[:1])
        assert final[0].shape == (64, 64, 3)


class TestLocalization:
    def test_localize_top_region(self, edit_scene):
        verts, faces = edit_scene["verts"], edit_scene["faces"]
        # Render simple coverage images from 3 views: white bg + gray fg.
        from youreditableavatar_tpu.ops.mesh_raster import rasterize_mesh

        cams = [make_cam(az, h=96, w=96) for az in (0, 120, 240)]
        images = []
        for c in cams:
            out = rasterize_mesh(
                jnp.asarray(verts), jnp.asarray(faces, jnp.int32),
                c.raster_camera(), MCFG,
            )
            fg = np.asarray(out.face_id) >= 0
            img = np.ones((96, 96, 3), np.float32)
            img[fg] = 0.5
            images.append(img)

        seg = HeuristicSegmenter(mode="upper")
        loc = LocalMeshEditing(
            verts, faces, seg,
            LocalizationConfig(dilate_iters=2, erode_iters=2, min_views=2,
                               mesh_cfg=MCFG),
        )
        info = loc.localize(cams, images, "the hat")
        fmask = info["editing_mask_faces"] > 0.5
        assert fmask.sum() > 0
        fc = verts[faces].mean(1)
        # Selected faces concentrate in the upper (z-high) band.
        assert fc[fmask][:, 2].mean() > fc[:, 2].mean()
        assert info["editing_mask"].sum() > 0
