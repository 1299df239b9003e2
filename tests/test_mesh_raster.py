"""Differentiable mesh rasterizer tests (XLA fallback + pallas interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera
from youreditableavatar_tpu.ops.marching_tets import make_tet_grid, marching_tets
from youreditableavatar_tpu.ops.mesh_raster import (
    MeshRasterConfig,
    compute_vertex_normals,
    interpolate_attributes,
    rasterize_mesh,
)
from youreditableavatar_tpu.ops.mesh_raster.interpolate import silhouette_alpha


def make_cam(w=64, h=64, dist=3.0):
    vm = np.eye(4, dtype=np.float32)
    vm[2, 3] = dist
    return RasterCamera.from_fov(vm, 0.8, 0.8, w, h)


def two_triangles():
    # Front triangle (z=0, covers center) and back triangle (z=1, bigger).
    verts = jnp.asarray(
        [
            [-0.4, -0.4, 0.0], [0.4, -0.4, 0.0], [0.0, 0.5, 0.0],
            [-0.8, -0.8, 1.0], [0.8, -0.8, 1.0], [0.0, 0.9, 1.0],
        ],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    return verts, faces


CFG = MeshRasterConfig(pair_budget=1 << 10, tile_capacity=128, backend="xla")


class TestVisibility:
    def test_depth_order(self):
        verts, faces = two_triangles()
        out = rasterize_mesh(verts, faces, make_cam(), CFG)
        fid = np.asarray(out.face_id)
        # Center pixel: both triangles cover it; the front one (0) must win.
        assert fid[32, 32] == 0
        assert (fid == 1).any()  # back triangle visible outside the overlap
        assert fid[0, 0] == -1
        assert fid[0, 63] == -1

    def test_coverage_fraction(self):
        verts, faces = two_triangles()
        out = rasterize_mesh(verts, faces, make_cam(), CFG)
        cover = (np.asarray(out.face_id) >= 0).mean()
        assert 0.1 < cover < 0.9

    def test_face_valid_mask(self):
        verts, faces = two_triangles()
        fv = jnp.asarray([True, False])
        out = rasterize_mesh(verts, faces, make_cam(), CFG, faces_valid=fv)
        assert not (np.asarray(out.face_id) == 1).any()
        assert (np.asarray(out.face_id) == 0).any()

    def test_pallas_interpret_matches_xla(self):
        verts, faces = two_triangles()
        cam = make_cam()
        out_x = rasterize_mesh(verts, faces, cam, CFG)
        cfg_p = MeshRasterConfig(
            pair_budget=1 << 10, backend="pallas", pallas_interpret=True
        )
        out_p = rasterize_mesh(verts, faces, cam, cfg_p)
        np.testing.assert_array_equal(
            np.asarray(out_x.face_id), np.asarray(out_p.face_id)
        )
        np.testing.assert_allclose(
            np.asarray(out_x.bary), np.asarray(out_p.bary), atol=1e-6
        )

    def test_mt_sphere_renders(self):
        # Marching-tets sphere → raster → coverage is a centered disk.
        gverts, gtets = make_tet_grid(12)
        pos = jnp.asarray(gverts)
        sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
        mt = marching_tets(pos, sdf, jnp.asarray(gtets), 4096, 8192)
        cam = make_cam(96, 96, dist=2.0)
        cfg = MeshRasterConfig(pair_budget=1 << 16, tile_capacity=2048,
                               backend="xla")
        out = rasterize_mesh(mt.verts, mt.faces, cam, cfg,
                             faces_valid=mt.faces_valid)
        fid = np.asarray(out.face_id)
        assert fid[48, 48] >= 0  # center covered
        assert fid[2, 2] == -1
        cover = (fid >= 0).mean()
        assert 0.05 < cover < 0.6
        # Depth at center is nearer than at the silhouette rim.
        d = np.asarray(out.depth)
        rim_rows = np.where((fid >= 0).any(1))[0]
        assert d[48, 48] < d[rim_rows[0], (fid[rim_rows[0]] >= 0).argmax()]


class TestInterpolation:
    def test_constant_attribute(self):
        verts, faces = two_triangles()
        out = rasterize_mesh(verts, faces, make_cam(), CFG)
        attrs = jnp.ones((6, 3)) * 0.7
        img = interpolate_attributes(out, faces, attrs, background=0.0)
        inside = np.asarray(out.face_id) >= 0
        np.testing.assert_allclose(np.asarray(img)[inside], 0.7, atol=1e-5)
        np.testing.assert_allclose(np.asarray(img)[~inside], 0.0)

    def test_linear_gradient_interpolation(self):
        # Attribute = x coordinate: interpolated image equals screen-space
        # world x of the surface point (perspective-correct).
        verts, faces = two_triangles()
        out = rasterize_mesh(verts, faces, make_cam(), CFG)
        attrs = verts[:, :1]
        img = np.asarray(
            interpolate_attributes(out, faces, attrs, background=99.0)
        )[..., 0]
        fid = np.asarray(out.face_id)
        row = fid[32]
        xs = img[32][row == 0]
        assert (np.diff(xs) > -1e-4).all()  # monotone along the scanline
        assert xs.min() >= -0.45 and xs.max() <= 0.45

    def test_attribute_gradients(self):
        verts, faces = two_triangles()
        cam = make_cam()
        out = rasterize_mesh(verts, faces, cam, CFG)

        def loss(attrs):
            img = interpolate_attributes(out, faces, attrs)
            return jnp.sum(img**2)

        g = jax.grad(loss)(jnp.ones((6, 3)) * 0.3)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_position_gradients_through_bary(self):
        verts, faces = two_triangles()
        cam = make_cam()

        def loss(v):
            out = rasterize_mesh(v, faces, cam, CFG)
            img = interpolate_attributes(out, faces, v[:, :1])
            return jnp.sum(img**2)

        g = jax.grad(loss)(verts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_silhouette_alpha_band(self):
        verts, faces = two_triangles()
        cam = make_cam()
        out = rasterize_mesh(verts, faces, cam, CFG)
        alpha = np.asarray(silhouette_alpha(out, faces))
        fid = np.asarray(out.face_id)
        assert (alpha[fid < 0] == 0).all()
        interior = alpha[32, 30:35]
        assert (interior > 0.99).all()
        # Differentiable w.r.t. positions.
        g = jax.grad(
            lambda v: jnp.sum(
                silhouette_alpha(rasterize_mesh(v, faces, cam, CFG), faces)
            )
        )(verts)
        assert float(jnp.abs(g).sum()) > 0


class TestNormals:
    def test_sphere_normals_point_outward(self):
        gverts, gtets = make_tet_grid(10)
        pos = jnp.asarray(gverts)
        sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
        mt = marching_tets(pos, sdf, jnp.asarray(gtets), 4096, 8192)
        vn = compute_vertex_normals(mt.verts, mt.faces, mt.faces_valid)
        v = np.asarray(mt.verts)[np.asarray(mt.verts_valid)]
        n = np.asarray(vn)[np.asarray(mt.verts_valid)]
        r = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)
        dots = np.einsum("ij,ij->i", n, r)
        # Consistent orientation: all outward or all inward.
        assert (dots > 0.8).all() or (dots < -0.8).all()
