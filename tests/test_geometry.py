"""Geometry substrate tests: tet grid, marching tets, compaction, subdivision,
partitioning, KNN, hash grid, MLP sphere init.

The marching-tets golden tests follow SURVEY §4's prescription: tiny grids,
analytic SDFs (sphere), invariants the reference algorithm
(`isosurface.py:112-345`) guarantees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    init_hashgrid_params,
    progressive_level_mask,
)
from youreditableavatar_tpu.ops.knn import (
    knn_squared_distances,
    mean_knn_sq_distance,
)
from youreditableavatar_tpu.ops.marching_tets import (
    MTOutput,
    compact_tets,
    make_tet_grid,
    marching_tets,
    mark_part_tets,
    overlap_vertex_mask,
    subdivide_tets,
)
from youreditableavatar_tpu.models.mlp import MLPConfig, init_mlp_params, mlp_apply


def tet_volumes(pos, tets):
    v = np.asarray(pos)[np.asarray(tets)]
    a, b, c, d = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
    return np.abs(np.einsum("ij,ij->i", np.cross(b - a, c - a), d - a)) / 6.0


class TestTetGrid:
    def test_counts_and_volume(self):
        verts, tets = make_tet_grid(4)
        assert verts.shape == (125, 3)
        assert tets.shape == (6 * 64, 4)
        vol = tet_volumes(verts, tets).sum()
        np.testing.assert_allclose(vol, 1.0, rtol=1e-5)

    def test_no_degenerate_tets(self):
        verts, tets = make_tet_grid(3)
        assert (tet_volumes(verts, tets) > 1e-9).all()


def sphere_mt(res=8, radius=0.35, max_verts=2048, max_faces=4096):
    verts, tets = make_tet_grid(res)
    pos = jnp.asarray(verts)
    sdf = jnp.linalg.norm(pos, axis=-1) - radius  # >0 outside
    return pos, sdf, jnp.asarray(tets), marching_tets(
        pos, sdf, jnp.asarray(tets), max_verts, max_faces
    )


class TestMarchingTets:
    def test_sphere_vertices_on_surface(self):
        _, _, _, out = sphere_mt()
        v = np.asarray(out.verts)[np.asarray(out.verts_valid)]
        r = np.linalg.norm(v, axis=-1)
        # Linear interp on a coarse grid: within a voxel of the true radius.
        np.testing.assert_allclose(r, 0.35, atol=0.02)
        assert int(out.num_verts) == len(v)
        assert int(out.num_verts) > 50

    def test_faces_reference_valid_vertices(self):
        _, _, _, out = sphere_mt()
        f = np.asarray(out.faces)[np.asarray(out.faces_valid)]
        vv = np.asarray(out.verts_valid)
        assert vv[f].all()
        assert int(out.num_faces) == len(f)

    def test_closed_surface_euler(self):
        # A closed genus-0 triangle mesh: V - E + F = 2, and E = 3F/2.
        _, _, _, out = sphere_mt()
        f = np.asarray(out.faces)[np.asarray(out.faces_valid)]
        v_used = np.unique(f)
        edges = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
        )
        e = len(np.unique(edges[:, 0].astype(np.int64) * (1 << 32)
                          + edges[:, 1]))
        assert len(v_used) - e + len(f) == 2

    def test_watertight_every_edge_shared_twice(self):
        _, _, _, out = sphere_mt()
        f = np.asarray(out.faces)[np.asarray(out.faces_valid)]
        edges = np.sort(
            np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
        )
        keys = edges[:, 0].astype(np.int64) * (1 << 32) + edges[:, 1]
        _, counts = np.unique(keys, return_counts=True)
        assert (counts == 2).all()

    def test_consistent_winding(self):
        # All face normals point the same way relative to the SDF gradient
        # (outward): for a sphere centered at origin, dot(normal, centroid)
        # has a consistent sign for every face.
        _, _, _, out = sphere_mt()
        f = np.asarray(out.faces)[np.asarray(out.faces_valid)]
        v = np.asarray(out.verts)
        a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        n = np.cross(b - a, c - a)
        d = np.einsum("ij,ij->i", n, (a + b + c) / 3)
        assert (d > 0).all() or (d < 0).all()

    def test_differentiable_wrt_sdf(self):
        verts, tets = make_tet_grid(4)
        pos = jnp.asarray(verts)
        tets = jnp.asarray(tets)

        def mean_vert_radius(delta):
            sdf = jnp.linalg.norm(pos, axis=-1) - 0.3 + delta
            out = marching_tets(pos, sdf, tets, 512, 1024)
            r = jnp.linalg.norm(out.verts, axis=-1)
            return jnp.sum(jnp.where(out.verts_valid, r, 0.0)) / jnp.sum(
                out.verts_valid
            )

        g = jax.grad(mean_vert_radius)(jnp.float32(0.0))
        # Increasing sdf shrinks the sphere → strictly negative gradient.
        assert np.isfinite(float(g)) and float(g) < -0.1

    def test_tet_subset_extraction(self):
        pos, sdf, tets, full = sphere_mt()
        half = jnp.arange(tets.shape[0]) < tets.shape[0] // 2
        out = marching_tets(pos, sdf, tets, 2048, 4096, tet_valid=half)
        assert int(out.num_faces) < int(full.num_faces)
        assert int(out.num_faces) > 0
        f2t = np.asarray(out.face_to_tet)[np.asarray(out.faces_valid)]
        assert (f2t < tets.shape[0] // 2).all()


class TestCompactSubdivide:
    def test_compact_lattice_matches_generic(self):
        """compact_tets_lattice (shifted-volume stats on the regular 6-tet
        lattice) must select exactly the same tets, in the same order, as
        the gather-based compact_tets — including with a tet_mask and the
        corner_threshold margin."""
        from youreditableavatar_tpu.ops.marching_tets import (
            compact_tets_lattice,
        )

        r = 9
        verts, tets = make_tet_grid(r)
        pos = jnp.asarray(verts * 2.0)
        tets_j = jnp.asarray(tets)
        rng = np.random.default_rng(3)
        sdf = jnp.asarray(
            (np.linalg.norm(verts * 2.0, axis=-1) - 0.45
             + 0.05 * rng.normal(size=verts.shape[0])).astype(np.float32)
        )
        tet_mask = jnp.asarray(rng.random(tets.shape[0]) > 0.3)
        for ct in (0.0, 2.0 / r):
            a = compact_tets(pos, sdf, tets_j, budget=4096,
                             tet_mask=tet_mask, corner_threshold=ct)
            b = compact_tets_lattice(sdf, r, budget=4096,
                                     tet_mask=tet_mask, corner_threshold=ct)
            np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
            assert int(a[2]) == int(b[2])

    def test_compact_selects_near_surface(self):
        verts, tets = make_tet_grid(8)
        pos = jnp.asarray(verts)
        tets_j = jnp.asarray(tets)
        sdf = jnp.linalg.norm(pos, axis=-1) - 0.35
        idx, valid, num = compact_tets(pos, sdf, tets_j, budget=4096)
        assert int(num) > 0
        sel = np.asarray(idx)[np.asarray(valid)]
        tsdf = np.asarray(sdf)[np.asarray(tets)[sel]]
        crosses = ((tsdf.min(1) < 0) & (tsdf.max(1) > 0)) | (
            np.abs(tsdf.mean(1)) <= 0.02
        )
        assert crosses.all()
        # And every surface-crossing tet is selected.
        all_tsdf = np.asarray(sdf)[np.asarray(tets)]
        crossing = (all_tsdf.min(1) < 0) & (all_tsdf.max(1) > 0)
        assert crossing.sum() <= int(num)

    def test_subdivide_preserves_volume(self):
        verts, tets = make_tet_grid(2)
        pos = jnp.asarray(verts)
        sdf = jnp.linalg.norm(pos, axis=-1) - 0.3
        sub = jnp.asarray(tets)[:12]
        valid = jnp.ones((12,), bool)
        new_pos, new_sdf, child, child_valid, num_mid = subdivide_tets(
            pos, sdf, sub, valid, max_mid=256
        )
        vol_parent = tet_volumes(pos, sub).sum()
        vol_child = tet_volumes(new_pos, child).sum()
        np.testing.assert_allclose(vol_child, vol_parent, rtol=1e-5)
        assert child.shape == (96, 4)
        assert bool(child_valid.all())

    def test_subdivide_preserves_orientation(self):
        # Every child must keep the parent's orientation parity — a mirrored
        # child flips marching-tets face winding (normal-map artifacts).
        pos = jnp.asarray(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        )
        tets = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        new_pos, _, child, valid, _ = subdivide_tets(
            pos, jnp.zeros(4), tets, jnp.ones(1, bool), 64
        )
        p = np.asarray(new_pos)
        for c in np.asarray(child):
            a, b, cc, d = p[c]
            sv = np.dot(np.cross(b - a, cc - a), d - a)
            assert sv > 0

    def test_subdivide_dedups_midpoints(self):
        verts, tets = make_tet_grid(2)
        pos = jnp.asarray(verts)
        sdf = jnp.zeros(pos.shape[0])
        sub = jnp.asarray(tets)[:12]
        valid = jnp.ones((12,), bool)
        _, _, child, _, num_mid = subdivide_tets(pos, sdf, sub, valid, 512)
        # Count distinct edges among the 12 tets by brute force.
        es = set()
        t_np = np.asarray(sub)
        for t in t_np:
            for i in range(4):
                for j in range(i + 1, 4):
                    es.add((min(t[i], t[j]), max(t[i], t[j])))
        assert int(num_mid) == len(es)


class TestPartition:
    def test_mark_and_overlap(self):
        pos, sdf, tets, out = sphere_mt()
        nf = out.faces.shape[0]
        # Mark faces in the +z hemisphere as editable.
        fc = np.asarray(out.verts)[np.asarray(out.faces)].mean(1)
        edit = jnp.asarray((fc[:, 2] > 0.1)) & out.faces_valid
        update, keep = mark_part_tets(
            tets, out.face_to_tet, out.faces_valid, edit
        )
        assert bool(jnp.any(update)) and bool(jnp.any(keep))
        assert not bool(jnp.any(update & keep))
        # Every NON-editable surface face's tet is frozen (keep); tets with
        # only editable faces are editable (reference semantics: update =
        # complement of the frozen shell, `isosurface.py:222-233`).
        nonedit = np.asarray(out.faces_valid) & ~np.asarray(edit)
        f2t_keep = np.asarray(out.face_to_tet)[nonedit]
        assert np.asarray(keep)[f2t_keep].all()
        only_edit = np.setdiff1d(
            np.asarray(out.face_to_tet)[np.asarray(edit)], f2t_keep
        )
        assert np.asarray(update)[only_edit].all()
        # Update includes empty-space tets (growth room).
        assert int(update.sum()) > int(jnp.asarray(edit).sum())

        ov = overlap_vertex_mask(tets, update, pos.shape[0])
        # Overlap vertices exist on the partition boundary and each belongs
        # to at least one tet of each side.
        assert bool(jnp.any(ov))
        t_np = np.asarray(tets)
        up = np.asarray(update)
        for v in np.flatnonzero(np.asarray(ov))[:20]:
            rows = np.any(t_np == v, axis=1)
            assert up[rows].any() and (~up[rows]).any()


class TestKNN:
    def test_matches_bruteforce(self, rng):
        pts = jnp.asarray(rng.normal(size=(500, 3)), jnp.float32)
        d2 = np.asarray(knn_squared_distances(pts, k=3, tile=128))
        p = np.asarray(pts)
        full = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(full, np.inf)
        ref = np.sort(full, axis=1)[:, :3]
        np.testing.assert_allclose(d2, ref, rtol=1e-4, atol=1e-6)

    def test_mean_knn_positive(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        m = np.asarray(mean_knn_sq_distance(pts))
        assert (m > 0).all()


class TestHashGrid:
    def test_shapes_and_determinism(self, rng):
        cfg = HashGridConfig(n_levels=4, base_resolution=4,
                             log2_hashmap_size=10)
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.uniform(0, 1, (32, 3)), jnp.float32)
        f1 = hashgrid_encode(params, x, cfg)
        f2 = hashgrid_encode(params, x, cfg)
        assert f1.shape == (32, 8)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_trilinear_continuity(self, rng):
        cfg = HashGridConfig(n_levels=2, base_resolution=4,
                             log2_hashmap_size=12)
        params = init_hashgrid_params(jax.random.PRNGKey(1), cfg)
        x0 = jnp.asarray([[0.3, 0.4, 0.5]], jnp.float32)
        eps = 1e-5
        f0 = hashgrid_encode(params, x0, cfg)
        f1 = hashgrid_encode(params, x0 + eps, cfg)
        assert float(jnp.abs(f1 - f0).max()) < 1e-6

    def test_gradient_flows_to_table(self, rng):
        cfg = HashGridConfig(n_levels=2, base_resolution=4,
                             log2_hashmap_size=8)
        params = init_hashgrid_params(jax.random.PRNGKey(2), cfg)
        x = jnp.asarray(rng.uniform(0, 1, (16, 3)), jnp.float32)
        g = jax.grad(lambda p: jnp.sum(hashgrid_encode(p, x, cfg) ** 2))(
            params
        )
        assert float(jnp.abs(g).sum()) > 0

    def test_pallas_scatter_matches_numpy(self, rng):
        """hash_scatter_add (the TPU backward kernel) vs a NumPy oracle —
        interpret mode off-TPU, the real Mosaic kernel on-chip."""
        from youreditableavatar_tpu.ops.hashgrid_pallas import (
            hash_scatter_add,
        )

        L, R, T = 3, 700, 256  # R not a CHUNK multiple: exercises padding
        idx = jnp.asarray(rng.integers(0, T, (L, R)), jnp.int32)
        v0 = jnp.asarray(rng.normal(size=(L, R)), jnp.float32)
        v1 = jnp.asarray(rng.normal(size=(L, R)), jnp.float32)
        out = np.asarray(hash_scatter_add(idx, v0, v1, T))
        ref = np.zeros((L, T, 2), np.float32)
        for lv in range(L):
            np.add.at(ref[lv], (np.asarray(idx[lv]), 0), np.asarray(v0[lv]))
            np.add.at(ref[lv], (np.asarray(idx[lv]), 1), np.asarray(v1[lv]))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_pallas_backend_grad_parity(self, rng):
        """custom-VJP (Pallas scatter) gradients ≡ XLA autodiff gradients,
        for the table, the points, and under a partial progressive mask."""
        cfg = HashGridConfig(n_levels=3, base_resolution=4,
                             log2_hashmap_size=8, progressive=True,
                             start_level=2, update_steps=100)
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.uniform(0.05, 0.95, (64, 3)), jnp.float32)
        mask = progressive_level_mask(cfg, 50)  # 2 of 3 levels active

        def loss(p, x, be):
            return jnp.sum(
                jnp.sin(hashgrid_encode(p, x, cfg, mask, backend=be)) ** 2
            )

        fx = float(loss(params, x, "xla"))
        fp = float(loss(params, x, "pallas"))
        np.testing.assert_allclose(fx, fp, rtol=1e-6)
        gx = jax.grad(loss, argnums=(0, 1))(params, x, "xla")
        gp = jax.grad(loss, argnums=(0, 1))(params, x, "pallas")
        np.testing.assert_allclose(
            np.asarray(gx[0]), np.asarray(gp[0]), rtol=1e-5, atol=1e-8,
            err_msg="table grad",
        )
        np.testing.assert_allclose(
            np.asarray(gx[1]), np.asarray(gp[1]), rtol=1e-4, atol=1e-8,
            err_msg="point grad",
        )

    def test_n_active_static_skip_is_exact(self, rng):
        """`n_active` (static level skip) must be bit-identical to the
        traced-mask path for values AND grads — masked levels produce
        zero features and exactly-zero table grads either way."""
        cfg = HashGridConfig(n_levels=6, log2_hashmap_size=8,
                             base_resolution=4, progressive=True,
                             start_level=3, update_steps=100)
        params = init_hashgrid_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.uniform(0.05, 0.95, (128, 3)), jnp.float32)
        lm = progressive_level_mask(cfg, 150)  # 4 of 6 active

        def loss(p, n_active):
            return jnp.sum(
                hashgrid_encode(p, x, cfg, lm, n_active=n_active) ** 2
            )

        np.testing.assert_array_equal(
            np.asarray(hashgrid_encode(params, x, cfg, lm)),
            np.asarray(hashgrid_encode(params, x, cfg, lm, n_active=4)),
        )
        ga = jax.grad(loss)(params, None)
        gb = jax.grad(loss)(params, 4)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
        assert float(jnp.abs(gb[4:]).max()) == 0.0  # masked: exactly zero

    def test_progressive_mask(self):
        cfg = HashGridConfig(
            n_levels=8, progressive=True, start_level=2, start_step=0,
            update_steps=100,
        )
        m0 = np.asarray(progressive_level_mask(cfg, 0))
        m250 = np.asarray(progressive_level_mask(cfg, 250))
        m_inf = np.asarray(progressive_level_mask(cfg, 10_000))
        assert m0.sum() == 2 and m250.sum() == 4 and m_inf.sum() == 8


class TestMLP:
    def test_sphere_init_approximates_distance(self, rng):
        # Reference SDF config depth (`implicit_sdf.py:26-41`): 1 hidden layer.
        cfg = MLPConfig(dim_in=16, dim_out=1, n_neurons=64,
                        n_hidden_layers=1, sphere_init=True,
                        sphere_init_radius=0.5)
        params = init_mlp_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(rng.normal(size=(256, 16)) * 0.3, jnp.float32)
        out = np.asarray(mlp_apply(params, x))[:, 0]
        r = np.linalg.norm(np.asarray(x)[:, :3], axis=-1)
        # Geometric init ⇒ roughly sdf(x) ≈ ‖x‖ − 0.5 (loose tolerance).
        corr = np.corrcoef(out, r - 0.5)[0, 1]
        assert corr > 0.9

    def test_output_shape(self, rng):
        cfg = MLPConfig(dim_in=8, dim_out=4)
        params = init_mlp_params(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(rng.normal(size=(10, 8)), jnp.float32)
        assert mlp_apply(params, x).shape == (10, 4)
