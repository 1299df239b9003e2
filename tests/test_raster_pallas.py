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
    # n_contrib diagnostic: exact count agreement between backends, and
    # empty pixels (T == 1) have zero contributors.
    np.testing.assert_array_equal(
        np.asarray(ox["n_contrib"]), np.asarray(op["n_contrib"])
    )
    empty = np.asarray(ox["final_t"]) >= 1.0 - 1e-7
    assert (np.asarray(ox["n_contrib"])[empty] == 0).all()


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


class TestChunkBoundaryLayout:
    """Deterministic chunk-boundary coverage for pad_tile_ranges +
    build_pallas_pair_rows (ADVICE r2): tile pair counts straddling the
    128-pair CHUNK ({0, 1, 127, 128, 129}) plus budget-overflow pairs.
    Asserts the padded layout routes every real pair to its tile-exclusive
    chunk-aligned slot, padding slots point at the zero field row, and the
    gather's VJP sends padding-slot cotangents to the discarded zero row.
    """

    def _make_binning(self, counts, budget):
        from youreditableavatar_tpu.ops.gaussian_raster.types import (
            TileBinning,
        )

        counts = np.asarray(counts, np.int32)
        total = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
            np.int32)
        # pair g-ids: distinct per pair, depth order within tile = id order
        pair_gauss = np.arange(budget, dtype=np.int32) % 977
        pair_tile = np.full((budget,), len(counts), np.int32)  # sentinel
        for t, (s, c) in enumerate(zip(starts, counts)):
            pair_tile[s:s + c] = t
        return TileBinning(
            pair_gauss=jnp.asarray(pair_gauss),
            pair_tile=jnp.asarray(pair_tile),
            tile_start=jnp.asarray(starts),
            tile_count=jnp.asarray(counts),
            num_pairs=jnp.asarray(total),
        )

    @pytest.mark.parametrize("counts", [
        [0, 127, 128, 129],
        [129, 0, 0, 127],
        [1, 128, 0, 5],
    ])
    def test_padded_destinations(self, counts):
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            pad_tile_ranges,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
            CHUNK,
        )

        budget = 512
        padded = budget + len(counts) * CHUNK
        binning = self._make_binning(counts, budget)
        dst, astart, total = jax.jit(
            lambda b: pad_tile_ranges(b, CHUNK, padded))(binning)
        dst, astart = np.asarray(dst), np.asarray(astart)
        assert int(total) == sum(counts)
        # aligned starts: cumulative chunk-aligned counts
        expect_start = 0
        for t, c in enumerate(counts):
            assert astart[t] == expect_start
            expect_start += -(-c // CHUNK) * CHUNK
        # every real pair lands inside its tile's aligned range, in order
        starts = np.asarray(binning.tile_start)
        for t, c in enumerate(counts):
            s = starts[t]
            np.testing.assert_array_equal(
                dst[s:s + c], astart[t] + np.arange(c))
        # overflow pairs (beyond total) dropped
        assert (dst[sum(counts):] == padded).all()

    def test_padding_slots_inert_and_grad_safe(self):
        """Padding slots index the zero field row; cotangents landing on
        padding rows do not leak into any gaussian's gradient."""
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            pad_tile_ranges,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.composite_pallas import (
            CHUNK,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.composite_xla import (
            NUM_FIELDS,
        )

        counts = [127, 1, 129]
        budget = 512
        padded = budget + len(counts) * CHUNK
        binning = self._make_binning(counts, budget)
        dst, astart, _ = pad_tile_ranges(binning, CHUNK, padded)

        n = 977
        rng = np.random.default_rng(0)
        fields = jnp.asarray(rng.normal(size=(n, 9)), jnp.float32)

        def build(fields):
            fields_ext = jnp.concatenate(
                [jnp.zeros((1, 9), fields.dtype), fields], axis=0)
            pg = jnp.zeros((padded,), jnp.int32).at[dst].set(
                binning.pair_gauss + 1, mode="drop")
            return jnp.concatenate(
                [fields_ext[pg],
                 jnp.zeros((padded, NUM_FIELDS - 9), fields.dtype)], axis=1
            ), pg

        rows, pg = build(fields)
        pg = np.asarray(pg)
        # padding slots -> row 0 (zero row) -> zero field values
        pad_mask = np.ones(padded, bool)
        pad_mask[np.asarray(dst)[: sum(counts)]] = False
        assert (pg[pad_mask] == 0).all()
        assert not np.asarray(rows)[pad_mask].any()

        # VJP: cotangents on PADDING rows must not reach any gaussian.
        ct = jnp.asarray(rng.normal(size=(padded, NUM_FIELDS)), jnp.float32)
        ct = ct * jnp.asarray(pad_mask[:, None], jnp.float32)
        g = jax.grad(lambda f: jnp.vdot(build(f)[0], ct))(fields)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

        # ...and cotangents on REAL rows reach exactly their gaussians.
        ct2 = jnp.asarray(rng.normal(size=(padded, NUM_FIELDS)), jnp.float32)
        ct2 = ct2 * jnp.asarray(~pad_mask[:, None], jnp.float32)
        g2 = jax.grad(lambda f: jnp.vdot(build(f)[0], ct2))(fields)
        touched = np.unique(np.asarray(binning.pair_gauss)[: sum(counts)])
        untouched = np.setdiff1d(np.arange(n), touched)
        assert np.abs(np.asarray(g2)[touched]).sum() > 0
        np.testing.assert_array_equal(np.asarray(g2)[untouched], 0.0)


class TestCountingLayout:
    """Sort-free counting-sort layout ≡ stable-sort + pad_tile_ranges.

    The Pallas render path builds its padded pair layout with
    `ops/gaussian_raster/counting.py` (histogram + rank kernels); these pin
    bit-exact agreement with the reference sort-based formulation on random
    expansions, including sentinel (culled) pairs, empty tiles, and
    chunk-boundary counts.
    """

    def _layouts(self, tile, gauss, num_tiles, chunk, padded):
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            TileBinning,
            pad_tile_ranges,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.counting import (
            counting_layout,
        )

        tile = jnp.asarray(tile, jnp.int32)
        gauss = jnp.asarray(gauss, jnp.int32)
        # Sort path (the layout bin_gaussians would produce).
        tile_s, gauss_s = jax.lax.sort(
            (tile, gauss), num_keys=1, is_stable=True)
        ids = jnp.arange(num_tiles, dtype=jnp.int32)
        ts = jnp.searchsorted(tile_s, ids, side="left").astype(jnp.int32)
        te = jnp.searchsorted(tile_s, ids, side="right").astype(jnp.int32)
        binning = TileBinning(
            pair_gauss=gauss_s, pair_tile=tile_s, tile_start=ts,
            tile_count=te - ts, num_pairs=jnp.sum(tile < num_tiles))
        dst1, as1, _ = pad_tile_ranges(binning, chunk, padded)
        pg1 = jnp.zeros((padded,), jnp.int32).at[dst1].set(
            gauss_s + 1, mode="drop")
        # Counting path (unsorted inputs).
        dst2, as2, tc2 = counting_layout(tile, num_tiles, chunk, padded)
        pg2 = jnp.zeros((padded,), jnp.int32).at[dst2].set(
            gauss + 1, mode="drop")
        return pg1, as1, binning.tile_count, pg2, as2, tc2

    def test_counting_layout_matches_sort(self):
        rng = np.random.default_rng(3)
        num_tiles, chunk = 24, 128
        p = 4096
        padded = p + num_tiles * chunk
        # Random tiles incl. sentinel (=num_tiles) culled pairs; some tiles
        # empty (never drawn), one tile exactly at a chunk boundary.
        tile = rng.integers(0, num_tiles + 1, p)
        tile[tile == 5] = 6  # force an empty tile
        boundary = np.where(tile == 7)[0]
        tile[boundary[chunk:]] = num_tiles  # tile 7 has exactly `chunk` pairs
        if len(boundary) < chunk:
            tile[: chunk - len(boundary)] = 7
        gauss = rng.integers(0, 997, p)
        pg1, as1, tc1, pg2, as2, tc2 = self._layouts(
            tile, gauss, num_tiles, chunk, padded)
        np.testing.assert_array_equal(np.asarray(pg1), np.asarray(pg2))
        np.testing.assert_array_equal(np.asarray(as1), np.asarray(as2))
        np.testing.assert_array_equal(np.asarray(tc1), np.asarray(tc2))

    def test_counting_layout_all_sentinel(self):
        from youreditableavatar_tpu.ops.gaussian_raster.counting import (
            counting_layout,
        )
        p, num_tiles, chunk = 1024, 8, 128
        padded = p + num_tiles * chunk
        tile = jnp.full((p,), num_tiles, jnp.int32)
        dst, astart, tc = counting_layout(tile, num_tiles, chunk, padded)
        assert bool((dst >= padded).all())
        np.testing.assert_array_equal(np.asarray(tc), 0)
        np.testing.assert_array_equal(np.asarray(astart), 0)

    def test_counting_matches_scene_expansion(self):
        """End-to-end: expansion from a real projected scene."""
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            bin_gaussians, expand_pairs)
        from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
            preprocess_gaussians,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.render import (
            build_pallas_pair_layout,
            build_pallas_pair_layout_counting,
        )

        rng = np.random.default_rng(11)
        n = 400
        cam = _cams()
        proj = preprocess_gaussians(
            jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.08, (n, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
            jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32),
            jnp.zeros((n, 1, 3), jnp.float32),
            cam, 0, 32)
        ntx, nty, p = 3, 2, 2048
        binning = bin_gaussians(proj, ntx, nty, p, 32)
        fe1, pg1, as1 = build_pallas_pair_layout(proj, binning, ntx, nty, p)
        fe2, pg2, as2, tc2, np2 = build_pallas_pair_layout_counting(
            proj, ntx, nty, p, 32)
        np.testing.assert_array_equal(np.asarray(pg1), np.asarray(pg2))
        np.testing.assert_array_equal(np.asarray(as1), np.asarray(as2))
        np.testing.assert_array_equal(
            np.asarray(binning.tile_count), np.asarray(tc2))
        assert int(binning.num_pairs) == int(np2)
        np.testing.assert_array_equal(np.asarray(fe1), np.asarray(fe2))


class TestExpandPallas:
    """Windowed Pallas pair expansion ≡ XLA expand_pairs (bit-exact)."""

    def _scene_proj(self, n, seed, w=96, h=64):
        from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
            preprocess_gaussians,
        )
        rng = np.random.default_rng(seed)
        vm = np.eye(4, dtype=np.float32)
        vm[2, 3] = 3.0
        cam = RasterCamera.from_fov(vm, 0.8, 0.6, w, h)
        return preprocess_gaussians(
            jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.1, (n, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
            jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32),
            jnp.zeros((n, 1, 3), jnp.float32),
            cam, 0, 32), cam

    @pytest.mark.parametrize("n,budget", [(300, 2048), (2500, 8192)])
    def test_expand_matches_xla(self, n, budget):
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            expand_pairs, pack_depth_ordered)
        from youreditableavatar_tpu.ops.gaussian_raster.expand_pallas import (
            expand_pairs_pallas,
        )
        proj, cam = self._scene_proj(n, seed=n)
        ntx, nty = 3, 2
        t1, g1, tot1 = expand_pairs(proj, ntx, nty, budget, 32)
        t2, g2, tot2 = expand_pairs_pallas(
            pack_depth_ordered(proj), budget, ntx, nty, 32, interpret=True)
        t1n, g1n, t2n, g2n = map(np.asarray, (t1, g1, t2, g2))
        assert int(tot1) == int(tot2)
        np.testing.assert_array_equal(t1n, t2n)
        live = t1n < ntx * nty
        np.testing.assert_array_equal(g1n[live], g2n[live])

    def test_expand_empty_scene(self):
        """All gaussians behind the camera -> every slot sentinel."""
        from youreditableavatar_tpu.ops.gaussian_raster.binning import (
            pack_depth_ordered)
        from youreditableavatar_tpu.ops.gaussian_raster.expand_pallas import (
            expand_pairs_pallas,
        )
        from youreditableavatar_tpu.ops.gaussian_raster.preprocess import (
            preprocess_gaussians,
        )
        rng = np.random.default_rng(0)
        n = 64
        vm = np.eye(4, dtype=np.float32)
        vm[2, 3] = -5.0  # camera behind the cloud
        cam = RasterCamera.from_fov(vm, 0.8, 0.6, 96, 64)
        proj = preprocess_gaussians(
            jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0.01, 0.1, (n, 3)), jnp.float32),
            jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
            jnp.asarray(rng.uniform(0.2, 0.95, n), jnp.float32),
            jnp.zeros((n, 1, 3), jnp.float32), cam, 0, 32)
        tile, gauss, total = expand_pairs_pallas(
            pack_depth_ordered(proj), 1024, 3, 2, 32, interpret=True)
        assert int(total) == 0
        np.testing.assert_array_equal(np.asarray(tile), 6)
