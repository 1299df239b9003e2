"""Pair-budget sizing + overflow-governance tests.

The CUDA reference sizes pair buffers exactly per render
(`rasterizer_impl.cu:277-303`) and cannot overflow; the XLA design must
instead (a) pre-size from an exact count, (b) detect overflow at runtime,
and (c) grow or fail — never train silently on a truncated render.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.models.tetgs import build_tetgs
from youreditableavatar_tpu.ops.gaussian_raster import (
    BudgetGovernor,
    PairOverflowError,
    RasterizeConfig,
    count_pairs,
    fit_pair_budget,
    render_gaussians,
)
from youreditableavatar_tpu.ops.gaussian_raster.types import RasterCamera
from youreditableavatar_tpu.stages.init_texture import (
    InitTextureConfig,
    TetGSInitTrainer,
)

from test_texture import make_cam, sphere_mesh


def random_scene(n=500, seed=3):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.4)
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (n, 3)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.3, 1.0, n).astype(np.float32))
    sh = jnp.asarray(rng.normal(size=(n, 1, 3)).astype(np.float32))
    vm = np.eye(4, dtype=np.float32)
    vm[2, 3] = 3.0
    cam = RasterCamera.from_fov(vm, 0.9, 0.9, 128, 96)
    return means, scales, quats, opac, sh, cam


class TestFitPairBudget:
    def test_bucket_ladder(self):
        # buckets are {2^k, 1.5·2^k}: growth is geometric, values aligned
        prev = 0
        budgets = sorted({fit_pair_budget(n, headroom=1.0)
                          for n in (1, 5000, 9000, 20000, 100000, 999999)})
        for b in budgets:
            assert b % 128 == 0
            assert b > prev
            prev = b

    def test_covers_need_with_headroom(self):
        for n in (1, 4095, 4097, 50_000, 1_000_000):
            b = fit_pair_budget(n, headroom=1.2)
            assert b >= int(n * 1.2)

    def test_bounded_distinct_buckets(self):
        # O(log) recompiles: every count up to 1M maps to few buckets
        vals = {fit_pair_budget(n) for n in range(1, 1_000_000, 997)}
        assert len(vals) <= 20

    def test_max_budget_raises(self):
        with pytest.raises(PairOverflowError):
            fit_pair_budget(1 << 30, max_budget=1 << 24)


class TestCountPairs:
    def test_matches_render_num_pairs(self):
        means, scales, quats, opac, sh, cam = random_scene()
        cfg = RasterizeConfig(backend="xla", pair_budget=1 << 15,
                              tile_capacity=1024, sh_degree=0)
        n_pre = int(count_pairs(means, scales, quats, opac, sh, cam, cfg))
        out = render_gaussians(means, scales, quats, opac, sh, cam, cfg)
        assert n_pre == int(out["num_pairs"])
        assert n_pre > 0


class TestGovernor:
    def test_no_overflow_returns_none(self):
        cfg = RasterizeConfig(pair_budget=1024, tile_capacity=64)
        gov = BudgetGovernor(policy="raise")
        assert gov.check(cfg, 1024, 0, step=0) is None

    def test_raise_policy(self):
        cfg = RasterizeConfig(pair_budget=1024, tile_capacity=64)
        gov = BudgetGovernor(policy="raise")
        with pytest.raises(PairOverflowError):
            gov.check(cfg, 1025, 0, step=0)

    def test_warn_policy(self):
        cfg = RasterizeConfig(pair_budget=1024, tile_capacity=64)
        gov = BudgetGovernor(policy="warn")
        with pytest.warns(RuntimeWarning):
            assert gov.check(cfg, 2000, 0, step=0) is None
        assert gov.events  # logged

    def test_grow_policy_pairs_and_tiles(self):
        cfg = RasterizeConfig(pair_budget=1024, tile_capacity=64)
        gov = BudgetGovernor(policy="grow")
        new = gov.check(cfg, 5000, 3, step=7)
        assert new.pair_budget >= 5000 and new.pair_budget > cfg.pair_budget
        assert new.tile_capacity == 128
        assert gov.events[0]["step"] == 7


def _make_init_trainer(pair_budget, policy, auto_size, n_iters=3):
    verts, faces, f2t = sphere_mesh()
    binding, params = build_tetgs(verts, faces, None, f2t, sh_levels=1)
    cams = []
    rng = np.random.default_rng(0)
    for az in (0.0, 180.0):
        c = make_cam(az)
        cams.append(dataclasses.replace(
            c, image=rng.uniform(0, 1, (c.height, c.width, 3))
            .astype(np.float32)
        ))
    cfg = InitTextureConfig(
        num_iterations=n_iters, log_every=1, sh_warmup_every=100,
        auto_size_budget=auto_size, overflow_policy=policy,
        raster=RasterizeConfig(backend="xla", pair_budget=pair_budget,
                               tile_capacity=256, sh_degree=0),
    )
    return TetGSInitTrainer(binding, params, cams, cfg)


class TestTrainerGovernance:
    def test_trainer_raises_on_overflow(self):
        # a deliberately tiny budget (128 pairs) must NOT be trained
        # through silently: policy="raise" fails on the first logged step
        tr = _make_init_trainer(128, "raise", auto_size=False)
        with pytest.raises(PairOverflowError):
            tr.train()

    def test_trainer_grows_on_overflow(self):
        tr = _make_init_trainer(128, "grow", auto_size=False)
        tr.train()
        assert tr.governor.events, "governor never noticed the overflow"
        grown = tr.cfg.raster.pair_budget
        assert grown > 128
        # after growth the recorded diagnostics fit the new budget
        assert tr.stats[-1]["num_pairs"] <= grown

    def test_auto_size_budget(self):
        tr = _make_init_trainer(128, "raise", auto_size=True)
        # the exact-count pre-pass replaced the 128 budget before compiling
        assert tr.cfg.raster.pair_budget > 128
        tr.train()  # and no overflow is hit
        assert not tr.governor.events
