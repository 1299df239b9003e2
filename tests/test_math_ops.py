"""Unit tests for SH, quaternion, covariance, and schedule/config utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youreditableavatar_tpu.ops import sh as sh_ops
from youreditableavatar_tpu.ops.covariance import (
    build_cov3d,
    conic_and_radius,
    cov3d_to_matrix,
)
from youreditableavatar_tpu.ops.quaternion import (
    matrix_to_quat,
    quat_multiply,
    quat_normalize,
    quat_to_matrix,
)
from youreditableavatar_tpu.utils.schedule import C


class TestSH:
    def test_dc_only_constant(self, rng):
        sh = jnp.asarray(rng.normal(size=(5, 1, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(5, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_ops.eval_sh(0, sh, dirs)
        np.testing.assert_allclose(
            out, sh_ops.SH_C0 * sh[:, 0, :], rtol=1e-6
        )

    def test_basis_orthonormal(self, rng):
        # Monte-Carlo check: ∫ Y_i Y_j dΩ = δ_ij (4π-normalized sampling).
        m = 200_000
        v = rng.normal(size=(m, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh_ops.eval_sh_basis(3, jnp.asarray(v, jnp.float32)))
        gram = 4 * np.pi * basis.T @ basis / m
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_clamp_and_offset(self):
        sh = jnp.zeros((2, 1, 3)).at[0, 0, 0].set(-10.0)
        means = jnp.zeros((2, 3)).at[:, 2].set(2.0)
        campos = jnp.zeros(3)
        col = sh_ops.sh_to_color(0, sh, means, campos)
        assert col[0, 0] == 0.0  # clamped
        np.testing.assert_allclose(col[1], 0.5)  # offset only

    def test_rgb_sh_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(7, 3)), jnp.float32)
        np.testing.assert_allclose(
            sh_ops.sh_dc_to_rgb(sh_ops.rgb_to_sh_dc(rgb)), rgb, atol=1e-6
        )


class TestQuaternion:
    def test_roundtrip(self, rng):
        q = quat_normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
        m = quat_to_matrix(q)
        q2 = matrix_to_quat(m)
        # Same rotation up to sign; canonical form has w >= 0.
        q_canon = jnp.where(q[..., :1] < 0, -q, q)
        np.testing.assert_allclose(q2, q_canon, atol=1e-5)

    def test_rotation_properties(self, rng):
        q = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
        m = quat_to_matrix(q)
        eye = jnp.broadcast_to(jnp.eye(3), m.shape)
        np.testing.assert_allclose(m @ jnp.swapaxes(m, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(m), jnp.ones(16), atol=1e-5)

    def test_multiply_matches_matrix_product(self, rng):
        a = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
        b = quat_normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
        np.testing.assert_allclose(
            quat_to_matrix(quat_multiply(a, b)),
            quat_to_matrix(a) @ quat_to_matrix(b),
            atol=1e-5,
        )


class TestCovariance:
    def test_cov3d_psd_and_eigvals(self, rng):
        scales = jnp.asarray(rng.uniform(0.1, 2.0, size=(32, 3)), jnp.float32)
        quats = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
        cov = cov3d_to_matrix(build_cov3d(scales, quats))
        eig = np.linalg.eigvalsh(np.asarray(cov))
        np.testing.assert_allclose(
            np.sort(eig, -1), np.sort(np.asarray(scales) ** 2, -1), rtol=1e-4
        )

    def test_conic_inverse(self, rng):
        a = rng.uniform(1.0, 3.0, 16)
        c = rng.uniform(1.0, 3.0, 16)
        b = rng.uniform(-0.5, 0.5, 16)
        cov2d = jnp.asarray(np.stack([a, b, c], -1), jnp.float32)
        conic, radius, det = conic_and_radius(cov2d)
        for i in range(16):
            m = np.array([[a[i], b[i]], [b[i], c[i]]])
            inv = np.linalg.inv(m)
            np.testing.assert_allclose(
                conic[i], [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=1e-4
            )
        assert (radius > 0).all()


class TestSchedule:
    def test_constant(self):
        assert C(2.5, 0, 100) == 2.5

    def test_linear_interp(self):
        spec = [100, 0.0, 1.0, 200]
        assert C(spec, 0, 100) == 0.0
        assert C(spec, 0, 150) == pytest.approx(0.5)
        assert C(spec, 0, 200) == 1.0
        assert C(spec, 0, 1000) == 1.0

    def test_three_entry_shorthand(self):
        spec = [0.0, 1.0, 10]
        assert C(spec, 0, 0) == 0.0
        assert C(spec, 0, 5) == pytest.approx(0.5)


class TestConfig:
    def test_parse_structured_nested(self):
        import dataclasses

        from youreditableavatar_tpu.utils.config import parse_structured

        @dataclasses.dataclass
        class Inner:
            lr: float = 0.1
            steps: int = 10

        @dataclasses.dataclass
        class Outer:
            name: str = "x"
            inner: Inner = dataclasses.field(default_factory=Inner)
            weight: float = 1.0  # may hold a schedule list

        cfg = parse_structured(
            Outer,
            {"name": "y", "inner": {"lr": 0.5}, "weight": [0, 1.0, 2.0, 100]},
        )
        assert cfg.inner.lr == 0.5 and cfg.inner.steps == 10
        assert cfg.weight == [0, 1.0, 2.0, 100]

    def test_unknown_key_raises(self):
        import dataclasses

        from youreditableavatar_tpu.utils.config import parse_structured

        @dataclasses.dataclass
        class A:
            x: int = 1

        with pytest.raises(KeyError):
            parse_structured(A, {"bogus": 2})

    def test_dotlist(self):
        from youreditableavatar_tpu.utils.config import apply_dotlist

        cfg = {"system": {"loss": {"lambda_sds": 1.0}}}
        apply_dotlist(cfg, ["system.loss.lambda_sds=0.5", "seed=3"])
        assert cfg["system"]["loss"]["lambda_sds"] == 0.5
        assert cfg["seed"] == 3


def test_devices_virtualized():
    assert jax.device_count() == 8
