"""Factorized grid encoding numerics (ops/factor_grid.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from signerf_tpu.ops.factor_grid import (
    FactorGridConfig,
    FactorGridEncoding,
    cp_level_features,
    hat_matrix,
    plane_features,
)


class TestHatMatrix:
    def test_rows_sum_to_one(self):
        h = hat_matrix(jnp.array([0.0, 0.3, 0.77, 1.0]), 9, jnp.float32)
        np.testing.assert_allclose(np.asarray(h.sum(-1)), 1.0, atol=1e-6)

    def test_exact_at_grid_points(self):
        res = 5
        u = jnp.array([0.0, 0.25, 0.5, 1.0])  # grid points of res=5
        h = hat_matrix(u, res, jnp.float32)
        expected = np.zeros((4, 5), np.float32)
        for i, j in enumerate([0, 1, 2, 4]):
            expected[i, j] = 1.0
        np.testing.assert_allclose(np.asarray(h), expected, atol=1e-6)

    def test_matches_manual_linear_interp(self):
        res = 8
        line = jax.random.normal(jax.random.PRNGKey(0), (res, 3))
        u = jnp.array([0.4123])
        got = hat_matrix(u, res, jnp.float32) @ line
        x = 0.4123 * (res - 1)
        i0 = int(np.floor(x))
        frac = x - i0
        expected = (1 - frac) * np.asarray(line[i0]) + frac * np.asarray(line[i0 + 1])
        np.testing.assert_allclose(np.asarray(got[0]), expected, rtol=1e-5)


class TestCPLevel:
    def test_separable_product(self):
        res, f = 4, 2
        key = jax.random.PRNGKey(1)
        lines = tuple(jax.random.normal(jax.random.fold_in(key, i), (res, f)) for i in range(3))
        # at a grid point the feature is the plain product of line entries
        x = jnp.array([[0.0, 1.0, 1.0 / 3.0]])  # grid indices 0, 3, 1
        out = cp_level_features(x, lines, jnp.float32)
        expected = np.asarray(lines[0][0]) * np.asarray(lines[1][3]) * np.asarray(lines[2][1])
        np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-5)


class TestPlane:
    def test_bilinear_at_grid_point(self):
        r, f = 4, 2
        plane = jax.random.normal(jax.random.PRNGKey(2), (r, r, f))
        x = jnp.array([[2.0 / 3.0, 1.0 / 3.0, 0.5]])  # (u=2, v=1) on axes (0,1)
        out = plane_features(x, plane, (0, 1), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(plane[2, 1]), rtol=1e-5
        )


class TestModule:
    def test_shapes_and_grads(self):
        cfg = FactorGridConfig(
            num_levels=3, base_res=4, max_res=16, features_per_level=4,
            include_planes=True, plane_res=8, plane_features=2,
        )
        enc = FactorGridEncoding(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), (5, 7, 3))
        params = enc.init(jax.random.PRNGKey(1), x)
        out = enc.apply(params, x)
        assert out.shape == (5, 7, cfg.out_dim)
        assert cfg.out_dim == 3 * 4 + 3 * 2

        g = jax.grad(
            lambda p: jnp.sum(enc.apply(p, x) ** 2)
        )(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0

    def test_continuity(self):
        """Encoding is continuous across cell boundaries."""
        cfg = FactorGridConfig(num_levels=2, base_res=4, max_res=8,
                               features_per_level=2)
        enc = FactorGridEncoding(cfg)
        x0 = jnp.array([[0.333333, 0.5, 0.5]])
        params = enc.init(jax.random.PRNGKey(0), x0)
        eps = 1e-4
        a = enc.apply(params, jnp.array([[1/3 - eps, 0.5, 0.5]]))
        b = enc.apply(params, jnp.array([[1/3 + eps, 0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)
