"""Analytic factor-grid density gradient vs autodiff ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.models.fields import (
    NerfactoField,
    factor_density_geo_and_grad,
)
from signerf_tpu.ops.factor_grid import dhat_matrix, hat_matrix


class TestDhat:
    def test_dhat_is_hat_derivative(self):
        res = 8
        u = jnp.asarray([0.123, 0.456, 0.789])
        eps = 1e-4
        num = (
            hat_matrix(u + eps, res, jnp.float32)
            - hat_matrix(u - eps, res, jnp.float32)
        ) / (2 * eps)
        ana = dhat_matrix(u, res, jnp.float32)
        np.testing.assert_allclose(np.asarray(ana), np.asarray(num), atol=1e-2)


class TestAnalyticDensityGrad:
    @pytest.fixture(scope="class")
    def field_and_params(self):
        field = NerfactoField(
            num_images=2,
            factor_num_levels=3,
            base_res=4,
            max_res=16,
            factor_features_per_level=4,
            hidden_dim=16,
            geo_feat_dim=7,
            encoding_backend="factor",
            compute_dtype=jnp.float32,
        )
        pos = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 3)) * 1.5 - 0.75
        dirs = jnp.ones((2, 3)) / jnp.sqrt(3.0)
        params = field.init(
            jax.random.PRNGKey(1), pos, dirs, jnp.zeros((2,), jnp.int32), False
        )["params"]
        return field, params, pos

    def test_density_and_geo_match_field(self, field_and_params):
        field, params, pos = field_and_params
        density, geo, grad = factor_density_geo_and_grad(params, pos, field)
        d_ref, geo_ref = field.apply({"params": params}, pos, method="density")
        np.testing.assert_allclose(
            np.asarray(density), np.asarray(d_ref), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(geo), np.asarray(geo_ref), rtol=1e-3, atol=5e-4
        )
        assert grad.shape == (2, 3, 3)

    def test_grad_matches_autodiff(self, field_and_params):
        field, params, pos = field_and_params
        _, _, grad = factor_density_geo_and_grad(params, pos, field)

        def density_fn(p):
            d, _ = field.apply({"params": params}, p, method="density")
            return d

        eye = jnp.eye(3)
        ref = jnp.stack(
            [
                jax.jvp(
                    density_fn, (pos,), (jnp.broadcast_to(eye[i], pos.shape),)
                )[1]
                for i in range(3)
            ],
            axis=-1,
        )
        np.testing.assert_allclose(
            np.asarray(grad), np.asarray(ref), rtol=1e-3, atol=1e-4
        )

    def test_model_uses_analytic_path(self, field_and_params):
        """Model forward with factor backend + predict_normals produces
        finite normals and grads flow first-order."""
        import dataclasses

        from signerf_tpu.models.nerfacto import NerfactoModel
        from tests.test_nerfacto_core import make_bundle, tiny_config

        cfg = dataclasses.replace(tiny_config(), predict_normals=True)
        model = NerfactoModel(cfg, num_train_images=3)
        params = model.init(jax.random.PRNGKey(0))
        rb = make_bundle(4)
        out = model.apply(params, rb, rng=jax.random.PRNGKey(1), train=True)
        assert "normals_samples" in out
        assert bool(jnp.isfinite(out["normals_samples"]).all())
        batch = {"image": jnp.zeros((4, 3))}

        def loss(p):
            o = model.apply(p, rb, rng=jax.random.PRNGKey(2), train=True)
            return sum(jax.tree_util.tree_leaves(model.loss_dict(o, batch)))

        g = jax.grad(loss)(params)
        assert all(
            bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g)
        )


class TestFusedAnalyticGrad:
    """The fused-kernel branch of factor_density_geo_and_grad (the TPU
    path), via pallas interpret mode. bf16 tables -> looser tolerances."""

    def test_fused_branch_matches_xla_branch(self, monkeypatch):
        from signerf_tpu.ops import fused_factor_pallas as ffp

        # f32 compute: the XLA branch is then numerically exact, so the
        # comparison isolates the kernel's own bf16-table rounding (with a
        # bf16 XLA branch, ITS bf16-rounded coordinates flip interpolation
        # cells at knots and the two branches disagree by ~11% fro — both
        # noisy around the same truth).
        field = NerfactoField(
            num_images=2,
            factor_num_levels=3,
            base_res=4,
            max_res=16,
            factor_features_per_level=4,
            hidden_dim=16,
            geo_feat_dim=7,
            encoding_backend="factor",
            compute_dtype=jnp.float32,
        )
        pos = jax.random.uniform(jax.random.PRNGKey(0), (8, 8, 3)) * 1.5 - 0.75
        dirs = jnp.ones((8, 3)) / jnp.sqrt(3.0)
        params = field.init(
            jax.random.PRNGKey(1), pos, dirs, jnp.zeros((8,), jnp.int32), False
        )["params"]

        d_x, g_x, gr_x = factor_density_geo_and_grad(params, pos, field)
        monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)
        d_f, g_f, gr_f = factor_density_geo_and_grad(params, pos, field)

        np.testing.assert_allclose(
            np.asarray(d_f), np.asarray(d_x), rtol=0.05, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(g_f), np.asarray(g_x), rtol=0.05, atol=5e-2
        )
        # elementwise outliers are expected: bf16-rounded coordinates can
        # flip the interpolation cell at knot boundaries, changing the
        # (piecewise-constant) derivative by O(value) on isolated samples.
        # Norm-relative error is the meaningful metric.
        a, b = np.asarray(gr_f, np.float64), np.asarray(gr_x, np.float64)
        fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
        assert fro < 0.05, fro
        scale = max(float(np.abs(b).max()), 1e-3)
        np.testing.assert_allclose(a, b, atol=0.3 * scale)

    def test_fused_branch_grad_is_stopped(self, monkeypatch):
        """Training differentiability: d loss/d params must exist and not
        traverse the (backward-less) grad kernel."""
        from signerf_tpu.ops import fused_factor_pallas as ffp

        monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)
        field = NerfactoField(
            num_images=2,
            factor_num_levels=2,
            base_res=4,
            max_res=8,
            factor_features_per_level=4,
            hidden_dim=16,
            geo_feat_dim=7,
            encoding_backend="factor",
            compute_dtype=jnp.bfloat16,
        )
        pos = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 3)) - 0.5
        dirs = jnp.ones((4, 3)) / jnp.sqrt(3.0)
        params = field.init(
            jax.random.PRNGKey(1), pos, dirs, jnp.zeros((4,), jnp.int32), False
        )["params"]

        def loss(p):
            d, g, gr = factor_density_geo_and_grad(p, pos, field)
            # grad normals enter the loss detached-only in training; here we
            # include them to assert stop_gradient (zero contribution).
            return jnp.sum(d) + jnp.sum(g) + jnp.sum(gr)

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in flat)
