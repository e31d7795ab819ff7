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
