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

    @pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
class TestFusedGradBackward:
    """The differentiable grad-encode path (grad_encode_fused): its Pallas
    VJP kernel must match jax.grad through the XLA dfeat01 expression —
    reference orientation-loss semantics flow through this backward."""

    def _setup(self, monkeypatch):
        from signerf_tpu.ops import fused_factor_pallas as ffp
        from signerf_tpu.ops.factor_grid import FactorGridConfig

        monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)
        # spans both small (<=128) and large (>128) level codepaths
        cfg = FactorGridConfig(
            num_levels=4, base_res=8, max_res=256, features_per_level=4
        )
        key = jax.random.PRNGKey(0)
        lines = tuple(
            tuple(
                jax.random.normal(
                    jax.random.fold_in(key, lvl * 3 + ax), (res, 4)
                )
                * 0.3
                for ax in range(3)
            )
            for lvl, res in enumerate(cfg.resolutions)
        )
        x01 = jax.random.uniform(jax.random.PRNGKey(9), (64, 3))
        ct = jax.random.normal(
            jax.random.PRNGKey(10), (64, 3, cfg.out_dim)
        )
        return cfg, lines, x01, ct

    def test_forward_matches_reference(self, monkeypatch):
        from signerf_tpu.ops.factor_grid import (
            dfeat01_reference,
            grad_encode_fused,
        )

        cfg, lines, x01, _ = self._setup(monkeypatch)
        fused = np.asarray(grad_encode_fused(cfg, lines, x01), np.float64)
        ref = np.asarray(dfeat01_reference(cfg, lines, x01), np.float64)
        fro = np.linalg.norm(fused - ref) / (np.linalg.norm(ref) + 1e-9)
        assert fro < 0.02, fro

    def test_backward_matches_xla_autodiff(self, monkeypatch):
        from signerf_tpu.ops.factor_grid import (
            dfeat01_reference,
            grad_encode_fused,
        )

        cfg, lines, x01, ct = self._setup(monkeypatch)

        def loss_fused(l, x):
            return jnp.sum(grad_encode_fused(cfg, l, x) * ct)

        def loss_ref(l, x):
            return jnp.sum(dfeat01_reference(cfg, l, x) * ct)

        gl_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(lines, x01)
        gl_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(lines, x01)

        # per-level, per-axis table grads: norm-relative (bf16 GEMM contract)
        for lvl in range(len(cfg.resolutions)):
            for ax in range(3):
                a = np.asarray(gl_f[lvl][ax], np.float64)
                b = np.asarray(gl_r[lvl][ax], np.float64)
                fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
                assert fro < 0.05, (lvl, ax, fro)
        a, b = np.asarray(gx_f, np.float64), np.asarray(gx_r, np.float64)
        fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
        assert fro < 0.05, fro

    def test_model_reference_mode_uses_fused_and_flows(self, monkeypatch):
        """End-to-end under interpret mode: reference-normals model training
        gradient flows into the encoding through the fused grad path."""
        import dataclasses

        from signerf_tpu.ops import fused_factor_pallas as ffp

        monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)
        from signerf_tpu.models.nerfacto import NerfactoModel
        from tests.test_nerfacto_core import make_bundle, tiny_config

        cfg = dataclasses.replace(tiny_config(), predict_normals=True)
        model = NerfactoModel(cfg, num_train_images=2)
        params = model.init(jax.random.PRNGKey(0))
        rb = make_bundle(4)

        def loss(p):
            out = model.apply(p, rb, rng=jax.random.PRNGKey(1), train=True)
            ld = model.normals_losses(out)
            return ld["orientation_loss"]

        g = jax.grad(loss)(params)
        enc = g["field"]["encoding"]
        total = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(enc)
        )
        assert total > 0  # gradient reached the line tables
        assert all(
            bool(jnp.isfinite(x).all())
            for x in jax.tree_util.tree_leaves(g)
        )


@pytest.mark.slow
class TestGradDotKernel:
    """The CONTRACTED spatial-derivative path (grad_encode_dot): only the
    density channel's gradient is consumed, so the kernel contracts
    dfeat01 [N, 3, D] with the MLP VJP row g [N, D] in VMEM and emits
    [N, 3] — forward and its three-way backward (tables, coords, g) must
    match the XLA dfeat01 einsum expression."""

    def _setup(self, monkeypatch):
        from signerf_tpu.ops import fused_factor_pallas as ffp
        from signerf_tpu.ops.factor_grid import FactorGridConfig

        monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)
        cfg = FactorGridConfig(
            num_levels=4, base_res=8, max_res=256, features_per_level=4
        )
        key = jax.random.PRNGKey(0)
        lines = tuple(
            tuple(
                jax.random.normal(
                    jax.random.fold_in(key, lvl * 3 + ax), (res, 4)
                )
                * 0.3
                for ax in range(3)
            )
            for lvl, res in enumerate(cfg.resolutions)
        )
        x01 = jax.random.uniform(jax.random.PRNGKey(9), (256, 3))
        g = jax.random.normal(jax.random.PRNGKey(11), (256, cfg.out_dim))
        return cfg, lines, x01, g

    def test_forward_matches_reference(self, monkeypatch):
        from signerf_tpu.ops.factor_grid import (
            dfeat01_reference,
            grad_encode_dot,
        )

        cfg, lines, x01, g = self._setup(monkeypatch)
        s = np.asarray(grad_encode_dot(cfg, lines, x01, g), np.float64)
        ref = np.asarray(
            jnp.einsum("njd,nd->nj", dfeat01_reference(cfg, lines, x01), g),
            np.float64,
        )
        fro = np.linalg.norm(s - ref) / (np.linalg.norm(ref) + 1e-9)
        assert fro < 0.02, fro

    def test_backward_matches_xla_autodiff(self, monkeypatch):
        from signerf_tpu.ops.factor_grid import (
            dfeat01_reference,
            grad_encode_dot,
        )

        cfg, lines, x01, g = self._setup(monkeypatch)
        # Fixed linear cotangent: a nonlinear functional (e.g. sin) would
        # evaluate its derivative at the two implementations' slightly
        # different bf16 forward values, comparing gradients of two
        # different functions (measured: chaotic-cos divergence up to 14%
        # while the kernel itself is BIT-identical to the dense bwd kernel
        # under rank-1 cotangent expansion).
        ct = jax.random.normal(jax.random.PRNGKey(12), (x01.shape[0], 3))

        def loss_fused(l, x, gg):
            return jnp.sum(grad_encode_dot(cfg, l, x, gg) * ct)

        def loss_ref(l, x, gg):
            return jnp.sum(
                jnp.einsum("njd,nd->nj", dfeat01_reference(cfg, l, x), gg)
                * ct
            )

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(lines, x01, g)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(lines, x01, g)
        for lvl in range(len(cfg.resolutions)):
            for ax in range(3):
                a = np.asarray(gf[0][lvl][ax], np.float64)
                b = np.asarray(gr[0][lvl][ax], np.float64)
                fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
                assert fro < 0.05, (lvl, ax, fro)
        for name, a_t, b_t in (("x01", gf[1], gr[1]), ("g", gf[2], gr[2])):
            a = np.asarray(a_t, np.float64)
            b = np.asarray(b_t, np.float64)
            fro = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)
            assert fro < 0.05, (name, fro)
