"""Tests for the nerfacto core: hash grid, SH, contraction, samplers, model.

Strategy per SURVEY.md §4(b,c): kernel-level numerics vs. reference math, on
tiny shapes so CPU compiles stay fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.cameras.cameras import RayBundle
from signerf_tpu.models import losses as L
from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from signerf_tpu.models.samplers import (
    make_spacing,
    render_weights,
    sample_pdf_bins,
    sample_uniform_bins,
)
from signerf_tpu.ops.contraction import contract
from signerf_tpu.ops.hashgrid import hashgrid_encode, hashgrid_resolutions
from signerf_tpu.ops.sh import sh_encode


def tiny_config():
    from signerf_tpu.models.nerfacto import ProposalNetArgs

    return NerfactoModelConfig(
        num_levels=4,
        log2_hashmap_size=8,
        max_res=64,
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embed_dim=4,
        num_proposal_samples_per_ray=(8, 6),
        num_nerf_samples_per_ray=4,
        proposal_net_args_list=(
            ProposalNetArgs(num_levels=2, log2_hashmap_size=6, max_res=32, hidden_dim=8),
            ProposalNetArgs(num_levels=2, log2_hashmap_size=6, max_res=64, hidden_dim=8),
        ),
    )


def make_bundle(n=4):
    key = jax.random.PRNGKey(0)
    dirs = jax.random.normal(key, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=dirs,
        pixel_area=jnp.full((n, 1), 1e-6),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        nears=jnp.full((n, 1), 0.05),
        fars=jnp.full((n, 1), 10.0),
    )


class TestHashGrid:
    def test_resolutions_growth(self):
        res = hashgrid_resolutions(16, 16, 2048)
        assert res[0] == 16 and res[-1] == 2048
        assert all(res[i] <= res[i + 1] for i in range(15))

    def test_dense_level_matches_manual_trilinear(self):
        # One dense level res=4 -> (res+1)^3=125 <= T=256: direct indexing.
        res = (4,)
        table = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 2))
        pos = jnp.array([[0.3, 0.7, 0.1]])
        out = hashgrid_encode(table, pos, res)

        # manual trilinear
        p = np.array([0.3, 0.7, 0.1]) * 4
        c0 = np.floor(p).astype(int)
        f = p - c0
        acc = np.zeros(2)
        for dx in range(2):
            for dy in range(2):
                for dz in range(2):
                    w = (
                        (f[0] if dx else 1 - f[0])
                        * (f[1] if dy else 1 - f[1])
                        * (f[2] if dz else 1 - f[2])
                    )
                    idx = (c0[0] + dx) + (c0[1] + dy) * 5 + (c0[2] + dz) * 25
                    acc += w * np.asarray(table[0, idx])
        np.testing.assert_allclose(np.asarray(out[0]), acc, rtol=1e-5)

    def test_batch_shape_and_grad(self):
        res = hashgrid_resolutions(3, 4, 32)
        table = jax.random.normal(jax.random.PRNGKey(2), (3, 64, 2)) * 0.01
        pos = jax.random.uniform(jax.random.PRNGKey(3), (5, 7, 3))
        out = hashgrid_encode(table, pos, res)
        assert out.shape == (5, 7, 6)
        g = jax.grad(lambda t: jnp.sum(hashgrid_encode(t, pos, res) ** 2))(table)
        assert g.shape == table.shape
        assert bool(jnp.isfinite(g).all())


class TestSH:
    def test_l0_constant_and_count(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        for levels, n in [(1, 1), (2, 4), (3, 9), (4, 16)]:
            out = sh_encode(d, levels)
            assert out.shape == (1, n)
        np.testing.assert_allclose(out[0, 0], 0.2820948, rtol=1e-5)

    def test_sum_of_squares_addition_theorem(self):
        # sum_m |Y_lm|^2 = (2l+1)/(4pi) for unit directions, any direction.
        key = jax.random.PRNGKey(0)
        d = jax.random.normal(key, (10, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        out = sh_encode(d, 4)
        for l, sl in [(0, slice(0, 1)), (1, slice(1, 4)), (2, slice(4, 9)), (3, slice(9, 16))]:
            ss = jnp.sum(out[:, sl] ** 2, axis=-1)
            expected = (2 * l + 1) / (4 * np.pi)
            np.testing.assert_allclose(np.asarray(ss), expected, rtol=1e-4)


class TestContraction:
    def test_identity_inside_unit_ball(self):
        x = jnp.array([[0.3, -0.2, 0.5]])
        np.testing.assert_allclose(np.asarray(contract(x)), np.asarray(x))

    def test_bounded_by_two(self):
        x = jnp.array([[100.0, -50.0, 3.0]])
        out = contract(x)
        assert float(jnp.max(jnp.abs(out))) < 2.0


class TestSamplers:
    def test_uniform_bins_monotone(self):
        bins = sample_uniform_bins(jax.random.PRNGKey(0), 4, 8)
        assert bins.shape == (4, 9)
        assert bool(jnp.all(jnp.diff(bins, axis=-1) >= 0))

    def test_pdf_concentrates_mass(self):
        # weights peaked in bin 5 of 8 -> resampled bins cluster there
        bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
        w = jnp.zeros((2, 8)).at[:, 5].set(1.0)
        new = sample_pdf_bins(None, bins, w, 16)
        mids = 0.5 * (new[..., 1:] + new[..., :-1])
        frac_in_peak = jnp.mean((mids > 5 / 8 - 0.1) & (mids < 6 / 8 + 0.1))
        assert float(frac_in_peak) > 0.7

    def test_render_weights_opaque(self):
        dens = jnp.full((1, 8), 1e4)
        deltas = jnp.full((1, 8), 0.1)
        w = render_weights(dens, deltas)
        np.testing.assert_allclose(float(w[0, 0]), 1.0, atol=1e-4)
        assert float(jnp.sum(w)) <= 1.0 + 1e-4

    def test_spacing_roundtrip(self):
        nears = jnp.full((3, 1), 0.05)
        fars = jnp.full((3, 1), 10.0)
        s2t, t2s = make_spacing(nears, fars)
        s = jnp.broadcast_to(jnp.linspace(0, 1, 5), (3, 5))
        t = s2t(s)
        np.testing.assert_allclose(np.asarray(t2s(t)), np.asarray(s), atol=1e-5)
        np.testing.assert_allclose(float(t[0, 0]), 0.05, rtol=1e-4)
        np.testing.assert_allclose(float(t[0, -1]), 10.0, rtol=1e-3)


class TestModel:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = NerfactoModel(tiny_config(), num_train_images=3)
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    def test_param_tree_layout(self, model_and_params):
        _, params = model_and_params
        assert set(params.keys()) == {"field", "proposal_0", "proposal_1"}

    @pytest.mark.slow
    def test_forward_shapes(self, model_and_params):
        model, params = model_and_params
        rb = make_bundle(4)
        out = model.apply(params, rb, rng=jax.random.PRNGKey(1), train=True)
        assert out["rgb"].shape == (4, 3)
        assert out["depth"].shape == (4, 1)
        assert out["accumulation"].shape == (4, 1)
        assert len(out["weights_list"]) == 2
        assert bool(jnp.isfinite(out["rgb"]).all())

    @pytest.mark.slow
    def test_loss_grads_flow_and_finite(self, model_and_params):
        # Note: proposal grads can legitimately be exactly zero at random
        # init (clip(w - w_outer, 0) saturates when the proposal
        # over-covers); dedicated interlevel-grad coverage lives in
        # TestLosses::test_interlevel_grads_when_undercovering.
        model, params = model_and_params
        rb = make_bundle(4)
        batch = {"image": jnp.ones((4, 3)) * 0.5}

        def total_loss(p):
            out = model.apply(p, rb, rng=jax.random.PRNGKey(2), train=True)
            return sum(jax.tree_util.tree_leaves(model.loss_dict(out, batch)))

        g = jax.grad(total_loss)(params)
        field_norm = sum(
            float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["field"])
        )
        assert field_norm > 0
        for x in jax.tree_util.tree_leaves(g):
            assert bool(jnp.isfinite(x).all())

    def test_losses_finite(self, model_and_params):
        model, params = model_and_params
        rb = make_bundle(4)
        out = model.apply(params, rb, rng=jax.random.PRNGKey(3), train=True)
        batch = {"image": jnp.zeros((4, 3))}
        ld = model.loss_dict(out, batch)
        assert {"rgb_loss", "interlevel_loss", "distortion_loss"} <= set(ld)
        for v in ld.values():
            assert bool(jnp.isfinite(v))

    def test_anneal_schedule(self, model_and_params):
        model, _ = model_and_params
        assert float(model.anneal(0)) == 0.0
        assert float(model.anneal(1000)) == pytest.approx(1.0)
        assert 0.0 < float(model.anneal(100)) < 1.0


class TestLosses:
    def test_interlevel_zero_when_matching(self):
        # proposal == final histogram -> loss ~ 0
        from signerf_tpu.models.ray_samples import RaySamples

        bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
        w = jnp.full((2, 8), 1.0 / 8)
        rs = RaySamples(
            origins=jnp.zeros((2, 3)),
            directions=jnp.ones((2, 3)),
            starts=bins[..., :-1],
            ends=bins[..., 1:],
            spacing_starts=bins[..., :-1],
            spacing_ends=bins[..., 1:],
        )
        loss = L.interlevel_loss([w], [rs], w, rs)
        assert float(loss) < 1e-8

    def test_interlevel_grads_when_undercovering(self):
        # Proposal mass away from the field's peak -> positive loss + grads.
        from signerf_tpu.models.ray_samples import RaySamples

        def make_rs(bins):
            return RaySamples(
                origins=jnp.zeros((1, 3)),
                directions=jnp.ones((1, 3)),
                starts=bins[..., :-1],
                ends=bins[..., 1:],
                spacing_starts=bins[..., :-1],
                spacing_ends=bins[..., 1:],
            )

        bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
        w_final = jnp.zeros((1, 8)).at[:, 6].set(1.0)  # field peak at bin 6

        def loss_of(wp_logits):
            wp = jax.nn.softmax(wp_logits, axis=-1)
            return L.interlevel_loss([wp], [make_rs(bins)], w_final, make_rs(bins))

        wp_logits = jnp.zeros((1, 8)).at[:, 1].set(5.0)  # proposal peak at bin 1
        val, grad = jax.value_and_grad(loss_of)(wp_logits)
        assert float(val) > 0
        assert float(jnp.abs(grad).sum()) > 0

    def test_distortion_zero_for_delta(self):
        from signerf_tpu.models.ray_samples import RaySamples

        bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
        w = jnp.zeros((1, 8)).at[:, 3].set(1.0)
        rs = RaySamples(
            origins=jnp.zeros((1, 3)),
            directions=jnp.ones((1, 3)),
            starts=bins[..., :-1],
            ends=bins[..., 1:],
            spacing_starts=bins[..., :-1],
            spacing_ends=bins[..., 1:],
        )
        # single-interval mass: inter term 0, intra = w^2 * width / 3
        expected = 1.0 * (1 / 8) / 3
        np.testing.assert_allclose(float(L.distortion_loss(w, rs)), expected, rtol=1e-5)


class TestFusedDensityModelPath:
    """Model-level routing through the fused encode+density-MLP kernel
    (interpret mode): the full NerfactoModel forward must match the XLA
    path and keep an identical param tree (checkpoint interchange)."""

    def test_model_forward_matches_xla_path(self, monkeypatch):
        import signerf_tpu.ops.factor_grid as fg
        from signerf_tpu.ops import fused_factor_pallas as ffp

        model = NerfactoModel(tiny_config(), num_train_images=2)
        params = model.init(jax.random.PRNGKey(0))
        bundle = make_bundle(4)
        out_ref = model.apply(params, bundle, train=False)

        monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)
        monkeypatch.setattr(fg, "use_fused_kernel", lambda: True)
        params_fused = model.init(jax.random.PRNGKey(0))
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            params_fused
        )
        out_fused = model.apply(params, bundle, train=False)
        for key in ("rgb", "depth", "accumulation"):
            a = np.asarray(out_fused[key])
            b = np.asarray(out_ref[key])
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
            assert rel < 0.05, (key, rel)
