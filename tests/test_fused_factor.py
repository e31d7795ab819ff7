"""Fused Pallas factor-grid encode: parity with the XLA reference path.

Runs the kernel in pallas interpret mode (CPU CI); the same kernel code is
what executes compiled on TPU. Covers: the nerfacto final-field schedule
(small + large levels, two-stage gather), the proposal schedule (all-dense),
non-multiple-of-block N (padding path), boundary coordinates, and the
custom_vjp backward (= XLA reference gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.ops import fused_factor_pallas as ffp
from signerf_tpu.ops.factor_grid import (
    FactorGridConfig,
    FactorGridEncoding,
    _encode_fused,
    _encode_reference,
)


def make_lines(cfg, key=0, scale=0.2):
    k = jax.random.PRNGKey(key)
    return tuple(
        tuple(
            jax.random.normal(jax.random.fold_in(k, 10 * l + a), (res, cfg.features_per_level))
            * scale
            for a in range(3)
        )
        for l, res in enumerate(cfg.resolutions)
    )


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ffp, "FORCE_INTERPRET", True)


CONFIGS = {
    "final": FactorGridConfig(num_levels=8, base_res=16, max_res=2048, features_per_level=16),
    "proposal": FactorGridConfig(num_levels=5, base_res=16, max_res=128, features_per_level=8),
    "prop256": FactorGridConfig(num_levels=5, base_res=16, max_res=256, features_per_level=8),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_parity_with_reference(name):
    cfg = CONFIGS[name]
    lines = make_lines(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))  # non-multiple N
    ref = np.asarray(_encode_reference(cfg, lines, x))
    out = np.asarray(_encode_fused(cfg, lines, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_boundary_coords_exact():
    cfg = CONFIGS["final"]
    lines = make_lines(cfg)
    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.0, 1.0]])
    ref = np.asarray(_encode_reference(cfg, lines, x))
    out = np.asarray(_encode_fused(cfg, lines, x))
    np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.parametrize("name", ["proposal", "final"])
@pytest.mark.slow
def test_backward_matches_reference_grads(name):
    """Pallas backward vs the XLA-reference vjp, SAME cotangent into both.

    Both paths share the bf16-GEMM contract, so agreement is at bf16
    relative precision; coordinate grads carry the (res-1) chain factor, so
    tolerances are relative to each leaf's magnitude."""
    from signerf_tpu.ops.factor_grid import _encode_fused_bwd

    cfg = CONFIGS[name]
    lines = make_lines(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (64, cfg.out_dim))

    gl_p, gx_p = _encode_fused_bwd(cfg, (lines, x), g)
    _, vjp = jax.vjp(lambda l, xx: _encode_reference(cfg, l, xx), lines, x)
    gl_r, gx_r = vjp(g)

    gx_p, gx_r = np.asarray(gx_p), np.asarray(gx_r)
    assert np.abs(gx_p - gx_r).max() <= 0.02 * np.abs(gx_r).max() + 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(gl_p), jax.tree_util.tree_leaves(gl_r)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=0.02 * max(np.abs(b).max(), 1e-3))


def test_encoding_module_uses_fused_on_noncpu(monkeypatch):
    """The linen module routes through the fused path when the backend gate
    is open; outputs must match the module's XLA path."""
    import signerf_tpu.ops.factor_grid as fg

    cfg = CONFIGS["proposal"]
    enc = FactorGridEncoding(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (33, 3))
    params = enc.init(jax.random.PRNGKey(4), x)
    ref = enc.apply(params, x)  # CPU backend -> XLA path
    monkeypatch.setattr(fg, "use_fused_kernel", lambda: True)
    out = enc.apply(params, x)  # fused (interpret) path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_pack_shapes():
    cfg = CONFIGS["final"]
    lines = make_lines(cfg)
    smalls, larges = ffp.pack_tables(cfg.resolutions, lines)
    n_large = sum(1 for r in cfg.resolutions if r > ffp.SMALL_MAX_RES)
    assert len(smalls) == 3 and len(larges) == n_large * 3
    n_small = sum(1 for r in cfg.resolutions if r <= ffp.SMALL_MAX_RES)
    assert smalls[0].shape[0] == n_small * cfg.features_per_level
    assert smalls[0].shape[1] % 8 == 0  # contraction dims need 8-row tiles
    for b in larges:
        assert b.shape[0] == (ffp.TAP_BLOCK + 1) * cfg.features_per_level
        assert b.shape[1] % 8 == 0


@pytest.mark.parametrize("name", ["final", "proposal"])
@pytest.mark.slow
def test_grad_kernel_matches_xla_dhat(name):
    """fused_factor_grad_tpu vs the XLA hat/dhat product-rule reference
    (the path models/fields.py uses on CPU)."""
    from signerf_tpu.ops.factor_grid import dhat_matrix, hat_matrix

    cfg = CONFIGS[name]
    lines = make_lines(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (300, 3))  # non-multiple N

    dfeats = []
    for lvl, res in enumerate(cfg.resolutions):
        f_ax, df_ax = [], []
        for ax in range(3):
            line = lines[lvl][ax].astype(jnp.bfloat16)
            f_ax.append(hat_matrix(x[:, ax], res, jnp.bfloat16) @ line)
            df_ax.append(dhat_matrix(x[:, ax], res, jnp.bfloat16) @ line)
        dfeats.append(
            jnp.stack(
                [
                    df_ax[0] * f_ax[1] * f_ax[2],
                    f_ax[0] * df_ax[1] * f_ax[2],
                    f_ax[0] * f_ax[1] * df_ax[2],
                ],
                axis=-2,
            )
        )
    ref = np.asarray(jnp.concatenate(dfeats, axis=-1).astype(jnp.float32))

    packed = ffp.pack_tables(cfg.resolutions, lines)
    out = np.asarray(
        ffp.fused_factor_grad_tpu(
            cfg.resolutions, cfg.features_per_level, packed, x, True
        )
    )
    assert out.shape == ref.shape == (300, 3, len(cfg.resolutions) * cfg.features_per_level)
    # derivative magnitudes scale with (res-1); tolerance relative to range
    tol = 0.02 * max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(out, ref, atol=tol)


# ---------------------------------------------------------------------------
# fused encode + density-MLP kernel
# ---------------------------------------------------------------------------


def _mlp_ws(cfg, hidden, out, key=7):
    k = jax.random.PRNGKey(key)
    d = cfg.out_dim
    w0 = jax.random.normal(jax.random.fold_in(k, 0), (d, hidden)) * 0.1
    b0 = jax.random.normal(jax.random.fold_in(k, 1), (hidden,)) * 0.05
    w1 = jax.random.normal(jax.random.fold_in(k, 2), (hidden, out)) * 0.1
    b1 = jax.random.normal(jax.random.fold_in(k, 3), (out,)) * 0.05
    return ((w0, b0), (w1, b1))


@pytest.mark.parametrize(
    "name,hidden,out",
    [("proposal", 16, 1), ("prop256", 16, 1), ("final", 64, 16)],
)
def test_fused_density_mlp_parity(name, hidden, out, monkeypatch):
    """Fused encode+MLP kernel vs the pure-XLA reference (all three
    production schedules: all-small, small+one-large, small+4-large)."""
    import signerf_tpu.ops.factor_grid as fg

    cfg = CONFIGS[name]
    lines = make_lines(cfg)
    ws = _mlp_ws(cfg, hidden, out)
    x = jax.random.uniform(jax.random.PRNGKey(9), (257, 3))  # non-multiple N
    ref = np.asarray(fg.density_mlp_reference(cfg, lines, ws, x))
    monkeypatch.setattr(fg, "use_fused_kernel", lambda: True)
    got = np.asarray(fg.fused_density_mlp(cfg, lines, ws, x))
    assert got.shape == ref.shape == (257, out)
    tol = 0.02 * max(float(np.abs(ref).max()), 1e-3)
    np.testing.assert_allclose(got, ref, atol=tol)


@pytest.mark.slow
def test_fused_density_bwd_multiblock_accumulation(monkeypatch):
    """The fully-fused backward kernel accumulates MLP-weight and table
    grads across sequential grid blocks (pl.when init at block 0 + RMW);
    N > 2 blocks incl. the zero-padded tail must match the XLA reference."""
    import signerf_tpu.ops.factor_grid as fg

    cfg = CONFIGS["proposal"]
    hidden, out = 16, 1
    lines = make_lines(cfg)
    ws = _mlp_ws(cfg, hidden, out)
    n = 2100  # 3 blocks of 1024 with a padded tail
    x = jax.random.uniform(jax.random.PRNGKey(20), (n, 3))
    g = jax.random.normal(jax.random.PRNGKey(21), (n, out))

    packed = ffp.pack_tables(cfg.resolutions, lines)
    (k0, b0), (k1, b1) = ws
    grad_packed, g_ws, gx = ffp.fused_factor_density_bwd_tpu(
        cfg.resolutions, cfg.features_per_level, packed, x,
        k0, b0, k1, b1, g, True,
    )
    gl = ffp.unpack_table_grads(
        cfg.resolutions, grad_packed, cfg.features_per_level
    )

    _, vjp_ref = jax.vjp(
        lambda l, w, xx: fg.density_mlp_reference(cfg, l, w, xx), lines, ws, x
    )
    gl_r, gw_r, gx_r = vjp_ref(g)
    ref_leaves = jax.tree_util.tree_leaves((gl_r, gw_r, gx_r))
    got_leaves = jax.tree_util.tree_leaves((gl, g_ws, gx))
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(got_leaves, ref_leaves):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
        assert rel < 0.06, rel


@pytest.mark.parametrize("name", ["proposal", "final"])
@pytest.mark.slow
def test_fused_density_mlp_backward(name, monkeypatch):
    """custom_vjp backward (fully-fused Pallas bwd kernel: in-VMEM feature
    recompute + MLP vjp + encode bwd) vs jax.vjp of the XLA reference."""
    import signerf_tpu.ops.factor_grid as fg

    cfg = CONFIGS[name]
    hidden, out = (16, 1) if name == "proposal" else (64, 16)
    lines = make_lines(cfg)
    ws = _mlp_ws(cfg, hidden, out)
    x = jax.random.uniform(jax.random.PRNGKey(10), (64, 3))
    g = jax.random.normal(jax.random.PRNGKey(11), (64, out))

    monkeypatch.setattr(fg, "use_fused_kernel", lambda: True)
    _, vjp_fused = jax.vjp(
        lambda l, w, xx: fg.fused_density_mlp(cfg, l, w, xx), lines, ws, x
    )
    gl_p, gw_p, gx_p = vjp_fused(g)
    monkeypatch.setattr(fg, "use_fused_kernel", lambda: False)
    saved_force_interpret = ffp.FORCE_INTERPRET
    ffp.FORCE_INTERPRET = False
    try:
        _, vjp_ref = jax.vjp(
            lambda l, w, xx: fg.density_mlp_reference(cfg, l, w, xx),
            lines,
            ws,
            x,
        )
        gl_r, gw_r, gx_r = vjp_ref(g)
    finally:
        ffp.FORCE_INTERPRET = saved_force_interpret
    # Both paths share the bf16-GEMM contract but round at different points
    # (fused kernel: f32-accumulated MLP vjp over bf16 operands; reference:
    # bf16-output dots throughout). Measured against a full-f32 referee at
    # these shapes, worst per-leaf norm-relative error is 0.065 (fused) vs
    # 0.052 (reference) — the same bf16-noise scale — so up to ~0.08
    # fused-vs-reference divergence is rounding redistribution, not error.
    for tree_p, tree_r in [(gl_p, gl_r), (gw_p, gw_r), (gx_p, gx_r)]:
        for a, b in zip(
            jax.tree_util.tree_leaves(tree_p), jax.tree_util.tree_leaves(tree_r)
        ):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
            assert rel < 0.08, rel


def test_density_field_modules_use_fused_path(monkeypatch):
    """HashMLPDensityField and NerfactoField.density route through the fused
    kernel when the gate is open, produce the same param tree as the XLA
    path, and match its outputs."""
    import signerf_tpu.ops.factor_grid as fg
    from signerf_tpu.models.fields import HashMLPDensityField, NerfactoField

    x = jax.random.uniform(jax.random.PRNGKey(0), (33, 3)) * 2 - 1
    prop = HashMLPDensityField(max_res=128, num_levels=5)
    params = prop.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(prop.apply(params, x))  # CPU gate closed -> XLA path
    monkeypatch.setattr(fg, "use_fused_kernel", lambda: True)
    params_fused = prop.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_fused
    )
    got = np.asarray(prop.apply(params, x))
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 0.02

    field = NerfactoField(num_images=2)
    dirs = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    monkeypatch.setattr(fg, "use_fused_kernel", lambda: False)
    pf = field.init(
        jax.random.PRNGKey(2), x[:, None, :], dirs, jnp.zeros((33,), jnp.int32), False
    )
    d_ref, geo_ref = field.apply(pf, x[:, None, :], method="density")
    monkeypatch.setattr(fg, "use_fused_kernel", lambda: True)
    d_fu, geo_fu = field.apply(pf, x[:, None, :], method="density")
    for a, b in [(d_fu, d_ref), (geo_fu, geo_ref)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
        assert rel < 0.02
