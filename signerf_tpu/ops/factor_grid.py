"""Factorized multiresolution grid encoding — the TPU-native spatial encoding.

WHY THIS EXISTS (measured, not guessed): instant-ngp-style hash grids are
gather-bound. On TPU, XLA's dense gather sustains only ~50-90M rows/s and
Mosaic's `tpu.dynamic_gather` is an intra-vreg shuffle (<=8-deep), so a
hash-grid nerfacto renders at ~5k rays/s/chip — two orders below the
reference GPU baseline. TPUs want matmuls, so this encoding replaces table
lookups with **dense interpolation-matrix products**:

    hat(u)[n, j] = relu(1 - |u_n - j|)          # [N, R] 2-banded rows
    axis_feat    = hat(u) @ line                # [N, R] @ [R, F] on the MXU
    level_feat   = hat_x@Lx * hat_y@Ly * hat_z@Lz   # CP (rank-F) product

i.e. a multiresolution CP (TensoRF-style) decomposition evaluated entirely
as MXU GEMMs. The backward is also GEMMs (hat^T @ grad) — no scatter-add.
Optionally adds VM plane terms (plane[yz] interp * line[x]) for
mid-frequency expressiveness; plane interpolation is a two-step contraction
(hat_x @ plane.reshape(Rx, Ry*F), then a row-wise hat_y reduction).

Line/plane parameters are tiny (KBs-MBs), live happily in VMEM, and shard/
replicate trivially. Capability parity target is nerfstudio's HashEncoding
inside `NerfactoField` (SURVEY.md §2b); `signerf_tpu/ops/hashgrid.py`
remains available as the semantics-parity backend.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class FactorGridConfig:
    num_levels: int = 8
    base_res: int = 16
    max_res: int = 1024
    features_per_level: int = 16
    include_planes: bool = False
    plane_res: int = 128
    plane_features: int = 8
    compute_dtype: str = "bfloat16"

    @property
    def resolutions(self) -> Tuple[int, ...]:
        if self.num_levels == 1:
            return (self.base_res,)
        g = math.exp(
            (math.log(self.max_res) - math.log(self.base_res))
            / (self.num_levels - 1)
        )
        return tuple(
            int(round(self.base_res * g**l)) for l in range(self.num_levels)
        )

    @property
    def out_dim(self) -> int:
        d = self.num_levels * self.features_per_level
        if self.include_planes:
            d += 3 * self.plane_features
        return d


def hat_matrix(u: jnp.ndarray, res: int, dtype) -> jnp.ndarray:
    """[N] coords in [0, 1] -> [N, res] linear-interpolation rows.

    Row n has at most two nonzeros: (1-frac) at floor(u*(res-1)) and frac at
    floor+1 — multiplying by a line table of shape [res, F] IS linear
    interpolation.
    """
    x = jnp.clip(u, 0.0, 1.0) * (res - 1)
    j = jnp.arange(res, dtype=x.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - j[None, :])).astype(dtype)


def dhat_matrix(u: jnp.ndarray, res: int, dtype) -> jnp.ndarray:
    """d(hat)/du in [0,1]-coords: -sign(x - j) inside each hat's support,
    times the chain factor (res - 1). Analytic derivative of linear interp —
    a second banded matrix, so the encoding's spatial gradient is ALSO one
    GEMM per axis (no autodiff through the encode)."""
    x = jnp.clip(u, 0.0, 1.0) * (res - 1)
    j = jnp.arange(res, dtype=x.dtype)
    diff = x[:, None] - j[None, :]
    inside = (jnp.abs(diff) < 1.0).astype(x.dtype)
    return (-jnp.sign(diff) * inside * (res - 1)).astype(dtype)


def cp_level_features(
    x01: jnp.ndarray,  # [N, 3] in [0,1]
    lines: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],  # each [R, F]
    dtype,
) -> jnp.ndarray:
    res = lines[0].shape[0]
    fx = hat_matrix(x01[:, 0], res, dtype) @ lines[0].astype(dtype)
    fy = hat_matrix(x01[:, 1], res, dtype) @ lines[1].astype(dtype)
    fz = hat_matrix(x01[:, 2], res, dtype) @ lines[2].astype(dtype)
    return fx * fy * fz  # [N, F]


def plane_features(
    x01: jnp.ndarray,  # [N, 3]
    plane: jnp.ndarray,  # [R, R, F]
    axes: Tuple[int, int],
    dtype,
) -> jnp.ndarray:
    """Bilinear interp on a 2D plane spanning `axes`, as two contractions."""
    r, _, f = plane.shape
    ha = hat_matrix(x01[:, axes[0]], r, dtype)  # [N, R]
    hb = hat_matrix(x01[:, axes[1]], r, dtype)  # [N, R]
    t1 = ha @ plane.reshape(r, r * f).astype(dtype)  # [N, R*F] (MXU)
    t1 = t1.reshape(-1, r, f)
    return jnp.einsum("nr,nrf->nf", hb, t1)  # row-wise reduce (VPU)


def _encode_reference(
    cfg: FactorGridConfig, lines: Tuple[Tuple[jnp.ndarray, ...], ...], x01: jnp.ndarray
) -> jnp.ndarray:
    """Pure-XLA CP encode over a [level][axis] line pytree (no planes)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    feats = [
        cp_level_features(x01, tuple(lines[lvl]), dtype)
        for lvl in range(len(cfg.resolutions))
    ]
    return jnp.concatenate(feats, axis=-1).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _encode_fused(cfg: FactorGridConfig, lines, x01: jnp.ndarray) -> jnp.ndarray:
    """Fused Pallas forward (ops/fused_factor_pallas.py). Backward dispatch:
    on TPU, the analytic Pallas backward (`fused_factor_encode_bwd_tpu`,
    bf16 GEMMs — matches the XLA gradient to norm-relative ~1e-2, not
    bit-identical); elsewhere, recompute through the XLA reference."""
    from signerf_tpu.ops import fused_factor_pallas as ffp

    packed = ffp.pack_tables(cfg.resolutions, lines)
    return ffp.fused_factor_encode_tpu(
        cfg.resolutions,
        cfg.features_per_level,
        packed,
        x01,
        ffp.FORCE_INTERPRET,
    )


def _encode_fused_fwd(cfg, lines, x01):
    return _encode_fused(cfg, lines, x01), (lines, x01)


def _encode_fused_bwd(cfg, residuals, g):
    lines, x01 = residuals
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        packed = ffp.pack_tables(cfg.resolutions, lines)
        grad_packed, grad_x = ffp.fused_factor_encode_bwd_tpu(
            cfg.resolutions,
            cfg.features_per_level,
            packed,
            x01,
            g,
            ffp.FORCE_INTERPRET,
        )
        grad_lines = ffp.unpack_table_grads(
            cfg.resolutions, grad_packed, cfg.features_per_level
        )
        return grad_lines, grad_x
    _, vjp = jax.vjp(lambda l, x: _encode_reference(cfg, l, x), lines, x01)
    return vjp(g)


_encode_fused.defvjp(_encode_fused_fwd, _encode_fused_bwd)


def fused_density_eligible(
    cfg: "FactorGridConfig", hidden_dim: int, num_layers: int = 2
) -> bool:
    """Whether `fused_density_mlp` supports this (encoding, MLP) config.

    Mirrors the fused kernel's hard preconditions (2-layer MLP contract of
    `mlp2_reference`, the `hidden % 8 == 0` sublane assert in
    `fused_factor_pallas.fused_factor_density_tpu`, and line-only tables) so
    callers can fall back to the XLA encode+MLP path at the config site —
    instead of a valid non-default config working on CPU but failing deep
    inside the jitted kernel wrapper on TPU."""
    return num_layers == 2 and hidden_dim % 8 == 0 and not cfg.include_planes


def use_fused_kernel() -> bool:
    """Fused Pallas encode runs on real TPU backends (incl. the axon tunnel,
    which reports backend "axon" but compiles Mosaic TPU kernels); anything
    else — CPU tests/dryrun meshes, GPU — uses the XLA reference path, since
    the kernel uses pltpu memory spaces and only lowers for TPU."""
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover - no backend at all
        return False
    if backend in ("tpu", "axon"):
        return True
    return any(d.platform == "tpu" for d in jax.devices())


class FactorGridEncoding(nn.Module):
    """Learned factorized encoding; drop-in alternative to HashGridEncoding."""

    config: FactorGridConfig = FactorGridConfig()

    def setup(self):
        cfg = self.config
        self.lines = [
            [
                self.param(
                    f"line_{lvl}_{ax}",
                    # scale ~1 so the rank-F *product* of three lines starts
                    # near instant-ngp's small-feature regime
                    nn.initializers.normal(0.2),
                    (res, cfg.features_per_level),
                )
                for ax in range(3)
            ]
            for lvl, res in enumerate(cfg.resolutions)
        ]
        if cfg.include_planes:
            self.planes = [
                self.param(
                    f"plane_{axes[0]}{axes[1]}",
                    nn.initializers.normal(0.02),
                    (cfg.plane_res, cfg.plane_res, cfg.plane_features),
                )
                for axes in [(0, 1), (0, 2), (1, 2)]
            ]

    def __call__(self, positions01: jnp.ndarray, use_fused: bool | None = None) -> jnp.ndarray:
        """use_fused: None = auto (fused Pallas forward on TPU backends,
        with the analytic Pallas backward handling training gradients);
        False = force the XLA path (debug/eval comparisons).
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        batch_shape = positions01.shape[:-1]
        x = jnp.clip(positions01.reshape(-1, 3), 0.0, 1.0)

        use_fused = (use_fused is not False) and use_fused_kernel()
        if not cfg.include_planes and use_fused:
            lines = tuple(tuple(axes) for axes in self.lines)
            out = _encode_fused(cfg, lines, x.astype(jnp.float32))
            return out.reshape(*batch_shape, cfg.out_dim)

        feats = []
        for lvl, _res in enumerate(cfg.resolutions):
            feats.append(cp_level_features(x, tuple(self.lines[lvl]), dtype))
        if cfg.include_planes:
            for plane, axes in zip(self.planes, [(0, 1), (0, 2), (1, 2)]):
                feats.append(plane_features(x, plane, axes, dtype))
        out = jnp.concatenate(feats, axis=-1).astype(jnp.float32)
        return out.reshape(*batch_shape, cfg.out_dim)

    def encode_with_grad(self, positions01: jnp.ndarray):
        """-> (feats [..., D], dfeats [..., 3, D]) with ANALYTIC spatial
        derivatives: per level/axis the derivative is `dhat @ line` — one
        extra GEMM per axis, sharing the primal's hat work conceptually,
        instead of autodiff re-evaluating the whole encode per tangent.
        CP levels only (plane terms unsupported here)."""
        cfg = self.config
        assert not cfg.include_planes, (
            "analytic gradients implemented for CP levels only"
        )
        dtype = jnp.dtype(cfg.compute_dtype)
        batch_shape = positions01.shape[:-1]
        x = jnp.clip(positions01.reshape(-1, 3), 0.0, 1.0)

        feats = []
        dfeats = []
        for lvl, res in enumerate(cfg.resolutions):
            lines = self.lines[lvl]
            f_ax = []
            df_ax = []
            for ax in range(3):
                h = hat_matrix(x[:, ax], res, dtype)
                dh = dhat_matrix(x[:, ax], res, dtype)
                line = lines[ax].astype(dtype)
                f_ax.append(h @ line)  # [N, F]
                df_ax.append(dh @ line)  # [N, F]
            feat = f_ax[0] * f_ax[1] * f_ax[2]
            dfeat = jnp.stack(
                [
                    df_ax[0] * f_ax[1] * f_ax[2],
                    f_ax[0] * df_ax[1] * f_ax[2],
                    f_ax[0] * f_ax[1] * df_ax[2],
                ],
                axis=-2,
            )  # [N, 3, F]
            feats.append(feat)
            dfeats.append(dfeat)
        out = jnp.concatenate(feats, axis=-1).astype(jnp.float32)
        dout = jnp.concatenate(dfeats, axis=-1).astype(jnp.float32)
        return (
            out.reshape(*batch_shape, cfg.out_dim),
            dout.reshape(*batch_shape, 3, cfg.out_dim),
        )

    def get_lines(self):
        """The [level][axis] line-param pytree — for callers that feed the
        params into a fused kernel (e.g. `fused_density_mlp`) instead of
        running the encode through this module."""
        return tuple(
            tuple(self.lines[lvl][ax] for ax in range(3))
            for lvl in range(len(self.config.resolutions))
        )

    @property
    def out_dim(self) -> int:
        return self.config.out_dim


def dfeat01_reference(
    cfg: FactorGridConfig,
    lines: Tuple[Tuple[jnp.ndarray, ...], ...],
    x01: jnp.ndarray,  # [N, 3]
) -> jnp.ndarray:
    """Pure-XLA d feat / d pos01 [N, 3, D] (hat/dhat GEMM expression) —
    the differentiable reference the fused grad kernel's backward matches."""
    dtype = jnp.dtype(cfg.compute_dtype)
    dfeats = []
    for lvl, res in enumerate(cfg.resolutions):
        f_ax, df_ax = [], []
        for ax in range(3):
            line = lines[lvl][ax].astype(dtype)
            f_ax.append(hat_matrix(x01[:, ax], res, dtype) @ line)
            df_ax.append(dhat_matrix(x01[:, ax], res, dtype) @ line)
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
    return jnp.concatenate(dfeats, axis=-1).astype(jnp.float32)  # [N, 3, D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def grad_encode_fused(cfg: FactorGridConfig, lines, x01: jnp.ndarray) -> jnp.ndarray:
    """DIFFERENTIABLE fused spatial-derivative encode: d feat / d pos01
    [N, 3, D] with a real backward (unlike `fused_factor_grad_tpu`, whose
    custom_vjp is zero — the fast_normals_losses detached path).

    Reference orientation-loss semantics backprop through the gradient
    normals into the line tables (models/nerfacto.py, fast_normals_losses=
    False); this wrapper keeps the fused Pallas forward AND routes the
    backward through the analytic Pallas VJP kernel
    (`fused_factor_grad_bwd_tpu`) on TPU, or through jax.vjp of the XLA
    expression elsewhere."""
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        packed = ffp.pack_tables(cfg.resolutions, lines)
        return ffp._fused_factor_grad_impl(
            cfg.resolutions,
            cfg.features_per_level,
            packed,
            x01,
            ffp.FORCE_INTERPRET,
        )
    return dfeat01_reference(cfg, lines, x01)


def _grad_encode_fused_fwd(cfg, lines, x01):
    return grad_encode_fused(cfg, lines, x01), (lines, x01)


def _grad_encode_fused_bwd(cfg, residuals, ct):
    lines, x01 = residuals
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        packed = ffp.pack_tables(cfg.resolutions, lines)
        grad_packed, grad_x = ffp.fused_factor_grad_bwd_tpu(
            cfg.resolutions,
            cfg.features_per_level,
            packed,
            x01,
            ct,
            ffp.FORCE_INTERPRET,
        )
        grad_lines = ffp.unpack_table_grads(
            cfg.resolutions, grad_packed, cfg.features_per_level
        )
        return grad_lines, grad_x
    _, vjp = jax.vjp(lambda l, x: dfeat01_reference(cfg, l, x), lines, x01)
    return vjp(ct)


grad_encode_fused.defvjp(_grad_encode_fused_fwd, _grad_encode_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def grad_encode_dot(
    cfg: FactorGridConfig, lines, x01: jnp.ndarray, g: jnp.ndarray
) -> jnp.ndarray:
    """Contracted differentiable spatial-derivative encode:
    s[n, ax] = <d feat / d pos01_ax, g[n]> -> [N, 3].

    The training loss consumes only the DENSITY channel's spatial gradient
    (gradient normals); with g the MLP's density-vs-features VJP row, this
    replaces `grad_encode_fused`'s [N, 3, D] output (plus two more [N, 3, D]
    chain intermediates outside the kernel) with a single [N, 3] result —
    round-5 profiling measured the normals path at 39.4 ms of the 92 ms
    signerf step, dominated by that HBM traffic. Backward flows into the
    line tables, the coords, AND g (so the MLP weights still receive their
    orientation-loss gradient), matching reference loss semantics
    (nerfstudio backprops through gradient normals into the density field;
    /root/reference/signerf/signerf.py:65-79 consumes them via
    rendered_orientation_loss)."""
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        packed = ffp.pack_tables(cfg.resolutions, lines)
        return ffp.fused_factor_grad_dot_tpu(
            cfg.resolutions,
            cfg.features_per_level,
            packed,
            x01,
            g,
            ffp.FORCE_INTERPRET,
        )
    return jnp.einsum(
        "njd,nd->nj", dfeat01_reference(cfg, lines, x01), g.astype(jnp.float32)
    )


def _grad_encode_dot_fwd(cfg, lines, x01, g):
    return grad_encode_dot(cfg, lines, x01, g), (lines, x01, g)


def _grad_encode_dot_bwd(cfg, residuals, ct):
    lines, x01, g = residuals
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        packed = ffp.pack_tables(cfg.resolutions, lines)
        grad_packed, grad_x, grad_g = ffp.fused_factor_grad_dot_bwd_tpu(
            cfg.resolutions,
            cfg.features_per_level,
            packed,
            x01,
            g,
            ct,
            ffp.FORCE_INTERPRET,
        )
        grad_lines = ffp.unpack_table_grads(
            cfg.resolutions, grad_packed, cfg.features_per_level
        )
        return grad_lines, grad_x, grad_g.astype(g.dtype)
    _, vjp = jax.vjp(
        lambda l, x, gg: jnp.einsum(
            "njd,nd->nj", dfeat01_reference(cfg, l, x), gg.astype(jnp.float32)
        ),
        lines,
        x01,
        g,
    )
    return vjp(ct)


grad_encode_dot.defvjp(_grad_encode_dot_fwd, _grad_encode_dot_bwd)


# ---------------------------------------------------------------------------
# fused encode + density-MLP (encode fused with the 2-layer bf16 head)
# ---------------------------------------------------------------------------


def mlp2_reference(feats: jnp.ndarray, ws) -> jnp.ndarray:
    """Exact-parity 2-layer bf16 MLP (== models.fields.MLP(num_layers=2) with
    compute_dtype=bfloat16): bf16 GEMM -> bf16 bias add -> ReLU -> bf16 GEMM
    -> bf16 bias add -> f32. `ws` = ((k0, b0), (k1, b1)) in flax Dense
    layout/fp32 params."""
    (k0, b0), (k1, b1) = ws
    x = feats.astype(jnp.bfloat16)
    h = jnp.maximum(x @ k0.astype(jnp.bfloat16) + b0.astype(jnp.bfloat16), 0)
    o = h @ k1.astype(jnp.bfloat16) + b1.astype(jnp.bfloat16)
    return o.astype(jnp.float32)


def density_mlp_reference(cfg: FactorGridConfig, lines, ws, x01) -> jnp.ndarray:
    """Pure-XLA reference for the fused encode+MLP path: [N, O] f32."""
    return mlp2_reference(_encode_reference(cfg, lines, x01), ws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_density_mlp(cfg: FactorGridConfig, lines, ws, x01) -> jnp.ndarray:
    """Encode + 2-layer MLP in one pass: [N, 3] pos01 -> [N, O] f32.

    On TPU backends BOTH passes are fully-fused Pallas kernels that never
    materialize the [N, D] feature matrix (or its cotangent) in HBM — the
    tiny-cuda-nn fully-fused capability the reference rides (SURVEY.md §2b
    row 1): forward `fused_factor_density_tpu`; backward
    `fused_factor_density_bwd_tpu` recomputes features in VMEM per block,
    takes the 2-layer MLP vjp in VMEM, and routes table/coordinate grads
    through the proven encode-backward bodies reading the in-VMEM cotangent.
    Off-TPU both passes use the XLA reference expression."""
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        packed = ffp.pack_tables(cfg.resolutions, lines)
        (k0, b0), (k1, b1) = ws
        return ffp.fused_factor_density_tpu(
            cfg.resolutions,
            cfg.features_per_level,
            packed,
            x01,
            k0,
            b0,
            k1,
            b1,
            ffp.FORCE_INTERPRET,
        )
    return density_mlp_reference(cfg, lines, ws, x01)


def _fused_density_mlp_fwd(cfg, lines, ws, x01):
    return fused_density_mlp(cfg, lines, ws, x01), (lines, ws, x01)


def _fused_density_mlp_bwd(cfg, residuals, g):
    lines, ws, x01 = residuals
    from signerf_tpu.ops import fused_factor_pallas as ffp

    if use_fused_kernel() or ffp.FORCE_INTERPRET:
        # Fully-fused backward: features and their cotangents stay in VMEM
        # (ffp.fused_factor_density_bwd_tpu section comment — the unfused
        # scheme paid four [N, D] f32 HBM round-trips per density field).
        packed = ffp.pack_tables(cfg.resolutions, lines)
        (k0, b0), (k1, b1) = ws
        grad_packed, (gk0, gb0, gk1, gb1), grad_x = (
            ffp.fused_factor_density_bwd_tpu(
                cfg.resolutions,
                cfg.features_per_level,
                packed,
                x01,
                k0,
                b0,
                k1,
                b1,
                g,
                ffp.FORCE_INTERPRET,
            )
        )
        grad_lines = ffp.unpack_table_grads(
            cfg.resolutions, grad_packed, cfg.features_per_level
        )
        return grad_lines, ((gk0, gb0), (gk1, gb1)), grad_x
    feats = _encode_reference(cfg, lines, x01)
    _, mlp_vjp = jax.vjp(mlp2_reference, feats, ws)
    g_feats, g_ws = mlp_vjp(g)
    _, evjp = jax.vjp(lambda l, x: _encode_reference(cfg, l, x), lines, x01)
    grad_lines, grad_x = evjp(g_feats)
    return grad_lines, g_ws, grad_x


fused_density_mlp.defvjp(_fused_density_mlp_fwd, _fused_density_mlp_bwd)
