"""Neural fields: nerfacto hash-grid field and the proposal density field.

Capability parity (SURVEY.md §2b "Nerfacto model"): the reference relies on
nerfstudio's `NerfactoField` (tiny-cuda-nn hash encoding + fused MLPs) and
`HashMLPDensityField` proposal networks, consumed via `NerfactoModel`
(/root/reference/signerf/signerf.py:12). Re-designed here as flax linen
modules over the XLA hash-grid op in `signerf_tpu/ops/hashgrid.py`.

TPU-first: MLPs run in bfloat16 (params fp32) so they tile onto the MXU;
the per-sample batch is flattened to [R*S, C] before the matmuls so XLA sees
one large GEMM per layer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from signerf_tpu.ops.contraction import contract_to_unit, normalize_aabb
from signerf_tpu.ops.hashgrid import hashgrid_resolutions, hashgrid_encode
from signerf_tpu.ops.sh import sh_encode


@jax.custom_jvp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with clamped input and derivative (instant-ngp density activation).

    The value clamp (x <= 15, density <= 3.3e6 — far beyond opaque) prevents
    inf densities when optimization spikes a hash entry; the derivative clamp
    matches instant-ngp/nerfstudio `trunc_exp`. Defined via custom_jvp (not
    custom_vjp) so BOTH differentiation modes work — gradient normals use
    forward-mode JVPs through the density.
    """
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    y = jnp.exp(jnp.clip(x, -15.0, 15.0))
    return y, t * y


class DenseParams(nn.Module):
    """Declares exactly the params of an `nn.Dense` (same names, shapes,
    initializers) and returns them as arrays instead of computing — lets a
    parent hand the weights to a fused kernel while keeping the param tree
    bit-identical to the Dense-computed path."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_dim, self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class MLP(nn.Module):
    """Plain ReLU MLP; bf16 compute / fp32 params by default."""

    hidden_dim: int
    num_layers: int  # total Dense layers (>=1)
    out_dim: int
    out_activation: Optional[str] = None  # None | "sigmoid"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray] = None,
        *,
        in_dim: Optional[int] = None,
        return_weights: bool = False,
    ):
        """Default: apply the MLP to `x`. With `return_weights=True` (and
        `in_dim` giving the input width), declare the SAME param tree via
        `DenseParams` children and return ((k0, b0), ...) for a fused-kernel
        caller (`ops/factor_grid.fused_density_mlp`). Both modes create
        identical params, so checkpoints are interchangeable."""
        if return_weights:
            assert in_dim is not None
            dims = [in_dim] + [self.hidden_dim] * (self.num_layers - 1) + [
                self.out_dim
            ]
            return tuple(
                DenseParams(dims[i], dims[i + 1], name=f"dense_{i}")()
                for i in range(self.num_layers)
            )
        orig_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.compute_dtype, name=f"dense_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.out_dim, dtype=self.compute_dtype, name=f"dense_{self.num_layers - 1}"
        )(x)
        x = x.astype(orig_dtype)
        if self.out_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x


class HashGridEncoding(nn.Module):
    """Learned multires hash table as a linen param around the XLA op."""

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048

    @nn.compact
    def __call__(self, positions01: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "table",
            lambda key: jax.random.uniform(
                key,
                (self.num_levels, 2**self.log2_hashmap_size, self.features_per_level),
                jnp.float32,
                minval=-1e-4,
                maxval=1e-4,
            ),
        )
        res = hashgrid_resolutions(self.num_levels, self.base_res, self.max_res)
        return hashgrid_encode(table, positions01, res)

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level


class NerfactoField(nn.Module):
    """Density + color field with appearance embedding and optional normals.

    `__call__(positions, directions, camera_indices, train)` returns a dict:
    density [R,S], rgb [R,S,3], (pred_normals [R,S,3] if predict_normals).
    Gradient normals are computed by the caller via `density_fn` autodiff.
    """

    num_images: int
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    hidden_dim_color: int = 64
    num_layers_color: int = 3
    appearance_embed_dim: int = 32
    use_appearance_embedding: bool = True
    average_appearance_embedding: bool = True  # eval uses mean embedding
    predict_normals: bool = False
    sh_levels: int = 4
    average_init_density: float = 1.0
    # "factor" = MXU factorized grid (TPU-fast default, ops/factor_grid.py);
    # "hash" = instant-ngp semantics-parity path (gather-bound on TPU).
    encoding_backend: str = "factor"
    factor_features_per_level: int = 16
    factor_num_levels: int = 8
    # Debug escape hatch: force the unfused XLA encode+MLP path even on TPU
    # (the fused Pallas path is also skipped automatically for configs the
    # kernel doesn't support — see ops/factor_grid.fused_density_eligible).
    use_fused_density: bool = True
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        if self.encoding_backend == "factor":
            from signerf_tpu.ops.factor_grid import (
                FactorGridConfig,
                FactorGridEncoding,
            )

            self.encoding = FactorGridEncoding(
                FactorGridConfig(
                    num_levels=self.factor_num_levels,
                    base_res=self.base_res,
                    max_res=self.max_res,
                    features_per_level=self.factor_features_per_level,
                )
            )
        else:
            self.encoding = HashGridEncoding(
                num_levels=self.num_levels,
                features_per_level=self.features_per_level,
                log2_hashmap_size=self.log2_hashmap_size,
                base_res=self.base_res,
                max_res=self.max_res,
            )
        self.mlp_base = MLP(
            hidden_dim=self.hidden_dim,
            num_layers=2,
            out_dim=1 + self.geo_feat_dim,
            compute_dtype=self.compute_dtype,
        )
        self.mlp_head = MLP(
            hidden_dim=self.hidden_dim_color,
            num_layers=self.num_layers_color,
            out_dim=3,
            out_activation="sigmoid",
            compute_dtype=self.compute_dtype,
        )
        if self.use_appearance_embedding:
            # Small init matters: flax's default Embed init is N(0,1), which
            # makes per-image codes dominate the color MLP input; the
            # eval-time *mean* embedding is then far out of distribution
            # (measured: 14.7 dB eval vs 36.5 dB with small codes on the
            # synthetic fit). N(0, 0.01) keeps the capability and the
            # train/eval renders consistent.
            self.appearance = nn.Embed(
                self.num_images,
                self.appearance_embed_dim,
                embedding_init=nn.initializers.normal(0.01),
                name="appearance",
            )
        if self.predict_normals:
            self.mlp_pred_normals = MLP(
                hidden_dim=64,
                num_layers=3,
                out_dim=3,
                compute_dtype=self.compute_dtype,
            )

    def density(
        self, positions: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """positions [..., 3] world -> (density [...], geo_feat [..., G]).

        On TPU with the factor backend, encode + base MLP run as ONE fused
        Pallas kernel (`ops/factor_grid.fused_density_mlp`) — the [N, 256]
        feature matrix never touches HBM; only the [N, 1+G] head output
        does. Elsewhere: fused/XLA encode followed by the flax MLP (same
        param tree either way — MLP(return_weights=True) declares identical
        params).
        """
        del train
        pos01 = contract_to_unit(positions)
        if self.encoding_backend == "factor":
            from signerf_tpu.ops.factor_grid import (
                fused_density_eligible,
                fused_density_mlp,
                use_fused_kernel,
            )

            cfg = self.encoding.config
            if (
                self.use_fused_density
                and fused_density_eligible(cfg, self.hidden_dim)
                and use_fused_kernel()
            ):
                ws = self.mlp_base(in_dim=cfg.out_dim, return_weights=True)
                x = jnp.clip(pos01.reshape(-1, 3), 0.0, 1.0)
                h = fused_density_mlp(
                    cfg, self.encoding.get_lines(), ws, x
                ).reshape(*pos01.shape[:-1], 1 + self.geo_feat_dim)
                density = self.average_init_density * trunc_exp(h[..., 0] - 1.0)
                return density, h[..., 1:]
        feats = self.encoding(pos01)
        h = self.mlp_base(feats)
        # nerfstudio parity: density = average_init_density * trunc_exp(x)
        # (signerf sets average_init_density=0.01, signerf_config.py:40).
        density = self.average_init_density * trunc_exp(h[..., 0] - 1.0)
        return density, h[..., 1:]

    def __call__(
        self,
        positions: jnp.ndarray,  # [R, S, 3]
        directions: jnp.ndarray,  # [R, 3] unit
        camera_indices: Optional[jnp.ndarray],  # [R] int32
        train: bool = False,
        appearance_mode: Optional[str] = None,  # "index" | "mean" | "zero"
    ):
        density, geo = self.density(positions, train=train)
        return self.head_only(
            density, geo, directions, camera_indices, train, appearance_mode
        )

    def head_only(
        self,
        density: jnp.ndarray,  # [R, S]
        geo: jnp.ndarray,  # [R, S, G]
        directions: jnp.ndarray,
        camera_indices: Optional[jnp.ndarray],
        train: bool = False,
        appearance_mode: Optional[str] = None,
    ):
        """Color/pred-normal heads over a precomputed (density, geo) — the
        entry point when density+gradients come from the analytic factor
        path (`factor_density_geo_and_grad`)."""
        num_s = geo.shape[-2]
        d_enc = sh_encode(directions, self.sh_levels)  # [R, 16]
        d_enc = jnp.broadcast_to(d_enc[..., None, :], (*density.shape, d_enc.shape[-1]))

        head_in = [d_enc, geo]
        if self.use_appearance_embedding:
            # Mode resolution: training uses the ray's own image code; eval
            # defaults to the mean code (nerfstudio parity) but callers that
            # render *known train cameras* (the dataset generator) should
            # pass "index" — the color MLP co-adapts to per-image codes and
            # the mean is measurably off-manifold (37 dB vs 14 dB on a
            # consistent scene).
            if appearance_mode is None:
                appearance_mode = (
                    "index" if (train and camera_indices is not None) else "mean"
                )
            if appearance_mode == "index" and camera_indices is not None:
                embed = self.appearance(camera_indices)  # [R, A]
            elif appearance_mode == "zero":
                embed = jnp.zeros(
                    (*density.shape[:-1], self.appearance_embed_dim)
                )
            else:
                mean = jnp.mean(self.appearance.embedding, axis=0)
                embed = jnp.broadcast_to(
                    mean, (*density.shape[:-1], self.appearance_embed_dim)
                )
            embed = jnp.broadcast_to(
                embed[..., None, :], (*density.shape, self.appearance_embed_dim)
            )
            head_in.append(embed)
        rgb = self.mlp_head(jnp.concatenate(head_in, axis=-1))

        out = {"density": density, "rgb": rgb}
        if self.predict_normals:
            pn = self.mlp_pred_normals(jnp.concatenate([geo, d_enc], axis=-1))
            norm = jnp.linalg.norm(pn, axis=-1, keepdims=True)
            out["pred_normals"] = pn / jnp.maximum(norm, 1e-6)
        del num_s
        return out


def factor_density_geo_and_grad(
    field_params,
    positions: jnp.ndarray,  # [..., 3] world
    field: "NerfactoField",
    differentiable_grad: bool = False,
):
    """(density [...], geo [..., G], ddensity/dx [..., 3]) with ANALYTIC
    spatial gradients — no autodiff through the encode.

    Chain: world x -> contract_to_unit (jacobian via 3 cheap elementwise
    JVPs) -> factor encode (dhat @ line GEMMs, ops/factor_grid) -> base MLP
    (manual forward-mode through 2 Dense+ReLU) -> trunc_exp chain.
    Pure function over the field's param subtree so it composes with the
    training loss as ordinary first-order reverse-mode (the jax.grad-based
    normals made the loss second-order, measured ~2x the whole train step).

    ``differentiable_grad``: when True, the returned ddensity/dx supports
    reverse-mode wrt the encoding tables — required by the reference
    orientation-loss semantics (nerfstudio backprops through the gradient
    normals into the density field). On TPU this routes through
    `grad_encode_fused` (fused Pallas forward + analytic Pallas VJP
    backward); off-TPU through the XLA hat/dhat expression. When False
    (eval, or fast_normals_losses=True), the forward-only fused kernel is
    used with its output detached.
    """
    from signerf_tpu.ops.factor_grid import (
        FactorGridConfig,
        dhat_matrix,
        hat_matrix,
    )

    assert field.encoding_backend == "factor"
    cfg = FactorGridConfig(
        num_levels=field.factor_num_levels,
        base_res=field.base_res,
        max_res=field.max_res,
        features_per_level=field.factor_features_per_level,
    )
    dtype = field.compute_dtype
    batch_shape = positions.shape[:-1]
    x = positions.reshape(-1, 3)

    # contraction + jacobian (3 elementwise JVPs; contract is trivial math)
    pos01 = contract_to_unit(x)
    eye = jnp.eye(3, dtype=x.dtype)
    jac_cols = [
        jax.jvp(contract_to_unit, (x,), (jnp.broadcast_to(eye[i], x.shape),))[1]
        for i in range(3)
    ]  # each [N, 3] = d pos01 / d x_i

    enc_params = field_params["encoding"]
    from signerf_tpu.ops import fused_factor_pallas as ffp
    from signerf_tpu.ops.factor_grid import (
        _encode_fused,
        use_fused_kernel,
    )

    fused = use_fused_kernel() or ffp.FORCE_INTERPRET
    dfeat01 = None
    if fused:
        # Fused Pallas path: primal through the differentiable encode kernel
        # (custom_vjp); spatial derivatives through the CONTRACTED grad-dot
        # kernel (grad_encode_dot) below — only the density channel's
        # spatial gradient is consumed, so the kernel contracts
        # dfeat01 [N, 3, D] with the MLP's density-vs-features VJP row in
        # VMEM and emits just [N, 3] (round-5: the uncontracted
        # grad_encode_fused path's [N, 3, D] HBM round-trips were 39.4 ms
        # of the 92 ms signerf step). differentiable_grad=True keeps the
        # kernel's custom_vjp live (reference orientation-loss semantics
        # backprop through the normals into the lines AND the MLP weights
        # via grad_g); False detaches the contraction output (eval /
        # fast_normals_losses).
        lines_t = tuple(
            tuple(enc_params[f"line_{lvl}_{ax}"] for ax in range(3))
            for lvl in range(len(cfg.resolutions))
        )
        feat = _encode_fused(cfg, lines_t, pos01)  # [N, D]
    else:
        feats = []
        dfeats01 = []  # derivative wrt pos01 axes
        for lvl, res in enumerate(cfg.resolutions):
            f_ax, df_ax = [], []
            for ax in range(3):
                line = enc_params[f"line_{lvl}_{ax}"].astype(dtype)
                f_ax.append(hat_matrix(pos01[:, ax], res, dtype) @ line)
                df_ax.append(dhat_matrix(pos01[:, ax], res, dtype) @ line)
            feats.append(f_ax[0] * f_ax[1] * f_ax[2])
            dfeats01.append(
                jnp.stack(
                    [
                        df_ax[0] * f_ax[1] * f_ax[2],
                        f_ax[0] * df_ax[1] * f_ax[2],
                        f_ax[0] * f_ax[1] * df_ax[2],
                    ],
                    axis=-2,
                )
            )
        feat = jnp.concatenate(feats, axis=-1).astype(jnp.float32)  # [N, D]
        dfeat01 = jnp.concatenate(dfeats01, axis=-1).astype(jnp.float32)

    jac = jnp.stack(jac_cols, axis=-1)  # [N, 3(pos01 j), 3(world i)]

    # base MLP forward (2 Dense + ReLU)
    mlp = field_params["mlp_base"]
    w0 = mlp["dense_0"]["kernel"].astype(dtype)
    b0 = mlp["dense_0"]["bias"].astype(dtype)
    w1 = mlp["dense_1"]["kernel"].astype(dtype)
    b1 = mlp["dense_1"]["bias"].astype(dtype)
    f16 = feat.astype(dtype)
    h0 = f16 @ w0 + b0
    a0 = jnp.maximum(h0, 0)
    h1 = (a0 @ w1 + b1).astype(jnp.float32)  # [N, 1+G]
    relu_mask = (h0 > 0).astype(dtype)

    if fused:
        # Density-channel VJP row through the MLP:
        # g[n, d] = sum_k w0[d, k] * relu_mask[n, k] * w1[k, 0]; then the
        # grad-dot kernel contracts it against dfeat01 in VMEM:
        # s01[n, j] = d h1_0 / d pos01_j. Chain to world axes afterwards.
        from signerf_tpu.ops.factor_grid import grad_encode_dot

        m = relu_mask * w1[:, 0][None, :]  # [N, H]
        g = (m @ w0.T).astype(jnp.float32)  # [N, D]
        s01 = grad_encode_dot(cfg, lines_t, pos01, g)  # [N, 3]
        if not differentiable_grad:
            s01 = jax.lax.stop_gradient(s01)
        dh0 = jnp.einsum("nj,nji->ni", s01, jac).astype(jnp.float32)
    else:
        # chain rule to world axes:
        # dfeat/dx_i = sum_j dfeat01[:, j] * J[:, j, i]
        dfeat_x = jnp.einsum("njd,nji->nid", dfeat01, jac)  # [N, 3, D]
        dh = (
            (dfeat_x.astype(dtype) @ w0) * relu_mask[:, None, :]
        ) @ w1  # [N, 3, 1+G]
        dh0 = dh[..., 0].astype(jnp.float32)  # [N, 3]

    raw = h1[..., 0] - 1.0
    density = field.average_init_density * trunc_exp(raw)
    inside = ((raw > -15.0) & (raw < 15.0)).astype(jnp.float32)
    ddensity = density[..., None] * dh0 * inside[..., None]  # [N, 3]
    geo = h1[..., 1:]

    return (
        density.reshape(batch_shape),
        geo.reshape(*batch_shape, -1),
        ddensity.reshape(*batch_shape, 3),
    )


class HashMLPDensityField(nn.Module):
    """Small density-only field used as a proposal network."""

    num_levels: int = 5
    features_per_level: int = 2
    log2_hashmap_size: int = 17
    base_res: int = 16
    max_res: int = 128
    hidden_dim: int = 16
    use_linear: bool = False
    encoding_backend: str = "factor"
    factor_features_per_level: int = 8
    use_fused_density: bool = True  # debug escape hatch, see NerfactoField
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, positions: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pos01 = contract_to_unit(positions)
        if self.encoding_backend == "factor":
            from signerf_tpu.ops.factor_grid import (
                FactorGridConfig,
                FactorGridEncoding,
                fused_density_eligible,
                fused_density_mlp,
                use_fused_kernel,
            )

            cfg = FactorGridConfig(
                num_levels=self.num_levels,
                base_res=self.base_res,
                max_res=self.max_res,
                features_per_level=self.factor_features_per_level,
            )
            enc = FactorGridEncoding(cfg)
            if (
                not self.use_linear
                and self.use_fused_density
                and fused_density_eligible(cfg, self.hidden_dim)
                and use_fused_kernel()
            ):
                # Fused encode+MLP kernel: density logits come straight out
                # of VMEM ([N, 1] instead of an [N, D] f32 feature matrix +
                # transpose + XLA MLP — the proposal fields evaluate 256
                # samples/ray, so this path is the render hot spot).
                mlp = MLP(
                    hidden_dim=self.hidden_dim,
                    num_layers=2,
                    out_dim=1,
                    compute_dtype=self.compute_dtype,
                )
                ws = mlp(in_dim=cfg.out_dim, return_weights=True)
                x = jnp.clip(pos01.reshape(-1, 3), 0.0, 1.0)
                h = fused_density_mlp(cfg, enc.get_lines(), ws, x).reshape(
                    *pos01.shape[:-1], 1
                )
                return trunc_exp(h[..., 0] - 1.0)
            feats = enc(pos01)
        else:
            feats = HashGridEncoding(
                num_levels=self.num_levels,
                features_per_level=self.features_per_level,
                log2_hashmap_size=self.log2_hashmap_size,
                base_res=self.base_res,
                max_res=self.max_res,
            )(pos01)
        if self.use_linear:
            h = nn.Dense(1, dtype=self.compute_dtype)(
                feats.astype(self.compute_dtype)
            ).astype(feats.dtype)
        else:
            h = MLP(
                hidden_dim=self.hidden_dim,
                num_layers=2,
                out_dim=1,
                compute_dtype=self.compute_dtype,
            )(feats)
        return trunc_exp(h[..., 0] - 1.0)
