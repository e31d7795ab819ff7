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


class MLP(nn.Module):
    """Plain ReLU MLP; bf16 compute / fp32 params by default."""

    hidden_dim: int
    num_layers: int  # total Dense layers (>=1)
    out_dim: int
    out_activation: Optional[str] = None  # None | "sigmoid"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
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

    def density(self, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """positions [..., 3] world -> (density [...], geo_feat [..., G])."""
        pos01 = contract_to_unit(positions)
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
        density, geo = self.density(positions)
        num_s = positions.shape[-2]
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
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        pos01 = contract_to_unit(positions)
        if self.encoding_backend == "factor":
            from signerf_tpu.ops.factor_grid import (
                FactorGridConfig,
                FactorGridEncoding,
            )

            feats = FactorGridEncoding(
                FactorGridConfig(
                    num_levels=self.num_levels,
                    base_res=self.base_res,
                    max_res=self.max_res,
                    features_per_level=self.factor_features_per_level,
                )
            )(pos01)
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
