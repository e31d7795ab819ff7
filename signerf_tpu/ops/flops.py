"""Analytic MXU-FLOPs accounting for the nerfacto render/train paths.

WHY ANALYTIC: the hot encode runs as Pallas kernels
(`ops/fused_factor_pallas.py`), which XLA's `compiled.cost_analysis()`
counts as zero-FLOP custom calls — on this backend it reports ~56 kFLOP/ray
when the executed GEMMs are ~50 MFLOP/ray.  These functions enumerate the
*executed* MXU GEMM shapes (including tile padding and the 9-tap block
redundancy of the large-level path), so `bench.py` can report an honest
MXU-utilization number and point at the next kernel target.

Conventions:
- counts multiply-add = 2 FLOPs, GEMM [M,K]x[K,N] = 2*M*K*N;
- only MXU GEMMs are counted (hat construction, tap blending, softplus etc.
  are VPU elementwise and excluded);
- backward factors are exact from the kernel structure: the tables-grad
  kernel re-runs every forward GEMM once and adds one same-shape grad GEMM
  per (axis, level) => bwd = 2x fwd (`_make_bwd_kernel`); Dense bwd is the
  usual dL/dW + dL/dx pair => 2x fwd.

Reference parity note: the reference has no FLOPs accounting at all; this
subsystem corresponds to VERDICT.md round-1 item #9.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

from signerf_tpu.ops.factor_grid import FactorGridConfig
from signerf_tpu.ops.fused_factor_pallas import (
    SMALL_MAX_RES,
    TAP_BLOCK,
    _num_blocks,
    _round_up,
)


def mlp_flops(dims: Sequence[int]) -> int:
    """Per-sample GEMM FLOPs of a Dense chain with layer widths `dims`
    (input, hidden..., out)."""
    return sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))


def factor_encode_flops(cfg: FactorGridConfig) -> int:
    """Per-sample forward FLOPs of the fused factor-grid encode, as executed
    by `fused_factor_encode_tpu` (packed small-level GEMM + per-large-level
    9-tap block GEMMs, incl. 8-row tile padding)."""
    res = cfg.resolutions
    small = [r for r in res if r <= SMALL_MAX_RES]
    large = [r for r in res if r > SMALL_MAX_RES]
    f = cfg.features_per_level
    total = 0
    if small:
        r_s_pad = _round_up(sum(small), 8)
        total += 3 * 2 * (len(small) * f) * r_s_pad
    for r in large:
        r1_pad = _round_up(_num_blocks(r), 8)
        total += 3 * 2 * ((TAP_BLOCK + 1) * f) * r1_pad
    return total


@dataclasses.dataclass(frozen=True)
class NerfactoFlops:
    """Per-ray FLOPs breakdown for one nerfacto model configuration.

    `render` is the eval/forward path; `train` additionally counts the
    backward pass (encode bwd = 2x fwd via the tables kernel; Dense bwd =
    2x fwd; coords-grad kernel is dead-code-eliminated with camera-opt
    off, matching the benched configuration).
    """

    field_encode: int  # per nerf sample
    field_mlps: int  # per nerf sample (base + color head)
    proposal: Tuple[int, ...]  # per proposal sample, one entry per net

    nerf_samples: int
    proposal_samples: Tuple[int, ...]

    @property
    def render_per_ray(self) -> int:
        per = self.nerf_samples * (self.field_encode + self.field_mlps)
        for n, f in zip(self.proposal_samples, self.proposal):
            per += n * f
        return per

    @property
    def train_per_ray(self) -> int:
        per = self.nerf_samples * (3 * self.field_encode + 3 * self.field_mlps)
        for n, f in zip(self.proposal_samples, self.proposal):
            per += n * 3 * f
        return per


def nerfacto_flops(model_config) -> NerfactoFlops:
    """Build the per-ray FLOPs model from a `NerfactoModelConfig`.

    Mirrors the module construction in `models/nerfacto.py` /
    `models/fields.py` (factor backend): field encode 8 levels x 16 feats,
    base MLP enc->64->16, color head (16 SH + 15 geo + 32 appearance)->
    64->64->3, proposal nets 5 levels x 8 feats + enc->16->1 MLP.
    """
    from signerf_tpu.models.fields import HashMLPDensityField, NerfactoField

    c = model_config
    field_cfg = FactorGridConfig(
        num_levels=NerfactoField.factor_num_levels,
        base_res=c.base_res,
        max_res=c.max_res,
        features_per_level=NerfactoField.factor_features_per_level,
    )
    enc_dim = field_cfg.out_dim
    geo = NerfactoField.geo_feat_dim
    sh_dim = (NerfactoField.sh_levels) ** 2  # sh_encode dim = levels^2
    head_in = sh_dim + geo + (
        c.appearance_embed_dim if c.use_appearance_embedding else 0
    )
    field_mlps = mlp_flops([enc_dim, c.hidden_dim, 1 + geo]) + mlp_flops(
        [head_in, c.hidden_dim_color, c.hidden_dim_color, 3]
    )
    if c.predict_normals:
        field_mlps += mlp_flops([geo + sh_dim, 64, 64, 3])

    prop = []
    for args in c.proposal_net_args_list:
        pcfg = FactorGridConfig(
            num_levels=args.num_levels,
            base_res=16,
            max_res=args.max_res,
            features_per_level=HashMLPDensityField.factor_features_per_level,
        )
        if args.use_linear:
            pmlp = mlp_flops([pcfg.out_dim, 1])
        else:
            pmlp = mlp_flops([pcfg.out_dim, args.hidden_dim, 1])
        prop.append(factor_encode_flops(pcfg) + pmlp)

    return NerfactoFlops(
        field_encode=factor_encode_flops(field_cfg),
        field_mlps=field_mlps,
        proposal=tuple(prop),
        nerf_samples=c.num_nerf_samples_per_ray,
        proposal_samples=tuple(c.num_proposal_samples_per_ray),
    )


def mxu_util(flops_per_ray: float, rays_per_sec: float, peak_flops: float) -> float:
    """Executed-GEMM MXU utilization in percent."""
    return 100.0 * flops_per_ray * rays_per_sec / peak_flops


def breakdown_str(f: NerfactoFlops) -> str:
    """Human-readable per-ray budget — where the next kernel hour goes."""
    rows = [
        ("field encode", f.nerf_samples * f.field_encode),
        ("field MLPs", f.nerf_samples * f.field_mlps),
    ]
    for i, (n, fl) in enumerate(zip(f.proposal_samples, f.proposal)):
        rows.append((f"proposal {i} ({n} samples)", n * fl))
    total = f.render_per_ray
    return "\n".join(
        f"  {name:24s} {fl/1e6:8.2f} MFLOP/ray  ({100*fl/total:4.1f}%)"
        for name, fl in rows
    )
