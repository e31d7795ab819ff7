"""Pallas TPU kernel for the factorized (CP) grid encoding.

The XLA path (ops/factor_grid.py) materializes every level's [N, R]
interpolation ("hat") matrix in HBM before the GEMM — for the field encoding
that is ~N * sum(R_l) * 3 axes of bf16 traffic (GBs per render chunk), which
caps throughput well below the MXU. This kernel builds each hat tile
directly in VMEM (broadcasted-iota + VPU elementwise), feeds the MXU with
it, and only ever writes the [N, L*F] result to HBM:

    per sample block B, per level l, per axis a:
        u     = x[:, a] * (R_l - 1)                       (VPU)
        hat   = relu(1 - |u - iota_R|)        [B, R_l]     (VPU, VMEM only)
        f_a   = hat @ line_{l,a}              [B, F]       (MXU)
    out[:, l*F:(l+1)*F] = f_x * f_y * f_z

All line tables together are tiny (sum_R * F * 3 floats ~ hundreds of KB)
and stay resident in VMEM across the whole grid.

The public entry `factor_encode_pallas` carries a custom VJP whose backward
is pure-XLA GEMM math (hat^T @ cotangent per level/axis — same structural
trick, no scatter-add), so training works end to end; the forward hot path
(rendering, proposal evals under stop_gradient) takes the kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from signerf_tpu.ops.factor_grid import hat_matrix

_BLOCK = 1024  # samples per grid step


def _kernel(x_ref, *refs, resolutions: Tuple[int, ...], feat: int):
    """x_ref [B, 3]; refs = (line_0_x, line_0_y, line_0_z, line_1_x, ...,
    out_ref)."""
    out_ref = refs[-1]
    line_refs = refs[:-1]
    x = x_ref[:]  # [B, 3]
    b = x.shape[0]
    for lvl, res in enumerate(resolutions):
        prod = None
        for ax in range(3):
            line = line_refs[lvl * 3 + ax][:]  # [R, F]
            u = jnp.clip(x[:, ax], 0.0, 1.0) * (res - 1)  # [B]
            iota = jax.lax.broadcasted_iota(jnp.int32, (b, res), 1).astype(
                jnp.float32
            )
            hat = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - iota))
            f = jnp.dot(
                hat.astype(jnp.bfloat16),
                line.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [B, F]
            prod = f if prod is None else prod * f
        out_ref[:, lvl * feat : (lvl + 1) * feat] = prod


def _forward(
    x01: jnp.ndarray,  # [N, 3]
    lines: Sequence[jnp.ndarray],  # L*3 tables [R_l, F], level-major
    resolutions: Tuple[int, ...],
) -> jnp.ndarray:
    feat = lines[0].shape[-1]
    n = x01.shape[0]
    num_levels = len(resolutions)
    pad = (-n) % _BLOCK
    x_p = jnp.pad(x01, ((0, pad), (0, 0))) if pad else x01
    n_p = x_p.shape[0]
    grid = n_p // _BLOCK

    kernel = functools.partial(_kernel, resolutions=resolutions, feat=feat)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        + [
            # whole table per step; index_map constant so it is loaded once
            pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for t in lines
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK, num_levels * feat), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_p, num_levels * feat), jnp.float32),
    )(x_p, *lines)
    return out[:n]


def _forward_ref(x01, lines, resolutions):
    """Pure-XLA reference (same math; used for VJP residual-free backward)."""
    feat = lines[0].shape[-1]
    outs = []
    for lvl, res in enumerate(resolutions):
        prod = None
        for ax in range(3):
            hat = hat_matrix(x01[:, ax], res, jnp.bfloat16)
            f = (hat @ lines[lvl * 3 + ax].astype(jnp.bfloat16)).astype(
                jnp.float32
            )
            prod = f if prod is None else prod * f
        outs.append(prod)
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def factor_encode_pallas(x01, lines_tuple, resolutions):
    return _forward(x01, list(lines_tuple), resolutions)


def _fwd(x01, lines_tuple, resolutions):
    return _forward(x01, list(lines_tuple), resolutions), (x01, lines_tuple)


def _bwd(resolutions, residuals, g):
    x01, lines_tuple = residuals
    # Backward via XLA autodiff of the reference formulation (GEMM-shaped:
    # d_line = hat^T @ (g * other-axes product); d_x via the hat derivative).
    _, vjp = jax.vjp(
        lambda x, ls: _forward_ref(x, ls, resolutions), x01, lines_tuple
    )
    dx, dlines = vjp(g)
    return dx, dlines


factor_encode_pallas.defvjp(_fwd, _bwd)
