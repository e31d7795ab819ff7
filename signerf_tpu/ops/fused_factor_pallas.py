"""Fused Pallas TPU kernel for the factorized multiresolution grid encoding.

Replaces the XLA path in `ops/factor_grid.py` for the encode *forward*
(capability parity target: the tiny-cuda-nn hash-encoding forward the
reference reaches through nerfstudio's NerfactoField — /root/reference/
signerf/signerf.py:12 via nerfstudio.models.nerfacto; here re-designed as a
CP factor grid, see ops/factor_grid.py's header for the measured rationale).

Why a kernel: the XLA path materializes per-level interpolation ("hat")
matrices of shape [N, res] in HBM before each GEMM and builds them with
O(N * sum_res) VPU ops. Measured on v5e: the final-field encode alone is
8.3 ms per 8192-ray render chunk (~31%), and the two proposal encodes are
another 9.7 ms (~36%). This kernel fuses everything into VMEM and cuts the
VPU work with a two-stage gather:

- Levels with res <= 128 ("small"): one block-diagonal GEMM per axis —
  hat rows for all small levels are built side by side in VMEM
  ([R_small, BLK]) and multiplied against a block-diagonal line table
  ([n_small*F, R_small]), so one MXU dot yields every small level's
  features at once.
- Levels with res > 128 ("large"): linear interpolation at resolution R is
  factored as (a) a one-hot GEMM over ceil((R-1)/8) *overlapping row blocks*
  of the line table (rows 8a..8a+8, so the interpolation neighborhood never
  crosses a block boundary), then (b) a 9-tap fine hat applied on the VPU.
  VPU cost per sample drops from O(R) to O(R/8 + 9F).

Orientation: the kernel is TRANSPOSED — samples run along lanes, features/
grid rows along sublanes. Per-sample scalars (coordinates, block indices,
fine offsets) are then [1, BLK] rows (one vreg) instead of [BLK, 1] columns
(which Mosaic pads to 128 lanes: 0.5 MB each — the naive orientation blew
the 16 MB VMEM budget). The kernel emits features as [D, N]; the wrapper
transposes back to [N, D] in XLA (one pass over the output).

Numerics match the XLA path's bf16-GEMM contract: hat/one-hot weights are
computed in f32 and cast to bf16 for the MXU, accumulation in f32.

Backward: this file also implements the Pallas backward (see "backward
kernel" section below — `fused_factor_encode_bwd_tpu`, recompute-style
table + coordinate grads, plus the analytic-normals d(density)/d(position)
kernels). Dispatch lives in factor_grid.py's `jax.custom_vjp`
(`_encode_fused_bwd`): on TPU backends (`use_fused_kernel()`) both passes
run these kernels; on CPU/GPU both fall back to the XLA reference path.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Levels at or below this resolution use the dense-hat path (full [res]-row
# hat built per block); above it, the 9-tap block-gather path. Round-5 A/B
# on v5e (see commit message): the dense hat *construction* is VPU-bound at
# ~res rows x 1024 lanes x 3 axes per block, so moving 76/128-res levels to
# the tap path cut the proposal0 fused density time. Env-overridable for
# tuning sweeps.
SMALL_MAX_RES = int(os.environ.get("SIGNERF_SMALL_MAX_RES", "64"))
TAP_BLOCK = 8  # coarse block width for large levels (9 taps incl. overlap)

# Test hook: force pallas interpret mode (runs the kernel as traced jax ops,
# so CPU CI can execute it). Read at trace time by the factor_grid wrapper.
FORCE_INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_levels(resolutions: Sequence[int]) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    small = tuple(r for r in resolutions if r <= SMALL_MAX_RES)
    large = tuple(r for r in resolutions if r > SMALL_MAX_RES)
    # levels are sorted ascending by construction (geometric schedule)
    assert tuple(resolutions) == small + large, "resolutions must be ascending"
    return small, large


def _num_blocks(res: int) -> int:
    return max(1, math.ceil((res - 1) / TAP_BLOCK))


def pack_small_lines(lines: Sequence[jnp.ndarray], dtype=jnp.bfloat16) -> jnp.ndarray:
    """Transposed block-diagonal [n_small*F, R_small_pad] line table."""
    f = lines[0].shape[1]
    r_tot = sum(l.shape[0] for l in lines)
    r_pad = _round_up(r_tot, 8)
    out = jnp.zeros((len(lines) * f, r_pad), dtype)
    off = 0
    for i, line in enumerate(lines):
        out = out.at[i * f : (i + 1) * f, off : off + line.shape[0]].set(
            line.astype(dtype).T
        )
        off += line.shape[0]
    return out


def small_meta(resolutions: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Per-packed-row (scale, offset) columns for the fused small-level hat.

    hatT[j, n] = relu(1 - |u_n * scale[j] - offset[j]|); padded rows get
    scale 0 / offset 2 so their hat value is exactly 0.
    """
    r_tot = sum(resolutions)
    r_pad = _round_up(r_tot, 8)
    scale = np.full((r_pad, 1), 0.0, np.float32)
    offset = np.full((r_pad, 1), 2.0, np.float32)
    off = 0
    for res in resolutions:
        scale[off : off + res, 0] = res - 1
        offset[off : off + res, 0] = np.arange(res, dtype=np.float32)
        off += res
    return scale, offset


def pack_large_blocks(line: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Transposed overlapping 9-row blocks: out[:, a] covers line[8a : 8a+9].

    Shape [9*F, r1_pad] with r1 = ceil((res-1)/8); static gather, params-
    sized (KBs), rebuilt per call outside the kernel.
    """
    res, f = line.shape
    r1 = _num_blocks(res)
    r1_pad = _round_up(r1, 8)
    idx = (np.arange(r1)[:, None] * TAP_BLOCK + np.arange(TAP_BLOCK + 1)[None, :]).reshape(-1)
    valid = idx < res
    idx = np.where(valid, idx, 0)
    blocks = jnp.take(line, jnp.asarray(idx), axis=0)  # [r1*9, F]
    blocks = blocks * jnp.asarray(valid, line.dtype)[:, None]
    blocks = blocks.reshape(r1, (TAP_BLOCK + 1) * f)  # [r1, 9F]
    blocks = jnp.pad(blocks, ((0, r1_pad - r1), (0, 0)))
    return blocks.T.astype(dtype)  # [9F, r1_pad]


def _make_kernel(resolutions: Tuple[int, ...], feat: int, blk: int):
    """Kernel closure for a static level schedule (transposed orientation)."""
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    out_dim = len(resolutions) * feat

    def kernel(coords_ref, scale_ref, offset_ref, small_x, small_y, small_z, *large_refs, out_ref):
        smalls = (small_x, small_y, small_z)
        # Level-major schedule keeps per-level temporaries (hat, one-hot, t1)
        # short-lived; all per-sample scalars are [1, BLK] rows (one vreg).
        if n_small:
            p_small = None
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]  # [1, BLK] f32 in [0, 1]
                hat = jnp.maximum(
                    0.0, 1.0 - jnp.abs(scale_ref[:, :] * u - offset_ref[:, :])
                )  # [R_s_pad, BLK]
                f_ax = jax.lax.dot_general(
                    smalls[ax][:, :],
                    hat.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [n_small*F, BLK]
                p_small = f_ax if p_small is None else p_small * f_ax
            out_ref[0 : n_small * feat, :] = p_small
        for li, res in enumerate(large_res):
            r1 = _num_blocks(res)
            r1_pad = _round_up(r1, 8)
            p_lvl = None
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]  # [1, BLK]
                blocks = large_refs[li * 3 + ax]  # [9F, r1_pad]
                xl = u * (res - 1)  # [1, BLK]
                a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
                x_loc = xl - a * TAP_BLOCK  # [1, BLK] in [0, 8)
                sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
                onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
                t1 = jax.lax.dot_general(
                    blocks[:, :],
                    onehot,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [9F, BLK]
                acc = None
                for c in range(TAP_BLOCK + 1):
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(x_loc - c))  # [1, BLK]
                    term = w * t1[c * feat : (c + 1) * feat, :]
                    acc = term if acc is None else acc + term
                p_lvl = acc if p_lvl is None else p_lvl * acc
            off = (n_small + li) * feat
            out_ref[off : off + feat, :] = p_lvl

    return kernel, small_res, large_res, out_dim


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def fused_factor_encode_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped to [0, 1]
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused kernel. `packed` = (smalls(3), larges(n_large*3))."""
    blk = 1024
    n = coords01.shape[0]
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T  # [3, N]
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))

    kernel, small_res, large_res, out_dim = _make_kernel(resolutions, feat, blk)
    smalls, larges = packed
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    def body(coords_ref, *refs):
        *in_refs, out_ref = refs
        kernel(coords_ref, *in_refs, out_ref=out_ref)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array operand
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    out_t = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_dim, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_dim, n_pad), jnp.float32),
        interpret=interpret,
    )(coords_t, scale_arr, offset_arr, *smalls, *larges)
    return out_t[:, :n].T  # [N, D]


def _make_grad_kernel(resolutions: Tuple[int, ...], feat: int, blk: int):
    """Forward-only spatial-derivative kernel: emits d feat / d u for the
    three pos01 axes, [3*D, BLK] axis-major. Same table/gather structure as
    the encode kernel — dhat is the banded derivative of the same hat (the
    9-tap t1 gather is shared per axis, only the tap weights differ).

    No backward exists or is needed: gradient normals are a DETACHED
    supervision target (see models/nerfacto.py loss_dict — nerfacto parity),
    so callers wrap this output in stop_gradient.
    """
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    out_dim = len(resolutions) * feat

    def kernel(coords_ref, scale_ref, offset_ref, small_x, small_y, small_z,
               *large_refs, out_ref):
        smalls = (small_x, small_y, small_z)
        if n_small:
            fs, ds = [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]  # [1, BLK]
                z = scale_ref[:, :] * u - offset_ref[:, :]  # [R_s_pad, BLK]
                hat = jnp.maximum(0.0, 1.0 - jnp.abs(z)).astype(jnp.bfloat16)
                dhat = (
                    -jnp.sign(z)
                    * (jnp.abs(z) < 1.0).astype(jnp.float32)
                    * scale_ref[:, :]
                ).astype(jnp.bfloat16)
                fs.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], hat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
                ds.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], dhat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            for ax in range(3):
                o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                out_ref[ax * out_dim : ax * out_dim + n_small * feat, :] = (
                    ds[ax] * fs[o1] * fs[o2]
                )
        for li, res in enumerate(large_res):
            r1 = _num_blocks(res)
            r1_pad = _round_up(r1, 8)
            f_l, d_l = [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                blocks = large_refs[li * 3 + ax]  # [9F, r1_pad]
                xl = u * (res - 1)
                a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
                x_loc = xl - a * TAP_BLOCK
                sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
                onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
                t1 = jax.lax.dot_general(
                    blocks[:, :], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [9F, BLK]
                facc = dacc = None
                for c in range(TAP_BLOCK + 1):
                    d = x_loc - c
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
                    dw = (
                        -jnp.sign(d)
                        * (jnp.abs(d) < 1.0).astype(jnp.float32)
                        * (res - 1)
                    )
                    t = t1[c * feat : (c + 1) * feat, :]
                    facc = w * t if facc is None else facc + w * t
                    dacc = dw * t if dacc is None else dacc + dw * t
                f_l.append(facc)
                d_l.append(dacc)
            off = (n_small + li) * feat
            for ax in range(3):
                o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                out_ref[ax * out_dim + off : ax * out_dim + off + feat, :] = (
                    d_l[ax] * f_l[o1] * f_l[o2]
                )

    return kernel, small_res, large_res, out_dim


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 4))
def fused_factor_grad_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped to [0, 1]
    interpret: bool = False,
) -> jnp.ndarray:
    """-> dfeat/du [N, 3, D] f32 (derivative wrt the pos01 axes; matches
    ops/factor_grid.dhat_matrix semantics).

    DETACHED by construction: the custom_vjp returns zero cotangents
    (gradient normals are supervision targets — nerfacto parity). A plain
    stop_gradient on the output is not enough: reverse-mode linearization
    still tries to push tangents through the pallas_call, which has no JVP
    rule."""
    return _fused_factor_grad_impl(resolutions, feat, packed, coords01, interpret)


def _fused_grad_fwd(resolutions, feat, packed, coords01, interpret):
    out = _fused_factor_grad_impl(resolutions, feat, packed, coords01, interpret)
    return out, (packed, coords01)


def _fused_grad_bwd(resolutions, feat, interpret, residuals, g):
    packed, coords01 = residuals
    zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
    return zeros(packed), zeros(coords01)


fused_factor_grad_tpu.defvjp(_fused_grad_fwd, _fused_grad_bwd)


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def _fused_factor_grad_impl(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    blk = 1024
    n = coords01.shape[0]
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))

    kernel, small_res, large_res, out_dim = _make_grad_kernel(
        resolutions, feat, blk
    )
    smalls, larges = packed
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    def body(coords_ref, *refs):
        *in_refs, out_ref = refs
        kernel(coords_ref, *in_refs, out_ref=out_ref)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    out_t = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3 * out_dim, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3 * out_dim, n_pad), jnp.float32),
        interpret=interpret,
    )(coords_t, scale_arr, offset_arr, *smalls, *larges)
    return out_t[:, :n].T.reshape(n, 3, out_dim)


def pack_tables(
    resolutions: Tuple[int, ...],
    lines: Sequence[Sequence[jnp.ndarray]],  # [level][axis] -> [res, F]
) -> Tuple:
    """Host/XLA-side packing of the per-level, per-axis line params."""
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    smalls = tuple(
        pack_small_lines([lines[l][ax] for l in range(n_small)])
        for ax in range(3)
    )
    larges = tuple(
        pack_large_blocks(lines[n_small + li][ax])
        for li in range(len(large_res))
        for ax in range(3)
    )
    return smalls, larges


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------
#
# Same recompute structure as the forward (hats / one-hots / t1 rebuilt in
# VMEM), then per axis the product rule G_ax = g_level * f_other1 * f_other2,
# and:
#   grad(line tables) = G @ hat^T (small) / tap-weighted G @ onehot^T (large)
#     — GEMMs accumulated across grid blocks into the (tiny) table grads
#       (TPU grids are sequential, so read-modify-write on the outputs is
#       race-free; block 0 initializes them to zero).
#   grad(coords)      = sum_features G * d f/d u, with d hat/d u the analytic
#     banded derivative (matches ops/factor_grid.dhat_matrix semantics).


def _make_bwd_kernel(resolutions: Tuple[int, ...], feat: int, blk: int, mode: str):
    """mode="tables": emit line-table grads only. mode="coords": emit
    coordinate grads only. Two kernels (two pallas_calls) so that when the
    training loss doesn't need d/d(positions) — camera-opt off/frozen, the
    common case — XLA dead-code-eliminates the coords kernel entirely."""
    assert mode in ("tables", "coords")
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    c_s = n_small * feat
    tables = mode == "tables"

    def kernel(coords_ref, g_ref, scale_ref, offset_ref, small_x, small_y, small_z,
               *refs):
        n_large = len(large_res)
        large_refs = refs[: n_large * 3]
        out_refs = refs[n_large * 3 :]
        if tables:
            gsmall_refs = out_refs[:3]
            glarge_refs = out_refs[3 : n_large * 3 + 3]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                for r in (*gsmall_refs, *glarge_refs):
                    r[:, :] = jnp.zeros_like(r)
        else:
            gcoords_ref = out_refs[0]

        smalls = (small_x, small_y, small_z)
        grad_u = [None, None, None]  # [1, BLK] per axis

        if n_small:
            g_s = g_ref[0:c_s, :]  # [C_s, BLK] f32
            hats = []
            fs = []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                z = scale_ref[:, :] * u - offset_ref[:, :]  # [R_s, BLK]
                hat = jnp.maximum(0.0, 1.0 - jnp.abs(z)).astype(jnp.bfloat16)
                if tables:
                    hats.append(hat)
                fs.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], hat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [C_s, BLK]
            for ax in range(3):
                o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                G = g_s * fs[o1] * fs[o2]  # [C_s, BLK]
                if tables:
                    gsmall_refs[ax][:, :] += jax.lax.dot_general(
                        G.astype(jnp.bfloat16), hats[ax], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C_s, R_s_pad]
                else:
                    # coordinate gradient: d hat/d u = -sign(z)*1{|z|<1}*scale
                    u = coords_ref[ax : ax + 1, :]
                    z = scale_ref[:, :] * u - offset_ref[:, :]
                    dhat = (
                        -jnp.sign(z)
                        * (jnp.abs(z) < 1.0).astype(jnp.float32)
                        * scale_ref[:, :]
                    ).astype(jnp.bfloat16)
                    dfdu = jax.lax.dot_general(
                        smalls[ax][:, :], dhat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [C_s, BLK]
                    gu = jnp.sum(G * dfdu, axis=0, keepdims=True)  # [1, BLK]
                    grad_u[ax] = gu if grad_u[ax] is None else grad_u[ax] + gu

        for li, res in enumerate(large_res):
            r1 = _num_blocks(res)
            r1_pad = _round_up(r1, 8)
            off = (n_small + li) * feat
            g_l = g_ref[off : off + feat, :]  # [F, BLK]
            onehots = []
            t1s = []
            xlocs = []
            f_l = []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                blocks = large_refs[li * 3 + ax]
                xl = u * (res - 1)
                a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
                x_loc = xl - a * TAP_BLOCK
                sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
                onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
                t1 = jax.lax.dot_general(
                    blocks[:, :], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [9F, BLK]
                acc = None
                for c in range(TAP_BLOCK + 1):
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(x_loc - c))
                    term = w * t1[c * feat : (c + 1) * feat, :]
                    acc = term if acc is None else acc + term
                onehots.append(onehot)
                t1s.append(t1)
                xlocs.append(x_loc)
                f_l.append(acc)
            for ax in range(3):
                o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                G = g_l * f_l[o1] * f_l[o2]  # [F, BLK]
                x_loc = xlocs[ax]
                if tables:
                    gt1_parts = []
                    for c in range(TAP_BLOCK + 1):
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(x_loc - c))
                        gt1_parts.append(w * G)
                    gt1 = jnp.concatenate(gt1_parts, axis=0).astype(jnp.bfloat16)
                    glarge_refs[li * 3 + ax][:, :] += jax.lax.dot_general(
                        gt1, onehots[ax], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [9F, r1_pad]
                else:
                    gu = None
                    for c in range(TAP_BLOCK + 1):
                        d = x_loc - c  # [1, BLK]
                        dw = (
                            -jnp.sign(d)
                            * (jnp.abs(d) < 1.0).astype(jnp.float32)
                            * (res - 1)
                        )
                        contrib = jnp.sum(
                            G * (dw * t1s[ax][c * feat : (c + 1) * feat, :]),
                            axis=0,
                            keepdims=True,
                        )
                        gu = contrib if gu is None else gu + contrib
                    grad_u[ax] = gu if grad_u[ax] is None else grad_u[ax] + gu

        if not tables:
            gcoords_ref[:, :] = jnp.concatenate(
                [grad_u[0], grad_u[1], grad_u[2]], axis=0
            )  # [3, BLK]

    return kernel, small_res, large_res


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def fused_factor_encode_bwd_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped
    g: jnp.ndarray,  # [N, D] f32 cotangent
    interpret: bool = False,
) -> Tuple[Tuple, jnp.ndarray]:
    """-> (grad_packed (same structure as `packed`, f32), grad_coords [N, 3])."""
    blk = 1024
    n = coords01.shape[0]
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    g_t = g.T  # [D, N]
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))
        g_t = jnp.pad(g_t, ((0, 0), (0, n_pad - n)))

    smalls, larges = packed
    k_tables, small_res, large_res = _make_bwd_kernel(resolutions, feat, blk, "tables")
    k_coords, _, _ = _make_bwd_kernel(resolutions, feat, blk, "coords")
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)
    out_dim = len(resolutions) * feat

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((out_dim, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    args = (coords_t, g_t, scale_arr, offset_arr, *smalls, *larges)

    table_outs = pl.pallas_call(
        k_tables,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            *[full(s.shape) for s in smalls],  # grad_smalls (accumulated)
            *[full(b.shape) for b in larges],  # grad_larges (accumulated)
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(s.shape, jnp.float32) for s in smalls],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in larges],
        ],
        interpret=interpret,
    )(*args)
    g_coords_t = pl.pallas_call(
        k_coords,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(*args)
    g_smalls = tuple(table_outs[:3])
    g_larges = tuple(table_outs[3 : 3 + len(larges)])
    g_coords = g_coords_t[:, :n].T
    return (g_smalls, g_larges), g_coords


def unpack_table_grads(
    resolutions: Tuple[int, ...],
    grad_packed: Tuple,
    feat: int,
):
    """Map packed-table grads back to per-level, per-axis [res, F] line grads.

    Small levels: slice the block-diagonal grad. Large levels: overlap-add
    the 9-row block grads (row 8a+c of the line receives block a tap c, and
    tap 8 of block a-1 aliases tap 0 of block a).
    """
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    g_smalls, g_larges = grad_packed
    grads = []
    for l, res in enumerate(small_res):
        off = sum(small_res[:l])
        per_axis = []
        for ax in range(3):
            blockdiag = g_smalls[ax]  # [C_s, R_s_pad]
            per_axis.append(blockdiag[l * feat : (l + 1) * feat, off : off + res].T)
        grads.append(tuple(per_axis))
    for li, res in enumerate(large_res):
        r1 = _num_blocks(res)
        per_axis = []
        for ax in range(3):
            gb = g_larges[li * 3 + ax]  # [9F, r1_pad] f32
            g3 = gb.T[:r1].reshape(r1, TAP_BLOCK + 1, feat)
            main = g3[:, :TAP_BLOCK, :].reshape(r1 * TAP_BLOCK, feat)
            pad_rows = r1 * TAP_BLOCK + TAP_BLOCK + 1
            out = jnp.zeros((pad_rows, feat), jnp.float32)
            out = out.at[: r1 * TAP_BLOCK].add(main)
            overlap_rows = jnp.arange(1, r1 + 1) * TAP_BLOCK
            out = out.at[overlap_rows].add(g3[:, TAP_BLOCK, :])
            per_axis.append(out[:res])
        grads.append(tuple(per_axis))
    return tuple(grads)


# ---------------------------------------------------------------------------
# backward of the spatial-derivative kernel (reference normals semantics)
# ---------------------------------------------------------------------------
#
# The grad kernel computes O_j = d_j * f_k * f_l per level (j, k, l a cyclic
# axis permutation; f = hat-interp, d = dhat-interp). Reference orientation-
# loss semantics backprop THROUGH the gradient normals into the encoding
# (models/nerfacto.py loss_dict, fast_normals_losses=False), so given the
# cotangent ct_j [F, BLK] per axis this kernel emits, per axis a:
#
#   G_hat_a  = ct_b*d_b*f_c + ct_c*d_c*f_b   (f_a's appearances in O_b, O_c)
#   G_dhat_a = ct_a*f_b*f_c                   (d_a's appearance in O_a)
#   grad(line_a) = hat_a-GEMM^T(G_hat_a) + dhat_a-GEMM^T(G_dhat_a)
#   grad(u_a)    = sum_F G_hat_a * d_a
#     (the d(dhat)/du term is zero a.e. — dhat is piecewise constant —
#      matching the XLA expression's autodiff exactly)
#
# Same recompute structure / table packing / accumulation strategy as the
# encode backward (_make_bwd_kernel above).


def _make_grad_bwd_kernel(resolutions: Tuple[int, ...], feat: int, blk: int, mode: str):
    assert mode in ("tables", "coords")
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    c_s = n_small * feat
    out_dim = len(resolutions) * feat
    tables = mode == "tables"

    def kernel(coords_ref, g_ref, scale_ref, offset_ref, small_x, small_y, small_z,
               *refs):
        n_large = len(large_res)
        large_refs = refs[: n_large * 3]
        out_refs = refs[n_large * 3 :]
        if tables:
            gsmall_refs = out_refs[:3]
            glarge_refs = out_refs[3 : n_large * 3 + 3]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                for r in (*gsmall_refs, *glarge_refs):
                    r[:, :] = jnp.zeros_like(r)
        else:
            gcoords_ref = out_refs[0]

        smalls = (small_x, small_y, small_z)
        grad_u = [None, None, None]

        if n_small:
            hats, dhats, fs, ds = [], [], [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                z = scale_ref[:, :] * u - offset_ref[:, :]  # [R_s_pad, BLK]
                hat = jnp.maximum(0.0, 1.0 - jnp.abs(z)).astype(jnp.bfloat16)
                dhat = (
                    -jnp.sign(z)
                    * (jnp.abs(z) < 1.0).astype(jnp.float32)
                    * scale_ref[:, :]
                ).astype(jnp.bfloat16)
                hats.append(hat)
                dhats.append(dhat)
                fs.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], hat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
                ds.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], dhat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            for ax in range(3):
                b, c = (ax + 1) % 3, (ax + 2) % 3
                ct_a = g_ref[ax * out_dim : ax * out_dim + c_s, :]
                ct_b = g_ref[b * out_dim : b * out_dim + c_s, :]
                ct_c = g_ref[c * out_dim : c * out_dim + c_s, :]
                G_hat = ct_b * ds[b] * fs[c] + ct_c * ds[c] * fs[b]
                G_dhat = ct_a * fs[b] * fs[c]
                if tables:
                    gsmall_refs[ax][:, :] += jax.lax.dot_general(
                        G_hat.astype(jnp.bfloat16), hats[ax],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        G_dhat.astype(jnp.bfloat16), dhats[ax],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    gu = jnp.sum(G_hat * ds[ax], axis=0, keepdims=True)
                    grad_u[ax] = gu if grad_u[ax] is None else grad_u[ax] + gu

        for li, res in enumerate(large_res):
            r1 = _num_blocks(res)
            r1_pad = _round_up(r1, 8)
            off = (n_small + li) * feat
            onehots, t1s, xlocs, f_l, d_l = [], [], [], [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                blocks = large_refs[li * 3 + ax]
                xl = u * (res - 1)
                a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
                x_loc = xl - a * TAP_BLOCK
                sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
                onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
                t1 = jax.lax.dot_general(
                    blocks[:, :], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                facc = dacc = None
                for cc in range(TAP_BLOCK + 1):
                    d = x_loc - cc
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
                    dw = (
                        -jnp.sign(d)
                        * (jnp.abs(d) < 1.0).astype(jnp.float32)
                        * (res - 1)
                    )
                    t = t1[cc * feat : (cc + 1) * feat, :]
                    facc = w * t if facc is None else facc + w * t
                    dacc = dw * t if dacc is None else dacc + dw * t
                onehots.append(onehot)
                t1s.append(t1)
                xlocs.append(x_loc)
                f_l.append(facc)
                d_l.append(dacc)
            for ax in range(3):
                b, c = (ax + 1) % 3, (ax + 2) % 3
                ct_a = g_ref[ax * out_dim + off : ax * out_dim + off + feat, :]
                ct_b = g_ref[b * out_dim + off : b * out_dim + off + feat, :]
                ct_c = g_ref[c * out_dim + off : c * out_dim + off + feat, :]
                G_hat = ct_b * d_l[b] * f_l[c] + ct_c * d_l[c] * f_l[b]
                G_dhat = ct_a * f_l[b] * f_l[c]
                x_loc = xlocs[ax]
                if tables:
                    gt1_parts = []
                    for cc in range(TAP_BLOCK + 1):
                        d = x_loc - cc
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
                        dw = (
                            -jnp.sign(d)
                            * (jnp.abs(d) < 1.0).astype(jnp.float32)
                            * (res - 1)
                        )
                        gt1_parts.append(w * G_hat + dw * G_dhat)
                    gt1 = jnp.concatenate(gt1_parts, axis=0).astype(jnp.bfloat16)
                    glarge_refs[li * 3 + ax][:, :] += jax.lax.dot_general(
                        gt1, onehots[ax], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    gu = jnp.sum(G_hat * d_l[ax], axis=0, keepdims=True)
                    grad_u[ax] = gu if grad_u[ax] is None else grad_u[ax] + gu

        if not tables:
            gcoords_ref[:, :] = jnp.concatenate(
                [grad_u[0], grad_u[1], grad_u[2]], axis=0
            )

    return kernel, small_res, large_res


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def fused_factor_grad_bwd_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped
    ct: jnp.ndarray,  # [N, 3, D] f32 cotangent of dfeat/du
    interpret: bool = False,
) -> Tuple[Tuple, jnp.ndarray]:
    """VJP of `fused_factor_grad_tpu`'s output wrt (packed tables, coords).

    -> (grad_packed (structure of `packed`, f32), grad_coords [N, 3])."""
    blk = 1024
    n = coords01.shape[0]
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    out_dim = len(resolutions) * feat
    ct_t = ct.reshape(n, 3 * out_dim).T  # [3D, N] axis-major rows
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))
        ct_t = jnp.pad(ct_t, ((0, 0), (0, n_pad - n)))

    smalls, larges = packed
    k_tables, small_res, large_res = _make_grad_bwd_kernel(
        resolutions, feat, blk, "tables"
    )
    k_coords, _, _ = _make_grad_bwd_kernel(resolutions, feat, blk, "coords")
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * out_dim, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    args = (coords_t, ct_t, scale_arr, offset_arr, *smalls, *larges)

    table_outs = pl.pallas_call(
        k_tables,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            *[full(s.shape) for s in smalls],
            *[full(b.shape) for b in larges],
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(s.shape, jnp.float32) for s in smalls],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in larges],
        ],
        interpret=interpret,
    )(*args)
    g_coords_t = pl.pallas_call(
        k_coords,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(*args)
    g_smalls = tuple(table_outs[:3])
    g_larges = tuple(table_outs[3 : 3 + len(larges)])
    return (g_smalls, g_larges), g_coords_t[:, :n].T


# ---------------------------------------------------------------------------
# contracted spatial-derivative ("grad-dot") kernels
# ---------------------------------------------------------------------------
#
# The training loss consumes ONLY the density channel's spatial gradient
# (gradient normals, models/nerfacto.py): ddensity/du = <dfeat/du, g> with
# g = d density_raw / d feat — the [N, D] MLP VJP row. Emitting the full
# dfeat/du [N, 3, D] (fused_factor_grad_tpu) and contracting outside costs
# two ~[N, 3, D] f32 HBM round-trips per signerf micro-batch (~600 MB at
# N=393k); round-5 profiling attributed 39.4 ms of the 92 ms signerf step
# to the normals path, dominated by exactly this traffic. These kernels
# contract with g INSIDE VMEM and emit only [N, 3]:
#
#   forward:  s[n, ax] = sum_d dfeat01[n, ax, d] * g[n, d]
#   backward: cotangent ct [N, 3] expands to the rank-1 effective cotangent
#             ct[n, ax] * g[n, d] against the table/coords VJPs (reusing the
#             _make_grad_bwd_kernel contraction structure), plus
#             grad_g[n, d] = sum_ax ct[n, ax] * dfeat01[n, ax, d]
#             so reverse-mode also flows into the MLP weights through g.


def _make_grad_dot_kernel(resolutions: Tuple[int, ...], feat: int, blk: int):
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    c_s = n_small * feat

    def kernel(coords_ref, g_ref, scale_ref, offset_ref, small_x, small_y,
               small_z, *large_refs, out_ref):
        smalls = (small_x, small_y, small_z)
        acc = [
            jnp.zeros((1, blk), jnp.float32),
            jnp.zeros((1, blk), jnp.float32),
            jnp.zeros((1, blk), jnp.float32),
        ]
        if n_small:
            fs, ds = [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                z = scale_ref[:, :] * u - offset_ref[:, :]
                hat = jnp.maximum(0.0, 1.0 - jnp.abs(z)).astype(jnp.bfloat16)
                dhat = (
                    -jnp.sign(z)
                    * (jnp.abs(z) < 1.0).astype(jnp.float32)
                    * scale_ref[:, :]
                ).astype(jnp.bfloat16)
                fs.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], hat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
                ds.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], dhat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            gw = g_ref[0:c_s, :]
            for ax in range(3):
                o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                acc[ax] += jnp.sum(
                    ds[ax] * fs[o1] * fs[o2] * gw, axis=0, keepdims=True
                )
        for li, res in enumerate(large_res):
            r1 = _num_blocks(res)
            r1_pad = _round_up(r1, 8)
            f_l, d_l = [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                blocks = large_refs[li * 3 + ax]
                xl = u * (res - 1)
                a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
                x_loc = xl - a * TAP_BLOCK
                sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
                onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
                t1 = jax.lax.dot_general(
                    blocks[:, :], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                facc = dacc = None
                for c in range(TAP_BLOCK + 1):
                    d = x_loc - c
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
                    dw = (
                        -jnp.sign(d)
                        * (jnp.abs(d) < 1.0).astype(jnp.float32)
                        * (res - 1)
                    )
                    t = t1[c * feat : (c + 1) * feat, :]
                    facc = w * t if facc is None else facc + w * t
                    dacc = dw * t if dacc is None else dacc + dw * t
                f_l.append(facc)
                d_l.append(dacc)
            off = (n_small + li) * feat
            gw = g_ref[off : off + feat, :]
            for ax in range(3):
                o1, o2 = (ax + 1) % 3, (ax + 2) % 3
                acc[ax] += jnp.sum(
                    d_l[ax] * f_l[o1] * f_l[o2] * gw, axis=0, keepdims=True
                )
        out_ref[:, :] = jnp.concatenate(
            acc + [jnp.zeros((5, blk), jnp.float32)], axis=0
        )

    return kernel, small_res, large_res


@functools.partial(jax.jit, static_argnums=(0, 1, 5))
def fused_factor_grad_dot_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped
    g: jnp.ndarray,  # [N, D] f32 feature cotangent (MLP VJP row)
    interpret: bool = False,
) -> jnp.ndarray:
    """-> s [N, 3] f32 with s[n, ax] = <dfeat01[n, ax, :], g[n, :]>."""
    blk = 1024
    n = coords01.shape[0]
    out_dim = len(resolutions) * feat
    assert g.shape == (n, out_dim), (g.shape, n, out_dim)
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    g_t = g.astype(jnp.float32).T  # [D, N]
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))
        g_t = jnp.pad(g_t, ((0, 0), (0, n_pad - n)))
    d_pad = _round_up(out_dim, 8)
    if d_pad != out_dim:
        g_t = jnp.pad(g_t, ((0, d_pad - out_dim), (0, 0)))

    kernel, small_res, large_res = _make_grad_dot_kernel(resolutions, feat, blk)
    smalls, larges = packed
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    def body(coords_ref, g_ref, *refs):
        *in_refs, out_ref = refs
        kernel(coords_ref, g_ref, *in_refs, out_ref=out_ref)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    out_t = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )(coords_t, g_t, scale_arr, offset_arr, *smalls, *larges)
    return out_t[:3, :n].T  # [N, 3]


def _make_grad_dot_bwd_kernel(
    resolutions: Tuple[int, ...], feat: int, blk: int, mode: str
):
    """VJP kernels for the grad-dot forward. The effective dfeat01 cotangent
    is the rank-1 product ct[n, ax] * g[n, d]; the contraction structure is
    _make_grad_bwd_kernel's with that substitution, plus mode "coords_g"
    additionally emitting grad_g[n, d] = sum_ax ct[n, ax] * dfeat01[n, ax, d].
    """
    assert mode in ("tables", "coords_g")
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    c_s = n_small * feat
    out_dim = len(resolutions) * feat
    d_pad = _round_up(out_dim, 8)
    tables = mode == "tables"

    def kernel(coords_ref, ct_ref, g_ref, scale_ref, offset_ref, small_x,
               small_y, small_z, *refs):
        n_large = len(large_res)
        large_refs = refs[: n_large * 3]
        out_refs = refs[n_large * 3 :]
        if tables:
            gsmall_refs = out_refs[:3]
            glarge_refs = out_refs[3 : n_large * 3 + 3]

            @pl.when(pl.program_id(0) == 0)
            def _init():
                for r in (*gsmall_refs, *glarge_refs):
                    r[:, :] = jnp.zeros_like(r)
        else:
            gcoords_ref, gg_ref = out_refs
            # rows beyond out_dim (d_pad padding) are never assigned below
            gg_ref[:, :] = jnp.zeros_like(gg_ref)

        smalls = (small_x, small_y, small_z)
        grad_u = [None, None, None]
        cts = [ct_ref[ax : ax + 1, :] for ax in range(3)]  # [1, BLK] each

        if n_small:
            hats, dhats, fs, ds = [], [], [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                z = scale_ref[:, :] * u - offset_ref[:, :]
                hat = jnp.maximum(0.0, 1.0 - jnp.abs(z)).astype(jnp.bfloat16)
                dhat = (
                    -jnp.sign(z)
                    * (jnp.abs(z) < 1.0).astype(jnp.float32)
                    * scale_ref[:, :]
                ).astype(jnp.bfloat16)
                hats.append(hat)
                dhats.append(dhat)
                fs.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], hat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
                ds.append(
                    jax.lax.dot_general(
                        smalls[ax][:, :], dhat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            gw = g_ref[0:c_s, :]
            for ax in range(3):
                b, c = (ax + 1) % 3, (ax + 2) % 3
                ct_a = cts[ax] * gw
                ct_b = cts[b] * gw
                ct_c = cts[c] * gw
                G_hat = ct_b * ds[b] * fs[c] + ct_c * ds[c] * fs[b]
                G_dhat = ct_a * fs[b] * fs[c]
                if tables:
                    gsmall_refs[ax][:, :] += jax.lax.dot_general(
                        G_hat.astype(jnp.bfloat16), hats[ax],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        G_dhat.astype(jnp.bfloat16), dhats[ax],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    gu = jnp.sum(G_hat * ds[ax], axis=0, keepdims=True)
                    grad_u[ax] = gu if grad_u[ax] is None else grad_u[ax] + gu
            if not tables:
                gg_small = (
                    cts[0] * ds[0] * fs[1] * fs[2]
                    + cts[1] * fs[0] * ds[1] * fs[2]
                    + cts[2] * fs[0] * fs[1] * ds[2]
                )  # [c_s, BLK]
                gg_ref[0:c_s, :] = gg_small

        for li, res in enumerate(large_res):
            r1 = _num_blocks(res)
            r1_pad = _round_up(r1, 8)
            off = (n_small + li) * feat
            onehots, xlocs, f_l, d_l = [], [], [], []
            for ax in range(3):
                u = coords_ref[ax : ax + 1, :]
                blocks = large_refs[li * 3 + ax]
                xl = u * (res - 1)
                a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
                x_loc = xl - a * TAP_BLOCK
                sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
                onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
                t1 = jax.lax.dot_general(
                    blocks[:, :], onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                facc = dacc = None
                for cc in range(TAP_BLOCK + 1):
                    d = x_loc - cc
                    w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
                    dw = (
                        -jnp.sign(d)
                        * (jnp.abs(d) < 1.0).astype(jnp.float32)
                        * (res - 1)
                    )
                    t = t1[cc * feat : (cc + 1) * feat, :]
                    facc = w * t if facc is None else facc + w * t
                    dacc = dw * t if dacc is None else dacc + dw * t
                onehots.append(onehot)
                xlocs.append(x_loc)
                f_l.append(facc)
                d_l.append(dacc)
            gw = g_ref[off : off + feat, :]
            for ax in range(3):
                b, c = (ax + 1) % 3, (ax + 2) % 3
                ct_a = cts[ax] * gw
                ct_b = cts[b] * gw
                ct_c = cts[c] * gw
                G_hat = ct_b * d_l[b] * f_l[c] + ct_c * d_l[c] * f_l[b]
                G_dhat = ct_a * f_l[b] * f_l[c]
                x_loc = xlocs[ax]
                if tables:
                    gt1_parts = []
                    for cc in range(TAP_BLOCK + 1):
                        d = x_loc - cc
                        w = jnp.maximum(0.0, 1.0 - jnp.abs(d))
                        dw = (
                            -jnp.sign(d)
                            * (jnp.abs(d) < 1.0).astype(jnp.float32)
                            * (res - 1)
                        )
                        gt1_parts.append(w * G_hat + dw * G_dhat)
                    gt1 = jnp.concatenate(gt1_parts, axis=0).astype(jnp.bfloat16)
                    glarge_refs[li * 3 + ax][:, :] += jax.lax.dot_general(
                        gt1, onehots[ax], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    gu = jnp.sum(G_hat * d_l[ax], axis=0, keepdims=True)
                    grad_u[ax] = gu if grad_u[ax] is None else grad_u[ax] + gu
            if not tables:
                gg_ref[off : off + feat, :] = (
                    cts[0] * d_l[0] * f_l[1] * f_l[2]
                    + cts[1] * f_l[0] * d_l[1] * f_l[2]
                    + cts[2] * f_l[0] * f_l[1] * d_l[2]
                )

        if not tables:
            gcoords_ref[:, :] = jnp.concatenate(
                [grad_u[0], grad_u[1], grad_u[2]], axis=0
            )

    return kernel, small_res, large_res


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def fused_factor_grad_dot_bwd_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped
    g: jnp.ndarray,  # [N, D] f32
    ct: jnp.ndarray,  # [N, 3] f32 cotangent of s
    interpret: bool = False,
) -> Tuple[Tuple, jnp.ndarray, jnp.ndarray]:
    """VJP of `fused_factor_grad_dot_tpu` wrt (packed tables, coords, g).

    -> (grad_packed, grad_coords [N, 3], grad_g [N, D])."""
    blk = 1024
    n = coords01.shape[0]
    out_dim = len(resolutions) * feat
    d_pad = _round_up(out_dim, 8)
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    g_t = g.astype(jnp.float32).T
    ct_t = ct.astype(jnp.float32).T  # [3, N]
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))
        g_t = jnp.pad(g_t, ((0, 0), (0, n_pad - n)))
        ct_t = jnp.pad(ct_t, ((0, 0), (0, n_pad - n)))
    if d_pad != out_dim:
        g_t = jnp.pad(g_t, ((0, d_pad - out_dim), (0, 0)))

    smalls, larges = packed
    k_tables, small_res, large_res = _make_grad_dot_bwd_kernel(
        resolutions, feat, blk, "tables"
    )
    k_cg, _, _ = _make_grad_dot_bwd_kernel(resolutions, feat, blk, "coords_g")
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    args = (coords_t, ct_t, g_t, scale_arr, offset_arr, *smalls, *larges)

    table_outs = pl.pallas_call(
        k_tables,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            *[full(s.shape) for s in smalls],
            *[full(b.shape) for b in larges],
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(s.shape, jnp.float32) for s in smalls],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in larges],
        ],
        interpret=interpret,
    )(*args)
    g_coords_t, gg_t = pl.pallas_call(
        k_cg,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    g_smalls = tuple(table_outs[:3])
    g_larges = tuple(table_outs[3 : 3 + len(larges)])
    return (
        (g_smalls, g_larges),
        g_coords_t[:, :n].T,
        gg_t[:out_dim, :n].T,
    )


# ---------------------------------------------------------------------------
# fused encode + density-MLP forward kernel
# ---------------------------------------------------------------------------
#
# The encode kernel above emits [D, N] f32 features to HBM, XLA transposes
# them to [N, D], and a 2-layer bf16 MLP reduces them to a handful of
# channels. For the proposal density fields (D=40 -> 16 -> 1) and the final
# field's base MLP (D=256 -> 64 -> 16) that round-trip is almost pure HBM
# tax: at render scale (8192 rays x 256 samples) the [D, N] f32 write plus
# the transpose's read+write move ~1 GB per chunk to produce 8 MB of
# densities. This kernel keeps the per-level CP features in VMEM and applies
# the MLP (two MXU dots over the level-concatenated feature rows) in-place,
# emitting only the MLP's output rows — the capability the reference gets
# from tiny-cuda-nn's fully-fused HashGrid+MLP CUDA kernels (SURVEY.md §2b
# row 1).
#
# Numerics match the XLA path's Dense(bf16) contract: feature products are
# f32 (same as the encode kernel), each dot takes bf16 operands with f32
# accumulation, and layer outputs round to bf16 before bias-add/ReLU exactly
# like flax Dense with dtype=bfloat16.


def _encode_feats_block(
    resolutions: Tuple[int, ...],
    feat: int,
    blk: int,
    coords_ref,
    scale_ref,
    offset_ref,
    smalls,
    large_refs,
):
    """Shared in-VMEM CP encode for one [*, BLK] sample block -> [D, BLK] f32.

    The same level schedule as the standalone encode kernel, as a helper so
    the fused density forward AND backward kernels recompute features without
    duplicating the gather structure."""
    small_res, large_res = _split_levels(resolutions)
    n_small = len(small_res)
    parts = []
    if n_small:
        p_small = None
        for ax in range(3):
            u = coords_ref[ax : ax + 1, :]  # [1, BLK]
            hat = jnp.maximum(
                0.0, 1.0 - jnp.abs(scale_ref[:, :] * u - offset_ref[:, :])
            )
            f_ax = jax.lax.dot_general(
                smalls[ax][:, :],
                hat.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [n_small*F, BLK]
            p_small = f_ax if p_small is None else p_small * f_ax
        parts.append(p_small)
    for li, res in enumerate(large_res):
        r1 = _num_blocks(res)
        r1_pad = _round_up(r1, 8)
        p_lvl = None
        for ax in range(3):
            u = coords_ref[ax : ax + 1, :]
            blocks = large_refs[li * 3 + ax]  # [9F, r1_pad]
            xl = u * (res - 1)
            a = jnp.clip(jnp.floor(xl * (1.0 / TAP_BLOCK)), 0, r1 - 1)
            x_loc = xl - a * TAP_BLOCK
            sub = jax.lax.broadcasted_iota(jnp.int32, (r1_pad, blk), 0)
            onehot = (sub.astype(jnp.float32) == a).astype(jnp.bfloat16)
            t1 = jax.lax.dot_general(
                blocks[:, :],
                onehot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [9F, BLK]
            acc = None
            for c in range(TAP_BLOCK + 1):
                w = jnp.maximum(0.0, 1.0 - jnp.abs(x_loc - c))
                term = w * t1[c * feat : (c + 1) * feat, :]
                acc = term if acc is None else acc + term
            p_lvl = acc if p_lvl is None else p_lvl * acc
        parts.append(p_lvl)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _make_density_kernel(
    resolutions: Tuple[int, ...], feat: int, blk: int, head_dtype
):
    # head_dtype: bf16 compiled on TPU (the Dense contract); f32 in interpret
    # mode — XLA:CPU's eager DotThunk can't execute bf16 x bf16 -> f32 for
    # the head's shapes, and interpret runs are parity tests, not perf.
    small_res, large_res = _split_levels(resolutions)

    def kernel(
        coords_ref, scale_ref, offset_ref, w0_ref, b0_ref, w1_ref, b1_ref,
        small_x, small_y, small_z, *large_refs, out_ref
    ):
        feats = _encode_feats_block(
            resolutions, feat, blk, coords_ref, scale_ref, offset_ref,
            (small_x, small_y, small_z), large_refs,
        )
        # layer 0: [H, D] @ [D, BLK] (head_dtype in, f32 accum) -> bf16
        # rounding + bias, ReLU — the flax Dense(dtype=bf16) contract.
        h = jax.lax.dot_general(
            w0_ref[:, :].astype(head_dtype),
            feats.astype(head_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        h = jnp.maximum(h + b0_ref[:, :].astype(jnp.bfloat16), 0)
        # layer 1: [O_pad, H] @ [H, BLK]
        o = jax.lax.dot_general(
            w1_ref[:, :].astype(head_dtype),
            h.astype(head_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out_ref[:, :] = (o + b1_ref[:, :].astype(jnp.bfloat16)).astype(
            jnp.float32
        )

    return kernel, small_res, large_res


@functools.partial(jax.jit, static_argnums=(0, 1, 8))
def fused_factor_density_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped to [0, 1]
    w0: jnp.ndarray,  # [D, H] f32 (flax Dense layout)
    b0: jnp.ndarray,  # [H]
    w1: jnp.ndarray,  # [H, O]
    b1: jnp.ndarray,  # [O]
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused encode + 2-layer-MLP forward: -> [N, O] f32 MLP outputs.

    Forward only — training gradients route through factor_grid's
    `fused_density_mlp` custom_vjp (encode recompute + XLA MLP vjp + the
    encode backward kernel)."""
    blk = 1024
    n = coords01.shape[0]
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))

    d_in, hidden = w0.shape
    out_dim = w1.shape[1]
    assert d_in == len(resolutions) * feat
    assert hidden % 8 == 0, "hidden dim must be a multiple of 8 (sublanes)"
    out_pad = _round_up(out_dim, 8)

    head_dtype = jnp.float32 if interpret else jnp.bfloat16
    w0t = w0.T.astype(jnp.bfloat16)  # [H, D] (bf16 rounding = Dense contract)
    b0c = b0.reshape(hidden, 1).astype(jnp.float32)
    w1t = jnp.pad(w1.T, ((0, out_pad - out_dim), (0, 0))).astype(jnp.bfloat16)
    b1c = jnp.pad(b1, (0, out_pad - out_dim)).reshape(out_pad, 1).astype(
        jnp.float32
    )

    kernel, small_res, large_res = _make_density_kernel(
        resolutions, feat, blk, head_dtype
    )
    smalls, larges = packed
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    def body(coords_ref, *refs):
        *in_refs, out_ref = refs
        kernel(coords_ref, *in_refs, out_ref=out_ref)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array operand
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        full(w0t.shape),
        full(b0c.shape),
        full(w1t.shape),
        full(b1c.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    out_t = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (out_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((out_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(coords_t, scale_arr, offset_arr, w0t, b0c, w1t, b1c, *smalls, *larges)
    return out_t[:out_dim, :n].T  # [N, O]


# ---------------------------------------------------------------------------
# fused encode + density-MLP BACKWARD kernel
# ---------------------------------------------------------------------------
#
# The unfused backward (factor_grid._fused_density_mlp_bwd before this
# kernel) paid four [N, D] f32 HBM round-trips per density field per step:
# the encode-recompute kernel WRITES feats, the XLA MLP vjp READS them and
# WRITES g_feats, and the two encode-backward kernels each READ g_feats. At
# the bench train regime (4096 rays x (256+96+48) samples, D=80/80/128)
# that is ~2.2 GB of pure feature traffic per optimizer step — the
# tiny-cuda-nn fully-fused *training* capability is precisely not paying it
# (SURVEY.md §2b row 1).
#
# This kernel keeps the whole chain in VMEM per 1024-sample block:
#   feats   = encode(coords)                     (_encode_feats_block)
#   h       = relu(w0 @ feats + b0)   [H, BLK]   (transposed Dense contract)
#   g_h     = (w1^T @ g_o) * 1{h>0}
#   g_feats = w0^T @ g_h               [D, BLK]  -> VMEM scratch
#   dw1 += g_o @ h^T, db1 += sum(g_o); dw0 += g_h @ feats^T, db0 += sum(g_h)
# then feeds the g_feats scratch straight into the PROVEN encode-backward
# kernel bodies (_make_bwd_kernel "tables"/"coords" read any ref — input or
# scratch), so the table/coordinate gradient math is byte-identical to the
# tested standalone backward. Only the [N, D] materializations disappear.
#
# Same two-call split as the standalone backward: the coords kernel is a
# separate pallas_call so XLA dead-code-eliminates it when d/d(positions)
# is unused (camera-opt off and sampling detached — the common case).


def _make_density_bwd_kernel(
    resolutions: Tuple[int, ...], feat: int, blk: int, mode: str, head_dtype
):
    # head_dtype: bf16 compiled on TPU; f32 in interpret mode (same XLA:CPU
    # DotThunk limitation the forward kernel documents). Weights arrive
    # already bf16-ROUNDED, so the f32 interpret dots see identical values.
    assert mode in ("tables", "coords")
    inner_kernel, small_res, large_res = _make_bwd_kernel(
        resolutions, feat, blk, mode
    )
    tables = mode == "tables"

    def kernel(
        coords_ref, g_ref, scale_ref, offset_ref, w0_ref, b0_ref, w1_ref,
        small_x, small_y, small_z, *refs
    ):
        n_large = len(large_res)
        large_refs = refs[: n_large * 3]
        if tables:
            # trailing outputs: encode-table grads, then dw0/db0/dw1/db1
            enc_out_refs = refs[n_large * 3 : n_large * 3 + 3 + n_large * 3]
            dw0_ref, db0_ref, dw1_ref, db1_ref = refs[
                n_large * 3 + 3 + n_large * 3 : n_large * 3 + 7 + n_large * 3
            ]
            gfeats_scratch = refs[-1]

            @pl.when(pl.program_id(0) == 0)
            def _init_mlp():
                for r in (dw0_ref, db0_ref, dw1_ref, db1_ref):
                    r[:, :] = jnp.zeros_like(r)
        else:
            enc_out_refs = (refs[n_large * 3],)
            gfeats_scratch = refs[-1]

        feats = _encode_feats_block(
            resolutions, feat, blk, coords_ref, scale_ref, offset_ref,
            (small_x, small_y, small_z), large_refs,
        )  # [D, BLK] f32
        # MLP forward (transposed flax-Dense bf16 contract, as in the fused
        # density forward kernel) + vjp, all in VMEM.
        w0v = w0_ref[:, :].astype(head_dtype)  # [H, D]
        w1v = w1_ref[:, :].astype(head_dtype)  # [O_pad, H]
        # Round operand VALUES to bf16 even when head_dtype is f32
        # (interpret mode) so interpret reproduces the TPU MXU semantics
        # (bf16-rounded operands, f32 accumulation) bit-for-bit.
        feats_b = feats.astype(jnp.bfloat16).astype(head_dtype)
        h = jax.lax.dot_general(
            w0v,
            feats_b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        h = jnp.maximum(h + b0_ref[:, :].astype(jnp.bfloat16), 0)  # [H, BLK]
        g_o = g_ref[:, :].astype(jnp.bfloat16)  # [O_pad, BLK]
        g_h = jax.lax.dot_general(
            w1v,
            g_o.astype(head_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (h.astype(jnp.float32) > 0.0).astype(jnp.float32)  # [H, BLK] f32
        # ^ compare in f32: Mosaic on v5e rejects cmpf on bf16 vregs
        #   ("Target does not support this comparison"); bf16->f32 is exact
        #   so the ReLU mask is unchanged.
        g_h_b = g_h.astype(jnp.bfloat16)
        # bf16 round-trip matches the XLA vjp chain (mlp2_reference's
        # feature cotangent passes through the bf16 dot) so the table grads
        # see the same rounding the unfused path produced.
        gfeats_scratch[:, :] = (
            jax.lax.dot_general(
                w0v,
                g_h_b.astype(head_dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            .astype(jnp.bfloat16)
            .astype(jnp.float32)
        )  # [D, BLK]

        if tables:
            dw1_ref[:, :] += jax.lax.dot_general(
                g_o.astype(head_dtype), h.astype(head_dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [O_pad, H]
            db1_ref[:, :] += jnp.sum(
                g_o.astype(jnp.float32), axis=1, keepdims=True
            )
            dw0_ref[:, :] += jax.lax.dot_general(
                g_h_b.astype(head_dtype), feats_b,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, D]
            db0_ref[:, :] += jnp.sum(g_h, axis=1, keepdims=True)

        # Table/coordinate grads: the tested standalone backward body,
        # reading the cotangent from the VMEM scratch instead of HBM.
        inner_kernel(
            coords_ref, gfeats_scratch, scale_ref, offset_ref,
            small_x, small_y, small_z, *large_refs, *enc_out_refs,
        )

    return kernel, small_res, large_res


@functools.partial(jax.jit, static_argnums=(0, 1, 9))
def fused_factor_density_bwd_tpu(
    resolutions: Tuple[int, ...],
    feat: int,
    packed: Tuple,
    coords01: jnp.ndarray,  # [N, 3] f32, pre-clipped
    w0: jnp.ndarray,  # [D, H] f32 (flax Dense layout)
    b0: jnp.ndarray,  # [H]
    w1: jnp.ndarray,  # [H, O]
    b1: jnp.ndarray,  # [O]
    g: jnp.ndarray,  # [N, O] f32 cotangent of the MLP output
    interpret: bool = False,
) -> Tuple[Tuple, Tuple, jnp.ndarray]:
    """Fully-fused backward of encode+2-layer-MLP.

    -> (grad_packed (structure of `packed`, f32),
        (gw0 [D, H], gb0 [H], gw1 [H, O], gb1 [O]),
        grad_coords [N, 3]).
    Feature/cotangent matrices never leave VMEM (see section comment)."""
    blk = 1024
    n = coords01.shape[0]
    n_pad = _round_up(max(n, blk), blk)
    coords_t = coords01.T
    d_in, hidden = w0.shape
    out_dim = w1.shape[1]
    assert d_in == len(resolutions) * feat
    assert hidden % 8 == 0, "hidden dim must be a multiple of 8 (sublanes)"
    out_pad = _round_up(out_dim, 8)
    g_t = jnp.pad(g.T, ((0, out_pad - out_dim), (0, 0)))  # [O_pad, N]
    if n_pad != n:
        coords_t = jnp.pad(coords_t, ((0, 0), (0, n_pad - n)))
        g_t = jnp.pad(g_t, ((0, 0), (0, n_pad - n)))

    # bf16 weight rounding = the Dense contract the forward kernel applies.
    w0t = w0.T.astype(jnp.bfloat16)  # [H, D]
    b0c = b0.reshape(hidden, 1).astype(jnp.float32)
    w1t = jnp.pad(w1.T, ((0, out_pad - out_dim), (0, 0))).astype(jnp.bfloat16)

    smalls, larges = packed
    head_dtype = jnp.float32 if interpret else jnp.bfloat16
    k_tables, small_res, large_res = _make_density_bwd_kernel(
        resolutions, feat, blk, "tables", head_dtype
    )
    k_coords, _, _ = _make_density_bwd_kernel(
        resolutions, feat, blk, "coords", head_dtype
    )
    s_scale, s_offset = small_meta(small_res)
    scale_arr = jnp.asarray(s_scale)
    offset_arr = jnp.asarray(s_offset)

    grid = (n_pad // blk,)
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((out_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        full(scale_arr.shape),
        full(offset_arr.shape),
        full(w0t.shape),
        full(b0c.shape),
        full(w1t.shape),
        *[full(s.shape) for s in smalls],
        *[full(b.shape) for b in larges],
    ]
    args = (coords_t, g_t, scale_arr, offset_arr, w0t, b0c, w1t, *smalls, *larges)
    scratch = [pltpu.VMEM((d_in, blk), jnp.float32)]

    table_outs = pl.pallas_call(
        k_tables,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            *[full(s.shape) for s in smalls],
            *[full(b.shape) for b in larges],
            full((hidden, d_in)),
            full((hidden, 1)),
            full((out_pad, hidden)),
            full((out_pad, 1)),
        ],
        out_shape=[
            *[jax.ShapeDtypeStruct(s.shape, jnp.float32) for s in smalls],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in larges],
            jax.ShapeDtypeStruct((hidden, d_in), jnp.float32),
            jax.ShapeDtypeStruct((hidden, 1), jnp.float32),
            jax.ShapeDtypeStruct((out_pad, hidden), jnp.float32),
            jax.ShapeDtypeStruct((out_pad, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    g_coords_t = pl.pallas_call(
        k_coords,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    g_smalls = tuple(table_outs[:3])
    g_larges = tuple(table_outs[3 : 3 + len(larges)])
    dw0_t, db0_c, dw1_t, db1_c = table_outs[3 + len(larges) :]
    g_ws = (
        dw0_t.T,  # [D, H] flax layout
        db0_c[:, 0],
        dw1_t[:out_dim].T,  # [H, O]
        db1_c[:out_dim, 0],
    )
    return (g_smalls, g_larges), g_ws, g_coords_t[:, :n].T
