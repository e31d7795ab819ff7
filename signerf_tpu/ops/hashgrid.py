"""Multi-resolution hash-grid encoding (instant-ngp style), TPU-native.

Capability parity target (SURVEY.md §2b "Nerfacto model"): the reference
reaches this through nerfstudio's ``HashEncoding``/tiny-cuda-nn CUDA kernels
(used by `NerfactoModel`, consumed at /root/reference/signerf/signerf.py:12).
Here it is a pure-XLA gather/trilinear-interp formulation that vectorizes over
levels, so the forward is a handful of fused gathers + FMAs and the backward
is XLA's native scatter-add — both of which map well onto TPU HBM bandwidth.

Design notes (TPU-first):
  * All levels share one ``[L, T, F]`` table so level processing is a single
    batched gather instead of a Python loop — one HLO, one fusion.
  * Dense-indexing vs. hashing per level is decided *statically* (resolutions
    are Python ints), so there is no data-dependent control flow under jit.
  * Hashing uses uint32 wraparound multiplies with the instant-ngp primes.
  * A Pallas kernel variant exists for the forward gather on larger batches;
    see `signerf_tpu/ops/pallas/hashgrid_kernel.py`. The jnp path is the
    reference implementation and the autodiff path.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# instant-ngp hashing primes (pi1=1 implicitly for x)
_PRIMES = (1, 2654435761, 805459861)


def hashgrid_resolutions(
    num_levels: int, base_res: int, max_res: int
) -> Tuple[int, ...]:
    """Per-level grid resolutions N_l = floor(N_min * b^l)."""
    if num_levels == 1:
        return (base_res,)
    growth = math.exp((math.log(max_res) - math.log(base_res)) / (num_levels - 1))
    return tuple(int(math.floor(base_res * growth**lvl)) for lvl in range(num_levels))


def init_hashgrid_table(
    key: jax.Array,
    num_levels: int,
    table_size: int,
    features_per_level: int,
    dtype=jnp.float32,
    scale: float = 1e-4,
) -> jnp.ndarray:
    """Uniform [-scale, scale] init, matching instant-ngp convention."""
    return jax.random.uniform(
        key,
        (num_levels, table_size, features_per_level),
        dtype=dtype,
        minval=-scale,
        maxval=scale,
    )


def _corner_indices(
    coords: jnp.ndarray, resolutions: Sequence[int], table_size: int
) -> jnp.ndarray:
    """Flat table indices of the 8 cell corners for every level.

    Args:
      coords: [L, N, 8, 3] int32 integer corner coordinates (already clamped
        to [0, N_l]).
      resolutions: python ints, length L.
      table_size: T.

    Returns:
      [L, N, 8] int32 indices into the per-level table.
    """
    num_levels = len(resolutions)
    out = []
    for lvl in range(num_levels):
        res = resolutions[lvl]
        c = coords[lvl]  # [N, 8, 3]
        if (res + 1) ** 3 <= table_size:
            # Dense: no collisions, row-major over (res+1)^3 grid.
            stride = res + 1
            idx = c[..., 0] + c[..., 1] * stride + c[..., 2] * stride * stride
        else:
            cu = c.astype(jnp.uint32)
            idx = (
                cu[..., 0] * jnp.uint32(_PRIMES[0])
                ^ cu[..., 1] * jnp.uint32(_PRIMES[1])
                ^ cu[..., 2] * jnp.uint32(_PRIMES[2])
            ) % jnp.uint32(table_size)
            idx = idx.astype(jnp.int32)
        out.append(idx)
    return jnp.stack(out, axis=0)


# The 8 unit-cube corner offsets, ordered x-fastest.
_OFFSETS = jnp.array(
    [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=jnp.int32
)  # [8, 3]


def hashgrid_encode(
    table: jnp.ndarray,
    positions: jnp.ndarray,
    resolutions: Sequence[int],
) -> jnp.ndarray:
    """Encode positions with a multiresolution hash grid.

    Args:
      table: [L, T, F] feature table.
      positions: [..., 3] in [0, 1]^3 (out-of-range values are clamped).
      resolutions: per-level grid resolutions (python ints, static).

    Returns:
      [..., L * F] concatenated per-level trilinear features.
    """
    num_levels, table_size, feat = table.shape
    assert len(resolutions) == num_levels
    batch_shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    pos = jnp.clip(pos, 0.0, 1.0)
    n = pos.shape[0]

    res_arr = jnp.asarray(resolutions, dtype=pos.dtype)  # [L]
    scaled = pos[None, :, :] * res_arr[:, None, None]  # [L, N, 3]
    floor = jnp.floor(scaled)
    frac = scaled - floor  # [L, N, 3]
    base = floor.astype(jnp.int32)  # [L, N, 3]

    corners = base[:, :, None, :] + _OFFSETS[None, None, :, :]  # [L, N, 8, 3]
    # Clamp into the valid grid range per level (static per level).
    max_coord = jnp.asarray([r for r in resolutions], jnp.int32)[:, None, None, None]
    corners = jnp.clip(corners, 0, max_coord)

    idx = _corner_indices(corners, resolutions, table_size)  # [L, N, 8]

    # Trilinear weights: prod over axes of (1-frac) or frac per corner bit.
    offs = _OFFSETS.astype(pos.dtype)  # [8, 3]
    w = jnp.prod(
        jnp.where(
            offs[None, None, :, :] > 0.5,
            frac[:, :, None, :],
            1.0 - frac[:, :, None, :],
        ),
        axis=-1,
    )  # [L, N, 8]

    # Batched gather: table [L, T, F], idx [L, N*8] -> [L, N*8, F]
    gathered = jax.vmap(lambda t, i: t[i])(table, idx.reshape(num_levels, -1))
    gathered = gathered.reshape(num_levels, n, 8, feat)

    feats = jnp.sum(w[..., None] * gathered, axis=2)  # [L, N, F]
    out = jnp.moveaxis(feats, 0, 1).reshape(n, num_levels * feat)
    return out.reshape(*batch_shape, num_levels * feat)
