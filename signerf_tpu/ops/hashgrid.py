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
  * This jnp path is both the reference implementation and the autodiff
    path. The TPU-fast spatial encoding is the factorized grid
    (`ops/factor_grid.py` + the Pallas kernels in
    `ops/fused_factor_pallas.py`); hash lookups stay gather-bound on TPU,
    which is why "factor" is the default backend.
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


def _corner_index(
    coords: jnp.ndarray, resolutions: Sequence[int], table_size: int
) -> jnp.ndarray:
    """Flat table indices of ONE corner, vectorized over levels.

    Dense-vs-hash is a per-level *static* choice; both index forms are
    computed vectorized and merged with a static mask so the HLO contains a
    single fused elementwise block regardless of L (compile-time matters:
    the remote-compile path chokes on L-unrolled graphs).

    Args:
      coords: [L, N, 3] int32 corner coordinates (already clamped to
        [0, N_l]).
      resolutions: python ints, length L.
      table_size: T.

    Returns:
      [L, N] int32 indices into the per-level table.
    """
    strides = jnp.asarray([r + 1 for r in resolutions], jnp.int32)[:, None]
    dense_mask = jnp.asarray(
        [(r + 1) ** 3 <= table_size for r in resolutions], bool
    )[:, None]
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    idx_dense = x + y * strides + z * strides * strides
    cu = coords.astype(jnp.uint32)
    idx_hash = (
        cu[..., 0] * jnp.uint32(_PRIMES[0])
        ^ cu[..., 1] * jnp.uint32(_PRIMES[1])
        ^ cu[..., 2] * jnp.uint32(_PRIMES[2])
    ) % jnp.uint32(table_size)
    return jnp.where(dense_mask, idx_dense, idx_hash.astype(jnp.int32))


# The 8 unit-cube corner offsets, ordered x-fastest.
_OFFSETS = tuple((i & 1, (i >> 1) & 1, (i >> 2) & 1) for i in range(8))


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

    Memory note: the 8 cube corners are processed in a python loop with an
    in-place accumulator, so peak intermediates are O(L*N*F) — NOT
    O(L*N*8*F). At render scale (N ~ 8M samples, L=16) the 8x-materialized
    form would be multiple GiB of index/weight arrays and stalls HBM; the
    looped form is what lets a 32768-ray render chunk fit comfortably.
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
    max_coord = jnp.asarray(list(resolutions), jnp.int32)[:, None, None]

    feats = jnp.zeros((num_levels, n, feat), pos.dtype)
    for off in _OFFSETS:
        off_arr = jnp.asarray(off, jnp.int32)
        corner = jnp.clip(base + off_arr, 0, max_coord)  # [L, N, 3]
        idx = _corner_index(corner, resolutions, table_size)  # [L, N]
        # Trilinear weight for this corner: prod over axes.
        w = jnp.prod(
            jnp.where(
                jnp.asarray(off, pos.dtype) > 0.5, frac, 1.0 - frac
            ),
            axis=-1,
        )  # [L, N]
        gathered = jax.vmap(lambda t, i: t[i])(table, idx)  # [L, N, F]
        feats = feats + w[..., None] * gathered

    out = jnp.moveaxis(feats, 0, 1).reshape(n, num_levels * feat)
    return out.reshape(*batch_shape, num_levels * feat)
