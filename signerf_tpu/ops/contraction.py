"""Scene contraction (mipnerf360-style, L-inf norm) and normalization.

Capability parity (SURVEY.md §2b): nerfacto wraps its field in
``SceneContraction(order=inf)`` so unbounded scenes map into [-2, 2]^3; the
reference consumes it via `NerfactoModel` (/root/reference/signerf/signerf.py:12).

Pure elementwise jnp (VPU work, fuses into the hash-grid position prep).
"""

from __future__ import annotations

import jax.numpy as jnp


def contract(positions: jnp.ndarray, order: float = jnp.inf) -> jnp.ndarray:
    """Map R^3 -> ball of radius 2: x if |x|<=1 else (2 - 1/|x|) * x/|x|.

    The unselected `where` branch must stay differentiable: with raw `mag`,
    d(scaled)/dx near mag->0 is inf, and reverse-mode through `where`
    produces 0 * inf = NaN — which surfaces exactly when gradient normals
    differentiate the density w.r.t. positions (predict_normals training).
    `mag_safe` clamps the scaled branch's input to >= 1 so both branches
    have finite gradients everywhere (standard double-where guard).
    """
    if order == jnp.inf and positions.shape[-1] == 3:
        # Component-unstacked path: [N, 3] puts the size-3 axis on vreg
        # lanes (3 of 128 occupied), so the rowwise max-reduce and every
        # elementwise op run at ~2% lane efficiency — measured 1.38 ms for
        # 2.1M samples on v5e (RENDER_BREAKDOWN.json "contraction"), ~23x
        # off bandwidth. Unstacking to three dense [N] vectors turns the
        # reduce into two elementwise maximums and runs every op at full
        # lane width; the only layout cost is the unstack/restack copies.
        x = positions[..., 0]
        y = positions[..., 1]
        z = positions[..., 2]
        mag = jnp.maximum(jnp.maximum(jnp.abs(x), jnp.abs(y)), jnp.abs(z))
        mag_safe = jnp.maximum(mag, 1.0)
        s = (2.0 - 1.0 / mag_safe) / mag_safe
        s = jnp.where(mag <= 1.0, jnp.ones_like(s), s)
        return jnp.stack([x * s, y * s, z * s], axis=-1)
    if order == jnp.inf:
        mag = jnp.max(jnp.abs(positions), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(positions, ord=order, axis=-1, keepdims=True)
    mag_safe = jnp.maximum(mag, 1.0)
    scaled = (2.0 - 1.0 / mag_safe) * (positions / mag_safe)
    return jnp.where(mag <= 1.0, positions, scaled)


def contract_to_unit(positions: jnp.ndarray, order: float = jnp.inf) -> jnp.ndarray:
    """Contract and shift into [0, 1]^3 for hash-grid lookup ((x+2)/4)."""
    return (contract(positions, order) + 2.0) / 4.0


def normalize_aabb(positions: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """Affine map of an AABB ([2,3]) into [0,1]^3 (proposal fields w/o
    contraction use this)."""
    return (positions - aabb[0]) / (aabb[1] - aabb[0])
