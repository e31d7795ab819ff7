"""Ray/primitive intersection utilities.

Capability parity with /root/reference/signerf/utils/intersection.py:5-112
(`intersect_with_aabb` slab method, `intersect_with_sphere` quadratic), used
for AABB-selection mask synthesis (datasetgenerator.py:763) and ray clipping.

Shape-polymorphic over leading batch dims; pure jnp (vmap/jit/shard friendly).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def intersect_with_aabb(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-method ray/AABB intersection.

    Args:
      rays_o: [..., 3] ray origins.
      rays_d: [..., 3] ray directions.
      aabb: [2, 3] — rows are (min_xyz, max_xyz).

    Returns:
      (nears, fars): each [..., 1]. Unclamped, like the reference
      (intersection.py:48-51 leaves the near-plane clamp commented out);
      nears > fars means no hit.
    """
    aabb = jnp.asarray(aabb, rays_o.dtype)
    inv_d = 1.0 / (rays_d + 1e-6)  # same epsilon convention as reference :33
    t_lo = (aabb[0] - rays_o) * inv_d  # [..., 3]
    t_hi = (aabb[1] - rays_o) * inv_d
    nears = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1, keepdims=True)
    fars = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1, keepdims=True)
    return nears, fars


def intersect_with_sphere(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    center: jnp.ndarray,
    radius: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quadratic ray/sphere intersection (parity: intersection.py:58-112).

    Assumes unit-norm directions. Non-hits (discriminant <= 0) collapse to the
    ray-perpendicular foot point, as in the reference (roots default to 0).
    Near/far are clamped to >= 0.
    """
    center = jnp.asarray(center, rays_o.dtype)
    oc = rays_o - center
    b = jnp.sum(oc * rays_d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    roots = jnp.where(disc > 0, jnp.sqrt(jnp.maximum(disc, 0.0)), 0.0)
    t1 = -b - roots
    t2 = -b + roots
    nears = jnp.clip(jnp.minimum(t1, t2), min=0.0)[..., None]
    fars = jnp.clip(jnp.maximum(t1, t2), min=0.0)[..., None]
    return nears, fars
