"""Camera pose synthesis: look-at poses on circles and random spheres.

Capability parity with /root/reference/signerf/utils/poses_generation.py:22-134
(`circle_poses`, `random_sphere_poses`): z-up world, camera +z points from the
target toward the camera (so the OpenGL camera, which looks along -z, faces
the target), x = normalize(z_up × z), y = z × x.

Implemented as pure jnp with explicit PRNG keys (JAX-style determinism instead
of the reference's global torch RNG).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """x / ||x|| with a clamped denominator (parity: poses_generation.py:9-20)."""
    return x / jnp.sqrt(jnp.clip(jnp.sum(x * x, -1, keepdims=True), min=eps))


def look_at_poses(positions: jnp.ndarray, target: Sequence[float]) -> jnp.ndarray:
    """Build [N, 4, 4] c2w matrices at ``positions`` looking at ``target``.

    z-up cross-product frame as in poses_generation.py:63-71.
    """
    target_v = jnp.asarray(target, jnp.float32)
    z = safe_normalize(positions - target_v)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), z.shape)
    x = safe_normalize(jnp.cross(up, z))
    y = safe_normalize(jnp.cross(z, x))
    n = positions.shape[0]
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
    poses = poses.at[:, :3, 0].set(x)
    poses = poses.at[:, :3, 1].set(y)
    poses = poses.at[:, :3, 2].set(z)
    poses = poses.at[:, :3, 3].set(positions)
    return poses


def circle_poses(
    size: int,
    radius: float,
    theta: float,
    phi: Tuple[float, float],
    position: Sequence[float] = (0.0, 0.0, 0.0),
    target: Sequence[float] = (0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """``size`` look-at poses on a circle (parity: poses_generation.py:22-73).

    theta: elevation angle from the +z axis in degrees (a polar angle — the
    reference parameterizes position as ``radius·sin(θ)`` in the xy plane and
    ``radius·cos(θ)`` along z). phi: (start, end) azimuth range in degrees,
    inclusive endpoints via linspace.
    """
    th = math.radians(theta)
    phis = jnp.linspace(math.radians(phi[0]), math.radians(phi[1]), size)
    pos_v = jnp.asarray(position, jnp.float32)
    positions = jnp.stack(
        [
            radius * math.sin(th) * jnp.cos(phis) + pos_v[0],
            radius * math.sin(th) * jnp.sin(phis) + pos_v[1],
            radius * math.cos(th) * jnp.ones_like(phis) + pos_v[2],
        ],
        axis=-1,
    )
    return look_at_poses(positions, target)


def random_sphere_poses(
    key: jax.Array,
    size: int,
    radius: float,
    theta: Tuple[float, float],
    phi: Tuple[float, float],
    position: Sequence[float] = (0.0, 0.0, 0.0),
    target: Sequence[float] = (0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """``size`` random look-at poses on a sphere cap, uniform in cos(theta)
    (parity: poses_generation.py:76-134).
    """
    k_theta, k_phi = jax.random.split(key)
    t_min = (1.0 - math.cos(math.radians(theta[0]))) * 0.5
    t_max = (1.0 - math.cos(math.radians(theta[1]))) * 0.5
    u = jax.random.uniform(k_theta, (size,)) * (t_max - t_min) + t_min
    thetas = jnp.arccos(1.0 - 2.0 * u)
    phis = (
        jax.random.uniform(k_phi, (size,))
        * (math.radians(phi[1]) - math.radians(phi[0]))
        + math.radians(phi[0])
    )
    pos_v = jnp.asarray(position, jnp.float32)
    positions = jnp.stack(
        [
            radius * jnp.sin(thetas) * jnp.cos(phis) + pos_v[0],
            radius * jnp.sin(thetas) * jnp.sin(phis) + pos_v[1],
            radius * jnp.cos(thetas) + pos_v[2],
        ],
        axis=-1,
    )
    return look_at_poses(positions, target)
