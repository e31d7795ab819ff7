"""Camera pose optimizer (SO3xR3 exponential-map refinement).

Capability parity (SURVEY.md §2b): nerfacto carries a `CameraOptimizer`; the
reference effectively freezes it (lr 1e-15, signerf_config.py:57-60) and its
pose adjustments are *deleted* on checkpoint load
(/root/reference/signerf/signerf_pipeline.py:110-121). We implement the real
thing so the capability exists; the SIGNeRF configs freeze it the same way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_camera_opt(num_cameras: int) -> jnp.ndarray:
    """[N, 6] zeros: (so3 log-rotation, translation)."""
    return jnp.zeros((num_cameras, 6), jnp.float32)


def exp_map_so3xr3(tangent: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 4] rigid transforms (Rodrigues for the rotation)."""
    log_rot = tangent[..., :3]
    t = tangent[..., 3:]
    theta = jnp.linalg.norm(log_rot, axis=-1, keepdims=True)  # [..., 1]
    theta = jnp.maximum(theta, 1e-12)
    axis = log_rot / theta
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(kx)
    k_mat = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], -1),
            jnp.stack([kz, zero, -kx], -1),
            jnp.stack([-ky, kx, zero], -1),
        ],
        axis=-2,
    )  # [..., 3, 3]
    st = jnp.sin(theta)[..., None]
    ct = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), k_mat.shape)
    rot = eye + st * k_mat + (1.0 - ct) * (k_mat @ k_mat)
    # Small-angle fallback: identity rotation.
    small = (theta < 1e-8)[..., None]
    rot = jnp.where(small, eye, rot)
    return jnp.concatenate([rot, t[..., :, None]], axis=-1)  # [..., 3, 4]


def apply_camera_opt(
    tangent: jnp.ndarray,  # [N_cams, 6]
    origins: jnp.ndarray,  # [R, 3]
    directions: jnp.ndarray,  # [R, 3]
    camera_indices: jnp.ndarray,  # [R] int32
):
    """Apply per-camera pose correction to rays."""
    adj = exp_map_so3xr3(tangent[camera_indices])  # [R, 3, 4]
    rot = adj[..., :3]
    new_o = origins + adj[..., 3]
    new_d = jnp.einsum("rij,rj->ri", rot, directions)
    return new_o, new_d
