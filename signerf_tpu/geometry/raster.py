"""Ray-traced proxy-mesh depth rendering (Möller–Trumbore, tiled).

Capability parity (SURVEY.md §2b "Offscreen mesh rasterization"): replaces
the reference's pyrender/EGL OffscreenRenderer
(/root/reference/signerf/renderer/renderer.py:149-196: IntrinsicsCamera with
znear 1e-4 / zfar 10, color+depth render, depth 0 on miss).

TPU-first design: instead of a GL rasterizer, a vmapped ray/triangle
intersector tiled over (ray chunk x triangle chunk) with a running min-t
carry under `lax.scan` — all static shapes, one fused kernel per tile, and
it runs on the same device as the NeRF render so the occlusion test
(mesh_depth < nerf_depth, datasetgenerator.py:719-721) never leaves HBM.

Deviation (improvement): depth is euclidean distance along the ray, not GL
z-buffer depth — consistent with the NeRF termination depth it is compared
against (the reference compares z-depth with ray-depth, a small geometric
mismatch away from the image center).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _moller_trumbore(
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    v0: jnp.ndarray,  # [F, 3]
    e1: jnp.ndarray,  # [F, 3]
    e2: jnp.ndarray,  # [F, 3]
) -> jnp.ndarray:
    """Min hit distance per ray over F triangles. Misses -> +inf. [N]"""
    eps = 1e-8
    h = jnp.cross(rays_d[:, None, :], e2[None, :, :])  # [N, F, 3]
    a = jnp.sum(e1[None] * h, axis=-1)  # [N, F]
    parallel = jnp.abs(a) < eps
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = rays_o[:, None, :] - v0[None, :, :]  # [N, F, 3]
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1[None, :, :])
    v = f * jnp.sum(rays_d[:, None, :] * q, axis=-1)
    t = f * jnp.sum(e2[None] * q, axis=-1)
    valid = (
        (~parallel)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    t = jnp.where(valid, t, jnp.inf)
    return jnp.min(t, axis=-1)  # [N]


def ray_mesh_depth(
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    verts: jnp.ndarray,  # [V, 3] (already posed in world space)
    faces: jnp.ndarray,  # [F, 3] int32
    tri_chunk: int = 512,
    ray_chunk: int = 4096,
) -> jnp.ndarray:
    """Min hit distance per ray, +inf on miss. Tiled to bound memory."""
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0

    num_faces = v0.shape[0]
    pad_f = (-num_faces) % tri_chunk
    if pad_f:
        # Degenerate padding triangles never hit (zero-area at origin).
        z = jnp.zeros((pad_f, 3), v0.dtype)
        v0 = jnp.concatenate([v0, z], 0)
        e1 = jnp.concatenate([e1, z], 0)
        e2 = jnp.concatenate([e2, z], 0)
    n_tri_chunks = v0.shape[0] // tri_chunk
    v0c = v0.reshape(n_tri_chunks, tri_chunk, 3)
    e1c = e1.reshape(n_tri_chunks, tri_chunk, 3)
    e2c = e2.reshape(n_tri_chunks, tri_chunk, 3)

    num_rays = rays_o.shape[0]
    pad_r = (-num_rays) % ray_chunk
    if pad_r:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad_r, 3), rays_o.dtype)], 0)
        rays_d = jnp.concatenate(
            [rays_d, jnp.ones((pad_r, 3), rays_d.dtype)], 0
        )
    n_ray_chunks = rays_o.shape[0] // ray_chunk
    roc = rays_o.reshape(n_ray_chunks, ray_chunk, 3)
    rdc = rays_d.reshape(n_ray_chunks, ray_chunk, 3)

    def per_ray_chunk(args):
        ro, rd = args

        def body(carry, tri):
            tv0, te1, te2 = tri
            t = _moller_trumbore(ro, rd, tv0, te1, te2)
            return jnp.minimum(carry, t), None

        init = jnp.full((ray_chunk,), jnp.inf, rays_o.dtype)
        t_min, _ = jax.lax.scan(body, init, (v0c, e1c, e2c))
        return t_min

    t = jax.lax.map(per_ray_chunk, (roc, rdc))
    return t.reshape(-1)[:num_rays]


def mesh_depth_render(
    camera,
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    znear: float = 1e-4,
    zfar: float = 10.0,
    color: Optional[Tuple[float, float, float]] = (0.0, 0.0, 0.0),
    camera_index: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render (color [H,W,3], depth [H,W,1]) of a posed mesh from a camera.

    Parity with `Renderer.render_camera` (renderer.py:149-196): depth is 0
    where the mesh is not hit (pyrender convention); hits outside
    [znear, zfar] are discarded; color is the flat material color on hits
    and white elsewhere (pyrender scene ambient=1, white background).
    """
    rb = camera.generate_rays(camera_index=camera_index)
    h, w = rb.origins.shape[:2]
    t = ray_mesh_depth(
        rb.origins.reshape(-1, 3), rb.directions.reshape(-1, 3), verts, faces
    ).reshape(h, w)
    hit = jnp.isfinite(t) & (t >= znear) & (t <= zfar)
    depth = jnp.where(hit, t, 0.0)[..., None]
    col = jnp.asarray(color, jnp.float32)
    color_img = jnp.where(
        hit[..., None], jnp.broadcast_to(col, (h, w, 3)), jnp.ones((h, w, 3))
    )
    return color_img, depth
