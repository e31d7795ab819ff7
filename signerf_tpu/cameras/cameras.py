"""Camera models and vmapped ray generation.

Capability parity target (SURVEY.md §2b "Ray generation & camera math"):
the reference consumes ``nerfstudio.cameras.cameras.Cameras.generate_rays``
(used at /root/reference/signerf/datasetgenerator/datasetgenerator.py:691 and
signerf/data/signerf_dataloader.py:66) with per-frame pinhole intrinsics and
OpenCV distortion parameters parsed from transforms.json
(signerf/data/signerf_dataparser.py:129-138,257-268).

Conventions (matching the reference/nerfstudio):
  * world: z-up, right-handed;
  * camera-to-world is OpenGL style — camera x right, y up, looks along -z;
  * image coordinates: x right, y down; pixel centers at +0.5;
  * ray direction in camera frame: ``[(u-cx)/fx, -(v-cy)/fy, -1]``.

Everything here is pure jnp and shape-static, so full-image ray generation
jits once per resolution and vmaps/shards trivially over cameras or pixels.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class CameraType(enum.IntEnum):
    PERSPECTIVE = 0
    FISHEYE = 1
    EQUIRECTANGULAR = 2


@struct.dataclass
class RayBundle:
    """A batch of rays. All leading dims are arbitrary batch dims."""

    origins: jnp.ndarray  # [..., 3]
    directions: jnp.ndarray  # [..., 3] unit-norm
    pixel_area: jnp.ndarray  # [..., 1]
    camera_indices: jnp.ndarray  # [..., 1] int32
    nears: Optional[jnp.ndarray] = None  # [..., 1]
    fars: Optional[jnp.ndarray] = None  # [..., 1]

    @property
    def shape(self):
        return self.origins.shape[:-1]

    def reshape(self, shape) -> "RayBundle":
        def rs(x):
            return None if x is None else x.reshape(tuple(shape) + (x.shape[-1],))

        return RayBundle(
            origins=rs(self.origins),
            directions=rs(self.directions),
            pixel_area=rs(self.pixel_area),
            camera_indices=rs(self.camera_indices),
            nears=rs(self.nears),
            fars=rs(self.fars),
        )


def _undistort_newton(
    u: jnp.ndarray,
    v: jnp.ndarray,
    dist: jnp.ndarray,
    num_iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Invert the OpenCV radial/tangential distortion model by Newton iteration.

    ``dist`` = [k1, k2, k3, k4, p1, p2] (nerfstudio parameter order, see
    signerf_dataparser.py:129-138). Forward model::

        r2 = x^2 + y^2
        d  = 1 + k1 r2 + k2 r2^2 + k3 r2^3 + k4 r2^4
        u  = x d + 2 p1 x y + p2 (r2 + 2 x^2)
        v  = y d + p1 (r2 + 2 y^2) + 2 p2 x y

    A fixed-iteration (static, jit-friendly) 2x2 Newton solve for (x, y).
    """
    k1, k2, k3, k4, p1, p2 = (dist[..., i] for i in range(6))

    def residual(x, y):
        r2 = x * x + y * y
        d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        fu = x * d + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - u
        fv = y * d + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y - v
        # Jacobian
        d_r2 = k1 + r2 * (2.0 * k2 + r2 * (3.0 * k3 + r2 * 4.0 * k4))
        fu_x = d + 2.0 * x * x * d_r2 + 2.0 * p1 * y + 6.0 * p2 * x
        fu_y = 2.0 * x * y * d_r2 + 2.0 * p1 * x + 2.0 * p2 * y
        fv_x = 2.0 * x * y * d_r2 + 2.0 * p1 * x + 2.0 * p2 * y
        fv_y = d + 2.0 * y * y * d_r2 + 6.0 * p1 * y + 2.0 * p2 * x
        return fu, fv, fu_x, fu_y, fv_x, fv_y

    def body(_, xy):
        x, y = xy
        fu, fv, fu_x, fu_y, fv_x, fv_y = residual(x, y)
        det = fu_x * fv_y - fu_y * fv_x
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (fu * fv_y - fv * fu_y) / det
        dy = (fv * fu_x - fu * fv_x) / det
        return (x - dx, y - dy)

    x, y = jax.lax.fori_loop(0, num_iters, body, (u, v))
    return x, y


@struct.dataclass
class Cameras:
    """Batched pinhole cameras (pytree). Leading dim = number of cameras.

    ``width``/``height`` are static (pytree aux data) so full-image ray
    generation traces with static shapes, as XLA requires.
    """

    camera_to_worlds: jnp.ndarray  # [N, 3, 4]
    fx: jnp.ndarray  # [N]
    fy: jnp.ndarray  # [N]
    cx: jnp.ndarray  # [N]
    cy: jnp.ndarray  # [N]
    distortion_params: Optional[jnp.ndarray] = None  # [N, 6] k1..k4,p1,p2
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    camera_type: int = struct.field(pytree_node=False, default=int(CameraType.PERSPECTIVE))

    def __len__(self) -> int:
        return self.camera_to_worlds.shape[0]

    @property
    def image_width(self) -> int:
        return self.width

    @property
    def image_height(self) -> int:
        return self.height

    def slice(self, idx) -> "Cameras":
        """Select a subset of cameras (python-level, static)."""
        dp = None if self.distortion_params is None else self.distortion_params[idx]
        return Cameras(
            camera_to_worlds=self.camera_to_worlds[idx],
            fx=self.fx[idx],
            fy=self.fy[idx],
            cx=self.cx[idx],
            cy=self.cy[idx],
            distortion_params=dp,
            width=self.width,
            height=self.height,
            camera_type=self.camera_type,
        )

    def rescaled(self, scale: float) -> "Cameras":
        """Rescale output resolution (parity: nerfstudio
        ``rescale_output_resolution``, used at signerf_dataparser.py:290)."""
        return Cameras(
            camera_to_worlds=self.camera_to_worlds,
            fx=self.fx * scale,
            fy=self.fy * scale,
            cx=self.cx * scale,
            cy=self.cy * scale,
            distortion_params=self.distortion_params,
            width=int(round(self.width * scale)),
            height=int(round(self.height * scale)),
            camera_type=self.camera_type,
        )

    # ------------------------------------------------------------------
    # ray generation
    # ------------------------------------------------------------------

    def _pixel_to_directions(
        self, cam_idx: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Camera-frame directions + world directions for pixel coords.

        cam_idx: [...] int32; px, py: [...] float (pixel centers already +0.5).
        Returns (world_dirs [...,3], pixel_area [...,1]).
        """
        fx = self.fx[cam_idx]
        fy = self.fy[cam_idx]
        cx = self.cx[cam_idx]
        cy = self.cy[cam_idx]
        u = (px - cx) / fx
        v = (py - cy) / fy
        if self.distortion_params is not None:
            dist = self.distortion_params[cam_idx]
            u, v = _undistort_newton(u, v, dist)
        # OpenGL camera: x right, y up, -z forward; image y is down.
        dirs_cam = jnp.stack([u, -v, -jnp.ones_like(u)], axis=-1)
        c2w = self.camera_to_worlds[cam_idx]  # [..., 3, 4]
        rot = c2w[..., :3, :3]
        dirs_world = jnp.einsum("...ij,...j->...i", rot, dirs_cam)
        norm = jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
        dirs_world = dirs_world / jnp.maximum(norm, 1e-12)
        # pixel area on the unit-distance image plane, scaled by direction norm
        pixel_area = (1.0 / (fx * fy)) / jnp.squeeze(norm, -1) ** 2
        return dirs_world, pixel_area[..., None]

    def generate_rays(
        self,
        camera_index: int = 0,
        aabb: Optional[jnp.ndarray] = None,
        nears: Optional[float] = None,
        fars: Optional[float] = None,
    ) -> RayBundle:
        """Full-image ray bundle [H, W] for one camera.

        ``aabb`` ([2,3]) clips rays to a scene box, matching the reference's
        ``camera.generate_rays(..., aabb_box=render_aabb)`` call at
        datasetgenerator.py:691.
        """
        h, w = self.height, self.width
        ys = jnp.arange(h, dtype=jnp.float32) + 0.5
        xs = jnp.arange(w, dtype=jnp.float32) + 0.5
        py, px = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]
        cam_idx = jnp.full((h, w), camera_index, dtype=jnp.int32)
        return self._rays_from_pixels(cam_idx, px, py, aabb, nears, fars)

    def generate_rays_at(
        self,
        indices: jnp.ndarray,
        aabb: Optional[jnp.ndarray] = None,
    ) -> RayBundle:
        """Rays for sampled pixels. indices: [N, 3] int = (camera, y, x)."""
        cam_idx = indices[..., 0]
        py = indices[..., 1].astype(jnp.float32) + 0.5
        px = indices[..., 2].astype(jnp.float32) + 0.5
        return self._rays_from_pixels(cam_idx, px, py, aabb, None, None)

    def _rays_from_pixels(self, cam_idx, px, py, aabb, nears, fars) -> RayBundle:
        dirs, pixel_area = self._pixel_to_directions(cam_idx, px, py)
        origins = jnp.broadcast_to(
            self.camera_to_worlds[cam_idx][..., :3, 3], dirs.shape
        )
        near_arr = far_arr = None
        if aabb is not None:
            from signerf_tpu.ops.intersection import intersect_with_aabb

            n, f = intersect_with_aabb(origins, dirs, aabb)
            near_arr = jnp.maximum(n, 0.0)
            far_arr = jnp.maximum(f, near_arr + 1e-6)
        if nears is not None:
            near_arr = jnp.full(dirs.shape[:-1] + (1,), nears, jnp.float32)
        if fars is not None:
            far_arr = jnp.full(dirs.shape[:-1] + (1,), fars, jnp.float32)
        return RayBundle(
            origins=origins,
            directions=dirs,
            pixel_area=pixel_area,
            camera_indices=cam_idx[..., None].astype(jnp.int32),
            nears=near_arr,
            fars=far_arr,
        )
