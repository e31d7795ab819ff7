"""Golden tests for camera math: poses, ray generation, distortion, intersection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.cameras import Cameras, circle_poses, random_sphere_poses
from signerf_tpu.cameras.cameras import _undistort_newton
from signerf_tpu.ops.intersection import intersect_with_aabb, intersect_with_sphere


def test_circle_poses_positions():
    # theta=90deg -> cameras on the equator (z = position_z)
    poses = circle_poses(size=4, radius=2.0, theta=90.0, phi=(0.0, 360.0), position=(0, 0, 0), target=(0, 0, 0))
    assert poses.shape == (4, 4, 4)
    np.testing.assert_allclose(np.asarray(poses[0, :3, 3]), [2.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(poses[:, 2, 3]), np.zeros(4), atol=1e-5)
    # radius preserved
    np.testing.assert_allclose(np.linalg.norm(np.asarray(poses[:, :3, 3]), axis=-1), 2.0, rtol=1e-5)


def test_circle_poses_look_at_target():
    poses = circle_poses(size=8, radius=1.5, theta=45.0, phi=(0.0, 270.0), target=(0.1, -0.2, 0.3))
    # camera -z (view direction) must point at the target
    cam_pos = np.asarray(poses[:, :3, 3])
    view = -np.asarray(poses[:, :3, 2])
    to_target = np.array([0.1, -0.2, 0.3]) - cam_pos
    to_target /= np.linalg.norm(to_target, axis=-1, keepdims=True)
    np.testing.assert_allclose(view, to_target, atol=1e-5)


def test_circle_poses_orthonormal():
    poses = np.asarray(circle_poses(size=5, radius=1.0, theta=60.0, phi=(0, 360)))
    rot = poses[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", rot, rot)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (5, 1, 1)), atol=1e-5)


def test_random_sphere_poses_radius_and_range():
    key = jax.random.PRNGKey(0)
    poses = random_sphere_poses(key, size=64, radius=3.0, theta=(30.0, 90.0), phi=(0.0, 180.0))
    pos = np.asarray(poses[:, :3, 3])
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 3.0, rtol=1e-5)
    polar = np.degrees(np.arccos(np.clip(pos[:, 2] / 3.0, -1, 1)))
    assert polar.min() >= 29.9 and polar.max() <= 90.1
    azim = np.degrees(np.arctan2(pos[:, 1], pos[:, 0]))
    assert azim.min() >= -0.1 and azim.max() <= 180.1


def _simple_cameras(n=2, w=32, h=24, dist=None):
    c2w = np.asarray(circle_poses(size=n, radius=2.0, theta=80.0, phi=(0, 120)))[:, :3, :4]
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.full((n,), 30.0),
        fy=jnp.full((n,), 30.0),
        cx=jnp.full((n,), w / 2),
        cy=jnp.full((n,), h / 2),
        distortion_params=dist,
        width=w,
        height=h,
    )


def test_generate_rays_shapes_and_norm():
    cams = _simple_cameras()
    rb = cams.generate_rays(camera_index=0)
    assert rb.origins.shape == (24, 32, 3)
    assert rb.directions.shape == (24, 32, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rb.directions), axis=-1), 1.0, atol=1e-5
    )
    # all origins equal camera position
    np.testing.assert_allclose(
        np.asarray(rb.origins[0, 0]), np.asarray(cams.camera_to_worlds[0, :3, 3]), atol=1e-6
    )


def test_center_ray_is_view_direction():
    cams = _simple_cameras()
    rb = cams.generate_rays(camera_index=1)
    center_dir = np.asarray(rb.directions[12, 16])  # pixel at principal point
    view = -np.asarray(cams.camera_to_worlds[1, :3, 2])
    np.testing.assert_allclose(center_dir, view, atol=2e-2)


def test_generate_rays_at_indices_match_full():
    cams = _simple_cameras()
    rb_full = cams.generate_rays(camera_index=0)
    idx = jnp.array([[0, 3, 5], [0, 20, 31]], jnp.int32)
    rb = cams.generate_rays_at(idx)
    np.testing.assert_allclose(
        np.asarray(rb.directions[0]), np.asarray(rb_full.directions[3, 5]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rb.directions[1]), np.asarray(rb_full.directions[20, 31]), atol=1e-6
    )


def test_undistort_newton_inverts_forward_model():
    # forward-distort a grid, then check the Newton solve recovers it
    dist = jnp.array([0.05, -0.01, 0.002, 0.0, 0.001, -0.002])
    x = jnp.linspace(-0.4, 0.4, 11)
    y = jnp.linspace(-0.3, 0.3, 9)
    xx, yy = jnp.meshgrid(x, y)
    k1, k2, k3, k4, p1, p2 = dist
    r2 = xx**2 + yy**2
    d = 1 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
    u = xx * d + 2 * p1 * xx * yy + p2 * (r2 + 2 * xx**2)
    v = yy * d + p1 * (r2 + 2 * yy**2) + 2 * p2 * xx * yy
    xs, ys = _undistort_newton(u, v, jnp.broadcast_to(dist, u.shape + (6,)))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yy), atol=1e-6)


def test_rescaled_intrinsics():
    cams = _simple_cameras(w=32, h=24)
    half = cams.rescaled(0.5)
    assert half.width == 16 and half.height == 12
    np.testing.assert_allclose(np.asarray(half.fx), 15.0)


# ---------------------------------------------------------------------------
# intersection golden tests (values hand-computed from the slab equations)
# ---------------------------------------------------------------------------


def test_intersect_with_aabb_axis_ray():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    nears, fars = intersect_with_aabb(o, d, aabb)
    np.testing.assert_allclose(np.asarray(nears[0, 0]), 2.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fars[0, 0]), 4.0, atol=1e-3)


def test_intersect_with_aabb_miss():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.array([[-3.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    nears, fars = intersect_with_aabb(o, d, aabb)
    assert float(nears[0, 0]) > float(fars[0, 0])  # miss convention


def test_intersect_with_aabb_batch_shape():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    o = jnp.zeros((4, 7, 3)) - jnp.array([3.0, 0, 0])
    d = jnp.tile(jnp.array([1.0, 0, 0]), (4, 7, 1))
    nears, fars = intersect_with_aabb(o, d, aabb)
    assert nears.shape == (4, 7, 1) and fars.shape == (4, 7, 1)


def test_intersect_with_sphere():
    o = jnp.array([[-3.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    nears, fars = intersect_with_sphere(o, d, jnp.zeros(3), 1.0)
    np.testing.assert_allclose(np.asarray(nears[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fars[0, 0]), 4.0, atol=1e-5)


def test_intersect_with_sphere_miss_clamps_zero():
    o = jnp.array([[-3.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    nears, fars = intersect_with_sphere(o, d, jnp.zeros(3), 1.0)
    # no hit: roots=0 -> t1=t2=-b=3 -> both clamp to 3 (foot of perpendicular)
    np.testing.assert_allclose(np.asarray(nears[0, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fars[0, 0]), 3.0, atol=1e-5)


def test_aabb_clipped_rays():
    cams = _simple_cameras()
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rb = cams.generate_rays(camera_index=0, aabb=aabb)
    assert rb.nears is not None and rb.fars is not None
    assert float(jnp.min(rb.nears)) >= 0.0
    assert bool(jnp.all(rb.fars >= rb.nears))
