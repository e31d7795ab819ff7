"""Camera pose optimizer (SO3xR3) tests — exp map correctness and
ray-bundle application (cameras/camera_opt.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.cameras.camera_opt import (
    apply_camera_opt,
    exp_map_so3xr3,
    init_camera_opt,
)


class TestExpMap:
    def test_zero_tangent_is_identity(self):
        out = exp_map_so3xr3(jnp.zeros((2, 6)))
        np.testing.assert_allclose(
            np.asarray(out[:, :, :3]), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(out[:, :, 3]), 0.0, atol=1e-6)

    def test_rotation_about_z(self):
        theta = 0.3
        t = jnp.array([[0.0, 0.0, theta, 0.0, 0.0, 0.0]])
        rot = np.asarray(exp_map_so3xr3(t)[0, :, :3])
        expected = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        np.testing.assert_allclose(rot, expected, atol=1e-6)

    def test_rotation_is_orthonormal(self):
        t = jax.random.normal(jax.random.PRNGKey(0), (5, 6)) * 0.5
        rots = np.asarray(exp_map_so3xr3(t)[:, :, :3])
        for r in rots:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert abs(np.linalg.det(r) - 1.0) < 1e-5

    def test_translation_passthrough(self):
        t = jnp.array([[0.0, 0.0, 0.0, 1.0, 2.0, 3.0]])
        out = exp_map_so3xr3(t)
        np.testing.assert_allclose(np.asarray(out[0, :, 3]), [1, 2, 3], atol=1e-6)


class TestApply:
    def test_per_camera_adjustment(self):
        tangent = init_camera_opt(3)
        tangent = tangent.at[1].set(jnp.array([0, 0, np.pi / 2, 0.5, 0, 0]))
        origins = jnp.zeros((2, 3))
        dirs = jnp.array([[1.0, 0, 0], [1.0, 0, 0]])
        cam_idx = jnp.array([0, 1], jnp.int32)
        new_o, new_d = apply_camera_opt(tangent, origins, dirs, cam_idx)
        # camera 0: unchanged
        np.testing.assert_allclose(np.asarray(new_d[0]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_o[0]), 0.0, atol=1e-6)
        # camera 1: x-dir rotated to y, origin shifted +x
        np.testing.assert_allclose(np.asarray(new_d[1]), [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_o[1]), [0.5, 0, 0], atol=1e-6)

    @pytest.mark.slow
    def test_model_uses_camera_opt_in_train(self):
        from signerf_tpu.models.nerfacto import NerfactoModel
        from tests.test_nerfacto_core import make_bundle, tiny_config
        import dataclasses

        cfg = dataclasses.replace(tiny_config(), use_camera_opt=True)
        model = NerfactoModel(cfg, num_train_images=3)
        params = model.init(jax.random.PRNGKey(0))
        assert "camera_opt" in params
        rb = make_bundle(4)
        out_a = model.apply(params, rb, rng=jax.random.PRNGKey(1), train=True)
        # perturb camera 0's pose -> train outputs change
        p2 = dict(params)
        p2["camera_opt"] = params["camera_opt"].at[0, 3].set(0.5)
        out_b = model.apply(p2, rb, rng=jax.random.PRNGKey(1), train=True)
        assert not np.allclose(np.asarray(out_a["rgb"]), np.asarray(out_b["rgb"]))
        # eval ignores the adjustment
        out_c = model.apply(params, rb, train=False)
        out_d = model.apply(p2, rb, train=False)
        np.testing.assert_allclose(
            np.asarray(out_c["rgb"]), np.asarray(out_d["rgb"])
        )
