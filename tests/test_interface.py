"""Interface tests: headless Generation API + built-in web viewer over the
tiny e2e trainer (SURVEY.md §2a Interface/Viewer parity)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from signerf_tpu.diffusion.diffuser import Diffuser
from signerf_tpu.engine.trainer import SIGNeRFTrainer
from signerf_tpu.interface.api import GenerationInterface
from signerf_tpu.interface.app import ViewerServer
from tests.test_pipeline_e2e import (
    fake_diffuse,
    tiny_trainer_config,
    write_tiny_dataset,
)


@pytest.fixture(scope="module")
def iface(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("iface")
    data = write_tiny_dataset(tmp / "data")
    cfg = tiny_trainer_config(data, tmp / "out")
    trainer = SIGNeRFTrainer(cfg)
    diffuser = Diffuser(
        cfg.pipeline.dataset_generator.diffuser, custom_fn=fake_diffuse
    )
    trainer.setup(diffuser=diffuser)
    return GenerationInterface(trainer)


class TestGenerationAPI:
    def test_reference_circle_count(self, iface):
        poses = iface.set_reference_circle(radius=2.0, theta=60.0)
        assert poses.shape == (3, 3, 4)  # 2x2 grid -> 3 refs

    def test_reference_pose_validation(self, iface):
        with pytest.raises(ValueError):
            iface.set_reference_poses(np.zeros((5, 3, 4)))

    def test_dataset_cameras_synthetic(self, iface):
        iface.set_dataset_cameras(mode="synthetic", count=7, radius=2.0)
        assert iface.use_synthetic and iface.synthetic_poses.shape == (7, 3, 4)
        iface.set_dataset_cameras(mode="original")
        assert not iface.use_synthetic

    def test_selection_writethrough(self, iface):
        iface.set_selection_aabb((-1, -1, -1), (1, 1, 1), inverse_mask=True)
        gc = iface.gen_config
        assert gc.masking_mode == "aabb"
        assert gc.aabb_max == (1, 1, 1) and gc.inverse_mask
        gc.inverse_mask = False
        iface.set_selection_shape("icosphere", position=(0.1, 0.2, 0.3))
        assert gc.masking_mode == "shape"
        assert gc.renderer.position == (0.1, 0.2, 0.3)
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))

    def test_generation_params_writethrough(self, iface):
        iface.set_generation_params(prompt="a red bear", num_inference_steps=5)
        assert iface.gen_config.diffuser.prompt == "a red bear"
        assert (
            iface.trainer.pipeline.dataset_generator.diffuser.config.prompt
            == "a red bear"
        )

    @pytest.mark.slow
    def test_preview_generation(self, iface):
        iface.set_reference_circle(radius=2.0, theta=60.0)
        sheets = iface.preview_generation()
        assert set(sheets) == {"image", "mask", "condition", "edited"}
        h, w = sheets["image"].shape[:2]
        assert h % 8 == 0 and w % 8 == 0
        # fake diffuser painted the masked region: edited != image somewhere
        if sheets["mask"].sum() > 0:
            assert not np.allclose(sheets["edited"], sheets["image"])


@pytest.mark.slow
class TestViewerServer:
    @pytest.fixture(scope="class")
    def server(self, iface):
        srv = ViewerServer(iface, port=0)
        httpd = srv.start_background()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", iface
        httpd.shutdown()

    def _get(self, url, timeout=240):
        # generous: first request compiles the render graph on CPU
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, r.read()

    def _post(self, url, body=b"{}"):
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read()

    def test_index_page(self, server):
        base, _ = server
        status, body = self._get(base + "/")
        assert status == 200 and b"SIGNeRF-TPU viewer" in body

    def test_state_endpoint(self, server):
        base, iface = server
        status, body = self._get(base + "/state")
        assert status == 200
        state = json.loads(body)
        assert state["training_state"] in ("paused", "training", "completed")
        assert "step" in state

    def test_render_endpoint(self, server):
        base, _ = server
        status, body = self._get(base + "/render?yaw=30&pitch=60&radius=2.0")
        assert status == 200 and body[:4] == b"\x89PNG"

    def test_events_sse_pushes_state(self, server):
        """/events streams state as SSE: an immediate push on connect, and
        a pushed update when training_state changes (no client polling)."""
        base, iface = server
        with urllib.request.urlopen(base + "/events", timeout=60) as r:
            assert r.headers.get("Content-Type", "").startswith(
                "text/event-stream"
            )
            line = r.readline()
            while not line.startswith(b"data: "):
                line = r.readline()
            first = json.loads(line[len(b"data: "):])
            assert "training_state" in first and "step" in first
            # flip the state; the stream must push the new value
            prev = iface.trainer.training_state
            iface.trainer.training_state = (
                "paused" if prev != "paused" else "training"
            )
            try:
                line = r.readline()
                while not line.startswith(b"data: "):
                    line = r.readline()
                second = json.loads(line[len(b"data: "):])
                assert second["training_state"] != first["training_state"]
            finally:
                iface.trainer.training_state = prev

    def test_train_pause_resume(self, server):
        base, iface = server
        self._post(base + "/train", json.dumps({"state": "paused"}).encode())
        assert iface.trainer.training_state == "paused"
        self._post(base + "/train", json.dumps({"state": "training"}).encode())
        assert iface.trainer.training_state == "training"

    def test_params_endpoint(self, server):
        base, iface = server
        self._post(
            base + "/params", json.dumps({"prompt": "from http"}).encode()
        )
        assert iface.gen_config.diffuser.prompt == "from http"

    def test_preview_endpoint(self, server):
        base, _ = server
        status, body = self._post(base + "/preview")
        assert status == 200
        sheets = json.loads(body)
        assert set(sheets) == {"image", "mask", "condition", "edited"}
        import base64

        png = base64.b64decode(sheets["edited"])
        assert png[:4] == b"\x89PNG"

    def test_export_endpoints(self, server, tmp_path):
        base, _ = server
        pc = tmp_path / "pc.ply"
        status, body = self._post(
            base + "/export",
            json.dumps(
                {"kind": "pointcloud", "path": str(pc), "downscale": 2,
                 "min_accumulation": 0.0, "num_points": 200}
            ).encode(),
        )
        assert status == 200
        out = json.loads(body)
        assert out["points"] > 0 and pc.exists()

        mesh = tmp_path / "m.obj"
        status, body = self._post(
            base + "/export",
            json.dumps(
                {"kind": "mesh", "path": str(mesh), "resolution": 16,
                 "iso": "p50"}
            ).encode(),
        )
        assert status == 200
        out = json.loads(body)
        assert out["faces"] > 0 and mesh.exists()


class TestOverlay:
    """Wireframe overlay math (viewer 3D scene parity: frustums, AABB box,
    proxy wire, screen-drag unprojection)."""

    def _cam(self, size=64):
        from signerf_tpu.cameras.poses import circle_poses

        pose = np.asarray(
            circle_poses(1, radius=2.0, theta=55.0, phi=(30.0, 30.0))
        )[0, :3, :]
        return {
            "c2w": pose,
            "fx": size * 1.2,
            "fy": size * 1.2,
            "cx": size / 2,
            "cy": size / 2,
        }

    def test_project_center_lands_on_principal_point(self):
        from signerf_tpu.interface.overlay import project_points

        cam = self._cam()
        # the orbit camera looks at the origin
        xy, depth = project_points(
            np.zeros((1, 3)), cam["c2w"], cam["fx"], cam["fy"], cam["cx"], cam["cy"]
        )
        assert depth[0] > 0
        np.testing.assert_allclose(xy[0], [cam["cx"], cam["cy"]], atol=1e-5)

    def test_point_behind_camera_culled(self):
        from signerf_tpu.interface.overlay import draw_segments

        cam = self._cam()
        origin = cam["c2w"][:3, 3]
        behind = origin + cam["c2w"][:3, 2] * 1.0  # +z = backward
        img = np.zeros((64, 64, 3), np.float32)
        segs = np.asarray([[behind, behind + 0.01]])
        out = draw_segments(
            img, segs, (1, 0, 0), cam["c2w"], cam["fx"], cam["fy"], cam["cx"], cam["cy"]
        )
        assert out.sum() == 0.0

    def test_aabb_segments_are_twelve_edges(self):
        from signerf_tpu.interface.overlay import aabb_segments

        segs = aabb_segments((-1, -2, -3), (1, 2, 3))
        assert segs.shape == (12, 2, 3)
        lens = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
        assert sorted(np.unique(np.round(lens, 5))) == [2.0, 4.0, 6.0]

    def test_compose_overlays_draws_box(self):
        from signerf_tpu.interface.overlay import COLOR_AABB, compose_overlays

        cam = self._cam()
        rgb = np.zeros((64, 64, 3), np.float32)
        scene = {
            "train_poses": None,
            "reference_poses": None,
            "synthetic_poses": None,
            "aabb": ((-0.3, -0.3, -0.3), (0.3, 0.3, 0.3)),
            "shape": None,
        }
        out = compose_overlays(rgb, cam, scene, {"aabb": True})
        assert out.sum() > 0
        # drawn pixels carry the AABB palette color
        lit = out[out.sum(-1) > 0]
        np.testing.assert_allclose(lit.mean(0), np.asarray(COLOR_AABB) * 0.9, atol=0.05)

    def test_frustum_segments_shape(self):
        from signerf_tpu.interface.overlay import frustums_for_poses

        poses = np.tile(np.eye(4)[:3], (5, 1, 1))
        segs = frustums_for_poses(poses)
        assert segs.shape == (5 * 9, 2, 3)

    def test_pixel_drag_is_camera_plane(self):
        from signerf_tpu.interface.overlay import pixel_drag_to_world, project_points

        cam = self._cam()
        point = np.zeros(3)
        delta = pixel_drag_to_world(10.0, 0.0, cam["c2w"], cam["fx"], cam["fy"], point)
        # dragging +x in screen space moves the projected point +x on screen
        xy0, _ = project_points(point[None], cam["c2w"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])
        xy1, _ = project_points((point + delta)[None], cam["c2w"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])
        np.testing.assert_allclose(xy1[0] - xy0[0], [10.0, 0.0], atol=1e-3)
        delta_y = pixel_drag_to_world(0.0, 7.0, cam["c2w"], cam["fx"], cam["fy"], point)
        xy2, _ = project_points((point + delta_y)[None], cam["c2w"], cam["fx"], cam["fy"], cam["cx"], cam["cy"])
        np.testing.assert_allclose(xy2[0] - xy0[0], [0.0, 7.0], atol=1e-3)


class TestSceneManipulation:
    def test_scene_elements_aabb_mode(self, iface):
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))
        iface.set_reference_circle(radius=2.0, theta=60.0)
        s = iface.scene_elements()
        assert s["train_poses"] is not None and s["train_poses"].shape[-2:] == (3, 4)
        assert s["reference_poses"].shape == (3, 3, 4)
        assert s["aabb"] == ((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))
        assert s["shape"] is None

    def test_scene_elements_shape_mode(self, iface):
        iface.set_selection_shape("bunny", position=(0.1, 0.0, 0.0))
        s = iface.scene_elements()
        assert s["aabb"] is None
        assert s["shape"] is not None and len(s["shape"]["verts"]) > 100
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))

    def test_nudge_aabb_translate_and_scale(self, iface):
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))
        iface.nudge("aabb", translate=(0.1, 0.0, 0.0))
        gc = iface.gen_config
        np.testing.assert_allclose(gc.aabb_min, (-0.3, -0.4, -0.4), atol=1e-9)
        np.testing.assert_allclose(gc.aabb_max, (0.5, 0.4, 0.4), atol=1e-9)
        iface.nudge("aabb", scale=2.0)
        np.testing.assert_allclose(gc.aabb_min, (-0.7, -0.8, -0.8), atol=1e-9)
        np.testing.assert_allclose(gc.aabb_max, (0.9, 0.8, 0.8), atol=1e-9)
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))

    def test_nudge_shape_writethrough(self, iface):
        iface.set_selection_shape("bunny", position=(0.0, 0.0, 0.0), scale=(0.1, 0.1, 0.1))
        iface.nudge("shape", translate=(0.0, 0.2, 0.0), scale=1.5, rotate_deg=(0, 0, 90))
        rc = iface.gen_config.renderer
        np.testing.assert_allclose(rc.position, (0.0, 0.2, 0.0))
        np.testing.assert_allclose(rc.scale, (0.15, 0.15, 0.15))
        np.testing.assert_allclose(rc.rotation, (0, 0, 90))
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))

    def test_nudge_reference_recenters_circle(self, iface):
        iface.set_reference_circle(radius=2.0, theta=60.0)
        before = iface.reference_poses.copy()
        iface.nudge("reference", translate=(0.5, 0.0, 0.0))
        after = iface.reference_poses
        # whole ring translated by the nudge
        np.testing.assert_allclose(
            after[:, :3, 3] - before[:, :3, 3],
            np.tile([[0.5, 0.0, 0.0]], (len(before), 1)),
            atol=1e-5,
        )
        assert iface.circle_params["position"] == (0.5, 0.0, 0.0)

    def test_drag_moves_aabb_in_camera_plane(self, iface):
        from signerf_tpu.cameras.poses import circle_poses

        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))
        pose = np.asarray(circle_poses(1, radius=2.0, theta=55.0, phi=(0.0, 0.0)))[0, :3, :]
        cam = {"c2w": pose, "fx": 76.8, "fy": 76.8}
        iface.drag("aabb", 10.0, 0.0, cam)
        gc = iface.gen_config
        center = 0.5 * (np.asarray(gc.aabb_min) + np.asarray(gc.aabb_max))
        assert np.linalg.norm(center) > 0.01  # moved
        # extent unchanged by a pure drag
        np.testing.assert_allclose(
            np.asarray(gc.aabb_max) - np.asarray(gc.aabb_min), 0.8, atol=1e-9
        )
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))


@pytest.mark.slow
class TestViewerSceneEndpoints:
    @pytest.fixture(scope="class")
    def server(self, iface):
        srv = ViewerServer(iface, port=0)
        httpd = srv.start_background()
        yield f"http://127.0.0.1:{httpd.server_address[1]}", iface
        httpd.shutdown()

    def _get(self, url, timeout=240):
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, r.read()

    def _post(self, url, obj):
        req = urllib.request.Request(
            url, data=json.dumps(obj).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read()

    def test_scene_endpoint(self, server):
        base, iface = server
        iface.set_reference_circle(radius=2.0, theta=60.0)
        status, body = self._get(base + "/scene")
        assert status == 200
        s = json.loads(body)
        assert s["masking_mode"] in ("aabb", "shape")
        assert len(s["reference_poses"]) == 3
        assert s["train_poses"] is not None

    def test_render_with_overlays(self, server):
        base, _ = server
        status, body = self._get(
            base + "/render?yaw=30&pitch=60&radius=2.0&train=1&reference=1&aabb=1"
        )
        assert status == 200 and body[:4] == b"\x89PNG"

    def test_nudge_endpoint(self, server):
        base, iface = server
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))
        status, _ = self._post(
            base + "/nudge", {"element": "aabb", "translate": [0.1, 0, 0]}
        )
        assert status == 200
        np.testing.assert_allclose(iface.gen_config.aabb_min, (-0.3, -0.4, -0.4))
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))

    def test_drag_endpoint(self, server):
        base, iface = server
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))
        status, _ = self._post(
            base + "/drag",
            {"element": "aabb", "dx_px": 8.0, "dy_px": 0.0,
             "yaw": 30.0, "pitch": 55.0, "radius": 2.0, "size": 128},
        )
        assert status == 200
        center = 0.5 * (
            np.asarray(iface.gen_config.aabb_min)
            + np.asarray(iface.gen_config.aabb_max)
        )
        assert np.linalg.norm(center) > 0.005
        iface.set_selection_aabb((-0.4, -0.4, -0.4), (0.4, 0.4, 0.4))

    def test_nudge_endpoint_bad_element(self, server):
        base, _ = server
        try:
            self._post(base + "/nudge", {"element": "nope"})
            assert False, "should 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


class TestProductionMesh:
    def test_v5e8_layout(self):
        import jax
        import pytest as _pytest

        from signerf_tpu.parallel import production_mesh

        if len(jax.devices()) < 8:
            _pytest.skip("needs 8 virtual devices")
        m = production_mesh(8)
        assert dict(m.shape) == {"data": 4, "tensor": 2}
        with _pytest.raises(ValueError):
            production_mesh(7)

    def test_mesh_from_spec_auto_is_pure_dp(self):
        """`--mesh auto` resolves to the 1-D data mesh — the measured-best
        edit-pass layout (parallel/mesh.py:production_mesh docstring); the
        2-D TP hedge stays opt-in via `--mesh production`."""
        import jax
        import pytest as _pytest

        from signerf_tpu.parallel import mesh_from_spec

        n = len(jax.devices())
        if n < 8:
            _pytest.skip("needs 8 virtual devices")
        auto = mesh_from_spec("auto")
        assert tuple(auto.axis_names) == ("data",)
        assert dict(auto.shape) == {"data": n}
        prod = mesh_from_spec("production")
        assert dict(prod.shape) == {"data": n // 2, "tensor": 2}
