"""Interface tests: headless Generation API + built-in web viewer over the
tiny e2e trainer (SURVEY.md §2a Interface/Viewer parity)."""

import json
import threading
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

    def test_preview_generation(self, iface):
        iface.set_reference_circle(radius=2.0, theta=60.0)
        sheets = iface.preview_generation()
        assert set(sheets) == {"image", "mask", "condition", "edited"}
        h, w = sheets["image"].shape[:2]
        assert h % 8 == 0 and w % 8 == 0
        # fake diffuser painted the masked region: edited != image somewhere
        if sheets["mask"].sum() > 0:
            assert not np.allclose(sheets["edited"], sheets["image"])


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
