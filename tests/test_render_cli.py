"""Render CLI (`python -m signerf_tpu.render`) drive on the tiny dataset."""

from pathlib import Path

import numpy as np
import pytest

from signerf_tpu.render import main as render_main
from tests.test_pipeline_e2e import write_tiny_dataset


class TestRenderCLI:
    def test_render_dataset_cameras(self, tmp_path):
        data = write_tiny_dataset(tmp_path / "data")
        out = tmp_path / "renders"
        rc = render_main(
            [
                "--data", str(data),
                "--output", str(out),
                "--model.num-levels", "2",
                "--model.max-res", "32",
                "--model.hidden-dim", "8",
                "--model.hidden-dim-color", "8",
                "--model.num-proposal-samples-per-ray", "[8, 6]",
                "--model.num-nerf-samples-per-ray", "4",
            ]
        )
        assert rc == 0
        rgbs = sorted(out.glob("rgb_*.png"))
        depths = sorted(out.glob("depth_*.png"))
        from tests.test_pipeline_e2e import N_CAMS
        assert len(rgbs) == N_CAMS and len(depths) == N_CAMS
        from PIL import Image

        img = np.asarray(Image.open(rgbs[0]))
        assert img.shape == (24, 24, 3)

    def test_render_arc(self, tmp_path):
        data = write_tiny_dataset(tmp_path / "data")
        out = tmp_path / "arc"
        rc = render_main(
            [
                "--data", str(data),
                "--output", str(out),
                "--arc", "3",
                "--arc-radius", "2.0",
                "--depth", "false",
                "--model.num-levels", "2",
                "--model.max-res", "32",
                "--model.hidden-dim", "8",
                "--model.hidden-dim-color", "8",
                "--model.num-proposal-samples-per-ray", "[8, 6]",
                "--model.num-nerf-samples-per-ray", "4",
            ]
        )
        assert rc == 0
        assert len(list(out.glob("rgb_*.png"))) == 3
        assert not list(out.glob("depth_*.png"))
