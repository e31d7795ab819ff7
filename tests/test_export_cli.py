"""Export CLI (`python -m signerf_tpu.export pointcloud`) drive on the tiny
dataset: back-projected colored PLY with filtering and subsampling."""

from pathlib import Path

import numpy as np
import pytest

from signerf_tpu.export import main as export_main, read_ply_header, write_ply
from tests.test_pipeline_e2e import write_tiny_dataset

TINY_MODEL_FLAGS = [
    "--model.num-levels", "2",
    "--model.max-res", "32",
    "--model.hidden-dim", "8",
    "--model.hidden-dim-color", "8",
    "--model.num-proposal-samples-per-ray", "[8, 6]",
    "--model.num-nerf-samples-per-ray", "4",
]


class TestPlyIO:
    def test_roundtrip_header_and_payload(self, tmp_path):
        pts = np.random.RandomState(0).randn(17, 3).astype(np.float32)
        cols = (np.random.RandomState(1).rand(17, 3) * 255).astype(np.uint8)
        p = tmp_path / "c.ply"
        write_ply(p, pts, cols)
        assert read_ply_header(p) == 17
        blob = p.read_bytes()
        body = blob[blob.index(b"end_header\n") + len(b"end_header\n"):]
        assert len(body) == 17 * (12 + 3)
        got = np.frombuffer(body, dtype=np.uint8)
        first_xyz = np.frombuffer(body[:12], dtype="<f4")
        np.testing.assert_allclose(first_xyz, pts[0])
        assert got[12:15].tolist() == cols[0].tolist()


class TestExportCLI:
    def test_pointcloud_export(self, tmp_path):
        data = write_tiny_dataset(tmp_path / "data")
        out = tmp_path / "pc.ply"
        rc = export_main(
            [
                "pointcloud",
                "--data", str(data),
                "--output", str(out),
                "--downscale", "1",
                "--min-accumulation", "0.0",
                "--num-points", "500",
            ]
            + TINY_MODEL_FLAGS
        )
        assert rc == 0
        n = read_ply_header(out)
        assert 0 < n <= 500

    def test_unknown_subcommand(self):
        assert export_main(["mesh"]) == 1
