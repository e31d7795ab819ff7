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
        assert export_main(["voxels"]) == 1


class TestMarchingTetrahedra:
    def test_sphere_watertight_and_accurate(self):
        from signerf_tpu.geometry.marching import marching_tetrahedra

        n = 24
        xs = np.linspace(-1.5, 1.5, n + 1)
        X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
        vals = -np.sqrt(X**2 + Y**2 + Z**2)
        verts, faces = marching_tetrahedra(
            vals, np.array([-1.5] * 3), np.array([3.0 / n] * 3), iso=-1.0
        )
        assert len(faces) > 0
        d = np.linalg.norm(verts, axis=1)
        assert np.abs(d - 1.0).max() < 3.0 / n  # within one cell
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        edges.sort(axis=1)
        uniq, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()  # watertight
        assert len(verts) - len(uniq) + len(faces) == 2  # sphere Euler char

    def test_empty_field(self):
        from signerf_tpu.geometry.marching import marching_tetrahedra

        verts, faces = marching_tetrahedra(
            np.zeros((5, 5, 5)), np.zeros(3), np.ones(3), iso=1.0
        )
        assert len(verts) == 0 and len(faces) == 0


class TestMeshExportCLI:
    def test_mesh_export_loads_in_proxy_pipeline(self, tmp_path):
        data = write_tiny_dataset(tmp_path / "data")
        out = tmp_path / "mesh.obj"
        rc = export_main(
            [
                "mesh",
                "--data", str(data),
                "--output", str(out),
                "--resolution", "24",
                "--iso", "p50",
            ]
            + TINY_MODEL_FLAGS
        )
        assert rc == 0
        # the exported OBJ loads through the shape-proxy path
        from signerf_tpu.geometry.obj import load_obj

        verts, faces = load_obj(out)
        assert len(verts) > 0 and len(faces) > 0
