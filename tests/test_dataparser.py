"""transforms.json round-trip tests against the SIGNeRF schema rules."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from signerf_tpu.data.dataparser import (
    SIGNeRFDataParserConfig,
    auto_orient_and_center_poses,
    load_previous_experiment_cameras,
    parse_transforms,
    transform_poses_to_original_space,
)


def _mk_pose(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m.tolist()


def _write_dataset(tmp_path: Path, n=4, w=16, h=12, extras=None, per_frame_masks=False):
    (tmp_path / "images").mkdir()
    frames = []
    for i in range(n):
        img = Image.new("RGB", (w, h), color=(i * 10, 0, 0))
        img.save(tmp_path / "images" / f"image_{i}.png")
        frame = {
            "fl_x": 20.0,
            "fl_y": 20.0,
            "cx": w / 2,
            "cy": h / 2,
            "w": w,
            "h": h,
            "file_path": f"./images/image_{i}.png",
            "transform_matrix": _mk_pose([i * 0.1, 0.0, 1.0 + 0.05 * i]),
        }
        if per_frame_masks:
            frame["_mask_path"] = f"./masks/mask_{i}.png"
        frames.append(frame)
    meta = {"camera_model": "OPENCV", "frames": frames}
    if extras:
        meta.update(extras)
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    if per_frame_masks:
        (tmp_path / "masks").mkdir()
        for i in range(n):
            Image.new("L", (w, h), color=128).save(tmp_path / "masks" / f"mask_{i}.png")
    return tmp_path


def test_basic_parse(tmp_path):
    _write_dataset(tmp_path)
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert len(out.image_filenames) == 4
    assert out.cameras.width == 16 and out.cameras.height == 12
    assert out.cameras.camera_to_worlds.shape == (4, 3, 4)
    # auto-scaled: max |translation| == 1
    assert np.isclose(np.max(np.abs(out.cameras.camera_to_worlds[:, :3, 3])), 1.0, atol=1e-5)


def test_original_transform_skips_reorientation(tmp_path):
    extras = {
        "original_transform_matrix": np.eye(4)[:3].tolist(),
        "original_scale_factor": 0.5,
    }
    _write_dataset(tmp_path, extras=extras)
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert out.dataparser_scale == 0.5
    # poses untouched (no centering applied)
    np.testing.assert_allclose(out.cameras.camera_to_worlds[0, :3, 3], [0, 0, 1.0], atol=1e-6)


def test_scene_transform_matrix_preferred(tmp_path):
    _write_dataset(tmp_path, extras={
        "original_transform_matrix": np.eye(4)[:3].tolist(),
        "original_scale_factor": 1.0,
    })
    meta = json.loads((tmp_path / "transforms.json").read_text())
    meta["frames"][0]["scene_transform_matrix"] = _mk_pose([9.0, 9.0, 9.0])
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    np.testing.assert_allclose(out.cameras.camera_to_worlds[0, :3, 3], [9, 9, 9], atol=1e-6)


def test_masks_dropped_without_original_indices(tmp_path):
    _write_dataset(tmp_path, per_frame_masks=True)
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert out.mask_filenames is None  # signerf_dataparser.py:273-274 rule


def test_white_mask_created_for_generated_frames(tmp_path):
    _write_dataset(tmp_path, per_frame_masks=True, extras={"original_indices": [0, 1]})
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert out.mask_filenames is not None
    # frames 2,3 not in original_indices -> white.png
    assert out.mask_filenames[2].name == "white.png"
    assert out.mask_filenames[0].name == "mask_0.png"
    white = np.array(Image.open(out.mask_filenames[2]))
    assert white.min() == 255


def test_no_train_eval_split(tmp_path):
    _write_dataset(tmp_path, n=7)
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert len(out.image_filenames) == 7  # all frames used (:198-200)


def test_transform_roundtrip_to_original_space(tmp_path):
    _write_dataset(tmp_path)
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    poses = np.array(out.cameras.camera_to_worlds)
    orig = out.transform_poses_to_original_space(poses)
    # re-applying dataparser transform+scale must recover scene-space poses
    t44 = np.eye(4)
    t44[:3] = out.dataparser_transform
    orig44 = np.concatenate([orig, np.tile([[[0, 0, 0, 1.0]]], (4, 1, 1))], axis=1)
    back = np.einsum("ij,njk->nik", t44, orig44)[:, :3, :4]
    back[:, :3, 3] *= out.dataparser_scale
    np.testing.assert_allclose(back, poses, atol=1e-5)


def test_auto_orient_up():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (5, 1, 1))
    # cameras with y-axis tilted: up = +x+z
    tilt = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
    for i in range(5):
        poses[i, :3, 1] = tilt
        poses[i, :3, 3] = rng.normal(size=3)
    new_poses, tf = auto_orient_and_center_poses(poses, method="up", center_method="poses")
    mean_up = new_poses[:, :3, 1].mean(0)
    mean_up /= np.linalg.norm(mean_up)
    np.testing.assert_allclose(mean_up, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(new_poses[:, :3, 3].mean(0), 0.0, atol=1e-6)


def test_load_previous_experiment_cameras(tmp_path):
    meta = {
        "is_synthetic": True,
        "is_combined": True,
        "reference_indices": [0, 1],
        "generated_indices": [2],
        "frames": [
            {"transform_matrix": _mk_pose([float(i), 0, 0])} for i in range(3)
        ],
    }
    p = tmp_path / "transforms.json"
    p.write_text(json.dumps(meta))
    out = load_previous_experiment_cameras(p)
    assert out["reference_camera_to_worlds"].shape == (2, 3, 4)
    assert out["synthetic_camera_to_worlds"].shape == (1, 3, 4)
    assert out["is_combined"] is True


def test_variable_resolution_uses_min_dims(tmp_path):
    # declared w larger than the others: target stays the smallest dims
    _write_dataset(tmp_path)
    meta = json.loads((tmp_path / "transforms.json").read_text())
    meta["frames"][0]["w"] = 99
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert (out.cameras.width, out.cameras.height) == (16, 12)
    # frame 0's fx/cx rescaled by 16/99
    np.testing.assert_allclose(float(out.cameras.fx[0]), 20.0 * 16 / 99, rtol=1e-6)


def test_depth_file_path_forwarded(tmp_path):
    """Parity: per-frame depth_file_path is read and forwarded via metadata
    (/root/reference/signerf/data/signerf_dataparser.py:172-175,189-192)."""
    _write_dataset(tmp_path)
    meta = json.loads((tmp_path / "transforms.json").read_text())
    (tmp_path / "depths").mkdir()
    for i, frame in enumerate(meta["frames"]):
        frame["depth_file_path"] = f"./depths/depth_{i}.png"
        Image.new("I;16", (16, 12), color=1000).save(
            tmp_path / "depths" / f"depth_{i}.png"
        )
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    depths = out.metadata["depth_filenames"]
    assert depths is not None and len(depths) == len(out.image_filenames)
    assert all(p.name.startswith("depth_") for p in depths)
    assert out.metadata["depth_unit_scale_factor"] == pytest.approx(1e-3)


def test_no_depths_means_none(tmp_path):
    _write_dataset(tmp_path)
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    assert out.metadata["depth_filenames"] is None


def test_variable_resolution_downscales_to_uniform(tmp_path):
    """Mixed-size frames load at the smallest dims with per-frame intrinsic
    rescale (replaces the reference's variable_res_collate,
    signerf_datamanager.py:76-81, under the static-shape constraint)."""
    (tmp_path / "images").mkdir()
    sizes = [(32, 24), (16, 12), (24, 24)]
    frames = []
    for i, (w, h) in enumerate(sizes):
        Image.new("RGB", (w, h), color=(i * 10, 0, 0)).save(
            tmp_path / "images" / f"image_{i}.png"
        )
        frames.append({
            "fl_x": float(w),
            "fl_y": float(h),
            "cx": w / 2,
            "cy": h / 2,
            "w": w,
            "h": h,
            "file_path": f"./images/image_{i}.png",
            "transform_matrix": _mk_pose([i * 0.1, 0.0, 1.0]),
        })
    (tmp_path / "transforms.json").write_text(
        json.dumps({"camera_model": "OPENCV", "frames": frames})
    )
    out = parse_transforms(SIGNeRFDataParserConfig(data=tmp_path))
    cams = out.cameras
    assert (cams.width, cams.height) == (16, 12)
    # per-frame anisotropic rescale: fx' = fx * 16/w, fy' = fy * 12/h; with
    # fl_x=w, fl_y=h every frame lands at fx=16, fy=12, cx=8, cy=6
    np.testing.assert_allclose(np.asarray(cams.fx), 16.0)
    np.testing.assert_allclose(np.asarray(cams.fy), 12.0)
    np.testing.assert_allclose(np.asarray(cams.cx), 8.0)
    np.testing.assert_allclose(np.asarray(cams.cy), 6.0)
