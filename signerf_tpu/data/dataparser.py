"""transforms.json parsing honoring the SIGNeRF schema extensions.

Capability parity with /root/reference/signerf/data/signerf_dataparser.py:26-357:

  * fixed (top-level) or per-frame intrinsics ``fl_x/fl_y/cx/cy/w/h`` and
    OpenCV distortion ``k1..k4, p1, p2`` (:80-138);
  * per-frame pose: ``scene_transform_matrix`` preferred over
    ``transform_matrix`` (:142-145);
  * ``_mask_path`` (underscore-prefixed so stock parsers ignore it, :147);
  * auto-created *white* masks for generated frames not listed in
    ``original_indices`` (:156-167);
  * reuse of stored ``original_transform_matrix`` / ``original_scale_factor``
    instead of re-orienting/rescaling (:210-228) so edited data stays in the
    original NeRF's coordinate frame;
  * **no train/eval split** (:198-200);
  * masks are dropped unless the dataset is a merged one, i.e. has
    ``original_indices`` (:273-274);
  * auto-downscale so the max dimension is < 1600 px, with the
    ``images_{k}/`` folder convention (:328-357).

Pose auto-orientation/centering replicates nerfstudio's
``camera_utils.auto_orient_and_center_poses`` semantics (methods "up"/"pca"/
"vertical"/"none"; centering "poses"/"focus"/"none") in numpy.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path, PurePath
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from signerf_tpu.cameras.cameras import Cameras

MAX_AUTO_RESOLUTION = 1600


# ---------------------------------------------------------------------------
# pose orientation / centering (nerfstudio-semantics, numpy)
# ---------------------------------------------------------------------------


def _rotation_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation matrix taking unit vector a to unit vector b (Rodrigues)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-8:
        return np.eye(3) if c > 0 else -np.eye(3)
    skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + skew + skew @ skew * (1.0 / (1.0 + c))


def _focus_of_attention(poses: np.ndarray, initial: np.ndarray) -> np.ndarray:
    """Point minimizing distance to all camera optical axes (-z rays)."""
    dirs = -poses[:, :3, 2:3]  # [N,3,1] camera forward (-z column)
    origins = poses[:, :3, 3:4]
    m = np.eye(3)[None] - dirs @ np.transpose(dirs, (0, 2, 1))  # [N,3,3]
    mt_m = np.transpose(m, (0, 2, 1)) @ m
    a = mt_m.sum(0)
    b = (mt_m @ origins).sum(0)
    return np.linalg.solve(a, b).squeeze(-1)


def auto_orient_and_center_poses(
    poses: np.ndarray,
    method: str = "up",
    center_method: str = "poses",
) -> Tuple[np.ndarray, np.ndarray]:
    """Orient/center [N,4,4] c2w poses; returns (new_poses[N,4,4], transform[3,4]).

    Parity target: nerfstudio ``camera_utils.auto_orient_and_center_poses``
    as invoked at signerf_dataparser.py:213-217 (default method "up",
    center "poses").
    """
    origins = poses[:, :3, 3]
    mean_origin = origins.mean(0)
    if center_method == "poses":
        translation = mean_origin
    elif center_method == "focus":
        translation = _focus_of_attention(poses, mean_origin)
    elif center_method == "none":
        translation = np.zeros(3)
    else:
        raise ValueError(f"unknown center_method {center_method!r}")

    if method == "up":
        up = poses[:, :3, 1].mean(0)
        up = up / np.linalg.norm(up)
        rot = _rotation_between(up, np.array([0.0, 0.0, 1.0]))
    elif method == "vertical":
        # least-squares vertical direction from camera x-axes (nerfstudio's
        # "vertical" refinement); fall back to "up" seed
        up = poses[:, :3, 1].mean(0)
        up = up / np.linalg.norm(up)
        x_axes = poses[:, :3, 0]
        _, s, vh = np.linalg.svd(x_axes, full_matrices=False)
        up_vertical = vh[2, :]
        up_vertical = up_vertical if np.dot(up_vertical, up) > 0 else -up_vertical
        rot = _rotation_between(up_vertical, np.array([0.0, 0.0, 1.0]))
    elif method == "pca":
        centered = origins - mean_origin
        _, _, vh = np.linalg.svd(centered, full_matrices=False)
        rot = vh
        if np.linalg.det(rot) < 0:
            rot[2, :] *= -1
        # flip so that +z ends up up-ish
        poses_test = rot @ poses[0, :3, 1]
        if poses_test[2] < 0:
            rot = np.diag([1.0, -1.0, -1.0]) @ rot
    elif method == "none":
        rot = np.eye(3)
    else:
        raise ValueError(f"unknown orientation method {method!r}")

    transform = np.concatenate([rot, rot @ -translation[:, None]], axis=1)  # [3,4]
    new_poses = np.einsum("ij,njk->nik", _to44(transform), poses)
    return new_poses, transform


def _to44(m34: np.ndarray) -> np.ndarray:
    out = np.eye(4, dtype=m34.dtype)
    out[:3, :4] = m34
    return out


def transform_poses_to_original_space(
    poses: np.ndarray,
    applied_transform: np.ndarray,
    applied_scale: float,
) -> np.ndarray:
    """Invert dataparser transform+scale: scene-space [N,3,4] -> original [N,3,4].

    Parity: nerfstudio ``transform_poses_to_original_space`` used via the
    callback handed to DatasetGenerator (signerf_pipeline.py:52-57,
    datasetgenerator.py:449-452).
    """
    out = poses.copy().astype(np.float64)
    out[:, :3, 3] /= applied_scale
    inv = np.linalg.inv(_to44(applied_transform.astype(np.float64)))
    out44 = np.einsum("ij,njk->nik", inv, np.concatenate(
        [out, np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (out.shape[0], 1, 1))], axis=1
    ))
    return out44[:, :3, :4].astype(np.float32)


# ---------------------------------------------------------------------------
# dataparser
# ---------------------------------------------------------------------------


@dataclass
class SIGNeRFDataParserConfig:
    """Parity: SIGNeRFDataParserConfig (signerf_dataparser.py:26-48)."""

    data: Path = Path(".")
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None
    scene_scale: float = 1.0
    orientation_method: str = "up"  # pca | up | vertical | none
    center_method: str = "poses"  # poses | focus | none
    auto_scale_poses: bool = True
    depth_unit_scale_factor: float = 1e-3


@dataclass
class DataparserOutputs:
    image_filenames: List[Path]
    cameras: Cameras
    scene_box_aabb: np.ndarray  # [2, 3]
    mask_filenames: Optional[List[Path]]
    dataparser_scale: float
    dataparser_transform: np.ndarray  # [3, 4]
    metadata: Dict[str, Any] = field(default_factory=dict)

    def transform_poses_to_original_space(self, poses: np.ndarray) -> np.ndarray:
        return transform_poses_to_original_space(
            poses, self.dataparser_transform, self.dataparser_scale
        )


def _auto_downscale_factor(
    data_dir: Path,
    filepath: PurePath,
    configured: Optional[int],
    prefix: str = "images_",
) -> int:
    """Pick a downscale factor so max dim < 1600 (parity :328-357)."""
    if configured is not None:
        return configured
    from PIL import Image

    with Image.open(data_dir / filepath) as img:
        w, h = img.size
    max_res = max(w, h)
    df = 0
    while True:
        if (max_res / 2**df) < MAX_AUTO_RESOLUTION:
            break
        if not (data_dir / f"{prefix}{2**(df+1)}" / PurePath(filepath).name).exists():
            break
        df += 1
    return 2**df


def _get_fname(
    filepath: PurePath, data_dir: Path, downscale_factor: int, prefix: str = "images_"
) -> Path:
    if downscale_factor > 1:
        return data_dir / f"{prefix}{downscale_factor}" / PurePath(filepath).name
    return data_dir / filepath


def parse_transforms(config: SIGNeRFDataParserConfig) -> DataparserOutputs:
    """Parse a SIGNeRF/nerfstudio transforms.json into DataparserOutputs."""
    data = Path(config.data)
    assert data.exists(), f"Data directory {data} does not exist."
    if data.suffix == ".json":
        meta = json.loads(data.read_text())
        data_dir = data.parent
    else:
        meta = json.loads((data / "transforms.json").read_text())
        data_dir = data

    frames = meta["frames"]
    fixed = {k: (k in meta) for k in ["fl_x", "fl_y", "cx", "cy", "h", "w"]}
    distort_fixed = any(k in meta for k in ["k1", "k2", "k3", "p1", "p2"])
    original_indices = meta.get("original_indices")

    downscale = None
    image_filenames: List[Path] = []
    mask_filenames: List[Path] = []
    depth_filenames: List[Path] = []
    poses: List[np.ndarray] = []
    fx, fy, cx, cy, hh, ww, distort = [], [], [], [], [], [], []

    def frame_distortion(src: Dict[str, Any]) -> np.ndarray:
        return np.array(
            [float(src.get(k, 0.0)) for k in ["k1", "k2", "k3", "k4", "p1", "p2"]],
            np.float32,
        )

    for idx, frame in enumerate(frames):
        filepath = PurePath(frame["file_path"])
        if downscale is None:
            downscale = _auto_downscale_factor(
                data_dir, filepath, config.downscale_factor
            )
        fname = _get_fname(filepath, data_dir, downscale)
        if not fname.exists():
            continue

        fx.append(float(meta["fl_x"] if fixed["fl_x"] else frame["fl_x"]))
        fy.append(float(meta["fl_y"] if fixed["fl_y"] else frame["fl_y"]))
        cx.append(float(meta["cx"] if fixed["cx"] else frame["cx"]))
        cy.append(float(meta["cy"] if fixed["cy"] else frame["cy"]))
        hh.append(int(meta["h"] if fixed["h"] else frame["h"]))
        ww.append(int(meta["w"] if fixed["w"] else frame["w"]))
        distort.append(frame_distortion(meta if distort_fixed else frame))
        image_filenames.append(fname)

        # scene_transform_matrix preferred (:142-145)
        key = "scene_transform_matrix" if "scene_transform_matrix" in frame else "transform_matrix"
        poses.append(np.array(frame[key], np.float32))

        if "_mask_path" in frame:
            mask_fname = _get_fname(
                PurePath(frame["_mask_path"]), data_dir, downscale, prefix="masks_"
            )
            if original_indices is not None and idx not in original_indices:
                # white mask rule (:156-167)
                white_path = mask_fname.parents[0] / "white.png"
                if not white_path.exists():
                    from PIL import Image

                    white_path.parent.mkdir(parents=True, exist_ok=True)
                    Image.new("L", (ww[-1], hh[-1]), color=255).save(white_path)
                mask_filenames.append(white_path)
            else:
                mask_filenames.append(mask_fname)

        # Per-frame depth supervision frames (parity:
        # /root/reference/signerf/data/signerf_dataparser.py:172-175,189-192
        # — read and forwarded via metadata; consumption is model-side).
        if "depth_file_path" in frame:
            depth_filenames.append(
                _get_fname(
                    PurePath(frame["depth_file_path"]),
                    data_dir,
                    downscale,
                    prefix="depths_",
                )
            )

    assert len(image_filenames) > 0, "No image files found; check transforms.json file_paths."
    assert len(mask_filenames) in (0, len(image_filenames)), (
        "mask_path must be specified for every frame or no frame"
    )
    assert len(depth_filenames) in (0, len(image_filenames)), (
        "depth_file_path must be specified for every frame or no frame"
    )

    pose_arr = np.stack(poses)  # [N, 4, 4]
    orientation_method = meta.get("orientation_override", config.orientation_method)

    if "original_transform_matrix" in meta:
        transform_matrix = np.array(meta["original_transform_matrix"], np.float32)
        if transform_matrix.shape[0] == 4:
            transform_matrix = transform_matrix[:3]
    else:
        pose_arr, transform_matrix = auto_orient_and_center_poses(
            pose_arr, method=orientation_method, center_method=config.center_method
        )

    if "original_scale_factor" in meta:
        scale_factor = float(meta["original_scale_factor"])
    else:
        scale_factor = 1.0
        if config.auto_scale_poses:
            scale_factor /= float(np.max(np.abs(pose_arr[:, :3, 3])))
        scale_factor *= config.scale_factor
        pose_arr[:, :3, 3] *= scale_factor

    aabb = config.scene_scale * np.array(
        [[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32
    )

    # Static resolution required for TPU (shape-static raygen). The
    # reference handles per-frame sizes with variable_res_collate
    # (signerf_datamanager.py:76-81); here every frame is instead resized
    # at load time to the smallest frame dims (load_images already resizes
    # to the camera dims), with per-frame intrinsics rescaled by each
    # frame's (sx, sy) — exact under the pinhole model, including
    # anisotropic resize (fx,cx scale by sx; fy,cy by sy).
    if len(set(ww)) != 1 or len(set(hh)) != 1:
        tw, th = min(ww), min(hh)
        for i in range(len(ww)):
            sx, sy = tw / ww[i], th / hh[i]
            fx[i] *= sx
            cx[i] *= sx
            fy[i] *= sy
            cy[i] *= sy
            ww[i], hh[i] = tw, th

    scale = 1.0 / downscale
    cameras = Cameras(
        camera_to_worlds=np.asarray(pose_arr[:, :3, :4], np.float32),
        fx=np.asarray(fx, np.float32),
        fy=np.asarray(fy, np.float32),
        cx=np.asarray(cx, np.float32),
        cy=np.asarray(cy, np.float32),
        distortion_params=np.stack(distort),
        width=ww[0],
        height=hh[0],
    ).rescaled(scale)

    if "applied_transform" in meta:
        applied = np.array(meta["applied_transform"], np.float32)
        transform_matrix = (_to44(transform_matrix) @ _to44(applied))[:3]
    if "applied_scale" in meta:
        scale_factor *= float(meta["applied_scale"])

    # masks dropped unless merged dataset (:273-274)
    if "original_indices" not in meta:
        mask_filenames = []

    return DataparserOutputs(
        image_filenames=image_filenames,
        cameras=cameras,
        scene_box_aabb=aabb,
        mask_filenames=mask_filenames or None,
        dataparser_scale=scale_factor,
        dataparser_transform=transform_matrix,
        metadata={
            "downscale_factor": downscale,
            "depth_filenames": depth_filenames or None,
            "depth_unit_scale_factor": config.depth_unit_scale_factor,
            "is_synthetic": meta.get("is_synthetic", False),
            "is_combined": meta.get("is_combined", False),
            "reference_indices": meta.get("reference_indices"),
            "generated_indices": meta.get("generated_indices"),
            "original_indices": meta.get("original_indices"),
        },
    )


def load_previous_experiment_cameras(transforms_path: Path) -> Dict[str, Any]:
    """Parse reference/synthetic poses back out of a generated transforms.json.

    Parity: /root/reference/signerf/utils/load_previous_experiment_cameras.py:12-54.
    Returns dict with 'reference_camera_to_worlds' [R,3,4],
    'synthetic_camera_to_worlds' [S,3,4] or None, and 'is_combined'.
    """
    meta = json.loads(Path(transforms_path).read_text())
    frames = meta["frames"]

    def pose(i):
        key = "scene_transform_matrix" if "scene_transform_matrix" in frames[i] else "transform_matrix"
        return np.array(frames[i][key], np.float32)[:3, :4]

    reference = np.stack([pose(i) for i in meta.get("reference_indices", [])]) if meta.get("reference_indices") else None
    synthetic = None
    if meta.get("is_synthetic") and meta.get("generated_indices"):
        synthetic = np.stack([pose(i) for i in meta["generated_indices"]])
    return {
        "reference_camera_to_worlds": reference,
        "synthetic_camera_to_worlds": synthetic,
        "is_combined": bool(meta.get("is_combined", False)),
    }
