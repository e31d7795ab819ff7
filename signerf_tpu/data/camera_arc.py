"""Synthetic camera-arc eval dataset + eval camera dataloaders.

Capability parity (SURVEY.md §2a): `CameraArcDataset`
(/root/reference/signerf/data/camera_arc_dataset.py:18-146 — cameras on a
circle for novel-view eval) and the eval dataloaders
(signerf_dataloader.py:23-104 — iterate camera poses, emit full-image
RayBundles; `FixedIndicesEvalCameraDataloader` walks a fixed index list).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from signerf_tpu.cameras.cameras import Cameras, RayBundle
from signerf_tpu.cameras.poses import circle_poses


@dataclasses.dataclass
class CameraArcDatasetConfig:
    """Parity: CameraArcDatasetConfig (camera_arc_dataset.py:18-38)."""

    num_cameras: int = 10
    radius: float = 1.0
    theta: float = 70.0  # polar angle, degrees
    phi_range: Tuple[float, float] = (0.0, 360.0)
    target: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    width: int = 512
    height: int = 512
    fx: float = 512.0
    fy: float = 512.0


class CameraArcDataset:
    """Synthetic eval cameras on a circle (no images — render targets)."""

    def __init__(self, config: CameraArcDatasetConfig):
        self.config = config
        poses = circle_poses(
            config.num_cameras,
            radius=config.radius,
            theta=config.theta,
            phi=config.phi_range,
            position=config.position,
            target=config.target,
        )  # [N, 4, 4]
        self.cameras = Cameras(
            camera_to_worlds=jnp.asarray(poses[:, :3, :]),
            fx=jnp.full((config.num_cameras,), config.fx),
            fy=jnp.full((config.num_cameras,), config.fy),
            cx=jnp.full((config.num_cameras,), config.width / 2.0),
            cy=jnp.full((config.num_cameras,), config.height / 2.0),
            width=config.width,
            height=config.height,
        )

    def __len__(self) -> int:
        return self.config.num_cameras


class EvalCameraDataloader:
    """Iterate cameras round-robin, yielding (camera_index, full-image
    RayBundle) (parity: signerf_dataloader.py:23-69)."""

    def __init__(self, cameras: Cameras, aabb: Optional[np.ndarray] = None):
        self.cameras = cameras
        self.aabb = None if aabb is None else jnp.asarray(aabb)
        self._idx = 0

    def __iter__(self) -> Iterator[Tuple[int, RayBundle]]:
        return self

    def __next__(self) -> Tuple[int, RayBundle]:
        i = self._idx % len(self.cameras)
        self._idx += 1
        return i, self.cameras.generate_rays(camera_index=i, aabb=self.aabb)


class FixedIndicesEvalCameraDataloader(EvalCameraDataloader):
    """Walk an explicit camera index list once (parity:
    signerf_dataloader.py:71-104)."""

    def __init__(
        self,
        cameras: Cameras,
        indices: Sequence[int],
        aabb: Optional[np.ndarray] = None,
    ):
        super().__init__(cameras, aabb)
        self.indices: List[int] = list(indices)

    def __iter__(self) -> Iterator[Tuple[int, RayBundle]]:
        for i in self.indices:
            yield i, self.cameras.generate_rays(camera_index=i, aabb=self.aabb)

    def __next__(self):  # pragma: no cover - iteration goes through __iter__
        raise TypeError("use iteration")
