"""Headless Generation interface — every control of the reference's
"Generation" tab as a programmatic API.

Capability parity (SURVEY.md §2a "Interface (GUI)"):
/root/reference/signerf/interface/interface.py:36-1043. The reference builds
a viser GUI whose widgets write through to both the live objects and the
configs (pattern at interface.py:119-121,287-289,313-315,447-449); this
class IS that write-through layer, decoupled from any GUI toolkit. The
built-in web viewer (interface/app.py) and any future viser frontend drive
this API.

Control surface mapping (reference lines):
  * general: dataset path/name (:119-141)                  -> set_general
  * reference cameras: frustum handles + circle setter
    (:144-203, 543-616)                                    -> set_reference_circle /
                                                              set_reference_poses
  * dataset cameras: Original/Synthetic + sphere setter +
    combine checkbox (:205-282, 619-689)                   -> set_dataset_cameras
  * selection AABB: gizmo + box (:310-342, 698-723)        -> set_selection_aabb
  * selection Shape: OBJ + pos/size/rot gizmo (:344-443,
    725-802)                                               -> set_selection_shape
  * generation params: prompt, scales, steps, seed,
    ControlNet scale (:445-534, 806-815)                   -> set_generation_params
  * Preview Generation modal (:817-879)                    -> preview_generation
  * Generate Dataset & Train (:83-116)                     -> generate_and_train
"""

from __future__ import annotations

import dataclasses
import threading
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from signerf_tpu.cameras.poses import circle_poses, random_sphere_poses


class GenerationInterface:
    def __init__(self, trainer):
        self.trainer = trainer
        self.reference_poses: Optional[np.ndarray] = None  # [R, 3, 4]
        self.synthetic_poses: Optional[np.ndarray] = None  # [S, 3, 4]
        self.use_synthetic: bool = False
        self.combine_with_original: bool = False
        self._busy = threading.Lock()

    # ------------------------------------------------------------------
    # general (interface.py:119-141)
    # ------------------------------------------------------------------

    @property
    def gen_config(self):
        return self.trainer.config.pipeline.dataset_generator

    def set_general(
        self, path: Optional[str] = None, dataset_name: Optional[str] = None
    ) -> None:
        if path is not None:
            self.gen_config.path = Path(path)
        if dataset_name is not None:
            self.gen_config.dataset_name = dataset_name

    # ------------------------------------------------------------------
    # reference cameras (interface.py:144-203, 543-616)
    # ------------------------------------------------------------------

    def set_reference_circle(
        self,
        radius: float = 1.0,
        theta: float = 70.0,
        phi_range: Tuple[float, float] = (0.0, 360.0),
        position: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        target: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    ) -> np.ndarray:
        """Place the rows*cols-1 reference cameras on a circle."""
        count = self.gen_config.rows * self.gen_config.cols - 1
        # endpoint-exclusive spacing like the GUI's circle setter
        span = phi_range[1] - phi_range[0]
        phi = (phi_range[0], phi_range[0] + span * (count - 1) / count)
        poses = np.asarray(
            circle_poses(count, radius=radius, theta=theta, phi=phi,
                         position=position, target=target)
        )[:, :3, :]
        self.reference_poses = poses
        return poses

    def set_reference_poses(self, poses: Sequence) -> None:
        arr = np.asarray(poses, np.float32)
        expected = self.gen_config.rows * self.gen_config.cols - 1
        if arr.shape[0] != expected:
            raise ValueError(
                f"need rows*cols-1 = {expected} reference poses, got {arr.shape[0]}"
            )
        self.reference_poses = arr[:, :3, :4]

    # ------------------------------------------------------------------
    # dataset cameras (interface.py:205-282, 619-689)
    # ------------------------------------------------------------------

    def set_dataset_cameras(
        self,
        mode: str = "original",  # "original" | "synthetic"
        combine_with_original: bool = False,
        count: int = 60,
        radius: float = 1.0,
        theta_range: Tuple[float, float] = (0.0, 90.0),
        phi_range: Tuple[float, float] = (0.0, 360.0),
        position: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        target: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        seed: int = 0,
    ) -> None:
        self.combine_with_original = combine_with_original
        if mode == "original":
            self.use_synthetic = False
            self.synthetic_poses = None
            return
        import jax

        self.use_synthetic = True
        self.synthetic_poses = np.asarray(
            random_sphere_poses(
                jax.random.PRNGKey(seed), count, radius=radius,
                theta=theta_range, phi=phi_range,
                position=position, target=target,
            )
        )[:, :3, :]

    # ------------------------------------------------------------------
    # selection (interface.py:310-443, 698-802)
    # ------------------------------------------------------------------

    def set_selection_aabb(
        self,
        aabb_min: Tuple[float, float, float],
        aabb_max: Tuple[float, float, float],
        inverse_mask: Optional[bool] = None,
    ) -> None:
        self.gen_config.masking_mode = "aabb"
        self.gen_config.aabb_min = tuple(aabb_min)
        self.gen_config.aabb_max = tuple(aabb_max)
        if inverse_mask is not None:
            self.gen_config.inverse_mask = inverse_mask

    def set_selection_shape(
        self,
        object_path: str,
        position: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        rotation: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        scale: Tuple[float, float, float] = (0.1, 0.1, 0.1),
        combine_shape_with_depth: Optional[bool] = None,
    ) -> None:
        self.gen_config.masking_mode = "shape"
        rc = self.gen_config.renderer
        rc.object_path = object_path
        rc.position = tuple(position)
        rc.rotation = tuple(rotation)
        rc.scale = tuple(scale)
        if combine_shape_with_depth is not None:
            self.gen_config.combine_shape_with_depth = combine_shape_with_depth

    # ------------------------------------------------------------------
    # generation params (interface.py:445-534)
    # ------------------------------------------------------------------

    def set_generation_params(
        self,
        prompt: Optional[str] = None,
        guidance_scale: Optional[float] = None,
        image_guidance_scale: Optional[float] = None,
        denoising_strength: Optional[float] = None,
        num_inference_steps: Optional[int] = None,
        seed: Optional[int] = None,
        controlnet_conditioning_scale: Optional[float] = None,
    ) -> None:
        d = self.gen_config.diffuser
        for name, val in [
            ("prompt", prompt),
            ("guidance_scale", guidance_scale),
            ("image_guidance_scale", image_guidance_scale),
            ("denoising_strength", denoising_strength),
            ("num_inference_steps", num_inference_steps),
            ("seed", seed),
            ("controlnet_conditioning_scale", controlnet_conditioning_scale),
        ]:
            if val is not None:
                setattr(d, name, val)
        # write-through to the live diffuser (GUI parity: configs stay in
        # sync with live objects)
        self.trainer.pipeline.dataset_generator.config.diffuser = d
        self.trainer.pipeline.dataset_generator.diffuser.config = d

    # ------------------------------------------------------------------
    # preview (interface.py:817-879)
    # ------------------------------------------------------------------

    def preview_generation(self) -> Dict[str, np.ndarray]:
        """Run one reference-sheet generation; return the four sheets as
        float arrays (original / mask / condition / edited)."""
        if self.reference_poses is None:
            self.set_reference_circle()
        gen = self.trainer.pipeline.dataset_generator
        gen.backfill_intrinsics(self.trainer.pipeline.datamanager.cameras)
        gen.setup_renderer()
        cams = gen._cameras_from_poses(self.reference_poses)
        img, mask, cond, edited, _refs = gen.generate_reference_sheet(cams)
        return {
            "image": np.asarray(img),
            "mask": np.asarray(mask),
            "condition": np.asarray(cond),
            "edited": np.asarray(edited),
        }

    # ------------------------------------------------------------------
    # Generate Dataset & Train (interface.py:83-116)
    # ------------------------------------------------------------------

    def generate_and_train(self) -> None:
        """The §3.2 flow: generate -> exchange -> reload w/o proposals ->
        train."""
        with self._busy:
            if self.reference_poses is None:
                self.set_reference_circle()
            kwargs: Dict[str, Any] = {
                "reference_camera_to_worlds": self.reference_poses
            }
            if self.use_synthetic:
                kwargs["synthetic_camera_to_worlds"] = self.synthetic_poses
                kwargs["merge_with_original_dataset"] = self.combine_with_original
            generated = self.trainer.generate_dataset(**kwargs)
            self.trainer.exchange_training_dataset(generated)
            self.trainer.train()
