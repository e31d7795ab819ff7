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
        # last circle/sphere setter params, kept so drag/nudge manipulation
        # can re-pose the cameras around a moved center (the reference keeps
        # these as live GUI state, interface.py:543-616)
        self.circle_params: Dict[str, Any] = dict(
            radius=1.0, theta=70.0, phi_range=(0.0, 360.0),
            position=(0.0, 0.0, 0.0), target=(0.0, 0.0, 0.0),
        )
        self.sphere_params: Dict[str, Any] = dict(
            mode="original", combine_with_original=False, count=60,
            radius=1.0, theta_range=(0.0, 90.0), phi_range=(0.0, 360.0),
            position=(0.0, 0.0, 0.0), target=(0.0, 0.0, 0.0), seed=0,
        )
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
        self.circle_params = dict(
            radius=radius, theta=theta, phi_range=tuple(phi_range),
            position=tuple(position), target=tuple(target),
        )
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
        self.sphere_params = dict(
            mode=mode, combine_with_original=combine_with_original,
            count=count, radius=radius, theta_range=tuple(theta_range),
            phi_range=tuple(phi_range), position=tuple(position),
            target=tuple(target), seed=seed,
        )
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
    # 3D scene elements + manipulation (interface.py:144-443, 543-802;
    # viewer.py:416-467 train-camera frustums)
    # ------------------------------------------------------------------

    def scene_elements(self) -> Dict[str, Any]:
        """Everything the viewer draws as overlays: train cameras,
        reference/synthetic poses, selection AABB, proxy mesh wire."""
        out: Dict[str, Any] = {
            "train_poses": None,
            "reference_poses": self.reference_poses,
            "synthetic_poses": self.synthetic_poses if self.use_synthetic else None,
            "aabb": None,
            "shape": None,
        }
        dm = getattr(self.trainer.pipeline, "datamanager", None)
        if dm is not None and getattr(dm, "cameras", None) is not None:
            out["train_poses"] = np.asarray(dm.cameras.camera_to_worlds)
        cfg = self.gen_config
        if cfg.masking_mode == "aabb":
            out["aabb"] = (tuple(cfg.aabb_min), tuple(cfg.aabb_max))
        else:
            shape = self._proxy_mesh()
            if shape is not None:
                out["shape"] = shape
        return out

    def _proxy_mesh(self) -> Optional[Dict[str, np.ndarray]]:
        """Load + pose the proxy mesh the way the generator will."""
        from signerf_tpu.geometry import primitives
        from signerf_tpu.geometry.obj import (
            load_obj,
            object_pose_matrix,
            transform_vertices,
        )

        rc = self.gen_config.renderer
        if rc.object_path == "bunny":
            verts, faces = primitives.bunny(2)
        elif rc.object_path == "icosphere":
            verts, faces = primitives.icosphere(2, 1.0)
        elif rc.object_path == "cube":
            verts, faces = primitives.cube(1.0)
        else:
            p = Path(rc.object_path)
            if not p.exists():
                return None
            verts, faces = load_obj(p)
        pose = object_pose_matrix(rc.position, rc.rotation, rc.scale)
        return {"verts": transform_vertices(verts, pose), "faces": faces}

    def nudge(
        self,
        element: str,  # "aabb" | "shape" | "reference"
        translate: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        scale: float = 1.0,
        rotate_deg: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    ) -> None:
        """Gizmo-equivalent manipulation with write-through to the configs
        (reference pattern: interface.py:310-443 transform controls)."""
        t = np.asarray(translate, np.float64)
        if element == "aabb":
            lo = np.asarray(self.gen_config.aabb_min, np.float64)
            hi = np.asarray(self.gen_config.aabb_max, np.float64)
            center = 0.5 * (lo + hi) + t
            half = 0.5 * (hi - lo) * float(scale)
            self.set_selection_aabb(tuple(center - half), tuple(center + half))
        elif element == "shape":
            rc = self.gen_config.renderer
            rc.position = tuple(np.asarray(rc.position, np.float64) + t)
            rc.scale = tuple(np.asarray(rc.scale, np.float64) * float(scale))
            rc.rotation = tuple(
                np.asarray(rc.rotation, np.float64)
                + np.asarray(rotate_deg, np.float64)
            )
        elif element == "reference":
            p = dict(self.circle_params)
            p["position"] = tuple(np.asarray(p["position"], np.float64) + t)
            p["target"] = tuple(np.asarray(p["target"], np.float64) + t)
            p["radius"] = float(p["radius"]) * float(scale)
            self.set_reference_circle(**p)
        else:
            raise ValueError(f"unknown scene element {element!r}")

    def drag(
        self,
        element: str,
        dx_px: float,
        dy_px: float,
        cam: Dict[str, Any],  # {c2w, fx, fy} of the viewing camera
    ) -> None:
        """Screen-space drag -> camera-plane world translation of the
        element's handle (the frustum/gizmo drag interaction)."""
        from signerf_tpu.interface.overlay import pixel_drag_to_world

        if element == "aabb":
            lo = np.asarray(self.gen_config.aabb_min)
            hi = np.asarray(self.gen_config.aabb_max)
            point = 0.5 * (lo + hi)
        elif element == "shape":
            point = np.asarray(self.gen_config.renderer.position)
        elif element == "reference":
            point = np.asarray(self.circle_params["position"])
        else:
            raise ValueError(f"unknown scene element {element!r}")
        delta = pixel_drag_to_world(
            dx_px, dy_px, np.asarray(cam["c2w"]), cam["fx"], cam["fy"], point
        )
        self.nudge(element, translate=tuple(delta))

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
