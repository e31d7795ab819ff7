"""Dataset generator: reference-sheet editing + full dataset regeneration.

Capability parity (SURVEY.md §2a "Dataset generator", §3.2/3.3 call stacks):
re-implements /root/reference/signerf/datasetgenerator/datasetgenerator.py:

  * output directory schema `images/ masks/ conditions/ rendered/ originals/
    references/` + `_{downscale}` variants + transforms.json + config.yml
    (:146-182);
  * `generate_reference_sheet` — r*c-1 views composed into one padded grid,
    ONE diffusion inpaint, masked blend, cell split-back (:470-594);
  * `generate_with_reference_sheet` — per view: render + mask/condition,
    splice into the LAST grid cell, inpaint, crop, blend, upscale (:597-674);
  * `render_camera` — NeRF render + mask + condition in `shape` / `aabb`
    modes (:677-818; the mask/condition math lives in
    signerf_tpu/editing/conditions.py);
  * original-dataset merge with inverted masks (:344-389);
  * incremental transforms.json writes after each phase (:323-342, :387-389)
    — the crash-resume mechanism (SURVEY.md §5 failure handling);
  * `save_generated_images` PNG layout + frame schema (`fl_x..h`,
    `file_path`, `_mask_path`, `transform_matrix`/`scene_transform_matrix`)
    (:398-468).

TPU-first notes: the NeRF render, mesh depth, mask/condition synthesis,
resizes, sheet composition and blend all run on device; the host only
decodes/encodes PNGs and drives the loop. The diffusion call is in-process
(jax_sdxl mode) so a whole edit pass never crosses a process boundary.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from signerf_tpu import config as cfglib
from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.diffusion.diffuser import Diffuser, DiffuserConfig
from signerf_tpu.editing.conditions import (
    MaskingConfig,
    aabb_mask_condition,
    shape_mask_condition,
)
from signerf_tpu.editing.sheet import (
    SheetLayout,
    blend_with_mask,
    compose_sheet,
    extract_last_cell,
    resize_bilinear,
    resize_mask,
    splice_last_cell,
    split_cells,
)
from signerf_tpu.utils.images import image_to_array, save_array_png

# render_fn(camera: Cameras, camera_index: int) -> {"rgb": [H,W,3], "depth": [H,W,1]}
RenderFn = Callable[[Cameras, int], Dict[str, jnp.ndarray]]


@dataclasses.dataclass
class RendererConfig:
    """Proxy-object placement (parity: renderer.py:23-39)."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    rotation: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # XYZ Euler, deg
    scale: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    color: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)
    # OBJ path or primitive name ("bunny" | "icosphere" | "cube"). Default
    # mirrors the reference's bundled bunny proxy (renderer.py:38); ours is
    # the procedurally generated signerf_tpu/assets/bunny_proxy.obj.
    object_path: str = "bunny"


@dataclasses.dataclass
class DatasetGeneratorConfig:
    """Parity: DatasetGeneratorConfig (datasetgenerator.py:32-81)."""

    path: Path = Path("./generations")
    dataset_name: str = "experiment"
    downscale_factor: int = 2
    fx: Optional[float] = None
    fy: Optional[float] = None
    cx: Optional[float] = None
    cy: Optional[float] = None
    width: Optional[int] = None
    height: Optional[int] = None
    masking_mode: str = "aabb"  # "shape" | "aabb"
    aabb_min: Tuple[float, float, float] = (-0.1, -0.1, -0.1)
    aabb_max: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    rows: int = 2
    cols: int = 3
    mask_dilation: Optional[Tuple[int, int]] = (50, 50)
    additional_depth_radius: float = 0.1
    renderer: RendererConfig = dataclasses.field(default_factory=RendererConfig)
    diffuser: DiffuserConfig = dataclasses.field(default_factory=DiffuserConfig)
    border_width_between_images: int = 0
    inverse_mask: bool = False
    manual_depth: Optional[Tuple[float, float]] = None
    combine_shape_with_depth: bool = False
    generation_batch_size: int = 4
    """Views diffused per call in the per-view loop. >1 batches K spliced
    sheets through ONE SDXL program (TPU fast path; the reference's serial
    per-camera loop is the main latency sink, SURVEY.md §3.2). 1 = serial
    parity. Note: at sheet scales where batching alone would push the UNet
    self-attention over the einsum->flash threshold, the SDXL pipeline
    auto-serializes the batch into single-view dispatches (the einsum path
    is ~2x faster there, see sdxl_pipeline.img2img); batching still wins
    below the threshold and on data-parallel meshes."""

    lastcell_vae_window: bool = True
    """Per-view VAE fast path (jax_sdxl only): between views only the
    sheet's LAST cell changes and only the last cell of the output is
    consumed, so the full-res VAE conv stages rerun on just a padded
    window around that cell — the cross-view encoder features are cached
    and the decoder renders only the consumed window; the VAE's one global
    attention still runs over the full latent each view
    (sdxl_pipeline.SheetEncodeCache). Deviation from the full path is
    limited to GroupNorm statistics seen over the window instead of the
    full sheet (the same class of deviation as diffusers' enable_tiling).
    False = always run the full-sheet VAE."""


class DatasetGenerator:
    def __init__(
        self,
        config: DatasetGeneratorConfig,
        original_transform_matrix: np.ndarray,  # [3|4, 4]
        original_scale_factor: float,
        transform_poses_to_original_space: Callable[[np.ndarray], np.ndarray],
        render_fn: RenderFn,
        diffuser: Optional[Diffuser] = None,
        mesh=None,
    ):
        """`mesh` (jax.sharding.Mesh, optional) is forwarded to the default
        Diffuser when no `diffuser` is supplied, so scripts that construct a
        DatasetGenerator directly — bypassing SIGNeRFPipeline — get the same
        TP/DP sheet-inpaint sharding instead of silently dropping to
        single-device diffusion. (Not to be confused with the proxy
        *triangle* mesh `self._mesh` below.)"""
        self.config = config
        self.original_transform_matrix = np.asarray(original_transform_matrix)
        self.original_scale_factor = float(original_scale_factor)
        self.transform_poses_to_original_space = transform_poses_to_original_space
        self.render_fn = render_fn
        self.diffuser = diffuser or Diffuser(config.diffuser, mesh=mesh)
        self.is_synthetic = False
        self._mesh: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self.dataset_path: Optional[Path] = None
        # Async PNG writer: device->host transfer + PNG encode of the 8
        # per-view images (~2-4 s over the tunnel) runs in worker threads
        # so the main thread keeps dispatching render/diffusion work.
        self._save_pool = None
        self._prefetch_pool = None
        self._pending_prev: List = []
        self._pending_cur: List = []
        # Per-phase wall-clock of the last generate_dataset() call:
        # {"sheet_s": float, "view_s": [per-chunk seconds...]}. view_s[0]
        # includes one-time compiles; the steady-state marginal is the
        # median of the tail (bench/north-star report both).
        self.last_timings: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # intrinsics backfill (parity: signerf_pipeline.py:60-88)
    # ------------------------------------------------------------------

    def backfill_intrinsics(self, cameras: Cameras) -> None:
        c = self.config
        if c.fx is None:
            c.fx = float(cameras.fx[0])
        if c.fy is None:
            c.fy = float(cameras.fy[0])
        if c.cx is None:
            c.cx = float(cameras.cx[0])
        if c.cy is None:
            c.cy = float(cameras.cy[0])
        if c.width is None:
            c.width = int(cameras.width)
        if c.height is None:
            c.height = int(cameras.height)

    def _cameras_from_poses(self, c2ws: np.ndarray) -> Cameras:
        c = self.config
        n = c2ws.shape[0]
        return Cameras(
            camera_to_worlds=jnp.asarray(c2ws[:, :3, :4], jnp.float32),
            fx=jnp.full((n,), c.fx, jnp.float32),
            fy=jnp.full((n,), c.fy, jnp.float32),
            cx=jnp.full((n,), c.cx, jnp.float32),
            cy=jnp.full((n,), c.cy, jnp.float32),
            width=int(c.width),
            height=int(c.height),
        )

    # ------------------------------------------------------------------
    # proxy mesh
    # ------------------------------------------------------------------

    def setup_renderer(self) -> None:
        """Load + pose the proxy mesh (parity: Renderer.setup,
        renderer.py:64-146)."""
        from signerf_tpu.geometry.obj import (
            load_obj,
            object_pose_matrix,
            transform_vertices,
        )
        from signerf_tpu.geometry import primitives

        rc = self.config.renderer
        if rc.object_path == "bunny":
            verts, faces = primitives.bunny(3)
        elif rc.object_path == "icosphere":
            verts, faces = primitives.icosphere(3, 1.0)
        elif rc.object_path == "cube":
            verts, faces = primitives.cube(1.0)
        else:
            path = Path(rc.object_path)
            if not path.exists() or path.suffix != ".obj":
                print(f"[generator] proxy mesh {path} missing; skipping setup")
                return
            verts, faces = load_obj(path)
        pose = object_pose_matrix(rc.position, rc.rotation, rc.scale)
        verts = transform_vertices(verts, pose)
        self._mesh = (jnp.asarray(verts), jnp.asarray(faces))

    def _mesh_render(self, cameras: Cameras, index: int):
        from signerf_tpu.geometry.raster import mesh_depth_render

        assert self._mesh is not None, "setup_renderer() not called"
        verts, faces = self._mesh
        return mesh_depth_render(
            cameras,
            verts,
            faces,
            color=self.config.renderer.color[:3],
            camera_index=index,
        )

    # ------------------------------------------------------------------
    # directory + transforms
    # ------------------------------------------------------------------

    _DIRS = ("images", "masks", "conditions", "rendered", "originals")

    def init_directory(self) -> None:
        c = self.config
        self.dataset_path = Path(c.path) / c.dataset_name
        for name in self._DIRS:
            (self.dataset_path / name).mkdir(parents=True, exist_ok=True)
            (self.dataset_path / f"{name}_{c.downscale_factor}").mkdir(
                parents=True, exist_ok=True
            )
        (self.dataset_path / "references").mkdir(parents=True, exist_ok=True)
        cfglib.save_yaml(c, self.dataset_path / "config.yml")

    def _base_transforms(self, merged: bool) -> Dict[str, Any]:
        return {
            "camera_model": "OPENCV",
            "orientation_override": "none",
            "method": "SIGNeRF",
            "is_synthetic": self.is_synthetic,
            "is_combined": merged,
            "frames": [],
            "original_transform_matrix": self.original_transform_matrix.tolist(),
            "original_scale_factor": self.original_scale_factor,
        }

    def _submit_save(self, arr, path: Path) -> None:
        """Queue a PNG save on the writer pool (device fetch + encode run in
        the worker thread)."""
        if self._save_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._save_pool = ThreadPoolExecutor(
                max_workers=4, thread_name_prefix="png-writer"
            )
        # Pass the device array through: the np conversion inside
        # save_array_png then runs on the worker thread.
        self._pending_cur.append(self._save_pool.submit(save_array_png, arr, path))

    def flush_saves(self) -> None:
        """Wait for every queued PNG save (re-raising worker exceptions)."""
        for fut in self._pending_prev + self._pending_cur:
            fut.result()
        self._pending_prev, self._pending_cur = [], []

    def _decode_original(self, filename: Path) -> jnp.ndarray:
        """Decode (+resize to the generator resolution) one original photo
        -> float32 [H, W, 3] in [0, 1]. Native C++ codec first
        (native/image_codec.cpp — GIL-free decode+resize, so prefetch
        threads overlap device compute); PIL + device bilinear resize as
        the fallback."""
        c = self.config
        h, w = int(c.height), int(c.width)
        from signerf_tpu.native.loader import decode_png_batch

        batch = decode_png_batch([filename], w, h)
        if batch is not None:
            return jnp.asarray(batch[0], jnp.float32) / 255.0
        from PIL import Image

        with Image.open(filename) as img:
            arr = jnp.asarray(image_to_array(img.convert("RGB")))
        if arr.shape[:2] != (h, w):
            arr = resize_bilinear(arr, h, w)
        return arr

    def _prefetch_originals(self, filenames, indices, futures) -> None:
        """Queue host PNG decodes for `indices` on the prefetch pool (one
        chunk of lookahead in generate_dataset hides the per-view decode
        behind the previous view's device work)."""
        if self._prefetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._prefetch_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="png-prefetch"
            )
        for i in indices:
            if filenames[i] is not None and i not in futures:
                futures[i] = self._prefetch_pool.submit(
                    self._decode_original, filenames[i]
                )

    def _write_transforms(self, transforms: Dict[str, Any]) -> None:
        # Resume invariant, relaxed by ONE chunk: saves queued before the
        # *previous* write are guaranteed on disk before this write lands,
        # so transforms.json can momentarily list at most the latest
        # chunk's still-encoding frames. generate_dataset() ends with
        # flush_saves(), so a completed generation is fully consistent.
        for fut in self._pending_prev:
            fut.result()
        self._pending_prev, self._pending_cur = self._pending_cur, []
        with open(self.dataset_path / "transforms.json", "w") as fh:
            json.dump(transforms, fh, indent=4)

    # ------------------------------------------------------------------
    # per-camera render + mask + condition (parity: render_camera :677-818)
    # ------------------------------------------------------------------

    def render_camera(
        self,
        cameras: Cameras,
        index: int,
        with_mask: bool = True,
        with_condition: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        c = self.config
        outputs = self.render_fn(cameras, index)
        rgb = outputs["rgb"]  # [H, W, 3]
        depth = outputs["depth"]  # [H, W, 1]
        if not with_mask:
            return rgb, None, None

        mcfg = MaskingConfig(
            masking_mode=c.masking_mode,
            aabb_min=tuple(c.aabb_min),
            aabb_max=tuple(c.aabb_max),
            mask_dilation=c.mask_dilation,
            additional_depth_radius=c.additional_depth_radius,
            manual_depth=c.manual_depth,
            inverse_mask=c.inverse_mask,
            combine_shape_with_depth=c.combine_shape_with_depth,
        )
        if c.masking_mode == "shape":
            _, mesh_depth = self._mesh_render(cameras, index)
            mask, cond = shape_mask_condition(depth, mesh_depth, mcfg)
        else:
            rb = cameras.generate_rays(camera_index=index)
            mesh_depth = mesh_color = None
            if c.combine_shape_with_depth and self._mesh is not None:
                mesh_color, mesh_depth = self._mesh_render(cameras, index)
            mask, cond = aabb_mask_condition(
                depth,
                rb.origins,
                rb.directions,
                mcfg,
                mesh_depth=mesh_depth,
                mesh_color=mesh_color,
            )
        if not with_condition:
            return rgb, mask, None
        return rgb, mask, cond

    # ------------------------------------------------------------------
    # reference sheet (parity: :470-594)
    # ------------------------------------------------------------------

    def _layout(self) -> SheetLayout:
        c = self.config
        return SheetLayout(
            rows=c.rows,
            cols=c.cols,
            cell_height=int(c.height) // c.downscale_factor,
            cell_width=int(c.width) // c.downscale_factor,
            border=c.border_width_between_images,
        )

    def generate_reference_sheet(self, cameras: Cameras):
        c = self.config
        lo = self._layout()
        n_ref = len(cameras)
        if n_ref != c.rows * c.cols - 1:
            raise ValueError(
                f"Camera count {n_ref} is not equal to (rows * cols) - 1 = "
                f"{c.rows * c.cols - 1}"
            )
        sh, sw = lo.cell_height, lo.cell_width
        references: List[Dict[str, jnp.ndarray]] = []
        imgs, msks, cnds = [], [], []
        for i in range(n_ref):
            render, mask, cond = self.render_camera(cameras, i)
            r_s = resize_bilinear(render, sh, sw)
            m_s = resize_mask(mask, sh, sw)
            c_s = resize_bilinear(cond, sh, sw)
            imgs.append(r_s)
            msks.append(m_s)
            cnds.append(c_s)
            references.append(
                {
                    "render": render,
                    "mask": mask,
                    "condition": cond,
                    "render_scaled": r_s,
                    "mask_scaled": m_s,
                    "condition_scaled": c_s,
                }
            )
        image_sheet, mask_sheet, cond_sheet = compose_sheet(lo, imgs, msks, cnds)

        # Empty-mask sentinel: a reference cell with no edit mask will pass
        # through the inpaint unedited, silently weakening the sheet's
        # multi-view context. Observed cause (round-4 probe): the NeRF
        # renders opaque floater density right at the camera from some
        # azimuths, so `nears < depth < fars` fails everywhere (median
        # depth ~0.07 vs box interval [0.86, 1.11] at two of eight poses of
        # the north-star checkpoint). The reference's mask formula fails
        # identically (datasetgenerator.py:766-768) but logs nothing.
        coverage = [float(jnp.mean(m)) for m in msks]
        for i, cov in enumerate(coverage):
            if cov == 0.0:
                print(
                    f"[generator] WARNING: reference view {i} has an EMPTY "
                    f"edit mask — its sheet cell will not be edited "
                    f"(likely floater density in front of the selection; "
                    f"check the NeRF's depth at that pose)",
                    flush=True,
                )

        edited_sheet = jnp.asarray(
            self.diffuser.diffuse(
                image_sheet,
                image_sheet,
                mask_sheet,
                cond_sheet,
                device_out=True,
            ),
            jnp.float32,
        )
        edited_sheet = blend_with_mask(edited_sheet, image_sheet, mask_sheet)

        for i, cell in enumerate(split_cells(lo, edited_sheet, n_ref)):
            references[i]["edited_scaled"] = cell
            references[i]["edited"] = resize_bilinear(
                cell, int(c.height), int(c.width)
            )
        return image_sheet, mask_sheet, cond_sheet, edited_sheet, references

    # ------------------------------------------------------------------
    # per-view generation (parity: :597-674)
    # ------------------------------------------------------------------

    def _cell_from_edited(self, lo, edited: jnp.ndarray) -> jnp.ndarray:
        """Last cell from either a full edited sheet or a bottom-right
        decode window (the `lastcell_vae_window` fast path returns only the
        consumed window; the sheet's /8 padding puts the cell up to 7 px in
        from the bottom-right corner, accounted for here)."""
        if edited.shape[:2] == (lo.height, lo.width):
            return extract_last_cell(lo, edited)
        rs, cs = lo.cell_slice(lo.last_index)
        off_h = lo.height - rs.stop  # /8-padding below the cell
        off_w = lo.width - cs.stop
        wh, ww = edited.shape[:2]
        return edited[
            wh - off_h - lo.cell_height : wh - off_h,
            ww - off_w - lo.cell_width : ww - off_w,
        ]

    def generate_with_reference_sheet(
        self,
        cameras: Cameras,
        index: int,
        filename: Optional[Path],
        image_sheet: jnp.ndarray,
        cond_sheet: jnp.ndarray,
        decoded: Optional[jnp.ndarray] = None,
        sheet_cache=None,
    ) -> Dict[str, jnp.ndarray]:
        c = self.config
        lo = self._layout()
        sh, sw = lo.cell_height, lo.cell_width

        render, mask, cond = self.render_camera(cameras, index)
        if decoded is not None:
            render = jnp.asarray(decoded, jnp.float32)
        elif filename is not None:
            render = self._decode_original(filename)

        r_s = resize_bilinear(render, sh, sw)
        m_s = resize_mask(mask, sh, sw)
        c_s = resize_bilinear(cond, sh, sw)

        image_sheet2, mask_sheet, cond_sheet2 = splice_last_cell(
            lo, image_sheet, cond_sheet, r_s, m_s, c_s
        )
        edited_sheet = jnp.asarray(
            self.diffuser.diffuse(
                image_sheet2,
                image_sheet2,
                mask_sheet,
                cond_sheet2,
                device_out=True,
                sheet_cache=sheet_cache,
            ),
            jnp.float32,
        )
        edited_scaled = self._cell_from_edited(lo, edited_sheet)
        edited_scaled = blend_with_mask(edited_scaled, r_s, m_s)
        edited = resize_bilinear(edited_scaled, int(c.height), int(c.width))

        return {
            "render": render,
            "mask": mask,
            "condition": cond,
            "edited": edited,
            "render_scaled": r_s,
            "mask_scaled": m_s,
            "condition_scaled": c_s,
            "edited_scaled": edited_scaled,
        }

    def generate_with_reference_sheet_batch(
        self,
        cameras: Cameras,
        indices: List[int],
        filenames: List[Optional[Path]],
        image_sheet: jnp.ndarray,
        cond_sheet: jnp.ndarray,
        decodeds: Optional[List[Optional[jnp.ndarray]]] = None,
        sheet_cache=None,
    ) -> List[Dict[str, jnp.ndarray]]:
        """Batched per-view generation: splice K views into K copies of the
        sheet and diffuse them in one call (`Diffuser.diffuse_batch`).
        Semantics identical to K serial `generate_with_reference_sheet`
        calls modulo the diffusion RNG stream."""
        c = self.config
        lo = self._layout()
        sh, sw = lo.cell_height, lo.cell_width

        views = []
        sheets_i, sheets_m, sheets_c = [], [], []
        for pos, (idx, filename) in enumerate(zip(indices, filenames)):
            render, mask, cond = self.render_camera(cameras, idx)
            decoded = decodeds[pos] if decodeds is not None else None
            if decoded is not None:
                render = jnp.asarray(decoded, jnp.float32)
            elif filename is not None:
                render = self._decode_original(filename)
            r_s = resize_bilinear(render, sh, sw)
            m_s = resize_mask(mask, sh, sw)
            c_s = resize_bilinear(cond, sh, sw)
            si, sm, sc = splice_last_cell(lo, image_sheet, cond_sheet, r_s, m_s, c_s)
            views.append((render, mask, cond, r_s, m_s, c_s))
            sheets_i.append(si)
            sheets_m.append(sm)
            sheets_c.append(sc)

        device = self.config.diffuser.mode == "jax_sdxl"
        stack = jnp.stack if device else np.stack
        batch_i = stack([s if device else np.asarray(s) for s in sheets_i])
        batch_m = stack([s if device else np.asarray(s) for s in sheets_m])
        batch_c = stack([s if device else np.asarray(s) for s in sheets_c])
        edited_sheets = self.diffuser.diffuse_batch(
            batch_i, batch_i, batch_m, batch_c, device_out=device,
            sheet_cache=sheet_cache,
        )

        out = []
        for k, (render, mask, cond, r_s, m_s, c_s) in enumerate(views):
            edited_scaled = self._cell_from_edited(
                lo, jnp.asarray(edited_sheets[k])
            )
            edited_scaled = blend_with_mask(edited_scaled, r_s, m_s)
            edited = resize_bilinear(edited_scaled, int(c.height), int(c.width))
            out.append(
                {
                    "render": render,
                    "mask": mask,
                    "condition": cond,
                    "edited": edited,
                    "render_scaled": r_s,
                    "mask_scaled": m_s,
                    "condition_scaled": c_s,
                    "edited_scaled": edited_scaled,
                }
            )
        return out

    # ------------------------------------------------------------------
    # saving (parity: save_generated_images :398-468)
    # ------------------------------------------------------------------

    def save_generated_images(
        self,
        idx: int,
        images: Dict[str, jnp.ndarray],
        cameras: Cameras,
        cam_index: int,
        transforms: Dict[str, Any],
        is_original: bool = False,
    ) -> Dict[str, Any]:
        c = self.config
        dp = self.dataset_path
        ds = c.downscale_factor
        if "edited" in images:
            self._submit_save(images["edited"], dp / "images" / f"image_{idx}.png")
        if "render" in images:
            sub = "originals" if is_original else "rendered"
            self._submit_save(images["render"], dp / sub / f"image_{idx}.png")
        if "mask" in images:
            self._submit_save(images["mask"], dp / "masks" / f"mask_{idx}.png")
        if "condition" in images:
            self._submit_save(
                images["condition"], dp / "conditions" / f"condition_{idx}.png"
            )
        if "edited_scaled" in images:
            self._submit_save(
                images["edited_scaled"], dp / f"images_{ds}" / f"image_{idx}.png"
            )
        if "render_scaled" in images:
            self._submit_save(
                images["render_scaled"], dp / f"rendered_{ds}" / f"image_{idx}.png"
            )
        if "mask_scaled" in images:
            self._submit_save(
                images["mask_scaled"], dp / f"masks_{ds}" / f"mask_{idx}.png"
            )
        if "condition_scaled" in images:
            self._submit_save(
                images["condition_scaled"],
                dp / f"conditions_{ds}" / f"condition_{idx}.png",
            )

        c2w = np.asarray(cameras.camera_to_worlds[cam_index])  # [3, 4]
        scene_tm = np.concatenate([c2w, [[0.0, 0.0, 0.0, 1.0]]], axis=0)
        transforms["frames"].append(
            {
                "fl_x": float(cameras.fx[cam_index]),
                "fl_y": float(cameras.fy[cam_index]),
                "cx": float(cameras.cx[cam_index]),
                "cy": float(cameras.cy[cam_index]),
                "w": int(cameras.width),
                "h": int(cameras.height),
                "file_path": f"./images/image_{idx}.png",
                "_mask_path": f"./masks/mask_{idx}.png",
                # Reference stores the scene-space pose in both keys
                # (datasetgenerator.py:461-462 FIXME acknowledged there).
                "transform_matrix": scene_tm.tolist(),
                "scene_transform_matrix": scene_tm.tolist(),
            }
        )
        return transforms

    # ------------------------------------------------------------------
    # full generation (parity: generate_dataset :185-395)
    # ------------------------------------------------------------------

    def generate_dataset(
        self,
        reference_camera_to_worlds: np.ndarray,  # [R, 3|4, 4]
        original_cameras: Optional[Cameras] = None,
        original_filenames: Optional[Sequence[Optional[Path]]] = None,
        original_images: Optional[np.ndarray] = None,  # [N, H, W, 3] float
        synthetic_camera_to_worlds: Optional[np.ndarray] = None,
        merge_with_original_dataset: bool = False,
    ) -> Path:
        c = self.config
        if original_cameras is None and synthetic_camera_to_worlds is None:
            raise ValueError(
                "Either original dataset or camera_to_worlds must be given"
            )
        if merge_with_original_dataset and (
            original_cameras is None or synthetic_camera_to_worlds is None
        ):
            raise ValueError(
                "Original dataset and camera_to_worlds must be given to merge"
            )

        self.init_directory()
        self.setup_renderer()
        self.is_synthetic = synthetic_camera_to_worlds is not None

        t_start = time.time()
        ref_cams = self._cameras_from_poses(
            np.asarray(reference_camera_to_worlds)
        )
        if synthetic_camera_to_worlds is not None:
            gen_cams = self._cameras_from_poses(
                np.asarray(synthetic_camera_to_worlds)
            )
            gen_filenames: List[Optional[Path]] = [None] * len(gen_cams)
        else:
            gen_cams = original_cameras
            gen_filenames = list(original_filenames or [None] * len(gen_cams))

        transforms = self._base_transforms(merge_with_original_dataset)

        (
            image_sheet,
            mask_sheet,
            cond_sheet,
            edited_sheet,
            references,
        ) = self.generate_reference_sheet(ref_cams)
        refs_dir = self.dataset_path / "references"
        save_array_png(image_sheet, refs_dir / "image_reference_sheet.png")
        save_array_png(mask_sheet, refs_dir / "mask_reference_sheet.png")
        save_array_png(cond_sheet, refs_dir / "condition_reference_sheet.png")
        save_array_png(edited_sheet, refs_dir / "edited_reference_sheet.png")

        idx = 0
        transforms["reference_indices"] = []
        for i in range(len(ref_cams)):
            transforms = self.save_generated_images(
                idx, references[i], ref_cams, i, transforms
            )
            transforms["reference_indices"].append(idx)
            idx += 1
        self._write_transforms(transforms)
        self.last_timings = {"sheet_s": time.time() - t_start, "view_s": []}
        print(
            f"[generator] reference sheet + {len(ref_cams)} reference views "
            f"done ({time.time() - t_start:.0f}s)",
            flush=True,
        )

        transforms["generated_indices"] = []
        bsz = max(1, int(c.generation_batch_size))
        # Cross-view VAE cache: the per-view loop splices every view into
        # the same `edited_sheet`, so its conv-only encoder features are
        # computed ONCE here and each view re-encodes only the last-cell
        # window (see DatasetGeneratorConfig.lastcell_vae_window).
        sheet_cache = None
        if c.lastcell_vae_window:
            lo_cache = self._layout()
            sheet_cache = self.diffuser.prepare_sheet_cache(
                edited_sheet, (lo_cache.cell_height, lo_cache.cell_width)
            )
        t_prev = time.time()
        prefetched: Dict[int, Any] = {}
        self._prefetch_originals(
            gen_filenames, range(min(bsz, len(gen_cams))), prefetched
        )
        for start in range(0, len(gen_cams), bsz):
            chunk = list(range(start, min(start + bsz, len(gen_cams))))
            # Queue the NEXT chunk's original decodes before touching this
            # one: the host PNG work then runs while this chunk's device
            # graph (render + diffusion) executes.
            self._prefetch_originals(
                gen_filenames,
                range(chunk[-1] + 1, min(chunk[-1] + 1 + bsz, len(gen_cams))),
                prefetched,
            )
            decoded = [
                prefetched.pop(i).result() if i in prefetched else None
                for i in chunk
            ]
            if bsz == 1:
                images_list = [
                    self.generate_with_reference_sheet(
                        gen_cams, chunk[0], gen_filenames[chunk[0]],
                        edited_sheet, cond_sheet, decoded=decoded[0],
                        sheet_cache=sheet_cache,
                    )
                ]
            else:
                images_list = self.generate_with_reference_sheet_batch(
                    gen_cams,
                    chunk,
                    [gen_filenames[i] for i in chunk],
                    edited_sheet,
                    cond_sheet,
                    decodeds=decoded,
                    sheet_cache=sheet_cache,
                )
            for i, images in zip(chunk, images_list):
                transforms = self.save_generated_images(
                    idx,
                    images,
                    gen_cams,
                    i,
                    transforms,
                    is_original=gen_filenames[i] is not None,
                )
                transforms["generated_indices"].append(idx)
                idx += 1
            self._write_transforms(transforms)
            now = time.time()
            self.last_timings["view_s"].append(now - t_prev)
            t_prev = now
            print(
                f"[generator] views {chunk[-1] + 1}/{len(gen_cams)} "
                f"({now - t_start:.0f}s)",
                flush=True,
            )

        if merge_with_original_dataset:
            transforms["original_indices"] = []
            lo = self._layout()
            sh, sw = lo.cell_height, lo.cell_width
            for i in range(len(original_cameras)):
                image = jnp.asarray(original_images[i], jnp.float32)
                render, mask, cond = self.render_camera(original_cameras, i)
                mask = 1.0 - mask  # inverted: originals exclude the object
                images = {
                    "render": render,
                    "mask": mask,
                    "condition": cond,
                    "edited": image,
                    "render_scaled": resize_bilinear(render, sh, sw),
                    "mask_scaled": resize_mask(mask, sh, sw),
                    "condition_scaled": resize_bilinear(cond, sh, sw),
                    "edited_scaled": resize_bilinear(image, sh, sw),
                }
                transforms = self.save_generated_images(
                    idx, images, original_cameras, i, transforms, True
                )
                transforms["original_indices"].append(idx)
                idx += 1
            self._write_transforms(transforms)

        self.flush_saves()
        print(
            f"[generator] dataset generated in "
            f"{(time.time() - t_start) / 60:.2f} minutes -> {self.dataset_path}"
        )
        return self.dataset_path
