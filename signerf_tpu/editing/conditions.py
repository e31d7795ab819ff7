"""Mask + depth-condition synthesis for the two selection modes.

Capability parity (SURVEY.md §2a "Dataset generator", mask/condition rows):
re-implements `DatasetGenerator.render_camera`'s masking/condition block
(/root/reference/signerf/datasetgenerator/datasetgenerator.py:716-818):

  * mode "shape": proxy-mesh occlusion test ``mesh_depth < nerf_depth`` on
    non-empty mesh pixels (:716-721);
  * mode "aabb": ray/box interval test ``nears < nerf_depth < fars`` with
    ``nears > 0`` (cameras inside the box ignored, :763-768);
  * elliptical mask dilation, default (50, 50) (:66, :727-730, :776-778);
  * normalized inverted depth conditions: depth window from the masked
    depth ± additional_depth_radius (or manual_depth), normalized, clamped,
    inverted (:738-748, :786-810);
  * optional ``combine_shape_with_depth``: mesh color channel composited
    into the AABB condition where the mesh is visible (:794-807);
  * ``inverse_mask`` flips the selection (:721, :768);
  * an all-empty mask yields zero mask + zero condition (:749-756, :811-818).

Pure jnp, static shapes; "is_visible" branches become `jnp.where` on a
scalar so everything stays jittable (no data-dependent control flow).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from signerf_tpu.editing.morphology import dilate
from signerf_tpu.ops.intersection import intersect_with_aabb

_INF = jnp.inf


@dataclasses.dataclass
class MaskingConfig:
    """Knob surface of DatasetGeneratorConfig's masking block
    (datasetgenerator.py:56-81)."""

    masking_mode: str = "aabb"  # "aabb" | "shape"
    aabb_min: Tuple[float, float, float] = (-0.1, -0.1, -0.1)
    aabb_max: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    mask_dilation: Optional[Tuple[int, int]] = (50, 50)
    additional_depth_radius: float = 0.1
    manual_depth: Optional[Tuple[float, float]] = None
    inverse_mask: bool = False
    combine_shape_with_depth: bool = False


def _finalize(
    visible: jnp.ndarray,  # [H, W, 1] float {0,1} raw (pre-dilation) mask
    mask: jnp.ndarray,  # [H, W, 1] float {0,1} (post-dilation) mask
    condition: jnp.ndarray,  # [H, W, 1]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero out mask+condition when nothing is visible (reference behavior
    for empty selections)."""
    is_visible = jnp.sum(visible) > 1e-6
    mask = jnp.where(is_visible, mask, jnp.zeros_like(mask))
    condition = jnp.where(is_visible, condition, jnp.zeros_like(condition))
    return mask, condition


def _depth_window(
    masked_depth_min: jnp.ndarray,
    masked_depth_max: jnp.ndarray,
    cfg: MaskingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if cfg.manual_depth is not None:
        return (
            jnp.asarray(cfg.manual_depth[0], jnp.float32),
            jnp.asarray(cfg.manual_depth[1], jnp.float32),
        )
    return (
        masked_depth_min - cfg.additional_depth_radius,
        masked_depth_max + cfg.additional_depth_radius,
    )


def shape_mask_condition(
    nerf_depth: jnp.ndarray,  # [H, W, 1]
    mesh_depth: jnp.ndarray,  # [H, W, 1], 0 where no mesh
    cfg: MaskingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference :716-756. Returns (mask [H,W,1] {0,1}, condition [H,W,1])."""
    non_empty = mesh_depth > 0
    visible = ((mesh_depth < nerf_depth) & non_empty).astype(jnp.float32)
    if cfg.inverse_mask:
        visible = 1.0 - visible
    mask = (
        dilate(visible, cfg.mask_dilation) if cfg.mask_dilation else visible
    )

    sel = (visible > 0) & (mesh_depth > 0)
    d_min = jnp.min(jnp.where(sel, mesh_depth, _INF))
    d_max = jnp.max(mesh_depth)
    lo, hi = _depth_window(d_min, d_max, cfg)
    rng = jnp.maximum(hi - lo, 1e-8)
    obj_n = (mesh_depth - lo) / rng
    nerf_n = (nerf_depth - lo) / rng
    condition = visible * obj_n + (1.0 - visible) * nerf_n
    condition = 1.0 - jnp.clip(condition, 0.0, 1.0)
    return _finalize(visible, mask, condition)


def aabb_mask_condition(
    nerf_depth: jnp.ndarray,  # [H, W, 1]
    rays_o: jnp.ndarray,  # [H, W, 3]
    rays_d: jnp.ndarray,  # [H, W, 3]
    cfg: MaskingConfig,
    mesh_depth: Optional[jnp.ndarray] = None,  # for combine_shape_with_depth
    mesh_color: Optional[jnp.ndarray] = None,  # [H, W, 3] (0..1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference :758-818. Returns (mask [H,W,1] {0,1}, condition [H,W,1])."""
    aabb = jnp.stack(
        [jnp.asarray(cfg.aabb_min, jnp.float32), jnp.asarray(cfg.aabb_max, jnp.float32)]
    )
    nears, fars = intersect_with_aabb(rays_o, rays_d, aabb)  # [H, W, 1]
    non_empty = (nears < fars) & (nears > 0.0)
    visible = ((nears < nerf_depth) & (nerf_depth < fars) & non_empty).astype(
        jnp.float32
    )
    if cfg.inverse_mask:
        visible = 1.0 - visible
    mask = (
        dilate(visible, cfg.mask_dilation) if cfg.mask_dilation else visible
    )

    sel = (nerf_depth * visible) > 0
    d_min = jnp.min(jnp.where(sel, nerf_depth, _INF))
    d_max = jnp.max(jnp.where(sel, nerf_depth, -_INF))
    lo, hi = _depth_window(d_min, d_max, cfg)
    rng = jnp.maximum(hi - lo, 1e-8)

    if cfg.combine_shape_with_depth and mesh_depth is not None:
        cam_visible = ((mesh_depth < nerf_depth) & (mesh_depth > 0)).astype(
            jnp.float32
        )
        nerf_n = (nerf_depth - lo) / rng
        color_ch = (
            mesh_color[..., :1]
            if mesh_color is not None
            else jnp.zeros_like(nerf_depth)
        )
        condition = cam_visible * color_ch + (1.0 - cam_visible) * nerf_n
    else:
        condition = (nerf_depth - lo) / rng
    condition = 1.0 - jnp.clip(condition, 0.0, 1.0)
    return _finalize(visible, mask, condition)
