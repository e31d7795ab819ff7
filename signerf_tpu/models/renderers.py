"""Volumetric compositing renderers: rgb / accumulation / depth / normals.

Capability parity (SURVEY.md §2b): nerfacto's `RGBRenderer(last_sample)`,
`AccumulationRenderer`, `DepthRenderer(median/expected)`, `NormalsRenderer`
— consumed by the reference through `NerfactoModel`
(/root/reference/signerf/signerf.py:12; `rgb`/`depth` outputs read at
datasetgenerator.py:700-701).

All pure jnp reductions over the sample axis; XLA fuses them with the field
MLP epilogue.
"""

from __future__ import annotations

import jax.numpy as jnp


def render_rgb(
    weights: jnp.ndarray,  # [R, S]
    rgbs: jnp.ndarray,  # [R, S, 3]
    background_color: str = "last_sample",
) -> jnp.ndarray:
    """Composite colors; background handling matches nerfstudio semantics."""
    acc = jnp.sum(weights, axis=-1, keepdims=True)  # [R, 1]
    comp = jnp.sum(weights[..., None] * rgbs, axis=-2)  # [R, 3]
    if background_color == "last_sample":
        bg = rgbs[..., -1, :]
    elif background_color == "white":
        bg = jnp.ones_like(comp)
    elif background_color == "black":
        bg = jnp.zeros_like(comp)
    else:
        raise ValueError(f"unknown background_color {background_color!r}")
    out = comp + bg * (1.0 - acc)
    return jnp.clip(out, 0.0, 1.0)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """[R, S] -> [R, 1] total opacity."""
    return jnp.sum(weights, axis=-1, keepdims=True)


def render_depth_expected(
    weights: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray
) -> jnp.ndarray:
    """Expected termination depth [R, 1], normalized by accumulation."""
    mids = 0.5 * (starts + ends)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    depth = jnp.sum(weights * mids, axis=-1, keepdims=True) / jnp.maximum(acc, 1e-10)
    return jnp.clip(depth, mids[..., :1], mids[..., -1:])


def render_depth_median(
    weights: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray
) -> jnp.ndarray:
    """Median termination depth [R, 1] (nerfstudio DepthRenderer default)."""
    mids = 0.5 * (starts + ends)  # [R, S]
    cum = jnp.cumsum(weights, axis=-1)  # [R, S]
    # First index where cumulative weight crosses 0.5.
    crossed = cum >= 0.5
    idx = jnp.argmax(crossed, axis=-1)
    # If never crossed (acc < 0.5) fall back to the last sample.
    any_crossed = jnp.any(crossed, axis=-1)
    idx = jnp.where(any_crossed, idx, mids.shape[-1] - 1)
    return jnp.take_along_axis(mids, idx[..., None], axis=-1)


def render_normals(weights: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Composite per-sample normals [R, S, 3] -> [R, 3] (not renormalized,
    matching nerfstudio's NormalsRenderer)."""
    return jnp.sum(weights[..., None] * normals, axis=-2)
