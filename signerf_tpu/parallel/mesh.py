"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's process-split "parallelism"
(SURVEY.md §2c: NeRF on GPU 1 + SDXL server on GPU 2 over HTTP,
/root/reference/README.md:275-277): here everything runs in one program over
a `jax.sharding.Mesh`, with XLA collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``num_devices`` devices.

    Default: 1-D data-parallel mesh over all devices. ``shape`` allows
    multi-axis meshes, e.g. shape=(2, 4), axis_names=("data", "tensor").
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),)
    dev_array = np.array(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def production_mesh(num_devices: Optional[int] = None, tensor: int = 2) -> Mesh:
    """The 2-D ("data", "tensor") edit-pass layout with UNet TP.

    NOT the shipped default (``--mesh auto`` resolves to the 1-D data
    mesh): every measurement favors pure DP for the edit pass — one v5e
    chip fits the full bf16 SDXL sheet inpaint (warm 3x3 1536px sheet
    ~25 s, examples/north_star_result.json), per-view generation is
    embarrassingly parallel at the measured K=1 program, and the only TP-2
    measurement anywhere is ADVERSE (tp2_inpaint_ratio 1.82x slower on the
    8-device CPU mesh, MULTICHIP_r03.json — collectives beating tiny
    matmuls is expected on CPU, but no favorable TP number exists on any
    backend). Keep this layout for memory headroom: f32 weights, bigger
    sheets, or ControlNet variants that break the single-chip fit. SDXL
    attention has 10/20 heads per block — divisible by 2, not 4/8 — so
    tensor=2 is the widest head sharding that covers every layer
    (diffusion/sdxl_pipeline.tensor_parallel_pspecs)."""
    n = num_devices if num_devices is not None else len(jax.devices())
    if n % tensor:
        raise ValueError(f"{n} devices not divisible by tensor={tensor}")
    return get_mesh(n, axis_names=("data", "tensor"), shape=(n // tensor, tensor))


def mesh_from_spec(spec: Optional[str]) -> Optional[Mesh]:
    """Resolve a CLI ``--mesh`` spec to a Mesh (or None for single-device).

    Specs:
      * ``none``        — no mesh (single device).
      * ``data``        — 1-D data-parallel mesh over all devices.
      * ``production``  — the 2-D TP hedge, (data=n/2, tensor=2); see
                          `production_mesh` for why it is NOT the default.
      * ``auto``        — the shipped default: single device -> none;
                          else the 1-D data mesh (the measured-best
                          edit-pass layout: training/rendering are pure DP
                          over rays, diffusion is DP over views, and one
                          chip fits the whole SDXL sheet inpaint).
      * ``data=4,tensor=2`` — explicit axis sizes (any axis names; sizes
                          must multiply to <= available devices).

    This is what `train/render/eval/export` pass through, so a stock
    v5e-8 invocation actually uses all 8 chips (the reference's
    one-deployment topology, /root/reference/README.md:275-277).
    """
    if spec is None:
        spec = "auto"
    spec = str(spec).strip().lower()
    n = len(jax.devices())
    if spec in ("none", "off", "1", "false"):
        return None
    if spec == "auto":
        return None if n == 1 else get_mesh(n)
    if spec == "data":
        return get_mesh(n)
    if spec == "production":
        return production_mesh(n)
    if "=" in spec:
        names, sizes = [], []
        for part in spec.split(","):
            name, _, size = part.partition("=")
            names.append(name.strip())
            sizes.append(int(size))
        total = int(np.prod(sizes))
        if total > n:
            raise ValueError(
                f"mesh spec {spec!r} wants {total} devices, {n} available"
            )
        return get_mesh(total, axis_names=tuple(names), shape=tuple(sizes))
    raise ValueError(
        f"unknown mesh spec {spec!r} "
        "(expected none|auto|data|production|name=size[,name=size...])"
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along(tree, mesh: Mesh, axis_name: str = "data", dim: int = 0):
    """Shard every leaf's ``dim`` over ``axis_name`` (leading batch dim)."""

    def put(x):
        spec = [None] * x.ndim
        spec[dim] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)
