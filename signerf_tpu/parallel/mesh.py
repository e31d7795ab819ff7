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
    """The documented v5e-8 edit-pass layout: ("data", "tensor") with
    tensor=2. SDXL attention has 10/20 heads per block — divisible by 2,
    not by 4/8 — so TP=2 is the widest head sharding that covers every
    layer; the remaining devices form the data axis (per-view diffusion DP
    + per-ray training DP). See README "Multi-chip" and
    diffusion/sdxl_pipeline.tensor_parallel_pspecs."""
    n = num_devices if num_devices is not None else len(jax.devices())
    if n % tensor:
        raise ValueError(f"{n} devices not divisible by tensor={tensor}")
    return get_mesh(n, axis_names=("data", "tensor"), shape=(n // tensor, tensor))


def mesh_from_spec(spec: Optional[str]) -> Optional[Mesh]:
    """Resolve a CLI ``--mesh`` spec to a Mesh (or None for single-device).

    Specs:
      * ``none``        — no mesh (single device).
      * ``data``        — 1-D data-parallel mesh over all devices.
      * ``production``  — the v5e-8 edit-pass layout, (data=n/2, tensor=2).
      * ``auto``        — the shipped default: single device -> none;
                          even device count -> production; else data.
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
        if n == 1:
            return None
        return production_mesh(n) if n % 2 == 0 else get_mesh(n)
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
