"""Pixel and patch sampling for ray-batch construction.

Capability parity (SURVEY.md §2a "Patch pixel sampler"):
/root/reference/signerf/data/signerf_patch_pixel_sampler.py:14-79 —
samples ``num_rays/(patch_size^2)`` random 32x32 patches per batch (rays
rounded down to a patch multiple, :41), builds indices via meshgrid offsets
(:59-78), and falls back to plain pixel sampling whenever a mask is present
(perf workaround for nerfstudio#3040, :53-57; consequence noted in the
reference README.md:226).

Pure jnp with explicit PRNG keys; all shapes static so the sampler jits and
fuses into the ray generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pixels(
    key: jax.Array,
    num_rays: int,
    num_images: int,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Uniform random pixel indices [num_rays, 3] = (camera, y, x)."""
    kc, ky, kx = jax.random.split(key, 3)
    cam = jax.random.randint(kc, (num_rays,), 0, num_images)
    ys = jax.random.randint(ky, (num_rays,), 0, height)
    xs = jax.random.randint(kx, (num_rays,), 0, width)
    return jnp.stack([cam, ys, xs], axis=-1).astype(jnp.int32)


def sample_pixels_masked(
    key: jax.Array,
    num_rays: int,
    mask_indices: jnp.ndarray,  # [M, 3] precomputed nonzero (cam, y, x)
) -> jnp.ndarray:
    """Sample rays uniformly from a precomputed valid-pixel index list.

    The reference samples ``torch.nonzero(mask)`` rows (nerfstudio
    PixelSampler semantics); here the nonzero set is precomputed host-side
    once per dataset swap so the device op is a single gather.
    """
    idx = jax.random.randint(key, (num_rays,), 0, mask_indices.shape[0])
    return mask_indices[idx]


def sample_patches(
    key: jax.Array,
    num_rays: int,
    patch_size: int,
    num_images: int,
    height: int,
    width: int,
) -> jnp.ndarray:
    """Random patch indices [N, 3] with N = floor(num_rays/ps^2)*ps^2.

    Patch origins are uniform in the valid range so every patch is fully
    inside the image (reference clamps by sampling in [0, dim - ps],
    signerf_patch_pixel_sampler.py:59-66).
    """
    ps = patch_size
    num_patches = num_rays // (ps * ps)
    kc, ky, kx = jax.random.split(key, 3)
    cam = jax.random.randint(kc, (num_patches,), 0, num_images)
    y0 = jax.random.randint(ky, (num_patches,), 0, max(height - ps, 1))
    x0 = jax.random.randint(kx, (num_patches,), 0, max(width - ps, 1))
    dy, dx = jnp.meshgrid(jnp.arange(ps), jnp.arange(ps), indexing="ij")
    ys = y0[:, None, None] + dy[None]
    xs = x0[:, None, None] + dx[None]
    cams = jnp.broadcast_to(cam[:, None, None], ys.shape)
    idx = jnp.stack([cams, ys, xs], axis=-1).reshape(-1, 3)
    return idx.astype(jnp.int32)


def gather_pixels(images: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """images [N, H, W, C], indices [R, 3] -> [R, C]."""
    return images[indices[:, 0], indices[:, 1], indices[:, 2]]
