"""Binary mask dilation with an elliptical structuring element.

Capability parity (SURVEY.md §2b "Mask dilation"): the reference uses
`cv2.dilate(mask, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, size))`
(/root/reference/signerf/datasetgenerator/datasetgenerator.py:727-730,
776-778; default size (50, 50) from :66).

TPU-native: dilation of a binary mask by a structuring element equals
"conv with the SE as kernel, then > 0" — one `lax.conv` that XLA maps to
the MXU, keeping the mask on device next to the NeRF depth it came from.
The SE itself is built with cv2 when available (bit-exact parity) and an
equivalent ellipse rasterization otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def ellipse_kernel(width: int, height: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (width, height)) as float32."""
    try:
        import cv2

        return cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (width, height)
        ).astype(np.float32)
    except Exception:
        # cv2's ellipse fill: semi-axes (w/2, h/2) around the center pixel.
        r, c = (height - 1) / 2.0, (width - 1) / 2.0
        inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
        ys = np.arange(height)[:, None] - r
        xs = np.arange(width)[None, :] - c
        if r == 0 or c == 0:
            return np.ones((height, width), np.float32)
        dx_max = np.round(c * np.sqrt(np.maximum(1 - ys * ys * inv_r2, 0)))
        return (np.abs(xs) <= dx_max).astype(np.float32)


def dilate(mask: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Dilate a [H, W] or [H, W, 1] binary mask by an elliptical SE.

    ``size`` = (width, height), matching cv2's (ksize.width, ksize.height).
    Returns a float mask in {0, 1} with the input's rank.
    """
    squeeze = mask.ndim == 3
    m = mask[..., 0] if squeeze else mask
    m = m.astype(jnp.float32)
    kern = jnp.asarray(ellipse_kernel(int(size[0]), int(size[1])))
    kh, kw = kern.shape
    out = jax.lax.conv_general_dilated(
        m[None, None, :, :],
        kern[None, None, :, :],
        window_strides=(1, 1),
        padding=((kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2)),
    )[0, 0]
    out = (out > 0).astype(jnp.float32)
    return out[..., None] if squeeze else out
