"""Array <-> PIL <-> base64 image conversion.

Capability parity (SURVEY.md §2a "Image converters"):
/root/reference/signerf/utils/image_tensor_converter.py:7-54 (float [H,W,1|3]
tensor <-> PIL via x255 uint8, 'L' mode for 1-channel) and
image_base64_converter.py:7-63 (PIL <-> base64 PNG).

Arrays here are numpy/jax [H, W, C] float in [0, 1] (or bool).
"""

from __future__ import annotations

import base64
import io
from typing import Union

import numpy as np


def array_to_image(arr) -> "PIL.Image.Image":
    """float/bool [H, W, 1|3] in [0,1] -> PIL image (parity:
    tensor_to_image)."""
    from PIL import Image

    # NaN/inf guard: background rays have inf depth, and random-weight
    # diffusion runs can emit NaN pixels — map to black instead of letting
    # the uint8 cast produce undefined values.
    a = _to_uint8(arr)
    if a.ndim == 3 and a.shape[-1] == 1:
        return Image.fromarray(a[..., 0], mode="L")
    if a.ndim == 2:
        return Image.fromarray(a, mode="L")
    return Image.fromarray(a, mode="RGB")


def image_to_array(img) -> np.ndarray:
    """PIL image -> float32 [H, W, C] in [0,1] (parity: image_to_tensor).
    'L' images get a trailing singleton channel."""
    a = np.asarray(img, dtype=np.float32) / 255.0
    if a.ndim == 2:
        a = a[..., None]
    if a.shape[-1] == 4:  # drop alpha like the reference converter
        a = a[..., :3]
    return a


def image_to_base64(img, fmt: str = "PNG") -> str:
    buf = io.BytesIO()
    img.save(buf, format=fmt)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def base64_to_image(data: str):
    from PIL import Image

    raw = base64.b64decode(data)
    return Image.open(io.BytesIO(raw))


def _to_uint8(arr) -> np.ndarray:
    """float/bool [H, W, C] in [0,1] -> uint8, with the same NaN/inf guard
    and rounding as array_to_image."""
    a = np.asarray(arr)
    if a.dtype == bool:
        a = a.astype(np.float32)
    a = np.nan_to_num(a, nan=0.0, posinf=1.0, neginf=0.0)
    a = np.clip(a, 0.0, 1.0)
    return (a * 255.0).astype(np.uint8)


def save_array_png(arr, path) -> None:
    """Write a float [H, W, 1|3] array in [0,1] as a PNG. Prefers the
    native C++ encoder (native/image_codec.cpp::encode_png — GIL-free, so
    the generator's writer-pool threads encode concurrently); falls back
    to PIL when the toolchain/library is unavailable."""
    a = _to_uint8(arr)
    from signerf_tpu.native.loader import encode_png

    if encode_png(a, path):
        return
    from PIL import Image

    if a.ndim == 3 and a.shape[-1] == 1:
        Image.fromarray(a[..., 0], mode="L").save(path)
    elif a.ndim == 2:
        Image.fromarray(a, mode="L").save(path)
    else:
        Image.fromarray(a, mode="RGB").save(path)
