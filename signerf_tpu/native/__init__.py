"""Native (C++) runtime components: threaded image codec for the data path."""

from signerf_tpu.native.loader import (
    decode_png_batch,
    encode_png,
    native_available,
    png_dims,
)

__all__ = ["decode_png_batch", "encode_png", "native_available", "png_dims"]
