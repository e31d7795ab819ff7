"""Native C++ PNG codec vs PIL ground truth."""

import numpy as np
import pytest

from signerf_tpu.native import decode_png_batch, native_available, png_dims


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image

    tmp = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    specs = [("RGB", (37, 23)), ("RGB", (64, 64)), ("L", (16, 32)), ("RGBA", (20, 20))]
    for i, (mode, (w, h)) in enumerate(specs):
        ch = {"RGB": 3, "L": 1, "RGBA": 4}[mode]
        arr = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
        img = Image.fromarray(arr.squeeze() if ch == 1 else arr, mode=mode)
        p = tmp / f"img_{i}.png"
        img.save(p)
        arrays.append(np.asarray(img.convert("RGB")))
        paths.append(p)
    return paths, arrays


class TestNativeCodec:
    def test_available(self):
        assert native_available(), "native codec failed to build"

    def test_png_dims(self, pngs):
        paths, arrays = pngs
        for p, a in zip(paths, arrays):
            dims = png_dims(p)
            assert dims == (a.shape[1], a.shape[0])

    def test_decode_exact_at_native_size(self, pngs):
        paths, arrays = pngs
        for p, a in zip(paths, arrays):
            out = decode_png_batch([p], a.shape[1], a.shape[0])
            assert out is not None
            np.testing.assert_array_equal(out[0], a)

    def test_batch_resize_matches_jax_convention(self, pngs):
        # The codec implements half-pixel-center point-sampled bilinear —
        # the torch.F.interpolate / jax.image.resize convention used by the
        # rest of the pipeline (PIL's BILINEAR is area-adaptive on
        # downscale, a different filter).
        import jax.numpy as jnp
        import jax

        paths, arrays = pngs
        w, h = 24, 16
        out = decode_png_batch(paths, w, h)
        assert out is not None and out.shape == (len(paths), h, w, 3)
        for i, (p, a) in enumerate(zip(paths, arrays)):
            ref = np.asarray(
                jax.image.resize(
                    jnp.asarray(a, jnp.float32), (h, w, 3), "linear",
                    antialias=False,
                )
            )
            diff = np.abs(out[i].astype(np.float32) - ref)
            assert diff.mean() < 1.5, f"file {i}: mean diff {diff.mean()}"

    def test_missing_file_returns_none(self, pngs):
        paths, _ = pngs
        out = decode_png_batch([paths[0], "/nonexistent.png"], 8, 8)
        assert out is None

    def test_loader_integration(self, pngs):
        from signerf_tpu.data.datamanager import load_images

        paths, arrays = pngs
        out = load_images(paths, 24, 16)
        assert out.shape == (len(paths), 16, 24, 3)
        assert out.dtype == np.uint8


class TestEncode:
    def test_encode_roundtrip_exact(self, tmp_path):
        from PIL import Image

        from signerf_tpu.native import encode_png

        rng = np.random.RandomState(7)
        rgb = (rng.rand(33, 47, 3) * 255).astype(np.uint8)
        p = tmp_path / "rgb.png"
        assert encode_png(rgb, p)
        np.testing.assert_array_equal(np.asarray(Image.open(p)), rgb)
        # our own decoder reads it back exactly too
        out = decode_png_batch([p], 47, 33)
        np.testing.assert_array_equal(out[0], rgb)

    def test_encode_gray_and_singleton_channel(self, tmp_path):
        from PIL import Image

        from signerf_tpu.native import encode_png

        g = (np.linspace(0, 255, 24 * 16).reshape(24, 16)).astype(np.uint8)
        p = tmp_path / "g.png"
        assert encode_png(g[..., None], p)
        np.testing.assert_array_equal(np.asarray(Image.open(p)), g)

    def test_encode_rejects_non_uint8(self, tmp_path):
        from signerf_tpu.native import encode_png

        assert not encode_png(np.zeros((4, 4, 3), np.float32), tmp_path / "f.png")

    def test_save_array_png_uses_same_conversion(self, tmp_path):
        """save_array_png output (native path) matches array_to_image's
        uint8 conversion bit-for-bit, including the NaN/inf guard."""
        from PIL import Image

        from signerf_tpu.utils.images import array_to_image, save_array_png

        arr = np.random.RandomState(1).rand(20, 30, 3).astype(np.float32)
        arr[0, 0] = np.nan
        arr[1, 1] = np.inf
        p = tmp_path / "s.png"
        save_array_png(arr, p)
        np.testing.assert_array_equal(
            np.asarray(Image.open(p)), np.asarray(array_to_image(arr))
        )
