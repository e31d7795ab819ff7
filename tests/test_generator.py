"""End-to-end dataset generator tests with a fake diffuser (SURVEY.md §4
seam (a): pluggable custom denoiser) — directory schema, transforms.json
round-trip through the SIGNeRF dataparser, blend semantics."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.cameras.poses import circle_poses
from signerf_tpu.diffusion.diffuser import Diffuser, DiffuserConfig
from signerf_tpu.generator.datasetgenerator import (
    DatasetGenerator,
    DatasetGeneratorConfig,
    RendererConfig,
)

H = W = 32


def fake_render_fn(cameras, index):
    """Analytic 'NeRF': unit sphere at origin on a white background."""
    rb = cameras.generate_rays(camera_index=index)
    o, d = rb.origins, rb.directions
    b = jnp.sum(o * d, -1)
    c = jnp.sum(o * o, -1) - 0.25  # radius 0.5
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    rgb = jnp.where(hit[..., None], jnp.array([0.8, 0.2, 0.2]), 1.0)
    depth = jnp.where(hit, t, 3.0)[..., None]
    return {"rgb": rgb, "depth": depth}


def fake_diffuse(original, rendered, mask, condition):
    """Editing stand-in: paint masked region green."""
    out = np.array(original)
    if mask is not None:
        m = mask[..., 0] > 0.5
        out[m] = [0.1, 0.9, 0.1]
    return out


def make_generator(tmp_path, **cfg_kw):
    cfg = DatasetGeneratorConfig(
        path=tmp_path,
        dataset_name="exp",
        downscale_factor=2,
        fx=40.0,
        fy=40.0,
        cx=W / 2,
        cy=H / 2,
        width=W,
        height=H,
        rows=2,
        cols=2,
        masking_mode="aabb",
        aabb_min=(-0.5, -0.5, -0.5),
        aabb_max=(0.5, 0.5, 0.5),
        mask_dilation=(5, 5),
        diffuser=DiffuserConfig(mode="custom"),
        **cfg_kw,
    )
    diffuser = Diffuser(cfg.diffuser, custom_fn=fake_diffuse)
    return DatasetGenerator(
        cfg,
        original_transform_matrix=np.eye(4)[:3],
        original_scale_factor=1.0,
        transform_poses_to_original_space=lambda p: p,
        render_fn=fake_render_fn,
        diffuser=diffuser,
    )


@pytest.fixture(scope="module")
def generated(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gen")
    gen = make_generator(tmp)
    ref_poses = np.asarray(circle_poses(3, radius=2.0, theta=60.0, phi=(0.0, 240.0)))
    syn_poses = np.asarray(circle_poses(4, radius=2.0, theta=75.0, phi=(0.0, 270.0)))
    out = gen.generate_dataset(
        reference_camera_to_worlds=ref_poses[:, :3],
        synthetic_camera_to_worlds=syn_poses[:, :3],
    )
    return gen, out


class TestGenerateDataset:
    def test_directory_schema(self, generated):
        _, path = generated
        for d in [
            "images", "masks", "conditions", "rendered", "originals",
            "images_2", "masks_2", "conditions_2", "references",
        ]:
            assert (path / d).is_dir(), d
        assert (path / "transforms.json").exists()
        assert (path / "config.yml").exists()
        for f in [
            "image_reference_sheet.png", "mask_reference_sheet.png",
            "condition_reference_sheet.png", "edited_reference_sheet.png",
        ]:
            assert (path / "references" / f).exists(), f

    def test_transforms_content(self, generated):
        _, path = generated
        t = json.loads((path / "transforms.json").read_text())
        assert t["method"] == "SIGNeRF"
        assert t["is_synthetic"] is True
        assert t["is_combined"] is False
        assert t["reference_indices"] == [0, 1, 2]
        assert t["generated_indices"] == [3, 4, 5, 6]
        assert len(t["frames"]) == 7
        fr = t["frames"][0]
        for key in ["fl_x", "fl_y", "cx", "cy", "w", "h", "file_path",
                    "_mask_path", "transform_matrix", "scene_transform_matrix"]:
            assert key in fr, key
        assert fr["file_path"] == "./images/image_0.png"

    def test_images_written_and_edited(self, generated):
        from PIL import Image

        _, path = generated
        img = np.asarray(Image.open(path / "images" / "image_0.png"))
        assert img.shape == (H, W, 3)
        # fake diffuser painted masked region green, blended via mask
        greens = (img[..., 1] > 200) & (img[..., 0] < 100)
        assert greens.sum() > 0

    def test_roundtrip_through_dataparser(self, generated):
        from signerf_tpu.data.dataparser import (
            SIGNeRFDataParserConfig,
            parse_transforms,
        )

        _, path = generated
        out = parse_transforms(SIGNeRFDataParserConfig(data=path))
        assert len(out.image_filenames) == 7
        assert out.cameras.width in (W, W // 2)
        # original frame kept (original_transform_matrix honored)
        assert out.dataparser_scale == 1.0

    def test_previous_experiment_cameras(self, generated):
        from signerf_tpu.data.dataparser import load_previous_experiment_cameras

        _, path = generated
        info = load_previous_experiment_cameras(path / "transforms.json")
        assert info["reference_camera_to_worlds"].shape == (3, 3, 4)
        assert info["synthetic_camera_to_worlds"] is not None
        assert info["synthetic_camera_to_worlds"].shape == (4, 3, 4)


class TestOriginalFilenamesPrefetch:
    """Per-view generation over original photos: decodes are prefetched one
    chunk ahead on a host thread pool (native codec first) and must land
    pixel-correct in the regenerated views."""

    def test_prefetched_originals_used_per_view(self, tmp_path):
        from PIL import Image

        gen = make_generator(tmp_path)
        ref_poses = np.asarray(
            circle_poses(3, radius=2.0, theta=60.0, phi=(0.0, 240.0))
        )
        orig_poses = np.asarray(
            circle_poses(3, radius=2.0, theta=45.0, phi=(0.0, 120.0))
        )
        orig_cams = gen._cameras_from_poses(orig_poses[:, :3])
        files = []
        for i, val in enumerate([64, 128, 192]):
            p = tmp_path / f"orig_{i}.png"
            Image.fromarray(np.full((H, W, 3), val, np.uint8)).save(p)
            files.append(p)
        path = gen.generate_dataset(
            reference_camera_to_worlds=ref_poses[:, :3],
            original_cameras=orig_cams,
            original_filenames=files,
        )
        # views 3..5 are the per-view regenerations of the three originals;
        # their "render" (saved under originals/) is the decoded photo
        for k, val in enumerate([64, 128, 192]):
            img = np.asarray(Image.open(path / "originals" / f"image_{3 + k}.png"))
            assert abs(int(img.mean()) - val) <= 2, (k, img.mean())

    def test_decode_original_matches_pil(self, tmp_path):
        from PIL import Image

        from signerf_tpu.utils.images import image_to_array

        gen = make_generator(tmp_path)
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (H, W, 3), np.uint8)
        p = tmp_path / "photo.png"
        Image.fromarray(arr).save(p)
        got = np.asarray(gen._decode_original(p))
        with Image.open(p) as img:
            want = image_to_array(img.convert("RGB"))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMergeWithOriginals:
    def test_merge_inverts_masks(self, tmp_path):
        gen = make_generator(tmp_path)
        ref_poses = np.asarray(circle_poses(3, radius=2.0, theta=60.0, phi=(0.0, 240.0)))
        syn_poses = np.asarray(circle_poses(2, radius=2.0, theta=75.0, phi=(0.0, 180.0)))
        orig_poses = np.asarray(circle_poses(2, radius=2.0, theta=45.0, phi=(0.0, 90.0)))
        orig_cams = gen._cameras_from_poses(orig_poses[:, :3])
        orig_images = np.full((2, H, W, 3), 0.5, np.float32)
        path = gen.generate_dataset(
            reference_camera_to_worlds=ref_poses[:, :3],
            original_cameras=orig_cams,
            original_images=orig_images,
            synthetic_camera_to_worlds=syn_poses[:, :3],
            merge_with_original_dataset=True,
        )
        t = json.loads((path / "transforms.json").read_text())
        assert t["is_combined"] is True
        assert t["original_indices"] == [5, 6]
        assert len(t["frames"]) == 7
        # merged originals keep their own pixels as "edited"
        from PIL import Image

        img = np.asarray(Image.open(path / "images" / "image_5.png"))
        assert abs(int(img.mean()) - 127) <= 2


class TestPreviewSheet:
    def test_reference_sheet_only(self, tmp_path):
        """Parity with the Preview Generation flow (interface.py:817-879):
        sheet generation without writing a dataset."""
        gen = make_generator(tmp_path)
        gen.setup_renderer()
        poses = np.asarray(circle_poses(3, radius=2.0, theta=60.0, phi=(0.0, 240.0)))
        cams = gen._cameras_from_poses(poses[:, :3])
        img, mask, cond, edited, refs = gen.generate_reference_sheet(cams)
        assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
        assert len(refs) == 3
        assert refs[0]["edited"].shape == (H, W, 3)
        # blend: outside mask, edited == original sheet
        outside = np.asarray(mask[..., 0]) == 0
        np.testing.assert_allclose(
            np.asarray(edited)[outside], np.asarray(img)[outside], atol=1e-5
        )


def test_bunny_proxy_primitive_and_obj_roundtrip(tmp_path):
    """Default proxy asset (role of /root/reference models/bunny.obj,
    renderer.py:38): procedural bunny primitive, OBJ round-trip, and the
    bundled asset file."""
    from pathlib import Path

    from signerf_tpu.geometry.obj import load_obj
    from signerf_tpu.geometry.primitives import bunny, save_obj

    v, f = bunny(2)
    assert v.shape[1] == 3 and f.shape[1] == 3 and len(f) > 100
    assert int(f.max()) < len(v)
    # asymmetric silhouette: x-extent differs front/back, ears above body
    assert v[:, 0].max() > abs(v[:, 0].min())
    assert v[:, 1].max() > 1.0
    p = tmp_path / "b.obj"
    save_obj(p, v, f)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)

    bundled = (
        Path(__file__).parents[1] / "signerf_tpu" / "assets" / "bunny_proxy.obj"
    )
    assert bundled.exists()
    v3, _ = load_obj(bundled)
    assert len(v3) > 1000


def test_renderer_bunny_default(tmp_path):
    from signerf_tpu.generator.datasetgenerator import RendererConfig

    assert RendererConfig().object_path == "bunny"
