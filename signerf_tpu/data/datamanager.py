"""Data manager: image loading/caching and on-device ray-batch supply.

Capability parity (SURVEY.md §2a "DataManager", "Eval dataloaders"):
replaces /root/reference/signerf/data/signerf_datamanager.py:29-230 and
signerf_dataloader.py:106-211.

The reference spawns `pathos` worker *processes* that pre-compute
(RayBundle, batch) pairs on the host and feed a queue (:148-179), because
torch ray-gen on GPU would contend with training. The TPU design inverts
this: images are stacked into one device-resident uint8 array and pixel
sampling + ray generation run *inside* the jitted train step
(engine/train_step.py), so there is no queue, no worker process, and no
host->device copy after startup. What remains host-side is exactly the IO:

  * `load_images` — thread-pool PIL decode (parity with the reference's
    ThreadPoolExecutor image cache, signerf_dataloader.py:172-184), with
    on-the-fly downscale honoring the `images_{k}/` convention;
  * `mask_indices` — precomputed [M, 3] (cam, y, x) nonzero coordinates so
    masked sampling is a single device gather (the reference samples
    torch.nonzero per batch);
  * `CachedImageStore` — subset cache with periodic resampling (parity:
    SelectiveCacheDataloader, signerf_dataloader.py:106-211) for datasets
    too large for HBM.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from signerf_tpu.data.dataparser import (
    DataparserOutputs,
    SIGNeRFDataParserConfig,
    parse_transforms,
)


def _load_one(path: Path, size: Optional[Tuple[int, int]]) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB")
        if size is not None and img.size != size:
            img = img.resize(size, Image.BILINEAR)
        return np.asarray(img, np.uint8)


def load_images(
    filenames: Sequence[Path],
    width: int,
    height: int,
    max_workers: int = 8,
) -> np.ndarray:
    """Decode images to a [N, H, W, 3] uint8 stack.

    Prefers the native C++ threaded PNG codec (signerf_tpu/native) — GIL-free
    decode + fused bilinear resize into one contiguous buffer; falls back to
    a PIL thread pool for non-PNG inputs or missing toolchain."""
    if filenames and all(str(p).lower().endswith(".png") for p in filenames):
        from signerf_tpu.native import decode_png_batch

        out = decode_png_batch(filenames, width, height)
        if out is not None:
            return out
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        arrays = list(ex.map(lambda p: _load_one(p, (width, height)), filenames))
    return np.stack(arrays, axis=0)


def load_masks(
    filenames: Sequence[Optional[Path]],
    width: int,
    height: int,
    max_workers: int = 8,
) -> np.ndarray:
    """[N, H, W] float {0,1} masks; missing files -> all-white (parity:
    white masks auto-created for generated frames, signerf_dataparser.py:156-167)."""

    def one(p: Optional[Path]) -> np.ndarray:
        if p is None or not Path(p).exists():
            return np.ones((height, width), np.float32)
        from PIL import Image

        with Image.open(p) as img:
            img = img.convert("L")
            if img.size != (width, height):
                img = img.resize((width, height), Image.NEAREST)
            return (np.asarray(img, np.float32) > 127).astype(np.float32)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        arrays = list(ex.map(one, filenames))
    return np.stack(arrays, axis=0)


def mask_indices_from_masks(masks: np.ndarray) -> np.ndarray:
    """[N, H, W] {0,1} -> [M, 3] int32 (cam, y, x) of valid pixels."""
    coords = np.argwhere(masks > 0.5)
    return coords.astype(np.int32)


@dataclasses.dataclass
class SIGNeRFDataManagerConfig:
    """Knob surface parity: signerf_datamanager.py:29-47 (queue/process
    knobs intentionally dropped — there is no host queue on TPU)."""

    dataparser: SIGNeRFDataParserConfig = dataclasses.field(
        default_factory=SIGNeRFDataParserConfig
    )
    train_num_rays_per_batch: int = 4096
    eval_num_rays_per_batch: int = 4096
    patch_size: int = 1
    micro_batches: int = 0  # 0: auto (ceil(num_rays/8192)); see SamplerSettings
    cache_images: int = -1  # -1: all on device; N>0: CachedImageStore subset
    cache_resample_every: int = 0  # resample subset every k batches (0: never)


def auto_micro_batches(num_rays: int, patch_size: int, use_mask: bool) -> int:
    """Smallest gradient-accumulation split that (a) divides num_rays,
    (b) keeps micro-batches near the measured 4096-ray HBM sweet spot,
    and (c) holds whole patches when patch sampling is active (LPIPS is
    patch-local). Falls back to monolithic when no such split exists
    within a sane bound — a prime ray count must not degenerate into
    thousands of single-ray micro-batches.

    Sweet-spot history: 8192 was measured in round 2 when the backward
    retained [N, 3, D] f32 normals intermediates (16384 monolithic = 71k
    rays/s vs 317k at 4096 — XLA spills). With the round-5 grad-dot
    kernel those transients are gone and the signerf regime (16384 rays,
    patch 32) measures micro4 (4096-ray micros) fastest: 70.5 ms vs 74.8
    (micro2) / 72.7 (monolithic) per step on v5e."""
    grain = patch_size * patch_size if (patch_size > 1 and not use_mask) else 1
    target = max(1, -(-num_rays // 4096))
    for m in range(target, 65):
        if num_rays % m == 0 and (num_rays // m) % grain == 0:
            return m
    return 1


class SIGNeRFDataManager:
    """Owns the parsed dataset + device-side image stack."""

    def __init__(self, config: SIGNeRFDataManagerConfig):
        self.config = config
        self.outputs: DataparserOutputs = parse_transforms(config.dataparser)
        # The dataparser builds Cameras with host numpy leaves; move them to
        # device arrays so in-jit indexing (traced camera ids) works.
        import jax
        import jax.numpy as jnp

        self.cameras = jax.tree_util.tree_map(
            jnp.asarray, self.outputs.cameras
        )
        cams = self.cameras
        self.images = load_images(
            self.outputs.image_filenames, cams.width, cams.height
        )
        self.mask_indices: Optional[np.ndarray] = None
        if self.outputs.mask_filenames is not None:
            masks = load_masks(
                self.outputs.mask_filenames, cams.width, cams.height
            )
            self.mask_indices = mask_indices_from_masks(masks)

    @property
    def num_images(self) -> int:
        return self.images.shape[0]

    def sampler_settings(self):
        from signerf_tpu.engine.train_step import SamplerSettings

        # Reference rule: any mask forces plain pixel sampling even with
        # patch_size > 1 (signerf_patch_pixel_sampler.py:53-57).
        num_rays = self.config.train_num_rays_per_batch
        use_mask = self.mask_indices is not None
        patch = self.config.patch_size
        micro = self.config.micro_batches
        if micro <= 0:
            micro = auto_micro_batches(num_rays, patch, use_mask)
        return SamplerSettings(
            num_rays=num_rays,
            patch_size=patch,
            use_mask=use_mask,
            micro_batches=micro,
        )


class CachedImageStore:
    """Subset image cache with periodic resampling.

    Parity: SelectiveCacheDataloader (signerf_dataloader.py:106-211) — keeps
    `cache_size` images loaded, optionally re-samples which subset every
    `resample_every` fetches. The device array is swapped wholesale; the
    consumer re-binds camera indices via `current_indices`.
    """

    def __init__(
        self,
        filenames: Sequence[Path],
        width: int,
        height: int,
        cache_size: int,
        resample_every: int = 0,
        seed: int = 0,
    ):
        self.filenames = list(filenames)
        self.width = width
        self.height = height
        self.cache_size = min(cache_size, len(self.filenames))
        self.resample_every = resample_every
        self._rng = np.random.RandomState(seed)
        self._fetches = 0
        self.current_indices: np.ndarray = np.array([], np.int64)
        self.images: Optional[np.ndarray] = None
        self._resample()

    def _resample(self) -> None:
        self.current_indices = self._rng.choice(
            len(self.filenames), size=self.cache_size, replace=False
        )
        self.images = load_images(
            [self.filenames[i] for i in self.current_indices],
            self.width,
            self.height,
        )

    def fetch(self) -> Tuple[np.ndarray, np.ndarray]:
        """-> (images [K,H,W,3] uint8, dataset indices [K])."""
        self._fetches += 1
        if (
            self.resample_every > 0
            and self._fetches % self.resample_every == 0
        ):
            self._resample()
        assert self.images is not None
        return self.images, self.current_indices
