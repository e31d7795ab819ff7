"""Diffuser: the inpainting interface of the dataset generator.

Capability parity (SURVEY.md §2a "Diffuser client"):
/root/reference/signerf/diffuser/diffuser.py:19-195. Same knob surface
(`DiffuserConfig` :19-60) and `diffuse(original, rendered, mask, condition)`
contract (:92), with three modes:

  * ``jax_sdxl`` (DEFAULT — the TPU-native replacement): in-process JAX/Flax
    SDXL base + ControlNet-depth img2img inpainting, batched on device. This
    deletes the reference's only "distributed backend" — the HTTP/base64
    boundary to a second GPU running SD Web UI (diffuser.py:180,
    README.md:275-277) — per SURVEY.md §5.
  * ``remote_sdwebui`` — wire-compatible HTTP client to an A1111 SD Web UI
    server (payload parity with diffuser.py:116-169: Euler a, steps/cfg/
    image_cfg/denoise/seed, ControlNet always-on script with depth model,
    inpaint fields mask_blur=4 / inpainting_fill=1 / full_res=0 / padding=32);
    connection failure returns the *original image* (:179-185).
  * ``custom`` — pluggable callable. Unlike the reference (which raises,
    :102-113), this is a working seam: pass `custom_fn` and it is used. The
    test suite uses it as the fake denoiser (SURVEY.md §4 seam (a)).

Images are float [H, W, C] arrays in [0, 1] throughout (C=3 or 1).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Optional

import numpy as np

from signerf_tpu.utils.images import (
    array_to_image,
    base64_to_image,
    image_to_array,
    image_to_base64,
)

DiffuseFn = Callable[
    [np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]],
    np.ndarray,
]


@dataclasses.dataclass
class DiffuserConfig:
    """Parity: DiffuserConfig (diffuser.py:19-60) + jax_sdxl extensions."""

    mode: str = "jax_sdxl"  # jax_sdxl | remote_sdwebui | custom
    url: str = "http://127.0.0.1"
    port: int = 5000
    prompt: str = "don't change the image"
    negative_prompt: str = ""
    guidance_scale: float = 7.0
    image_guidance_scale: float = 1.5
    denoising_strength: float = 0.9
    num_inference_steps: int = 20
    lower_bound: float = 0.02
    upper_bound: float = 0.98
    seed: int = 1
    stable_diffusion_model: str = "sd_xl_base_1.0.safetensors [31e35c80fc]"
    controlnet_model: str = "diffusers_xl_depth_full [2f51180b]"
    controlnet_lowvram: bool = False
    controlnet_conditioning_scale: float = 0.8
    controlnet_conditioning_scale_start: float = 0.0
    controlnet_conditioning_scale_end: float = 1.0
    controlnet_control_mode: str = "Balanced"
    # jax_sdxl-only knobs
    sdxl_weights_path: Optional[str] = None  # safetensors dir; random if None
    mask_blur: int = 4
    inpainting_fill: int = 1  # A1111 fill mode: 0 fill, 1 original, 2 noise
    sharding_axis: Optional[str] = None  # shard UNet over this mesh axis


class Diffuser:
    """Dispatches `diffuse` to the configured backend."""

    def __init__(
        self,
        config: DiffuserConfig,
        custom_fn: Optional[DiffuseFn] = None,
        mesh=None,
    ):
        self.config = config
        self.custom_fn = custom_fn
        self.mesh = mesh
        self._sdxl = None  # lazily built (heavy)

    # ------------------------------------------------------------------

    def prepare_sheet_cache(self, sheet_image, cell_hw):
        """Cross-view VAE cache for the per-view loop (jax_sdxl only; other
        modes return None and `diffuse(sheet_cache=...)` ignores it). See
        sdxl_pipeline.SheetEncodeCache."""
        if self.config.mode != "jax_sdxl":
            return None
        return self._get_sdxl().prepare_sheet_cache(sheet_image, cell_hw)

    def diffuse(
        self,
        original_image: np.ndarray,  # [H, W, 3] float
        rendered_image: np.ndarray,  # [H, W, 3] float
        mask_image: Optional[np.ndarray] = None,  # [H, W, 1] float
        condition_image: Optional[np.ndarray] = None,  # [H, W, 1] float
        device_out: bool = False,
        sheet_cache=None,
    ) -> np.ndarray:
        """Edit `original_image` guided by the depth condition; returns
        [H, W, 3] float (same dims as the input, parity diffuser.py:188-193).

        With `device_out=True` the jax_sdxl backend keeps inputs and output
        on-device (async dispatch, no host round-trip); the other backends
        ignore the flag and return host arrays as always — host boundaries
        are inherent to HTTP (`remote_sdwebui`) and to the np-array contract
        of `custom` test fakes.
        """
        mode = self.config.mode
        if mode == "custom":
            if self.custom_fn is None:
                raise ValueError(
                    "Diffuser mode 'custom' requires a custom_fn "
                    "(the reference's extension point, diffuser.py:102-113)"
                )
            return self.custom_fn(
                np.asarray(original_image),
                np.asarray(rendered_image),
                None if mask_image is None else np.asarray(mask_image),
                None if condition_image is None else np.asarray(condition_image),
            )
        if mode == "remote_sdwebui":
            return self._diffuse_remote(
                np.asarray(original_image),
                np.asarray(rendered_image),
                None if mask_image is None else np.asarray(mask_image),
                None if condition_image is None else np.asarray(condition_image),
            )
        if mode == "jax_sdxl":
            return self._diffuse_jax_sdxl(
                original_image,
                rendered_image,
                mask_image,
                condition_image,
                device_out=device_out,
                sheet_cache=sheet_cache,
            )
        raise ValueError(f"unknown diffuser mode {mode!r}")

    def diffuse_batch(
        self,
        original_images: np.ndarray,  # [K, H, W, 3]
        rendered_images: np.ndarray,
        mask_images: Optional[np.ndarray] = None,  # [K, H, W, 1]
        condition_images: Optional[np.ndarray] = None,
        device_out: bool = False,
        sheet_cache=None,
    ) -> np.ndarray:
        """Batched edit. jax_sdxl diffuses all K images in ONE jitted call
        (the per-view generation fast path); other modes loop."""
        if self.config.mode == "jax_sdxl":
            cfg = self.config
            pipe = self._get_sdxl()
            out = pipe.img2img(
                    sheet_cache=sheet_cache,
                    image=original_images,
                    prompt=cfg.prompt,
                    negative_prompt=cfg.negative_prompt,
                    mask=mask_images,
                    control_image=condition_images,
                    strength=cfg.denoising_strength,
                    num_steps=cfg.num_inference_steps,
                    guidance_scale=cfg.guidance_scale,
                    controlnet_scale=cfg.controlnet_conditioning_scale,
                    controlnet_start=cfg.controlnet_conditioning_scale_start,
                    controlnet_end=cfg.controlnet_conditioning_scale_end,
                    seed=cfg.seed,
                    mask_blur=cfg.mask_blur,
                    inpainting_fill=cfg.inpainting_fill,
                    control_mode=cfg.controlnet_control_mode,
                    device_out=device_out,
            )
            return out if device_out else np.asarray(out)
        outs = []
        for i in range(len(original_images)):
            outs.append(
                self.diffuse(
                    original_images[i],
                    rendered_images[i],
                    None if mask_images is None else mask_images[i],
                    None if condition_images is None else condition_images[i],
                )
            )
        return np.stack(outs)

    # ------------------------------------------------------------------
    # in-process JAX SDXL + ControlNet
    # ------------------------------------------------------------------

    def _get_sdxl(self):
        if self._sdxl is None:
            from signerf_tpu.diffusion.sdxl_pipeline import SDXLInpaintPipeline

            self._sdxl = SDXLInpaintPipeline.create(
                weights_path=self.config.sdxl_weights_path, mesh=self.mesh
            )
        return self._sdxl

    def _diffuse_jax_sdxl(
        self, original, rendered, mask, condition, device_out: bool = False,
        sheet_cache=None,
    ) -> np.ndarray:
        cfg = self.config
        pipe = self._get_sdxl()
        out = pipe.img2img(
            sheet_cache=sheet_cache,
            image=original,
            prompt=cfg.prompt,
            negative_prompt=cfg.negative_prompt,
            mask=mask,
            control_image=condition,
            strength=cfg.denoising_strength,
            num_steps=cfg.num_inference_steps,
            guidance_scale=cfg.guidance_scale,
            controlnet_scale=cfg.controlnet_conditioning_scale,
            controlnet_start=cfg.controlnet_conditioning_scale_start,
            controlnet_end=cfg.controlnet_conditioning_scale_end,
            seed=cfg.seed,
            mask_blur=cfg.mask_blur,
            inpainting_fill=cfg.inpainting_fill,
            control_mode=cfg.controlnet_control_mode,
            device_out=device_out,
        )
        return out if device_out else np.asarray(out)

    # ------------------------------------------------------------------
    # wire-compatible A1111 client
    # ------------------------------------------------------------------

    def _diffuse_remote(
        self, original, rendered, mask, condition
    ) -> np.ndarray:
        cfg = self.config
        url = f"{cfg.url}:{cfg.port}"
        payload = {
            "init_images": [image_to_base64(array_to_image(original))],
            "model": cfg.stable_diffusion_model,
            "init_latent_images": [image_to_base64(array_to_image(rendered))],
            "prompt": cfg.prompt,
            "steps": cfg.num_inference_steps,
            "cfg_scale": cfg.guidance_scale,
            "image_cfg_scale": cfg.image_guidance_scale,
            "height": int(original.shape[0]),
            "width": int(original.shape[1]),
            "denoising_strength": cfg.denoising_strength,
            "seed": cfg.seed,
            "sampler_name": "Euler a",
            "alwayson_scripts": {
                "controlnet": {
                    "args": [
                        {
                            "enabled": True,
                            "input_image": None
                            if condition is None
                            else image_to_base64(array_to_image(condition)),
                            "model": cfg.controlnet_model,
                            "module": "none",
                            "weight": cfg.controlnet_conditioning_scale,
                            "guidance_start": cfg.controlnet_conditioning_scale_start,
                            "guidance_end": cfg.controlnet_conditioning_scale_end,
                            "lowvram": cfg.controlnet_lowvram,
                            "control_mode": cfg.controlnet_control_mode,
                        }
                    ]
                }
            },
        }
        if mask is not None:
            payload["mask"] = image_to_base64(array_to_image(mask))
            payload["mask_blur"] = 4
            payload["inpainting_fill"] = 1
            payload["inpaint_full_res"] = 0
            payload["inpaint_full_res_padding"] = 32

        try:
            import requests

            req = requests.post(
                f"{url}/sdapi/v1/img2img",
                headers={
                    "accept": "application/json",
                    "Content-Type": "application/json",
                },
                data=json.dumps(payload),
                timeout=9999,
            )
            res = req.json()
        except Exception as exc:  # connection failure -> original image
            print(
                f"[diffuser] could not reach SD Web UI at {url}: {exc}; "
                "returning original image (parity diffuser.py:179-185)"
            )
            return np.asarray(original)

        assert "images" in res, f"Images not found in response: {res}"
        img = base64_to_image(res["images"][0])
        from PIL import Image

        img = img.resize(
            (original.shape[1], original.shape[0]), Image.Resampling.LANCZOS
        )
        return image_to_array(img)[..., :3]
