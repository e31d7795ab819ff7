"""SDXL + ControlNet-depth img2img/inpaint pipeline — the in-process
replacement for the reference's SD Web UI server.

Capability parity (SURVEY.md §2b "SDXL + ControlNet", §7.4): implements the
knob surface the reference sends over HTTP (diffuser.py:132-169) natively:
Euler-a sampling, steps/cfg/denoising-strength/seed, ControlNet depth
conditioning with weight + guidance start/end, masked inpaint with
mask_blur and fill modes. The whole grid inpaint is ONE jitted program:
CLIP encode -> VAE encode -> fori_loop(UNet+ControlNet, CFG, ancestral
step, latent mask blend) -> VAE decode.

Weights: `weights_path` points to a directory with flax-serialized params
(`sdxl_params.msgpack`, see scripts/convert_sdxl_weights.py for the offline
torch->flax converter) + CLIP tokenizer files. Absent weights (this
no-egress environment), params are deterministically random-initialized —
the full pipeline still runs end-to-end, which is what the tests and the
TPU benchmarks exercise; dropping real weights in changes no code.

Sharding: with a mesh, `tensor_parallel_pspecs` shards attention-head and
FF projections over the "tensor" axis; XLA inserts psums over ICI. The
grid image's latent (e.g. 3x3 sheet at 1024 cells -> ~(3072/8)^2 = 147k
tokens of self-attention at the top block) is exactly the workload tensor
parallelism pays for (SURVEY.md §2c mapping).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from signerf_tpu.diffusion import sampler as S
from signerf_tpu.diffusion.clip import (
    CLIP_BIGG_CONFIG,
    CLIP_L_CONFIG,
    CLIPTextConfig,
    CLIPTextModel,
)
from signerf_tpu.diffusion.tokenizer import load_tokenizer
from signerf_tpu.diffusion.unet import (
    SDXL_UNET_CONFIG,
    TINY_UNET_CONFIG,
    ControlNet,
    UNet2DConditionModel,
    UNetConfig,
)
from signerf_tpu.diffusion.vae import (
    TINY_VAE_CONFIG,
    AutoencoderKL,
    VAEConfig,
)


@dataclasses.dataclass(frozen=True)
class SDXLConfig:
    unet: UNetConfig = SDXL_UNET_CONFIG
    vae: VAEConfig = VAEConfig()
    clip_l: CLIPTextConfig = CLIP_L_CONFIG
    clip_g: CLIPTextConfig = CLIP_BIGG_CONFIG
    vae_downscale: int = 8  # 2^(len(vae.block_out_channels)-1)


TINY_SDXL_CONFIG = SDXLConfig(
    unet=TINY_UNET_CONFIG,
    vae=TINY_VAE_CONFIG,
    clip_l=CLIPTextConfig(
        vocab_size=49408, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2,
    ),
    clip_g=CLIPTextConfig(
        vocab_size=49408, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2, projection_dim=16,
    ),
    vae_downscale=2,
)


def _context_dim(cfg: SDXLConfig) -> int:
    return cfg.clip_l.hidden_size + cfg.clip_g.hidden_size


def _worst_selfattn_scores(ucfg: UNetConfig, lat_h: int, lat_w: int) -> int:
    """Largest per-batch-element self-attention score term (heads * S^2),
    derived from the UNet config (block i attends at latent>>i; heads =
    ch/head_dim). Mirrors the per-layer einsum-vs-flash gate in unet.py
    (score_bytes = 2 * b * heads * sq * sk) for ANY config, not just
    SDXL's (10 heads, half-res)."""
    return max(
        (
            (ch // ucfg.attention_head_dim)
            * ((lat_h >> i) * (lat_w >> i)) ** 2
            for i, ch in enumerate(ucfg.block_out_channels)
            if ucfg.transformer_layers[i] > 0
        ),
        default=0,
    )


@dataclasses.dataclass
class SheetEncodeCache:
    """Cross-view VAE work cache for per-view sheet regeneration.

    The per-view loop (SURVEY.md §3.2; reference datasetgenerator.py:637-659)
    re-diffuses the SAME reference sheet ~100 times with only the LAST cell
    changed, and only the last cell of the output is consumed. The VAE is
    pure convolution except one global attention at latent resolution, so:

      * encode: the conv-only `encoder.down` features of the base sheet are
        cached; per view, `down` reruns on just a padded window around the
        last cell and the result is spliced in. The window's context margin
        exceeds the down-path receptive field (~8.5 latent px for the SDXL
        VAE: 68 input px), so splice-interior features are exact; the global
        mid attention then runs over the full assembled feature map. The
        only deviation from a full encode is GroupNorm batch statistics
        being computed over the window instead of the full sheet (same
        deviation class as diffusers' enable_tiling, which ships as a
        standard quality-accepted path).
      * decode: `decoder.mid` (the global attention) runs on the full
        latent; the expensive image-res `decoder.up` runs only on a padded
        window whose pixels are actually consumed (~17% of the sheet area).

    Build with `SDXLInpaintPipeline.prepare_sheet_cache`.
    """

    down_feats: Any  # [1, Hl, Wl, C] conv-only encoder features (device)
    sheet_hw: Tuple[int, int]  # (H, W) pixels
    cell_hw: Tuple[int, int]  # last-cell (h, w) pixels
    window_lat: Tuple[int, int, int, int, int, int]
    # (enc_wh, enc_ww, splice_h, splice_w, dec_wh, dec_ww) in latent units


# Latent-unit margins for the windowed sheet fast path. The SDXL VAE's
# conv receptive half-width is ~8.5 latent px on the encoder down path and
# ~12.5 on the decoder up path; 16 covers both with slack.
LASTCELL_ENC_CTX_PAD_LAT = 16  # context ring feeding the splice interior
LASTCELL_ENC_SPLICE_PAD_LAT = 16  # splice region beyond the cell itself
LASTCELL_DEC_PAD_LAT = 16  # decode window beyond the cell


class SDXLInpaintPipeline:
    """Holds module defs + params and exposes `img2img`."""

    def __init__(self, config: SDXLConfig, params: Dict[str, Any], tokenizer, mesh=None):
        assert _context_dim(config) == config.unet.cross_attention_dim, (
            "UNet cross_attention_dim must equal concat CLIP hidden sizes"
        )
        # Meshed flash: the pallas kernel is opaque to GSPMD, so img2img
        # traces under a unet.flash_mesh() context — attention shard_maps
        # over the mesh (heads on "tensor", batch on "data") and each
        # device runs flash on its local shard. Layers whose head count
        # doesn't divide the TP axis fall back to einsum per-layer.
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.unet = UNet2DConditionModel(config.unet)
        self.controlnet = ControlNet(
            config.unet,
            cond_downscale_steps=int(np.log2(config.vae_downscale)),
        )
        self.vae = AutoencoderKL(config.vae)
        self.clip_l = CLIPTextModel(config.clip_l)
        self.clip_g = CLIPTextModel(config.clip_g)
        self._jit_cache: Dict[Tuple, Any] = {}
        self._prompt_cache: Dict[Tuple[str, str], Any] = {}

    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        weights_path: Optional[str | Path] = None,
        config: Optional[SDXLConfig] = None,
        mesh=None,
        seed: int = 0,
        param_dtype=jnp.bfloat16,
    ) -> "SDXLInpaintPipeline":
        """`param_dtype` defaults to bf16: the full stack (UNet 2.57B +
        ControlNet encoder copy + dual CLIP + VAE) is ~20GB in f32 — more
        than one v5e chip's HBM before any activations. bf16 weights halve
        that and match the modules' compute dtype.

        The default config is ALWAYS the full SDXL architecture (random
        init when no weights are given). The tiny config exists for tests
        and must be passed explicitly — its vae_downscale=2 puts UNet
        attention at near-pixel token counts, which at sheet resolutions
        allocates a ~19GB score matrix."""
        config = config or SDXLConfig()
        tokenizer = load_tokenizer(weights_path)
        params = None
        if weights_path is not None:
            blob = Path(weights_path) / "sdxl_params.msgpack"
            if blob.exists():
                from flax import serialization

                params = serialization.msgpack_restore(blob.read_bytes())
        if params is None:
            from signerf_tpu.utils.calibration import warn_uncalibrated

            warn_uncalibrated(
                "SDXL",
                f"(weights_path={weights_path!r}) edited images will be "
                "noise, not edits. Export real checkpoints with "
                "scripts/convert_sdxl_weights.py and pass weights_path.",
            )
            params = cls._random_init(config, seed)
        if param_dtype is not None:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(param_dtype), params
            )
        if mesh is not None:
            params = _shard_params(params, mesh)
        return cls(config, params, tokenizer, mesh)

    @staticmethod
    def _random_init(
        config: SDXLConfig, seed: int, param_dtype=jnp.bfloat16
    ) -> Dict[str, Any]:
        def cast(tree):
            # cast per component immediately: the full-size stack's f32
            # transient would not fit HBM
            if param_dtype is None:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(param_dtype), tree
            )

        keys = jax.random.split(jax.random.PRNGKey(seed), 5)
        f = config.vae_downscale
        h = w = 8 * f
        lat = jnp.zeros((1, 8, 8, config.unet.in_channels))
        ctx = jnp.zeros((1, 77, config.unet.cross_attention_dim))
        pooled = jnp.zeros((1, config.clip_g.projection_dim or config.clip_g.hidden_size))
        tids = jnp.zeros((1, 6))
        t = jnp.zeros((1,))
        unet = UNet2DConditionModel(config.unet)
        cn = ControlNet(
            config.unet, cond_downscale_steps=int(np.log2(f))
        )
        vae = AutoencoderKL(config.vae)
        clip_l = CLIPTextModel(config.clip_l)
        clip_g = CLIPTextModel(config.clip_g)
        ids = jnp.zeros((1, 77), jnp.int32)
        return {
            "unet": cast(unet.init(keys[0], lat, t, ctx, pooled, tids)["params"]),
            "controlnet": cast(
                # 3-channel conditioning (RGB depth map) for diffusers
                # weight parity: cond_embedding.conv_in is [16, 3, 3, 3].
                cn.init(
                    keys[1], lat, jnp.zeros((1, h, w, 3)), t, ctx, pooled, tids
                )["params"]
            ),
            "vae": cast(vae.init(keys[2], jnp.zeros((1, h, w, 3)))["params"]),
            "clip_l": cast(clip_l.init(keys[3], ids)["params"]),
            "clip_g": cast(clip_g.init(keys[4], ids)["params"]),
        }

    # ------------------------------------------------------------------
    # prompt encoding
    # ------------------------------------------------------------------

    def encode_prompt(self, prompt: str, negative_prompt: str = ""):
        """-> (context [2, 77, D], pooled [2, P]) for (uncond, cond).

        Cached per (prompt, negative): the per-view generation loop
        (SURVEY.md §3.2) re-diffuses every dataset view with one prompt, so
        re-running the two CLIP towers each call is pure dispatch waste."""
        cached = self._prompt_cache.get((prompt, negative_prompt))
        if cached is not None:
            return cached
        ids = np.stack([self.tokenizer(negative_prompt), self.tokenizer(prompt)])
        ids = jnp.asarray(ids)
        if not hasattr(self, "_jit_encode_prompt"):
            # One jitted program for both towers: eager dispatch of the two
            # 32-layer CLIP stacks costs ~9 s of per-op RTT over the axon
            # tunnel (measured, DIFFUSION_BREAKDOWN prompt_encode_uncached)
            # vs milliseconds compiled.
            def _encode(pl_, pg_, ids_):
                _, pen_l, _ = self.clip_l.apply({"params": pl_}, ids_)
                _, pen_g, _, proj_g = self.clip_g.apply({"params": pg_}, ids_)
                context = jnp.concatenate(
                    [pen_l.astype(jnp.float32), pen_g.astype(jnp.float32)],
                    axis=-1,
                )
                return context, proj_g.astype(jnp.float32)

            self._jit_encode_prompt = jax.jit(_encode)
        context, proj_g = self._jit_encode_prompt(
            self.params["clip_l"], self.params["clip_g"], ids
        )
        out = (context, proj_g)
        if len(self._prompt_cache) > 32:
            self._prompt_cache.clear()
        self._prompt_cache[(prompt, negative_prompt)] = out
        return out

    # ------------------------------------------------------------------
    # windowed last-cell fast path (see SheetEncodeCache)
    # ------------------------------------------------------------------

    def prepare_sheet_cache(
        self, image: np.ndarray, cell_hw: Tuple[int, int]
    ) -> SheetEncodeCache:
        """Encode-down the base sheet ONCE for the per-view loop.

        `image`: [H, W, 3] float [0, 1] — the reference sheet (the content
        of its last cell is irrelevant: the per-view splice region plus its
        context margin covers every feature the cell can influence).
        `cell_hw`: last-cell (height, width) in pixels.
        """
        f = self.config.vae_downscale
        img = jnp.asarray(image, jnp.float32)[None]
        _, h, w = img.shape[:3]
        assert h % f == 0 and w % f == 0, (h, w, f)
        hl, wl = h // f, w // f
        if not hasattr(self, "_jit_encode_down"):
            self._jit_encode_down = jax.jit(
                lambda p, x: self.vae.apply(
                    {"params": p}, x * 2.0 - 1.0, method="encode_down"
                )
            )
        feats = self._jit_encode_down(self.params["vae"], img)

        def dims(cell_px, full_lat):
            cell_lat = -((-cell_px) // f)  # ceil
            splice = min(cell_lat + LASTCELL_ENC_SPLICE_PAD_LAT, full_lat)
            enc_w = min(splice + LASTCELL_ENC_CTX_PAD_LAT, full_lat)
            dec_w = min(cell_lat + LASTCELL_DEC_PAD_LAT, full_lat)
            return enc_w, splice, dec_w

        eh, sh_, dh = dims(cell_hw[0], hl)
        ew, sw_, dw = dims(cell_hw[1], wl)
        return SheetEncodeCache(
            down_feats=feats,
            sheet_hw=(h, w),
            cell_hw=tuple(cell_hw),
            window_lat=(eh, ew, sh_, sw_, dh, dw),
        )

    # ------------------------------------------------------------------
    # main entry
    # ------------------------------------------------------------------

    def img2img(
        self,
        image: np.ndarray,  # [H, W, 3] or [K, H, W, 3] float [0, 1]
        prompt: str,
        negative_prompt: str = "",
        mask: Optional[np.ndarray] = None,  # [(K,) H, W, 1] float, 1 = edit
        control_image: Optional[np.ndarray] = None,  # [(K,) H, W, 1|3] depth
        strength: float = 0.9,
        num_steps: int = 20,
        guidance_scale: float = 7.0,
        controlnet_scale: float = 0.8,
        controlnet_start: float = 0.0,
        controlnet_end: float = 1.0,
        seed: int = 1,
        mask_blur: int = 4,
        inpainting_fill: int = 1,
        control_mode: str = "balanced",
        device_out: bool = False,
        sheet_cache: Optional[SheetEncodeCache] = None,
    ) -> np.ndarray:
        """Edit one image or a whole batch in ONE jitted program.

        With `sheet_cache` (per-view regeneration fast path, single image
        whose dims match the cache): VAE encode reruns only on a padded
        window around the last cell (spliced into the cached features) and
        VAE decode renders only the window whose pixels are consumed — the
        return value is then the decoded BOTTOM-RIGHT WINDOW
        [dec_wh*f, dec_ww*f, 3] (containing the last cell at its own
        bottom-right corner), not the full sheet.

        Batched inputs (leading K) are the per-view generation fast path
        (SURVEY.md §3.2 hot-loop note): K spliced sheets diffuse together,
        amortizing the UNet across views.

        `device_out=True` returns the edited image as a device (jax) array
        without any host round-trip: JAX inputs stay resident, dispatch is
        async, and the caller decides when (and on which thread) to fetch.
        This is what lets the generator's per-view loop pipeline — the host
        enqueues view i+1's NeRF render while view i's denoise chain is
        still executing (the reference pays this serialization over HTTP,
        /root/reference/signerf/diffuser/diffuser.py:180).
        """
        cfg = self.config
        single = np.ndim(image) == 3
        img = jnp.asarray(image, jnp.float32)
        if single:
            img = img[None]
        k_batch, h, w = img.shape[:3]
        f = cfg.vae_downscale
        assert h % f == 0 and w % f == 0, (
            f"image dims must be /{f} (sheet is /8-padded upstream)"
        )

        # Data-parallel per-view generation: with a "data" mesh axis, shard
        # the view batch's leading dim over it (params replicated — see
        # _shard_params) and let GSPMD partition the whole sampler. This is
        # the multi-chip fast path for SURVEY.md §3.2's per-camera hot loop:
        # K spliced sheets denoise simultaneously, one per chip group.
        data_size = (
            self.mesh.shape["data"]
            if self.mesh is not None and "data" in self.mesh.axis_names
            else 0
        )

        # Serial-views fast path: at sheet scale the per-layer attention
        # fits at view-batch 1 but crosses the flash-score threshold at
        # K>1 (unet.py gate). Two serial K=1 programs still beat one K=2
        # batch with TUNED flash tilings (ATTN_SWEEP.json: 2x2.60 ms vs
        # 5.36 ms at S=9216; with the old stock blocks the gap was 1.9x:
        # einsum calls). When no data axis shards the view batch, K serial
        # einsum dispatches beat one flash dispatch, so run views one at a
        # time through the (cached) k_batch=1 program. Per-view RNG then
        # matches the reference's fixed-seed-per-call semantics
        # (/root/reference/signerf/diffuser/diffuser.py:47 seed=1 per view).
        if not single and k_batch > 1 and (data_size <= 1 or k_batch % data_size):
            from signerf_tpu.diffusion.unet import FLASH_SCORE_BYTES_THRESHOLD

            worst = _worst_selfattn_scores(cfg.unet, h // f, w // f)
            if (
                cfg.unet.use_flash_attention
                and 2 * 1 * worst < FLASH_SCORE_BYTES_THRESHOLD
                and 2 * k_batch * worst >= FLASH_SCORE_BYTES_THRESHOLD
            ):
                def per_view(x, k):
                    if x is None or np.ndim(x) == 3:
                        return x  # shared [H, W, C] conditioning
                    return x[k]  # device- or host-side indexing alike

                stack = jnp.stack if device_out else np.stack
                return stack(
                    [
                        self.img2img(
                            img[k], prompt, negative_prompt,
                            per_view(mask, k), per_view(control_image, k),
                            strength, num_steps, guidance_scale,
                            controlnet_scale, controlnet_start,
                            controlnet_end, seed, mask_blur,
                            inpainting_fill, control_mode,
                            device_out=device_out,
                            sheet_cache=sheet_cache,
                        )
                        for k in range(k_batch)
                    ]
                )

        def batched(x, channels):
            if x is None:
                return None
            arr = jnp.asarray(x, jnp.float32)
            if arr.ndim == 3:
                arr = jnp.broadcast_to(arr[None], (k_batch, h, w, channels))
            return arr

        sigmas_np = S.strength_sigmas(S.get_sigmas(num_steps), strength)
        context, pooled = self.encode_prompt(prompt, negative_prompt)
        add_time_ids = jnp.asarray([[h, w, 0, 0, h, w]], jnp.float32)

        msk = batched(mask, 1)
        # ControlNet conditioning is RGB (3-channel) for diffusers weight
        # parity: the reference's A1111 payload sends the depth map as an
        # RGB PNG (/root/reference/signerf/diffuser/diffuser.py:151-156) and
        # diffusers ControlNetConditioningEmbedding.conv_in is [16, 3, 3, 3].
        # Single-channel depth inputs are broadcast.
        ctrl = batched(control_image, 3)
        if ctrl is None:
            ctrl = jnp.zeros((k_batch, h, w, 3), jnp.float32)
        elif ctrl.shape[-1] == 1:
            ctrl = jnp.repeat(ctrl, 3, axis=-1)

        if data_size > 1 and k_batch % data_size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = NamedSharding(self.mesh, P("data", None, None, None))
            img = jax.device_put(img, dp)
            ctrl = jax.device_put(ctrl, dp)
            if msk is not None:
                msk = jax.device_put(msk, dp)

        # A1111 control_mode names (payload parity:
        # /root/reference/signerf/diffuser/diffuser.py:158 "Balanced") map
        # onto the Mikubill-extension semantics implemented in _run.
        control_mode = {
            "balanced": "balanced",
            "my prompt is more important": "prompt",
            "controlnet is more important": "controlnet",
        }.get(control_mode.strip().lower(), control_mode.strip().lower())
        if control_mode not in ("balanced", "prompt", "controlnet"):
            raise ValueError(f"unknown control_mode {control_mode!r}")

        # Windowed last-cell path only applies to a single sheet whose dims
        # match the cache (batched programs fall back to the full path).
        window_lat = None
        down_feats = None
        if (
            sheet_cache is not None
            and k_batch == 1
            and msk is not None
            and (h, w) == tuple(sheet_cache.sheet_hw)
        ):
            window_lat = tuple(sheet_cache.window_lat)
            down_feats = sheet_cache.down_feats

        key = (
            k_batch, h, w, len(sigmas_np), msk is not None, mask_blur,
            inpainting_fill, control_mode, window_lat,
        )
        run = self._jit_cache.get(key)
        if run is None:
            # mask_blur / inpainting_fill / control_mode / window_lat drive
            # python-level control flow.
            run = jax.jit(self._run, static_argnums=(14, 15, 16, 18))
            self._jit_cache[key] = run
        if self.mesh is not None:
            from signerf_tpu.diffusion import unet as unet_mod

            names = self.mesh.axis_names
            ctx = unet_mod.flash_mesh(
                self.mesh,
                batch_axis="data" if "data" in names else None,
                head_axis="tensor" if "tensor" in names else None,
            )
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            out = run(
                self.params,
                img,
                msk if msk is not None else jnp.ones((k_batch, h, w, 1)),
                jnp.asarray(msk is not None),
                ctrl,
                context,
                pooled,
                add_time_ids,
                jnp.asarray(sigmas_np),
                jnp.asarray(guidance_scale, jnp.float32),
                jnp.asarray(controlnet_scale, jnp.float32),
                jnp.asarray(controlnet_start, jnp.float32),
                jnp.asarray(controlnet_end, jnp.float32),
                jax.random.PRNGKey(seed),
                mask_blur,
                inpainting_fill,
                control_mode,
                down_feats,
                window_lat,
            )
        # nan_to_num: with *random-init* weights the eps prediction is
        # unbounded and the ancestral chain can diverge; real weights keep
        # latents bounded. Sanitizing here keeps no-weights pipelines (CI,
        # benches) producing valid images without touching sampler
        # semantics.
        out = jnp.clip(jnp.nan_to_num(out, nan=0.5, posinf=1.0, neginf=0.0), 0.0, 1.0)
        out = out[0] if single else out
        return out if device_out else np.asarray(out)

    # ------------------------------------------------------------------

    def _run(
        self,
        params,
        image,
        mask,
        use_mask,
        control_image,
        context,
        pooled,
        add_time_ids,
        sigmas,
        guidance_scale,
        controlnet_scale,
        controlnet_start,
        controlnet_end,
        rng,
        mask_blur: int,
        inpainting_fill: int,
        control_mode: str = "balanced",
        down_cache=None,
        window_lat: Optional[Tuple[int, int, int, int, int, int]] = None,
    ):
        cfg = self.config
        f = cfg.vae_downscale
        k_batch, h, w = image.shape[:3]

        blurred = jax.vmap(lambda m: S.gaussian_blur(m, mask_blur))(mask)
        filled = jax.vmap(
            lambda im, m: S.apply_fill_mode(im, m, inpainting_fill)
        )(image, blurred)

        k_enc, k_fill, k_sample = jax.random.split(rng, 3)
        if window_lat is not None:
            # Windowed last-cell encode (SheetEncodeCache): rerun the
            # conv-only down path on the bottom-right window, splice the
            # interior into the cached base-sheet features, then run the
            # global mid attention over the full assembled map.
            eh, ew, sp_h, sp_w, _, _ = window_lat
            win = filled[:, h - eh * f :, w - ew * f :, :]
            wfeats = self.vae.apply(
                {"params": params["vae"]}, win * 2.0 - 1.0,
                method="encode_down",
            )
            feats = down_cache.at[:, -sp_h:, -sp_w:, :].set(
                wfeats[:, -sp_h:, -sp_w:, :].astype(down_cache.dtype)
            )
            init_latent = self.vae.apply(
                {"params": params["vae"]}, feats,
                method="encode_from_features",
            )  # [1, h/f, w/f, C]
        else:
            # VAE encode/decode are per-image independent and their full-res
            # activations dominate peak HBM (measured: batch-2 decode of a
            # 1536px sheet needs ~21 GB vs 15.75 available). lax.map
            # sequentializes over the batch so peak memory is single-image
            # regardless of generation_batch_size; the UNet denoise loop
            # below stays batched where the MXU win actually is.
            init_latent = jax.lax.map(
                lambda im: self.vae.apply(
                    {"params": params["vae"]},
                    (im[None] * 2.0 - 1.0),
                    method="encode",
                )[0],
                filled,
            )  # [K, h/f, w/f, C]

        latent_mask = jax.image.resize(
            blurred, (k_batch, h // f, w // f, 1), "linear"
        )
        # fill modes 2/3: replace masked latents with noise / zeros
        if inpainting_fill == 2:
            noise = jax.random.normal(k_fill, init_latent.shape)
            init_latent = (
                init_latent * (1 - latent_mask) + noise * latent_mask
            )
        elif inpainting_fill == 3:
            init_latent = init_latent * (1 - latent_mask)

        # CFG: batched [uncond x K, cond x K] by default. At sheet scale
        # running uncond|cond SEQUENTIALLY at batch K halves the attention
        # footprint, and two B1 dispatches still beat one B2 even with
        # TUNED flash tilings (ATTN_SWEEP.json @68e48f6: 2x2.60 ms vs
        # 5.36 ms at S=9216 h10; with stock blocks the gap was 1.9x whole-
        # step). Same math, same rng, just scheduling.
        from signerf_tpu.diffusion.unet import FLASH_SCORE_BYTES_THRESHOLD

        worst_scores = _worst_selfattn_scores(self.unet.config, h // f, w // f)
        batched_score_bytes = 2 * (2 * k_batch) * worst_scores
        sequential_cfg = batched_score_bytes >= FLASH_SCORE_BYTES_THRESHOLD

        ctx_u = jnp.repeat(context[:1], k_batch, 0)
        ctx_c = jnp.repeat(context[1:], k_batch, 0)
        pooled_u = jnp.repeat(pooled[:1], k_batch, 0)
        pooled_c = jnp.repeat(pooled[1:], k_batch, 0)
        tids_k = jnp.repeat(add_time_ids, k_batch, 0)

        # control_mode (Mikubill ControlNet-extension semantics, exposed by
        # the reference payload as "Balanced" / "My prompt is more
        # important" / "ControlNet is more important",
        # /root/reference/signerf/diffuser/diffuser.py:56-58,158):
        #   balanced   — residuals applied equally to both CFG branches;
        #   prompt     — soft-weight ladder 0.825^(n-i) downweights shallow
        #                residuals (deepest/mid keep full strength);
        #   controlnet — the UNCOND branch runs without control, so CFG
        #                amplifies the controlled direction.
        def eps_branch(x_in, t_cont, step_frac, ctx_b, pooled_b, tids_b, cb,
                       cn_gain=1.0):
            tb = jnp.full((x_in.shape[0],), t_cont)
            down_res, mid_res = self.controlnet.apply(
                {"params": params["controlnet"]},
                x_in, cb, tb, ctx_b, pooled_b, tids_b,
            )
            active = (
                (step_frac >= controlnet_start) & (step_frac <= controlnet_end)
            ).astype(jnp.float32)
            scale = controlnet_scale * active * cn_gain
            n_down = len(down_res)
            if control_mode == "prompt":
                soft = [0.825 ** (n_down - i) for i in range(n_down)]
                mid_soft = 1.0
            else:
                soft = [1.0] * n_down
                mid_soft = 1.0
            return self.unet.apply(
                {"params": params["unet"]},
                x_in, tb, ctx_b, pooled_b, tids_b,
                extra_down_residuals=[
                    r * (scale * s) for r, s in zip(down_res, soft)
                ],
                extra_mid_residual=mid_res * (scale * mid_soft),
            )

        def denoised_fn(x, sigma, step_frac):
            x_in = S.scale_model_input(x, sigma)
            t_cont = S.sigma_to_t(sigma, S.make_sd_schedule())
            uncond_gain = 0.0 if control_mode == "controlnet" else 1.0
            if sequential_cfg:
                eps_u = eps_branch(
                    x_in, t_cont, step_frac, ctx_u, pooled_u, tids_k,
                    control_image, cn_gain=uncond_gain,
                )
                eps_c = eps_branch(
                    x_in, t_cont, step_frac, ctx_c, pooled_c, tids_k,
                    control_image,
                )
            else:
                xb = jnp.concatenate([x_in, x_in], axis=0)  # [2K, ...]
                cb = jnp.concatenate([control_image, control_image], axis=0)
                gains = jnp.concatenate(
                    [
                        jnp.full((k_batch,), uncond_gain, jnp.float32),
                        jnp.ones((k_batch,), jnp.float32),
                    ]
                )[:, None, None, None]
                eps = eps_branch(
                    xb, t_cont, step_frac,
                    jnp.concatenate([ctx_u, ctx_c]),
                    jnp.concatenate([pooled_u, pooled_c]),
                    jnp.concatenate([tids_k, tids_k]),
                    cb, cn_gain=gains,
                )
                eps_u, eps_c = eps[:k_batch], eps[k_batch:]
            eps_mix = S.cfg_mix(eps_u, eps_c, guidance_scale)
            return S.eps_to_denoised(x, eps_mix, sigma)

        inpaint = S.InpaintSpec(
            init_latent=init_latent,
            latent_mask=jnp.where(use_mask, latent_mask, jnp.ones_like(latent_mask)),
        )
        final = S.sample_euler_ancestral(
            k_sample, denoised_fn, init_latent, sigmas, inpaint
        )
        if window_lat is not None:
            # Global attention over the FULL latent, image-res convs over
            # only the consumed window.
            _, _, _, _, dec_h, dec_w = window_lat
            dfeats = self.vae.apply(
                {"params": params["vae"]}, final, method="decode_mid"
            )
            decoded = self.vae.apply(
                {"params": params["vae"]},
                dfeats[:, -dec_h:, -dec_w:, :],
                method="decode_up",
            )  # [1, dec_h*f, dec_w*f, 3]
        else:
            decoded = jax.lax.map(
                lambda z: self.vae.apply(
                    {"params": params["vae"]}, z[None], method="decode"
                )[0],
                final,
            )
        return (decoded + 1.0) / 2.0


# ---------------------------------------------------------------------------
# tensor-parallel sharding
# ---------------------------------------------------------------------------


def tensor_parallel_pspecs(params: Dict[str, Any], axis: str = "tensor"):
    """PartitionSpec tree for megatron-style TP of the UNet/ControlNet:
    column-shard q/k/v and FF-in projections, row-shard the output
    projections (XLA inserts the psum over ICI)."""
    from jax.sharding import PartitionSpec as P

    def spec_for(path: Tuple[str, ...], leaf) -> "P":
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        if leaf.ndim >= 2:
            if any(k in joined for k in ("to_q", "to_k", "to_v")):
                return P(*([None] * (leaf.ndim - 1) + [axis]))  # column
            if "ff_geglu/proj" in joined:
                return P(*([None] * (leaf.ndim - 1) + [axis]))
            if "to_out" in joined or "ff_out" in joined:
                return P(*([axis] + [None] * (leaf.ndim - 1)))  # row
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _shard_params(params, mesh):
    """TP-shard params over the mesh's "tensor" axis if it has one;
    otherwise (pure data-parallel mesh) replicate them."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if "tensor" in mesh.axis_names:
        specs = tensor_parallel_pspecs(params)
    else:
        specs = jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
