"""Diffusion schedule + Euler-ancestral sampler with A1111 semantics.

Capability parity (SURVEY.md §2b "SDXL + ControlNet" / §7.4): the reference
delegates sampling to the SD Web UI server with sampler "Euler a",
denoising_strength partial noising, CFG, and masked inpaint
(/root/reference/signerf/diffuser/diffuser.py:132-169). This module
implements those semantics natively:

  * scaled-linear beta schedule (SD/SDXL: beta 0.00085 -> 0.012 squared
    linspace over 1000 steps) and its sigma parameterization
    sigma_t = sqrt((1 - abar_t) / abar_t);
  * k-diffusion `DiscreteSchedule.get_sigmas` timestep selection
    (linear in t with log-sigma interpolation) — what A1111 uses for
    non-Karras "Euler a";
  * CompVis eps-model wrapping: c_in = 1/sqrt(sigma^2+1),
    denoised = x - sigma * eps(x * c_in, t(sigma));
  * `get_ancestral_step` + Euler-ancestral update;
  * img2img strength: keep the last floor(strength * steps) sigmas and
    start from x0 + noise * sigma[0];
  * masked inpaint: per-step latent re-blend with the noised original
    outside the mask + final blend (A1111 img2img mask path), fill modes
    0 fill / 1 original / 2 latent-noise / 3 latent-zero;
  * classifier-free guidance mixing.

Everything is shape-static jnp; the step loop is a `lax.fori_loop` over a
precomputed sigma table, so the whole sampler jits into ONE dispatch.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# schedule
# ---------------------------------------------------------------------------


def make_sd_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    """Return sigmas[t] (ascending in t) of the scaled-linear DDPM schedule."""
    betas = (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)


def get_sigmas(
    num_steps: int, train_sigmas: Optional[np.ndarray] = None
) -> np.ndarray:
    """k-diffusion sigma selection: t linspace(T-1, 0, n), log-sigma interp;
    appended 0. Returns [n+1] descending."""
    if train_sigmas is None:
        train_sigmas = make_sd_schedule()
    t_max = len(train_sigmas) - 1
    t = np.linspace(t_max, 0, num_steps)
    log_sigmas = np.log(train_sigmas)
    low_idx = np.floor(t).astype(int)
    high_idx = np.ceil(t).astype(int)
    w = t - low_idx
    log_s = (1 - w) * log_sigmas[low_idx] + w * log_sigmas[high_idx]
    sigmas = np.exp(log_s)
    return np.append(sigmas, 0.0).astype(np.float32)


def sigma_to_t(sigma: jnp.ndarray, train_sigmas: np.ndarray) -> jnp.ndarray:
    """Continuous timestep for a sigma (log-sigma interpolation inverse)."""
    log_sigmas = jnp.asarray(np.log(train_sigmas))
    log_sigma = jnp.log(jnp.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, None] if sigma.ndim else log_sigma - log_sigmas
    # find the last index where log_sigmas <= log_sigma
    ge = (log_sigmas <= log_sigma).astype(jnp.int32)
    low = jnp.clip(jnp.sum(ge) - 1, 0, len(train_sigmas) - 2)
    high = low + 1
    w = (log_sigma - log_sigmas[low]) / (log_sigmas[high] - log_sigmas[low])
    w = jnp.clip(w, 0.0, 1.0)
    return (1.0 - w) * low + w * high


def get_ancestral_step(
    sigma_from: jnp.ndarray, sigma_to: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k-diffusion `get_ancestral_step` (eta=1)."""
    sigma_up = jnp.minimum(
        sigma_to,
        jnp.sqrt(
            jnp.maximum(
                sigma_to**2
                * (sigma_from**2 - sigma_to**2)
                / jnp.maximum(sigma_from**2, 1e-20),
                0.0,
            )
        ),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))
    return sigma_down, sigma_up


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------

# denoised_fn(x, sigma, step_frac) -> denoised x0 prediction (CFG applied
# inside); step_frac = i / num_steps in [0, 1) gates ControlNet start/end.
DenoisedFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


class InpaintSpec(NamedTuple):
    """Latent-space inpaint state: blend with the noised original outside
    the (latent) mask after every step."""

    init_latent: jnp.ndarray  # [B, h, w, C] clean original latents
    latent_mask: jnp.ndarray  # [B, h, w, 1], 1 = regenerate, 0 = keep


def sample_euler_ancestral(
    key: jax.Array,
    denoised_fn: DenoisedFn,
    init_latent: jnp.ndarray,  # [B, h, w, C] clean image latents (img2img)
    sigmas: jnp.ndarray,  # [n+1] descending, last = 0
    inpaint: Optional[InpaintSpec] = None,
) -> jnp.ndarray:
    """Euler-ancestral sampling from `init_latent + noise * sigmas[0]`.

    The loop runs as lax.fori_loop so the full chain is one jitted dispatch.
    """
    n = sigmas.shape[0] - 1
    k_init, k_loop = jax.random.split(key)
    noise = jax.random.normal(k_init, init_latent.shape, init_latent.dtype)
    x = init_latent + noise * sigmas[0]

    def body(i, carry):
        x, k = carry
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]
        denoised = denoised_fn(x, sigma, i.astype(jnp.float32) / n)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next)
        d = (x - denoised) / jnp.maximum(sigma, 1e-10)
        x = x + d * (sigma_down - sigma)
        k, sub = jax.random.split(k)
        step_noise = jax.random.normal(sub, x.shape, x.dtype)
        x = jnp.where(sigma_next > 0, x + step_noise * sigma_up, x)
        if inpaint is not None:
            # Re-noise the original to the *next* sigma and keep it outside
            # the mask (A1111 img2img latent mask path).
            k, sub2 = jax.random.split(k)
            renoise = jax.random.normal(sub2, x.shape, x.dtype)
            orig_noised = inpaint.init_latent + renoise * sigma_next
            x = (
                x * inpaint.latent_mask
                + orig_noised * (1.0 - inpaint.latent_mask)
            )
        return (x, k)

    x, _ = jax.lax.fori_loop(0, n, body, (x, k_loop))
    if inpaint is not None:
        x = (
            x * inpaint.latent_mask
            + inpaint.init_latent * (1.0 - inpaint.latent_mask)
        )
    return x


def strength_sigmas(sigmas: np.ndarray, strength: float) -> np.ndarray:
    """img2img denoising-strength: keep the last t_enc+1 sigma entries
    (A1111: t_enc = min(int(strength * steps), steps - 1))."""
    steps = len(sigmas) - 1
    t_enc = min(int(strength * steps), steps)
    if t_enc <= 0:
        return sigmas[-1:]
    return sigmas[steps - t_enc :]


def cfg_mix(
    eps_uncond: jnp.ndarray, eps_cond: jnp.ndarray, scale: float | jnp.ndarray
) -> jnp.ndarray:
    return eps_uncond + scale * (eps_cond - eps_uncond)


def eps_to_denoised(
    x: jnp.ndarray, eps: jnp.ndarray, sigma: jnp.ndarray
) -> jnp.ndarray:
    """CompVis eps-parameterization: denoised = x - sigma * eps."""
    return x - sigma * eps


def scale_model_input(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """c_in scaling before the eps model: x / sqrt(sigma^2 + 1)."""
    return x / jnp.sqrt(sigma**2 + 1.0)


# ---------------------------------------------------------------------------
# pixel-mask helpers (A1111 inpaint preprocessing)
# ---------------------------------------------------------------------------


def gaussian_blur(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable gaussian blur of [H, W, 1] with sigma ~ radius/2 (A1111
    `mask_blur` uses PIL GaussianBlur(radius))."""
    if radius <= 0:
        return mask
    sigma = max(radius / 2.0, 0.5)
    half = int(3 * sigma + 0.5)
    xs = np.arange(-half, half + 1)
    kern = np.exp(-0.5 * (xs / sigma) ** 2)
    kern = (kern / kern.sum()).astype(np.float32)
    k = jnp.asarray(kern)
    m = mask[..., 0][None, None]  # [1,1,H,W]
    m = jax.lax.conv_general_dilated(
        m, k[None, None, :, None], (1, 1), [(half, half), (0, 0)]
    )
    m = jax.lax.conv_general_dilated(
        m, k[None, None, None, :], (1, 1), [(0, 0), (half, half)]
    )
    return m[0, 0][..., None]


def apply_fill_mode(
    image: jnp.ndarray,  # [H, W, 3]
    mask: jnp.ndarray,  # [H, W, 1] (1 = regenerate)
    fill_mode: int,
) -> jnp.ndarray:
    """A1111 `inpainting_fill` pixel-space preprocessing.

    0 = "fill" (replace masked pixels with the unmasked mean color),
    1 = "original" (no-op; the reference uses this, diffuser.py:166),
    2/3 handled in latent space by the pipeline.
    """
    if fill_mode != 0:
        return image
    keep = 1.0 - mask
    denom = jnp.maximum(jnp.sum(keep), 1.0)
    mean_color = jnp.sum(image * keep, axis=(0, 1)) / denom
    return image * keep + mean_color * mask
