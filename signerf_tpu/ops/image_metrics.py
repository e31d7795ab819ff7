"""Full-image quality metrics: PSNR and SSIM (jnp, jittable).

Capability parity: nerfstudio's eval metrics (PSNR/SSIM/LPIPS) used by
`ns-eval`; LPIPS lives in signerf_tpu/ops/lpips.py. SSIM follows the
standard Wang et al. formulation with an 11x11 Gaussian window
(sigma 1.5), computed as depthwise convolutions (MXU/VPU work).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Images in [0, 1], any matching shape -> scalar dB."""
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur of [H, W, C] (valid padding)."""
    c = x.shape[-1]
    img = x.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID")
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), "VALID")
    return out[:, 0].transpose(1, 2, 0)


def ssim(
    pred: jnp.ndarray,  # [H, W, C] in [0, 1]
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    k = jnp.asarray(_gaussian_kernel(window_size, sigma))
    c1, c2 = 0.01**2, 0.03**2
    mu_x = _blur(pred, k)
    mu_y = _blur(target, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _blur(pred * pred, k) - mu_xx
    sigma_yy = _blur(target * target, k) - mu_yy
    sigma_xy = _blur(pred * target, k) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den)
