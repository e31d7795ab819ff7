"""NeRF training losses: interlevel (proposal), distortion, orientation,
predicted-normal, and pixel losses.

Capability parity (SURVEY.md §2a "Model"): the reference's `SIGNeRFModel`
uses L1 rgb loss + LPIPS patch loss (/root/reference/signerf/signerf.py:35-62)
plus nerfacto's inherited interlevel, distortion, orientation and
predicted-normal losses (signerf.py:64-81). The interlevel/distortion math
follows mipnerf360 as implemented in nerfstudio's `math/losses`.

All losses operate in normalized s-space on [R, S] arrays — pure reductions,
fully shardable over rays.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from signerf_tpu.models.ray_samples import RaySamples

EPS = 1e-7


def _outer(
    t0_starts: jnp.ndarray,
    t0_ends: jnp.ndarray,
    t1_starts: jnp.ndarray,
    t1_ends: jnp.ndarray,
    y1: jnp.ndarray,
) -> jnp.ndarray:
    """For each interval [t0_s, t0_e], sum of y1 mass over overlapping t1 bins
    (outer measure upper bound, mipnerf360 eq. 13)."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )  # [R, S1+1]

    # Monotone-lookup as masked reductions instead of searchsorted +
    # take_along_axis (per-row gathers are the TPU bottleneck — see
    # samplers.sample_pdf_bins for the same rewrite). cy1 is nondecreasing:
    #   lo: last t1_start <= t0_start  -> max of masked cy1[:-1]
    #   hi: first t1_end  >= t0_end    -> min of masked cy1[1:]
    inf = jnp.inf
    le = t1_starts[..., None, :] <= t0_starts[..., :, None]  # [R, S0, S1]
    ge = t1_ends[..., None, :] >= t0_ends[..., :, None]
    cy_lo_e = cy1[..., None, :-1]
    cy_hi_e = cy1[..., None, 1:]
    cy1_lo = jnp.max(jnp.where(le, cy_lo_e, -inf), axis=-1)
    cy1_hi = jnp.min(jnp.where(ge, cy_hi_e, inf), axis=-1)
    # clip semantics of the searchsorted formulation at the boundaries
    cy1_lo = jnp.where(jnp.isfinite(cy1_lo), cy1_lo, cy1[..., :1])
    cy1_hi = jnp.where(jnp.isfinite(cy1_hi), cy1_hi, cy1[..., -1:])
    return cy1_hi - cy1_lo


def lossfun_outer(
    t: jnp.ndarray,  # [R, S+1] final bins (s-space)
    w: jnp.ndarray,  # [R, S] final weights (detached by caller)
    t_env: jnp.ndarray,  # [R, S1+1] proposal bins
    w_env: jnp.ndarray,  # [R, S1] proposal weights (grads flow)
) -> jnp.ndarray:
    w_outer = _outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + EPS)


def interlevel_loss(
    weights_list: Sequence[jnp.ndarray],
    ray_samples_list: Sequence[RaySamples],
    final_weights: jnp.ndarray,
    final_samples: RaySamples,
) -> jnp.ndarray:
    """Proposal supervision: pull each proposal histogram over the field's."""
    c = final_samples.spacing_bins
    w = jax.lax.stop_gradient(final_weights)
    c = jax.lax.stop_gradient(c)
    loss = 0.0
    for w_prop, s_prop in zip(weights_list, ray_samples_list):
        cp = s_prop.spacing_bins
        loss = loss + jnp.mean(jnp.sum(lossfun_outer(c, w, cp, w_prop), axis=-1))
    return loss


def distortion_loss(
    final_weights: jnp.ndarray, final_samples: RaySamples
) -> jnp.ndarray:
    """mipnerf360 distortion in s-space (O(S^2), S=48 -> trivial on MXU/VPU)."""
    t = final_samples.spacing_bins  # [R, S+1]
    w = final_weights  # [R, S]
    ut = 0.5 * (t[..., 1:] + t[..., :-1])  # midpoints [R, S]
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])  # [R, S, S]
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return jnp.mean(loss_inter + loss_intra)


def orientation_loss(
    weights: jnp.ndarray,  # [R, S]
    normals: jnp.ndarray,  # [R, S, 3]
    view_dirs: jnp.ndarray,  # [R, 3]
) -> jnp.ndarray:
    """Penalize normals facing away from the camera (Ref-NeRF)."""
    v = -view_dirs[:, None, :]  # toward camera
    n_dot_v = jnp.sum(normals * v, axis=-1)  # [R, S]
    return jnp.mean(jnp.sum(weights * jnp.minimum(n_dot_v, 0.0) ** 2, axis=-1))


def pred_normal_loss(
    weights: jnp.ndarray,  # [R, S]
    normals: jnp.ndarray,  # [R, S, 3] gradient normals (detached by caller)
    pred_normals: jnp.ndarray,  # [R, S, 3]
) -> jnp.ndarray:
    return jnp.mean(
        jnp.sum(weights * (1.0 - jnp.sum(normals * pred_normals, axis=-1)), axis=-1)
    )


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse_loss(pred, target), 1e-12))
