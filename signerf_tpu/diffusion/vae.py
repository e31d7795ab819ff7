"""AutoencoderKL (SDXL VAE) in flax linen, NHWC.

Encoder/decoder with GroupNorm+SiLU resnet stacks and a single-head spatial
attention mid-block — standard SD VAE topology, config-driven so tests can
run a tiny instance. Latent scaling factor for SDXL is 0.13025.

TPU notes: convs are NHWC so XLA maps them directly onto the MXU; a whole
1024x1024x3 encode is ~milliseconds-scale conv work on one v5e chip.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from signerf_tpu.diffusion.norms import GroupNormBF16

SDXL_VAE_SCALING = 0.13025


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_groups: int = 32
    scaling_factor: float = SDXL_VAE_SCALING


TINY_VAE_CONFIG = VAEConfig(
    block_out_channels=(16, 32), layers_per_block=1, norm_groups=4
)


def _gn(groups: int, name: str):
    # bf16 I/O + f32 stats (norms.py) — avoids f32 activation copies at
    # sheet-resolution decodes (see unet.py:_gn for measurements).
    return GroupNormBF16(num_groups=groups, epsilon=1e-6, name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = _gn(self.groups, "norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _gn(self.groups, "norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


# Above this many tokens the mid-block attention runs query-chunked: the
# [S, S] score matrix at a 1536px sheet (192x192 latent = 36864 tokens) is
# 5.4 GB in f32 — the VAE's HBM peak — while chunking queries keeps the
# softmax exact (full key axis per row) at a [CHUNK, S] footprint.
ATTN_CHUNK_TOKENS = 8192
ATTN_QUERY_CHUNK = 2048


def _plain_attention(q, k, v, dtype):
    c = q.shape[-1]
    scores = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c).astype(dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dtype)
    return jnp.einsum("bqk,bkc->bqc", probs, v)


def _chunked_attention(q, k, v, dtype):
    """Query-blocked attention, numerically identical to `_plain_attention`
    (the softmax still sees the complete key axis per query row); peak
    score memory is [ATTN_QUERY_CHUNK, S] instead of [S, S]."""
    b, s, c = q.shape
    pad = (-s) % ATTN_QUERY_CHUNK
    if pad:
        q = jnp.concatenate([q, jnp.zeros((b, pad, c), q.dtype)], axis=1)
    nq = q.shape[1] // ATTN_QUERY_CHUNK
    q_blocks = jnp.moveaxis(
        q.reshape(b, nq, ATTN_QUERY_CHUNK, c), 1, 0
    )  # [nq, B, CHUNK, C]
    scale = 1.0 / jnp.sqrt(c).astype(dtype)

    def per_chunk(qc):
        scores = jnp.einsum("bqc,bkc->bqk", qc, k) * scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(dtype)
        return jnp.einsum("bqk,bkc->bqc", probs, v)

    out = jax.lax.map(per_chunk, q_blocks)  # [nq, B, CHUNK, C]
    out = jnp.moveaxis(out, 0, 1).reshape(b, nq * ATTN_QUERY_CHUNK, c)
    return out[:, :s]


class AttnBlock(nn.Module):
    groups: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = _gn(self.groups, "group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        if h * w > ATTN_CHUNK_TOKENS:
            out = _chunked_attention(q, k, v, y.dtype)
        else:
            out = _plain_attention(q, k, v, y.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        chans = cfg.block_out_channels
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    ch, cfg.norm_groups, self.dtype, name=f"down_{i}_res_{j}"
                )(h)
            if i < len(chans) - 1:
                h = nn.Conv(
                    ch,
                    (3, 3),
                    strides=(2, 2),
                    padding=((0, 1), (0, 1)),
                    dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(h)
        h = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype, name="mid_res_1")(h)
        h = AttnBlock(cfg.norm_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype, name="mid_res_2")(h)
        h = _gn(cfg.norm_groups, "conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        h = nn.Conv(
            2 * cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans = cfg.block_out_channels
        h = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )(z)
        h = nn.Conv(chans[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        h = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype, name="mid_res_1")(h)
        h = AttnBlock(cfg.norm_groups, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype, name="mid_res_2")(h)
        for i, ch in enumerate(reversed(chans)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(
                    ch, cfg.norm_groups, self.dtype, name=f"up_{i}_res_{j}"
                )(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(
                    ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample"
                )(h)
        h = _gn(cfg.norm_groups, "conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)

    def encode(self, images: jnp.ndarray, rng=None) -> jnp.ndarray:
        """[B, H, W, 3] in [-1, 1] -> scaled latents [B, H/2^k, W/2^k, C]."""
        mean, logvar = self.encoder(images)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents -> images [B, H, W, 3] in [-1, 1]."""
        return self.decoder(latents / self.config.scaling_factor)

    def __call__(self, images, rng=None):
        z = self.encode(images, rng)
        return self.decode(z)
