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
    """Split into `down` (pure conv, full-res — the FLOP bulk) and `mid_out`
    (mid resnets + ONE global attention + output convs, all at latent res)
    so the windowed sheet-encode fast path can recompute `down` on just a
    padded window around the changed cell while `mid_out` — the only
    non-local stage — still sees the full assembled feature map. Param
    names match the previous nn.compact layout exactly (checkpoint/
    weight-conversion compatible)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.config
        chans = cfg.block_out_channels
        setattr(
            self,
            "conv_in",
            nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype),
        )
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                setattr(
                    self,
                    f"down_{i}_res_{j}",
                    ResnetBlock(ch, cfg.norm_groups, self.dtype),
                )
            if i < len(chans) - 1:
                setattr(
                    self,
                    f"down_{i}_downsample",
                    nn.Conv(
                        ch,
                        (3, 3),
                        strides=(2, 2),
                        padding=((0, 1), (0, 1)),
                        dtype=self.dtype,
                    ),
                )
        self.mid_res_1 = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype)
        self.mid_attn = AttnBlock(cfg.norm_groups, self.dtype)
        self.mid_res_2 = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype)
        self.conv_norm_out = _gn(cfg.norm_groups, None)
        self.conv_out = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype
        )
        self.quant_conv = nn.Conv(
            2 * cfg.latent_channels, (1, 1), dtype=self.dtype
        )

    def down(self, x):
        """[B, H, W, 3] -> conv-only features [B, H/2^k, W/2^k, C_last]."""
        cfg = self.config
        chans = cfg.block_out_channels
        h = getattr(self, "conv_in")(x)
        for i in range(len(chans)):
            for j in range(cfg.layers_per_block):
                h = getattr(self, f"down_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                h = getattr(self, f"down_{i}_downsample")(h)
        return h

    def mid_out(self, h):
        """Down-features -> (mean, logvar). Contains the global attention."""
        h = self.mid_res_1(h)
        h = self.mid_attn(h)
        h = self.mid_res_2(h)
        h = self.conv_norm_out(h)
        h = nn.silu(h)
        h = self.conv_out(h)
        h = self.quant_conv(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar

    def __call__(self, x):
        return self.mid_out(self.down(x))


class Decoder(nn.Module):
    """Split into `mid` (input convs + mid resnets + the ONE global
    attention, all at latent res) and `up` (pure conv upsampling — the
    FLOP bulk at image res) so the windowed sheet-decode fast path can run
    `mid` on the full latent and `up` on just the window whose pixels are
    actually consumed. Param names match the previous layout exactly."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.config
        chans = cfg.block_out_channels
        self.post_quant_conv = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=self.dtype
        )
        setattr(
            self,
            "conv_in",
            nn.Conv(chans[-1], (3, 3), padding=1, dtype=self.dtype),
        )
        self.mid_res_1 = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype)
        self.mid_attn = AttnBlock(cfg.norm_groups, self.dtype)
        self.mid_res_2 = ResnetBlock(chans[-1], cfg.norm_groups, self.dtype)
        for i, ch in enumerate(reversed(chans)):
            for j in range(cfg.layers_per_block + 1):
                setattr(
                    self,
                    f"up_{i}_res_{j}",
                    ResnetBlock(ch, cfg.norm_groups, self.dtype),
                )
            if i < len(chans) - 1:
                setattr(
                    self,
                    f"up_{i}_upsample",
                    nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype),
                )
        self.conv_norm_out = _gn(cfg.norm_groups, None)
        self.conv_out = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)

    def mid(self, z):
        """Latents (unscaled) -> latent-res features [B, h, w, C_last]."""
        h = self.post_quant_conv(z)
        h = getattr(self, "conv_in")(h)
        h = self.mid_res_1(h)
        h = self.mid_attn(h)
        h = self.mid_res_2(h)
        return h

    def up(self, h):
        """Latent-res features -> image [B, H, W, 3] in [-1, 1]."""
        cfg = self.config
        chans = cfg.block_out_channels
        for i, ch in enumerate(reversed(chans)):
            for j in range(cfg.layers_per_block + 1):
                h = getattr(self, f"up_{i}_res_{j}")(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = getattr(self, f"up_{i}_upsample")(h)
        h = self.conv_norm_out(h)
        h = nn.silu(h)
        return self.conv_out(h)

    def __call__(self, z):
        return self.up(self.mid(z))


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

    # ---- staged entry points for the windowed sheet fast path ----------
    # (see sdxl_pipeline.SheetEncodeCache: per-view regeneration changes
    # only the sheet's last cell, so the full-res conv stages run on a
    # padded window while the global attention runs at latent res.)

    def encode_down(self, images: jnp.ndarray) -> jnp.ndarray:
        """Conv-only encoder features (no attention, fully local)."""
        return self.encoder.down(images)

    def encode_from_features(self, feats: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Down-features -> scaled latents (mid attention + output convs)."""
        mean, logvar = self.encoder.mid_out(feats)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.config.scaling_factor

    def decode_mid(self, latents: jnp.ndarray) -> jnp.ndarray:
        """Scaled latents -> latent-res decoder features (global attention
        runs here, over the FULL latent)."""
        return self.decoder.mid(latents / self.config.scaling_factor)

    def decode_up(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Latent-res decoder features -> image (conv-only, local)."""
        return self.decoder.up(feats)

    def __call__(self, images, rng=None):
        z = self.encode(images, rng)
        return self.decode(z)
