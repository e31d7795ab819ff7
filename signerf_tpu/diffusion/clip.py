"""CLIP text encoders (ViT-L and OpenCLIP bigG text towers) in flax linen.

SDXL's dual text conditioning: the 77-token prompt runs through BOTH
encoders; the *penultimate* hidden states (2048 = 768 + 1280 concat) become
the cross-attention context, and bigG's projected EOS embedding (1280)
becomes the pooled `add_text_embeds`.

TPU notes: standard pre-LN causal transformer — pure MXU work in bf16. The
77-token sequence is tiny; no sharding needed for the text towers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    hidden_act: str = "quick_gelu"  # ViT-L; bigG uses "gelu"
    projection_dim: Optional[int] = None  # bigG: 1280


CLIP_L_CONFIG = CLIPTextConfig()
CLIP_BIGG_CONFIG = CLIPTextConfig(
    hidden_size=1280,
    intermediate_size=5120,
    num_layers=32,
    num_heads=20,
    hidden_act="gelu",
    projection_dim=1280,
)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)

        def split(t):
            return t.reshape(*t.shape[:-1], cfg.num_heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(
            self.dtype
        )
        scores = jnp.where(mask, scores, jnp.finfo(self.dtype).min)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(*x.shape)
        return dense("out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        h = nn.LayerNorm(name="layer_norm1", dtype=jnp.float32)(x)
        x = x + CLIPAttention(cfg, self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(name="layer_norm2", dtype=jnp.float32)(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (final_hidden, penultimate_hidden, pooled[, projected])."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
        )
        x = (tok + pos[None, :s]).astype(self.dtype)

        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]  # [1,1,S,S]
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal)
        final = nn.LayerNorm(name="final_layer_norm", dtype=jnp.float32)(x)

        # pooled = final hidden at the EOS position (argmax of ids == EOS;
        # CLIP uses the highest token id which is EOS)
        eos_idx = jnp.argmax(input_ids, axis=-1)  # [B]
        pooled = final[jnp.arange(b), eos_idx]  # [B, H]
        if cfg.projection_dim is not None:
            projected = nn.Dense(
                cfg.projection_dim,
                use_bias=False,
                dtype=self.dtype,
                name="text_projection",
            )(pooled)
            return final, penultimate, pooled, projected
        return final, penultimate, pooled
