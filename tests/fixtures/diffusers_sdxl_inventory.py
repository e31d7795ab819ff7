"""Vendored diffusers parameter-name inventory for SDXL base 1.0 components.

This module INDEPENDENTLY enumerates every state-dict key (and its torch
shape) of the diffusers checkpoints the converter must consume:

  * ``UNet2DConditionModel``  (stabilityai/stable-diffusion-xl-base-1.0)
  * ``ControlNetModel``       (diffusers-style SDXL depth ControlNet)
  * ``AutoencoderKL``         (SDXL VAE)
  * ``CLIPTextModel``         (text_encoder,   ViT-L/14:   12 x 768)
  * ``CLIPTextModelWithProjection`` (text_encoder_2, bigG: 32 x 1280)

The names/shapes are derived from the published diffusers architecture
layout (module naming rules + SDXL config), NOT from this repo's mapping
functions — so the coverage test in test_weight_conversion.py is
double-entry bookkeeping: the converter's flax->torch key derivation and
this inventory must agree exactly for the real-weights path to be safe.

ALLOWED_UNUSED lists keys real checkpoints carry that hold no learnable
weight our models consume (registered buffers).
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]
Inventory = Dict[str, Shape]


def _conv(inv: Inventory, key: str, out_ch: int, in_ch: int, k: int) -> None:
    inv[f"{key}.weight"] = (out_ch, in_ch, k, k)
    inv[f"{key}.bias"] = (out_ch,)


def _linear(inv: Inventory, key: str, out_f: int, in_f: int, bias=True) -> None:
    inv[f"{key}.weight"] = (out_f, in_f)
    if bias:
        inv[f"{key}.bias"] = (out_f,)


def _norm(inv: Inventory, key: str, ch: int) -> None:
    inv[f"{key}.weight"] = (ch,)
    inv[f"{key}.bias"] = (ch,)


def _resnet(
    inv: Inventory, prefix: str, in_ch: int, out_ch: int, time_dim=None
) -> None:
    _norm(inv, f"{prefix}.norm1", in_ch)
    _conv(inv, f"{prefix}.conv1", out_ch, in_ch, 3)
    if time_dim is not None:
        _linear(inv, f"{prefix}.time_emb_proj", out_ch, time_dim)
    _norm(inv, f"{prefix}.norm2", out_ch)
    _conv(inv, f"{prefix}.conv2", out_ch, out_ch, 3)
    if in_ch != out_ch:
        _conv(inv, f"{prefix}.conv_shortcut", out_ch, in_ch, 1)


def _transformer(
    inv: Inventory, prefix: str, ch: int, depth: int, context: int = 2048
) -> None:
    """Transformer2DModel with use_linear_projection=True (SDXL)."""
    _norm(inv, f"{prefix}.norm", ch)  # GroupNorm
    _linear(inv, f"{prefix}.proj_in", ch, ch)
    _linear(inv, f"{prefix}.proj_out", ch, ch)
    for b in range(depth):
        base = f"{prefix}.transformer_blocks.{b}"
        _norm(inv, f"{base}.norm1", ch)
        _norm(inv, f"{base}.norm2", ch)
        _norm(inv, f"{base}.norm3", ch)
        # self-attention: q/k/v no bias, out has bias
        _linear(inv, f"{base}.attn1.to_q", ch, ch, bias=False)
        _linear(inv, f"{base}.attn1.to_k", ch, ch, bias=False)
        _linear(inv, f"{base}.attn1.to_v", ch, ch, bias=False)
        _linear(inv, f"{base}.attn1.to_out.0", ch, ch)
        # cross-attention: k/v from the text context
        _linear(inv, f"{base}.attn2.to_q", ch, ch, bias=False)
        _linear(inv, f"{base}.attn2.to_k", ch, context, bias=False)
        _linear(inv, f"{base}.attn2.to_v", ch, context, bias=False)
        _linear(inv, f"{base}.attn2.to_out.0", ch, ch)
        # GEGLU feed-forward (mult 4, gate doubles the projection)
        _linear(inv, f"{base}.ff.net.0.proj", 8 * ch, ch)
        _linear(inv, f"{base}.ff.net.2", ch, 4 * ch)


def _unet_trunk(inv: Inventory, encoder_only: bool) -> None:
    """conv_in + embeddings + down blocks + mid (shared by UNet/ControlNet)."""
    C = (320, 640, 1280)
    DEPTH = (0, 2, 10)
    T = 1280  # time embedding dim

    _conv(inv, "conv_in", C[0], 4, 3)
    _linear(inv, "time_embedding.linear_1", T, C[0])
    _linear(inv, "time_embedding.linear_2", T, T)
    _linear(inv, "add_embedding.linear_1", T, 2816)
    _linear(inv, "add_embedding.linear_2", T, T)

    for i, ch in enumerate(C):
        prev = C[i - 1] if i > 0 else C[0]
        for j in range(2):
            in_ch = prev if j == 0 else ch
            _resnet(inv, f"down_blocks.{i}.resnets.{j}", in_ch, ch, T)
            if DEPTH[i] > 0:
                _transformer(
                    inv, f"down_blocks.{i}.attentions.{j}", ch, DEPTH[i]
                )
        if i < len(C) - 1:
            _conv(inv, f"down_blocks.{i}.downsamplers.0.conv", ch, ch, 3)

    _resnet(inv, "mid_block.resnets.0", C[-1], C[-1], T)
    _transformer(inv, "mid_block.attentions.0", C[-1], DEPTH[-1])
    _resnet(inv, "mid_block.resnets.1", C[-1], C[-1], T)

    if encoder_only:
        return

    # up path: 3 resnets per block; skip channels pop the down residual
    # stack [conv_in, d0r0, d0r1, d0down, d1r0, d1r1, d1down, d2r0, d2r1]
    res_stack = [C[0], C[0], C[0], C[0], C[1], C[1], C[1], C[2], C[2]]
    UP_C = (1280, 640, 320)
    UP_DEPTH = (10, 2, 0)
    hidden = C[-1]
    for i, ch in enumerate(UP_C):
        for j in range(3):
            skip = res_stack.pop()
            _resnet(inv, f"up_blocks.{i}.resnets.{j}", hidden + skip, ch, T)
            hidden = ch
            if UP_DEPTH[i] > 0:
                _transformer(
                    inv, f"up_blocks.{i}.attentions.{j}", ch, UP_DEPTH[i]
                )
        if i < len(UP_C) - 1:
            _conv(inv, f"up_blocks.{i}.upsamplers.0.conv", ch, ch, 3)

    _norm(inv, "conv_norm_out", C[0])
    _conv(inv, "conv_out", 4, C[0], 3)


def unet_inventory() -> Inventory:
    inv: Inventory = {}
    _unet_trunk(inv, encoder_only=False)
    return inv


def controlnet_inventory() -> Inventory:
    inv: Inventory = {}
    _unet_trunk(inv, encoder_only=True)
    # conditioning embedding: conv_in(3->16), 6 blocks, zero conv_out
    _conv(inv, "controlnet_cond_embedding.conv_in", 16, 3, 3)
    stem = [(16, 16), (32, 16), (32, 32), (96, 32), (96, 96), (256, 96)]
    for b, (out_ch, in_ch) in enumerate(stem):
        _conv(inv, f"controlnet_cond_embedding.blocks.{b}", out_ch, in_ch, 3)
    _conv(inv, "controlnet_cond_embedding.conv_out", 320, 256, 3)
    # zero convs: one per down residual + mid
    res_stack = [320, 320, 320, 320, 640, 640, 640, 1280, 1280]
    for i, ch in enumerate(res_stack):
        _conv(inv, f"controlnet_down_blocks.{i}", ch, ch, 1)
    _conv(inv, "controlnet_mid_block", 1280, 1280, 1)
    return inv


def vae_inventory() -> Inventory:
    inv: Inventory = {}
    C = (128, 256, 512, 512)

    def _attn(prefix: str, ch: int) -> None:
        _norm(inv, f"{prefix}.group_norm", ch)
        _linear(inv, f"{prefix}.to_q", ch, ch)
        _linear(inv, f"{prefix}.to_k", ch, ch)
        _linear(inv, f"{prefix}.to_v", ch, ch)
        _linear(inv, f"{prefix}.to_out.0", ch, ch)

    # encoder
    _conv(inv, "encoder.conv_in", C[0], 3, 3)
    for i, ch in enumerate(C):
        prev = C[i - 1] if i > 0 else C[0]
        for j in range(2):
            in_ch = prev if j == 0 else ch
            _resnet(inv, f"encoder.down_blocks.{i}.resnets.{j}", in_ch, ch)
        if i < len(C) - 1:
            _conv(inv, f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch, 3)
    _resnet(inv, "encoder.mid_block.resnets.0", C[-1], C[-1])
    _attn("encoder.mid_block.attentions.0", C[-1])
    _resnet(inv, "encoder.mid_block.resnets.1", C[-1], C[-1])
    _norm(inv, "encoder.conv_norm_out", C[-1])
    _conv(inv, "encoder.conv_out", 8, C[-1], 3)
    _conv(inv, "quant_conv", 8, 8, 1)

    # decoder (channels reversed, 3 resnets per block)
    D = (512, 512, 256, 128)
    _conv(inv, "decoder.conv_in", D[0], 4, 3)
    _resnet(inv, "decoder.mid_block.resnets.0", D[0], D[0])
    _attn("decoder.mid_block.attentions.0", D[0])
    _resnet(inv, "decoder.mid_block.resnets.1", D[0], D[0])
    for i, ch in enumerate(D):
        prev = D[i - 1] if i > 0 else D[0]
        for j in range(3):
            in_ch = prev if j == 0 else ch
            _resnet(inv, f"decoder.up_blocks.{i}.resnets.{j}", in_ch, ch)
        if i < len(D) - 1:
            _conv(inv, f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch, 3)
    _norm(inv, "decoder.conv_norm_out", D[-1])
    _conv(inv, "decoder.conv_out", 3, D[-1], 3)
    _conv(inv, "post_quant_conv", 4, 4, 1)
    return inv


def _clip_inventory(layers: int, hidden: int, mlp: int, projection: bool) -> Inventory:
    inv: Inventory = {}
    inv["text_model.embeddings.token_embedding.weight"] = (49408, hidden)
    inv["text_model.embeddings.position_embedding.weight"] = (77, hidden)
    for i in range(layers):
        base = f"text_model.encoder.layers.{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(inv, f"{base}.self_attn.{p}", hidden, hidden)
        _norm(inv, f"{base}.layer_norm1", hidden)
        _norm(inv, f"{base}.layer_norm2", hidden)
        _linear(inv, f"{base}.mlp.fc1", mlp, hidden)
        _linear(inv, f"{base}.mlp.fc2", hidden, mlp)
    _norm(inv, "text_model.final_layer_norm", hidden)
    if projection:
        _linear(inv, "text_projection", hidden, hidden, bias=False)
    return inv


def clip_l_inventory() -> Inventory:
    """text_encoder: CLIPTextModel ViT-L/14 (12 layers, 768, mlp 3072)."""
    return _clip_inventory(12, 768, 3072, projection=False)


def clip_g_inventory() -> Inventory:
    """text_encoder_2: CLIPTextModelWithProjection bigG (32, 1280, 5120)."""
    return _clip_inventory(32, 1280, 5120, projection=True)


INVENTORIES = {
    "unet": unet_inventory,
    "controlnet": controlnet_inventory,
    "vae": vae_inventory,
    "clip_l": clip_l_inventory,
    "clip_g": clip_g_inventory,
}

# Buffers present in real checkpoints that carry no learnable weight our
# models consume (conversion may ignore them, nothing else).
ALLOWED_UNUSED = {
    "unet": set(),
    "controlnet": set(),
    "vae": set(),
    "clip_l": {"text_model.embeddings.position_ids"},
    "clip_g": {"text_model.embeddings.position_ids"},
}
