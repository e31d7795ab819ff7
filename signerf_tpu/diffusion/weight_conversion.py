"""Diffusers-checkpoint -> flax-param-tree conversion (full name mapping).

Maps torch state dicts of SDXL base 1.0 components (diffusers layouts:
`UNet2DConditionModel`, `ControlNetModel`, `AutoencoderKL`,
`CLIPTextModel(WithProjection)`) onto the param trees built by
signerf_tpu/diffusion/{unet,vae,clip}.py.

Layout transforms:
  * Conv2d  : torch [O, I, kh, kw]  -> flax [kh, kw, I, O]
  * Linear  : torch [O, I]          -> flax [I, O]
  * Embed   : weight                -> embedding (as-is)
  * Norms   : weight/bias           -> scale/bias (as-is)

Every flax leaf must be matched by exactly one torch tensor with the right
shape; `convert_component` raises with the full miss list otherwise, so a
drifted diffusers version fails loudly instead of silently mangling
weights. Tensors may be torch tensors or numpy arrays (np.asarray is the
only requirement), so the mapping is unit-testable without torch weights.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# path translation
# ---------------------------------------------------------------------------


def _resnet(tname: str, leaf_parent: str) -> str:
    sub = {
        "norm1": "norm1",
        "conv1": "conv1",
        "time_emb_proj": "time_emb_proj",
        "norm2": "norm2",
        "conv2": "conv2",
        "conv_shortcut": "conv_shortcut",
    }[leaf_parent]
    return f"{tname}.{sub}"


def _transformer(tname: str, rest: List[str]) -> str:
    # rest like ["blocks_0", "attn1", "to_q"] or ["blocks_0", "ff_geglu",
    # "proj"] / ["blocks_0", "ff_out"] / ["blocks_0", "norm1"] or
    # ["norm"] / ["proj_in"] / ["proj_out"]
    head = rest[0]
    if head == "norm":
        return f"{tname}.norm"
    if head in ("proj_in", "proj_out"):
        return f"{tname}.{head}"
    k = int(head.split("_")[1])
    base = f"{tname}.transformer_blocks.{k}"
    sub = rest[1]
    if sub in ("norm1", "norm2", "norm3"):
        return f"{base}.{sub}"
    if sub in ("attn1", "attn2"):
        proj = rest[2]
        if proj == "to_out":
            return f"{base}.{sub}.to_out.0"
        return f"{base}.{sub}.{proj}"
    if sub == "ff_geglu":
        return f"{base}.ff.net.0.proj"
    if sub == "ff_out":
        return f"{base}.ff.net.2"
    raise KeyError(f"unknown transformer sub-path {rest}")


def unet_torch_name(path: List[str]) -> str:
    """flax param path (without trailing kernel/bias/scale) -> torch module."""
    p = path[0] if path[0] != "core" else None
    parts = path[1:] if p is None else path
    head = parts[0]
    m = re.match(r"down_(\d+)_res_(\d+)", head)
    if m:
        return _resnet(
            f"down_blocks.{m[1]}.resnets.{m[2]}", parts[1]
        )
    m = re.match(r"down_(\d+)_attn_(\d+)", head)
    if m:
        return _transformer(f"down_blocks.{m[1]}.attentions.{m[2]}", parts[1:])
    m = re.match(r"down_(\d+)_downsample", head)
    if m:
        return f"down_blocks.{m[1]}.downsamplers.0.conv"
    m = re.match(r"up_(\d+)_res_(\d+)", head)
    if m:
        return _resnet(f"up_blocks.{m[1]}.resnets.{m[2]}", parts[1])
    m = re.match(r"up_(\d+)_attn_(\d+)", head)
    if m:
        return _transformer(f"up_blocks.{m[1]}.attentions.{m[2]}", parts[1:])
    m = re.match(r"up_(\d+)_upsample", head)
    if m:
        return f"up_blocks.{m[1]}.upsamplers.0.conv"
    fixed = {
        "conv_in": "conv_in",
        "conv_out": "conv_out",
        "conv_norm_out": "conv_norm_out",
        "time_embed_1": "time_embedding.linear_1",
        "time_embed_2": "time_embedding.linear_2",
        "add_embed_1": "add_embedding.linear_1",
        "add_embed_2": "add_embedding.linear_2",
        "mid_res_1": None,
        "mid_res_2": None,
        "mid_attn": None,
    }
    if head == "mid_res_1":
        return _resnet("mid_block.resnets.0", parts[1])
    if head == "mid_res_2":
        return _resnet("mid_block.resnets.1", parts[1])
    if head == "mid_attn":
        return _transformer("mid_block.attentions.0", parts[1:])
    if head in fixed and fixed[head]:
        return fixed[head]
    raise KeyError(f"unmapped unet path {path}")


def controlnet_torch_name(path: List[str]) -> str:
    head = path[0]
    m = re.match(r"zero_conv_(\d+)", head)
    if m:
        return f"controlnet_down_blocks.{m[1]}"
    if head == "zero_conv_mid":
        return "controlnet_mid_block"
    if head == "cond_conv_in":
        return "controlnet_cond_embedding.conv_in"
    if head == "cond_conv_out":
        return "controlnet_cond_embedding.conv_out"
    m = re.match(r"cond_block_(\d+)", head)
    if m:
        return f"controlnet_cond_embedding.blocks.{m[1]}"
    return unet_torch_name(path)


def vae_torch_name(path: List[str]) -> str:
    comp = path[0]  # encoder | decoder
    parts = path[1:]
    head = parts[0]
    if comp == "encoder" and head == "quant_conv":
        return "quant_conv"
    if comp == "decoder" and head == "post_quant_conv":
        return "post_quant_conv"
    m = re.match(r"down_(\d+)_res_(\d+)", head)
    if m:
        return f"{comp}.down_blocks.{m[1]}.resnets.{m[2]}.{parts[1]}"
    m = re.match(r"down_(\d+)_downsample", head)
    if m:
        return f"{comp}.down_blocks.{m[1]}.downsamplers.0.conv"
    m = re.match(r"up_(\d+)_res_(\d+)", head)
    if m:
        return f"{comp}.up_blocks.{m[1]}.resnets.{m[2]}.{parts[1]}"
    m = re.match(r"up_(\d+)_upsample", head)
    if m:
        return f"{comp}.up_blocks.{m[1]}.upsamplers.0.conv"
    if head in ("mid_res_1", "mid_res_2"):
        idx = 0 if head == "mid_res_1" else 1
        return f"{comp}.mid_block.resnets.{idx}.{parts[1]}"
    if head == "mid_attn":
        sub = parts[1]
        if sub == "to_out":
            sub = "to_out.0"
        return f"{comp}.mid_block.attentions.0.{sub}"
    if head in ("conv_in", "conv_out", "conv_norm_out"):
        return f"{comp}.{head}"
    raise KeyError(f"unmapped vae path {path}")


def clip_torch_name(path: List[str]) -> str:
    head = path[0]
    if head == "token_embedding":
        return "text_model.embeddings.token_embedding"
    if head == "position_embedding":
        return "text_model.embeddings.position_embedding"
    if head == "final_layer_norm":
        return "text_model.final_layer_norm"
    if head == "text_projection":
        return "text_projection"
    m = re.match(r"layers_(\d+)", head)
    if m:
        base = f"text_model.encoder.layers.{m[1]}"
        sub = path[1]
        if sub == "self_attn":
            return f"{base}.self_attn.{path[2]}"
        if sub in ("layer_norm1", "layer_norm2"):
            return f"{base}.{sub}"
        if sub in ("fc1", "fc2"):
            return f"{base}.mlp.{sub}"
    raise KeyError(f"unmapped clip path {path}")


_NAME_FNS = {
    "unet": unet_torch_name,
    "controlnet": controlnet_torch_name,
    "vae": vae_torch_name,
    "clip_l": clip_torch_name,
    "clip_g": clip_torch_name,
}


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _torch_key(component: str, path: Tuple[str, ...]) -> Tuple[str, str]:
    """-> (torch key, transform kind)."""
    *mods, leaf = path
    name_fn = _NAME_FNS[component]
    if leaf == "kernel":
        tmod = name_fn(list(mods))
        return f"{tmod}.weight", "kernel"
    if leaf == "bias":
        tmod = name_fn(list(mods))
        return f"{tmod}.bias", "as_is"
    if leaf == "scale":
        tmod = name_fn(list(mods))
        return f"{tmod}.weight", "as_is"
    if leaf == "embedding":
        tmod = name_fn(list(mods))
        return f"{tmod}.weight", "as_is"
    if leaf == "position_embedding":
        tmod = name_fn(list(mods) + [leaf])
        return f"{tmod}.weight", "as_is"
    raise KeyError(f"unknown leaf {leaf} at {path}")


def _transform(value, kind: str, target_shape) -> np.ndarray:
    arr = np.asarray(value)
    if kind == "kernel":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 2:  # linear [O, I] -> [I, O]
            arr = arr.T
    if arr.shape != tuple(target_shape):
        raise ValueError(
            f"shape mismatch after transform: {arr.shape} vs {target_shape}"
        )
    return arr.astype(np.float32)


def expected_torch_keys(component: str, flax_params: Dict) -> Dict[str, Tuple]:
    """{torch key: (flax path, kind)} for coverage checks / fake fixtures."""
    out = {}
    for path in _flatten(flax_params):
        tkey, kind = _torch_key(component, path)
        out[tkey] = (path, kind)
    return out


def convert_component(
    component: str, flax_params: Dict, torch_sd: Dict[str, Any]
) -> Dict:
    """Fill `flax_params`' structure from a torch state dict. Raises with a
    miss list if any flax leaf has no source tensor."""
    flat = _flatten(flax_params)
    misses = []
    new_flat = {}
    for path, leaf in flat.items():
        tkey, kind = _torch_key(component, path)
        if tkey not in torch_sd:
            misses.append(f"{'/'.join(path)} <- {tkey}")
            continue
        new_flat[path] = _transform(torch_sd[tkey], kind, np.shape(leaf))
    if misses:
        raise KeyError(
            f"{component}: {len(misses)} unmatched params, e.g.:\n  "
            + "\n  ".join(misses[:20])
        )

    def unflatten(flat_dict):
        tree: Dict = {}
        for path, v in flat_dict.items():
            node = tree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = v
        return tree

    return unflatten(new_flat)


def convert_all(flax_params: Dict, torch_sds: Dict[str, Dict]) -> Dict:
    """Convert every component ({unet, controlnet, vae, clip_l, clip_g})."""
    return {
        comp: convert_component(comp, flax_params[comp], torch_sds[comp])
        for comp in flax_params
    }
