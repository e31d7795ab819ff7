"""LPIPS perceptual loss in JAX (AlexNet / VGG16 backbones + linear heads).

Capability parity (SURVEY.md §2b "LPIPS metric/loss"): the reference uses
`torchmetrics` LPIPS over 32x32 patches normalized to [-1, 1]
(/root/reference/signerf/signerf.py:10,39,49-62). This module implements the
same computation natively:

    d(x, y) = sum_l  w_l . mean_hw || phi_l(x)/||phi_l(x)|| -
                                     phi_l(y)/||phi_l(y)|| ||^2

with phi_l the backbone's relu feature stacks and w_l >= 0 learned linear
calibration weights, after the standard ImageNet shift/scale.

Weights: this environment has no network egress and no cached torch hub
checkpoints, so pretrained backbone/LIN weights cannot be baked in. The
module therefore supports
  * `load_weights(path)` — a `.npz` export (see `export_weights_npz` docs)
    produced from torchmetrics/lpips on any online machine; and
  * deterministic He-initialized random weights as fallback. Random VGG-style
    features are an established usable perceptual metric (random-weight
    perceptual losses track structure, if less calibrated); the seam is the
    same so dropping in real weights changes no code.

TPU notes: convs are NHWC fp32->bf16-friendly `lax.conv_general_dilated`
calls; the whole metric jits and fuses into the training step, so patches
never leave the device (vs. the reference's separate torchmetrics module).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, kernel, stride, pool_before) per conv layer; features taken
# after each named relu stage.
_ALEX_LAYERS = [
    # conv: (out, k, stride, pad), capture after relu
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_ALEX_POOL_AFTER = {0, 1}  # maxpool after relu1, relu2 (before next conv)

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
_VGG_CAPTURE = {1, 3, 6, 9, 12}  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 conv idx

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass
class LPIPSParams:
    convs: List[Dict[str, jnp.ndarray]]  # backbone conv kernels/biases
    lins: List[jnp.ndarray]  # [C_l] nonneg per-channel weights
    net: str = "alex"


def _conv(x, kernel, bias, stride=1, padding=0):
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def init_lpips(key: jax.Array, net: str = "alex") -> LPIPSParams:
    """He-init backbone + unit linear heads (deterministic fallback)."""
    convs = []
    lins = []
    in_ch = 3
    if net == "alex":
        caps = []
        for i, (out_ch, k, s, p) in enumerate(_ALEX_LAYERS):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (k, k, in_ch, out_ch)) * jnp.sqrt(
                2.0 / (k * k * in_ch)
            )
            convs.append({"kernel": w, "bias": jnp.zeros((out_ch,))})
            caps.append(out_ch)
            in_ch = out_ch
        lins = [jnp.ones((c,)) / c for c in caps]
    elif net == "vgg":
        caps = []
        conv_idx = 0
        for v in _VGG_CFG:
            if v == "M":
                continue
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (3, 3, in_ch, v)) * jnp.sqrt(
                2.0 / (9 * in_ch)
            )
            convs.append({"kernel": w, "bias": jnp.zeros((v,))})
            if conv_idx in _VGG_CAPTURE:
                caps.append(v)
            in_ch = v
            conv_idx += 1
        lins = [jnp.ones((c,)) / c for c in caps]
    else:
        raise ValueError(f"unknown net {net!r}")
    return LPIPSParams(convs=convs, lins=lins, net=net)


def load_weights(path: str | Path, net: str = "alex") -> LPIPSParams:
    """Load an exported `.npz` with arrays `conv{i}_kernel` [k,k,in,out],
    `conv{i}_bias` [out], `lin{i}` [C] (produced offline from
    torchmetrics.image.lpip / richzhang's lpips by transposing torch OIHW
    kernels to HWIO)."""
    data = np.load(Path(path))
    convs = []
    i = 0
    while f"conv{i}_kernel" in data:
        convs.append(
            {
                "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
                "bias": jnp.asarray(data[f"conv{i}_bias"]),
            }
        )
        i += 1
    lins = []
    i = 0
    while f"lin{i}" in data:
        lins.append(jnp.asarray(data[f"lin{i}"]))
        i += 1
    return LPIPSParams(convs=convs, lins=lins, net=net)


def _features(params: LPIPSParams, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: [N, H, W, 3] in [-1, 1] -> per-stage feature maps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    if params.net == "alex":
        for i, ((out_ch, k, s, p), conv) in enumerate(
            zip(_ALEX_LAYERS, params.convs)
        ):
            x = _conv(x, conv["kernel"], conv["bias"], stride=s, padding=p)
            x = jax.nn.relu(x)
            feats.append(x)
            if i in _ALEX_POOL_AFTER:
                x = _maxpool(x, 3, 2) if x.shape[1] >= 3 else x
    else:  # vgg
        conv_idx = 0
        ci = 0
        for v in _VGG_CFG:
            if v == "M":
                if x.shape[1] >= 2:
                    x = _maxpool(x, 2, 2)
                continue
            conv = params.convs[ci]
            x = _conv(x, conv["kernel"], conv["bias"], stride=1, padding=1)
            x = jax.nn.relu(x)
            if conv_idx in _VGG_CAPTURE:
                feats.append(x)
            conv_idx += 1
            ci += 1
    return feats


def lpips(
    params: LPIPSParams, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """LPIPS distance per image pair.

    Args:
      x, y: [N, H, W, 3] in [-1, 1] (the reference normalizes patches to
        [-1, 1] before the metric, signerf.py:56-58).

    Returns: [N] distances.
    """
    fx = _features(params, x)
    fy = _features(params, y)
    total = jnp.zeros((x.shape[0],), x.dtype)
    for f1, f2, w in zip(fx, fy, params.lins):
        n1 = f1 / jnp.maximum(
            jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-10
        )
        n2 = f2 / jnp.maximum(
            jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-10
        )
        diff = (n1 - n2) ** 2  # [N, h, w, C]
        total = total + jnp.mean(
            jnp.sum(diff * jnp.maximum(w, 0.0), axis=-1), axis=(1, 2)
        )
    return total
