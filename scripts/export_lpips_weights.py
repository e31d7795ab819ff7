"""Offline exporter: pretrained LPIPS weights -> the `.npz` format that
`signerf_tpu.ops.lpips.load_weights` consumes.

Run on any machine WITH network access / cached checkpoints (this repo's
environment has neither):

    pip install lpips            # richzhang/PerceptualSimilarity
    python scripts/export_lpips_weights.py alex lpips_alex.npz
    python scripts/export_lpips_weights.py vgg  lpips_vgg.npz

then point `SIGNeRFModelConfig.lpips_weights_path` at the file. The
reference reaches the same weights through torchmetrics' LPIPS
(/root/reference/signerf/signerf.py:10,39); torchmetrics wraps the same
richzhang checkpoints, so either source works.

Export format (ops/lpips.py:load_weights):
    conv{i}_kernel [k, k, in, out]  (HWIO — transposed from torch OIHW)
    conv{i}_bias   [out]
    lin{i}         [C_i]            (nonnegative per-channel weights)

`convert_state_dict` is pure numpy and ORDER-based (it scans conv tensors
in module order rather than matching exact key strings), so it tolerates
the key-prefix differences between `lpips`, `torchmetrics`, and raw
torchvision backbones. Its contract is unit-tested against the loader in
tests/test_weight_conversion.py without needing torch or real weights.
"""

from __future__ import annotations

import sys
from typing import Dict, List

import numpy as np

# Expected backbone conv output channels, in order (must match
# signerf_tpu/ops/lpips.py layer specs).
_ALEX_OUT = [64, 192, 384, 256, 256]
_VGG_OUT = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
# feature-capture channel dims (the lin heads' input channels)
_ALEX_CAPTURE = [64, 192, 384, 256, 256]
_VGG_CAPTURE = [64, 128, 256, 512, 512]


def convert_state_dict(sd: Dict[str, "np.ndarray"], net: str) -> Dict[str, np.ndarray]:
    """Map an LPIPS-model state dict (any of the common key layouts) onto
    the loader's npz schema. `sd` values may be torch tensors or numpy
    arrays. Order-based: backbone convs are the 4-D [O,I,k,k] tensors with
    k>1 or in==3/prev-out channels in key order; lin heads are the 1x1
    convs with out==1."""
    expect_out = _ALEX_OUT if net == "alex" else _VGG_OUT
    capture = _ALEX_CAPTURE if net == "alex" else _VGG_CAPTURE

    items = [(k, np.asarray(v)) for k, v in sd.items()]
    convs: List[np.ndarray] = []
    conv_biases: Dict[int, np.ndarray] = {}
    lins: List[np.ndarray] = []

    # backbone convs, in declaration order
    for k, v in items:
        if v.ndim == 4 and v.shape[0] != 1 and len(convs) < len(expect_out):
            if v.shape[0] != expect_out[len(convs)]:
                raise ValueError(
                    f"unexpected conv order at {k}: out={v.shape[0]}, "
                    f"expected {expect_out[len(convs)]}"
                )
            convs.append(v)
        elif v.ndim == 1 and len(conv_biases) < len(convs):
            if v.shape[0] == convs[len(conv_biases)].shape[0]:
                conv_biases[len(conv_biases)] = v
        elif (
            v.ndim == 4
            and v.shape[0] == 1
            and v.shape[2] == v.shape[3] == 1
            and v.shape[1] != 3  # excludes the scaling_layer shift/scale
        ):
            lins.append(v)

    if len(convs) != len(expect_out):
        raise ValueError(f"found {len(convs)} backbone convs, want {len(expect_out)}")
    if len(lins) != len(capture):
        raise ValueError(f"found {len(lins)} lin heads, want {len(capture)}")
    for i, lin in enumerate(lins):
        if lin.shape[1] != capture[i]:
            raise ValueError(
                f"lin{i} has in={lin.shape[1]}, expected {capture[i]}"
            )

    out: Dict[str, np.ndarray] = {}
    for i, w in enumerate(convs):
        out[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        bias = conv_biases.get(i)
        out[f"conv{i}_bias"] = (
            bias.astype(np.float32)
            if bias is not None
            else np.zeros((w.shape[0],), np.float32)
        )
    for i, lin in enumerate(lins):
        # richzhang lins are stored pre-relu; the metric uses max(w, 0)
        out[f"lin{i}"] = np.maximum(lin[0, :, 0, 0].astype(np.float32), 0.0)
    return out


def main() -> int:
    if len(sys.argv) != 3 or sys.argv[1] not in ("alex", "vgg"):
        print(__doc__)
        return 1
    net, dest = sys.argv[1], sys.argv[2]
    import lpips as lpips_pkg  # richzhang/PerceptualSimilarity
    import torch

    model = lpips_pkg.LPIPS(net=net, verbose=False)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    arrs = convert_state_dict(sd, net)

    # sanity: round-trip through the loader
    np.savez(dest, **arrs)
    sys.path.insert(0, ".")
    from signerf_tpu.ops.lpips import load_weights

    params = load_weights(dest, net)
    assert len(params.convs) == len(_ALEX_OUT if net == "alex" else _VGG_OUT)
    print(f"wrote {dest}: {len(arrs)} arrays, loader OK")
    del torch
    return 0


if __name__ == "__main__":
    sys.exit(main())
