"""Offline converter: diffusers SDXL (+ControlNet-depth) torch weights ->
this repo's flax param tree (`sdxl_params.msgpack` + tokenizer files).

Run on any machine WITH network access and `torch`, `diffusers`,
`transformers` installed (the no-egress TPU environment cannot download
weights itself):

    python scripts/convert_sdxl_weights.py \
        --sdxl stabilityai/stable-diffusion-xl-base-1.0 \
        --controlnet diffusers/controlnet-depth-sdxl-1.0 \
        --out /weights/sdxl/

Then point the diffuser at it:
    --pipeline.dataset-generator.diffuser.sdxl-weights-path /weights/sdxl/

The name mapping lives in signerf_tpu/diffusion/weight_conversion.py and is
unit-tested against synthetic state dicts; `convert_component` fails loudly
(full miss list) if a diffusers version renames modules.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sdxl", default="stabilityai/stable-diffusion-xl-base-1.0")
    ap.add_argument("--controlnet", default="diffusers/controlnet-depth-sdxl-1.0")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    try:
        import torch
        from diffusers import ControlNetModel, StableDiffusionXLPipeline
    except ImportError as exc:
        print(f"requires torch + diffusers on the converting machine: {exc}")
        return 1

    import numpy as np
    from flax import serialization

    from signerf_tpu.diffusion.sdxl_pipeline import (
        SDXLConfig,
        SDXLInpaintPipeline,
    )
    from signerf_tpu.diffusion.weight_conversion import convert_all

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    print("loading diffusers checkpoints ...")
    pipe = StableDiffusionXLPipeline.from_pretrained(
        args.sdxl, torch_dtype=torch.float32
    )
    cn = ControlNetModel.from_pretrained(args.controlnet, torch_dtype=torch.float32)

    pipe.tokenizer.save_pretrained(out / "tokenizer")

    def sd_numpy(module) -> dict:
        return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}

    torch_sds = {
        "unet": sd_numpy(pipe.unet),
        "controlnet": sd_numpy(cn),
        "vae": sd_numpy(pipe.vae),
        "clip_l": sd_numpy(pipe.text_encoder),
        "clip_g": sd_numpy(pipe.text_encoder_2),
    }

    print("building flax template (abstract init) ...")
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        template = SDXLInpaintPipeline._random_init(
            SDXLConfig(), seed=0, param_dtype=None
        )

    print("converting ...")
    converted = convert_all(template, torch_sds)
    blob = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, converted)
    )
    (out / "sdxl_params.msgpack").write_bytes(blob)
    print(f"wrote {out / 'sdxl_params.msgpack'} "
          f"({len(blob) / 1e9:.2f} GB) + tokenizer files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
