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

    print("dumping golden activations (torch CPU reference) ...")
    dump_goldens(pipe, cn, out)
    return 0


def _stats(arr) -> dict:
    """Activation fingerprint: summary stats + a fixed slice. The jax side
    (tests/test_weight_conversion.py::TestGoldenParity) recomputes these on
    identical inputs and compares norm-relatively."""
    import numpy as np

    a = np.asarray(arr, np.float64).reshape(-1)
    return {
        "mean": float(a.mean()),
        "std": float(a.std()),
        "abs_mean": float(np.abs(a).mean()),
        "slice": [float(x) for x in a[:: max(1, len(a) // 16)][:16]],
        "shape": list(np.asarray(arr).shape),
    }


def golden_inputs():
    """Deterministic f32 inputs shared by the torch dump and the jax test.
    512px single-latent regime; NHWC — the torch side transposes."""
    import numpy as np

    r = np.random.RandomState(0)
    return {
        "latent": r.standard_normal((1, 64, 64, 4)).astype(np.float32),
        "context": (r.standard_normal((1, 77, 2048)) * 0.5).astype(np.float32),
        "pooled": (r.standard_normal((1, 1280)) * 0.5).astype(np.float32),
        "time_ids": np.asarray([[512, 512, 0, 0, 512, 512]], np.float32),
        "timestep": 500.0,
        "image": (r.uniform(-1, 1, (1, 256, 256, 3))).astype(np.float32),
        "cond_image": (r.uniform(0, 1, (1, 512, 512, 3))).astype(np.float32),
        "token_ids": (np.arange(77) % 1000 + 100).reshape(1, 77),
    }


def dump_goldens(pipe, cn, out: Path) -> None:
    """Write golden_activations.json: per-component fingerprints of the
    DIFFUSERS torch models on `golden_inputs()`. The moment a weights dir
    (with this file) is provided to the no-egress environment, the skipped
    golden-parity test validates jax-vs-torch numerics as a switch-flip
    (SURVEY.md §7 hard part (b))."""
    import json

    import numpy as np
    import torch

    gi = golden_inputs()
    nchw = lambda a: torch.from_numpy(np.moveaxis(a, -1, 1).copy())  # noqa: E731
    goldens = {}
    with torch.no_grad():
        lat = nchw(gi["latent"])
        ctx = torch.from_numpy(gi["context"])
        added = {
            "text_embeds": torch.from_numpy(gi["pooled"]),
            "time_ids": torch.from_numpy(gi["time_ids"]),
        }
        t = torch.tensor([gi["timestep"]])
        goldens["unet"] = _stats(
            pipe.unet(lat, t, encoder_hidden_states=ctx,
                      added_cond_kwargs=added).sample.numpy()
        )
        down, mid = cn(
            lat, t, encoder_hidden_states=ctx,
            controlnet_cond=nchw(gi["cond_image"]),
            added_cond_kwargs=added, return_dict=False,
        )
        goldens["controlnet_mid"] = _stats(mid.numpy())
        goldens["controlnet_down_last"] = _stats(down[-1].numpy())
        z = pipe.vae.encode(nchw(gi["image"])).latent_dist.mean
        goldens["vae_encode"] = _stats(
            (z * pipe.vae.config.scaling_factor).numpy()
        )
        goldens["vae_decode"] = _stats(
            pipe.vae.decode(z).sample.numpy()
        )
        ids = torch.from_numpy(gi["token_ids"]).long()
        goldens["clip_l_penultimate"] = _stats(
            pipe.text_encoder(
                ids, output_hidden_states=True
            ).hidden_states[-2].numpy()
        )
        enc2 = pipe.text_encoder_2(ids, output_hidden_states=True)
        goldens["clip_g_penultimate"] = _stats(enc2.hidden_states[-2].numpy())
        goldens["clip_g_projected"] = _stats(enc2.text_embeds.numpy())
    (out / "golden_activations.json").write_text(json.dumps(goldens, indent=1))
    print(f"wrote {out / 'golden_activations.json'}")


if __name__ == "__main__":
    sys.exit(main())
