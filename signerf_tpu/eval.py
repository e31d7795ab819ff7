"""Eval CLI: `python -m signerf_tpu.eval --data ... --load-dir ...`.

Capability parity: nerfstudio's `ns-eval` — renders every dataset camera
from a checkpoint and reports PSNR / SSIM / (optional) LPIPS against the
ground-truth images, writing a JSON summary.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

from signerf_tpu import config as cfglib


def main(argv=None) -> int:
    from signerf_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from signerf_tpu.data.datamanager import (
        SIGNeRFDataManager,
        SIGNeRFDataManagerConfig,
    )
    from signerf_tpu.data.dataparser import SIGNeRFDataParserConfig
    from signerf_tpu.engine.checkpoints import latest_checkpoint, surgical_restore
    from signerf_tpu.engine.train_step import make_eval_render
    from signerf_tpu.models.signerf import SIGNeRFModel, SIGNeRFModelConfig
    from signerf_tpu.ops.image_metrics import psnr, ssim

    argv = list(sys.argv[1:] if argv is None else argv)
    opts = cfglib.parse_cli_overrides(argv)
    data = Path(opts.pop("data"))
    load_dir = opts.pop("load-dir", opts.pop("load_dir", None))
    out_path = Path(opts.pop("output", "eval.json"))
    use_lpips = str(opts.pop("lpips", "false")).lower() in ("1", "true", "yes")
    from signerf_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(opts.pop("mesh", "auto"))
    if mesh is not None:
        print(f"[eval] device mesh: {dict(mesh.shape)} (rays DP over all axes)")

    dm = SIGNeRFDataManager(
        SIGNeRFDataManagerConfig(dataparser=SIGNeRFDataParserConfig(data=data))
    )
    model_cfg = SIGNeRFModelConfig(use_lpips=False)
    for key, val in list(opts.items()):
        if key.startswith("model."):
            model_cfg = cfglib.apply_overrides(
                model_cfg, {key[len("model."):]: val}
            )
    model = SIGNeRFModel(model_cfg, num_train_images=dm.num_images)
    params = model.init(jax.random.PRNGKey(0))
    if load_dir is not None:
        ckpt = latest_checkpoint(Path(load_dir))
        if ckpt is None:
            print(f"no checkpoint under {load_dir}")
            return 1
        params = surgical_restore(ckpt, params)
        print(f"loaded {ckpt}")

    lpips_params = None
    if use_lpips:
        from signerf_tpu.ops.lpips import init_lpips, load_weights, lpips as lpips_fn

        lp = opts.pop("lpips-weights", None)
        if lp:
            lpips_params = load_weights(lp)
        else:
            from signerf_tpu.utils.calibration import warn_uncalibrated

            warn_uncalibrated(
                "LPIPS",
                "the reported 'lpips' column is a random-feature distance, "
                "NOT calibrated LPIPS — pass --lpips-weights PATH.npz "
                "(scripts/export_lpips_weights.py) for real numbers.",
            )
            lpips_params = init_lpips(jax.random.PRNGKey(0))

    render = make_eval_render(model, chunk_size=8192)
    cams = dm.cameras
    h, w = cams.height, cams.width
    aabb = jnp.asarray(dm.outputs.scene_box_aabb)
    rows = []
    for i in range(len(cams)):
        rb = cams.generate_rays(camera_index=i, aabb=aabb)
        out = render(params, rb.reshape((h * w,)), appearance_mode="index")
        pred = out["rgb"].reshape(h, w, 3)
        gt = jnp.asarray(dm.images[i], jnp.float32) / 255.0
        row = {
            "camera": i,
            "psnr": float(psnr(pred, gt)),
            "ssim": float(ssim(pred, gt)),
        }
        if lpips_params is not None:
            from signerf_tpu.ops.lpips import lpips as lpips_fn

            row["lpips"] = float(
                lpips_fn(
                    lpips_params,
                    pred[None] * 2.0 - 1.0,
                    gt[None] * 2.0 - 1.0,
                )[0]
            )
        rows.append(row)
        print(f"camera {i}: psnr={row['psnr']:.2f} ssim={row['ssim']:.4f}")

    summary = {
        "num_images": len(rows),
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "ssim": float(np.mean([r["ssim"] for r in rows])),
        "per_image": rows,
    }
    if lpips_params is not None:
        summary["lpips"] = float(np.mean([r["lpips"] for r in rows]))
    out_path.write_text(json.dumps(summary, indent=2))
    print(f"mean psnr={summary['psnr']:.2f} ssim={summary['ssim']:.4f} -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
