"""Render CLI: `python -m signerf_tpu.render --data ... --load-dir ...`.

Capability parity: the nerfstudio `ns-render` / `ns-viewer` flows the
reference relies on for inspecting results (SURVEY.md §7.2 "the
`ns-viewer`/`ns-render` equivalents"). Renders RGB/depth/accumulation for
either the dataset's cameras or a synthetic camera arc, writing PNGs.

Flags:
  --data PATH          dataset (transforms.json)
  --load-dir PATH      checkpoint directory (latest step-*.ckpt is used)
  --output PATH        output directory (default renders/)
  --arc N              render an N-camera circle arc instead of dataset cams
  --arc-radius R --arc-theta T
  --downscale K        render at 1/K resolution
  --depth true         also write inverted-depth visualizations
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

from signerf_tpu import config as cfglib


def main(argv=None) -> int:
    from signerf_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from signerf_tpu.cameras.cameras import Cameras
    from signerf_tpu.cameras.poses import circle_poses
    from signerf_tpu.data.datamanager import SIGNeRFDataManager, SIGNeRFDataManagerConfig
    from signerf_tpu.data.dataparser import SIGNeRFDataParserConfig
    from signerf_tpu.engine.checkpoints import latest_checkpoint, surgical_restore
    from signerf_tpu.engine.train_step import make_eval_render
    from signerf_tpu.models.signerf import SIGNeRFModel, SIGNeRFModelConfig
    from signerf_tpu.utils.images import save_array_png

    argv = list(sys.argv[1:] if argv is None else argv)
    opts = cfglib.parse_cli_overrides(argv)
    data = Path(opts.pop("data"))
    load_dir = opts.pop("load-dir", opts.pop("load_dir", None))
    out_dir = Path(opts.pop("output", "renders"))
    arc = int(opts.pop("arc", 0))
    arc_radius = float(opts.pop("arc-radius", opts.pop("arc_radius", 1.0)))
    arc_theta = float(opts.pop("arc-theta", opts.pop("arc_theta", 70.0)))
    downscale = int(opts.pop("downscale", 1))
    want_depth = str(opts.pop("depth", "true")).lower() in ("1", "true", "yes")
    from signerf_tpu.parallel import mesh_from_spec

    mesh = mesh_from_spec(opts.pop("mesh", "auto"))
    if mesh is not None:
        print(f"[render] device mesh: {dict(mesh.shape)} (rays DP over all axes)")

    dm = SIGNeRFDataManager(
        SIGNeRFDataManagerConfig(dataparser=SIGNeRFDataParserConfig(data=data))
    )
    model_cfg = SIGNeRFModelConfig(use_lpips=False)
    for key, val in opts.items():
        model_cfg = cfglib.apply_overrides(model_cfg, {key.removeprefix("model."): val}) \
            if key.startswith("model.") else model_cfg
    model = SIGNeRFModel(model_cfg, num_train_images=dm.num_images)
    params = model.init(jax.random.PRNGKey(0))
    if load_dir is not None:
        ckpt = latest_checkpoint(Path(load_dir))
        if ckpt is None:
            print(f"no checkpoint under {load_dir}")
            return 1
        params = surgical_restore(ckpt, params)
        print(f"loaded {ckpt}")

    cams = dm.cameras
    if downscale > 1:
        cams = cams.rescaled(1.0 / downscale)
    if arc > 0:
        poses = circle_poses(arc, radius=arc_radius, theta=arc_theta, phi=(0.0, 360.0 * (arc - 1) / arc))
        cams = Cameras(
            camera_to_worlds=jnp.asarray(np.asarray(poses)[:, :3, :]),
            fx=jnp.full((arc,), float(cams.fx[0])),
            fy=jnp.full((arc,), float(cams.fy[0])),
            cx=jnp.full((arc,), cams.width / 2.0),
            cy=jnp.full((arc,), cams.height / 2.0),
            width=cams.width,
            height=cams.height,
        )

    render = make_eval_render(model, chunk_size=8192, mesh=mesh)
    out_dir.mkdir(parents=True, exist_ok=True)
    h, w = cams.height, cams.width
    aabb = jnp.asarray(dm.outputs.scene_box_aabb)
    for i in range(len(cams)):
        rb = cams.generate_rays(camera_index=i, aabb=aabb)
        out = render(params, rb.reshape((h * w,)))
        rgb = np.asarray(out["rgb"]).reshape(h, w, 3)
        save_array_png(rgb, out_dir / f"rgb_{i:05d}.png")
        if want_depth:
            depth = np.asarray(out["depth"]).reshape(h, w)
            d = depth - depth.min()
            d = 1.0 - d / max(d.max(), 1e-6)
            save_array_png(d[..., None], out_dir / f"depth_{i:05d}.png")
        print(f"rendered {i + 1}/{len(cams)}")
    print(f"wrote {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
