"""Export CLI: `python -m signerf_tpu.export pointcloud --data ... [...]`.

Capability parity: the `ns-export pointcloud` flow behind the stock
viewer's Export tab the reference inherits
(/root/reference/signerf/interface/viewer.py:192-211 "export tab") —
back-projects rendered depth into a colored point cloud and writes a
binary PLY any DCC tool can open. TPU-native: the renders come from the
chunked `make_eval_render` path (one jitted program, rays padded to chunk
multiples), so the export reuses the exact renderer the viewer and eval
use.

Subcommands:
  pointcloud           back-projected colored point cloud -> .ply
  mesh                 density iso-surface via marching tetrahedra -> .obj
                       (watertight; reusable as a shape-mode proxy via
                       `renderer.object_path`)

Flags:
  --data PATH          dataset (transforms.json)
  --load-dir PATH      checkpoint directory (latest step-*.ckpt)
  --output PATH        output .ply (default point_cloud.ply)
  --num-points N       uniform subsample target (default 1_000_000)
  --downscale K        render at 1/K resolution (default 2)
  --min-accumulation A drop rays with opacity below A (default 0.5)
  --bbox-min/--bbox-max "(x,y,z)" keep points inside this box / sample the
                       mesh grid over it (default: the scene box)
  --resolution N       mesh grid resolution per axis (default 256)
  --iso D              mesh density iso-level (default 15.0); "pNN" uses
                       the NN-th percentile of the sampled densities
  --model.*            model config overrides (must match the checkpoint)
"""

from __future__ import annotations

import struct
import sys
from pathlib import Path

import numpy as np

from signerf_tpu import config as cfglib


def write_ply(path: Path, points: np.ndarray, colors: np.ndarray) -> None:
    """Binary little-endian PLY: float32 xyz + uint8 rgb."""
    n = points.shape[0]
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.empty(
        n,
        dtype=np.dtype(
            [("xyz", "<f4", 3), ("rgb", "u1", 3)], align=False
        ),
    )
    rec["xyz"] = points.astype(np.float32)
    rec["rgb"] = colors.astype(np.uint8)
    with open(path, "wb") as fh:
        fh.write(header.encode("ascii"))
        fh.write(rec.tobytes())


def read_ply_header(path: Path) -> int:
    """Vertex count from a PLY header (for tests/tools)."""
    with open(path, "rb") as fh:
        for raw in fh:
            line = raw.decode("ascii", "ignore").strip()
            if line.startswith("element vertex"):
                return int(line.split()[-1])
            if line == "end_header":
                break
    return 0


def pointcloud_from_renders(
    render_fn,
    cams,
    aabb,
    min_accumulation: float = 0.5,
    num_points: int = 1_000_000,
    log=print,
):
    """Back-project rendered depth into (points [N,3], colors uint8 [N,3]).

    `render_fn(ray_bundle_flat) -> {"rgb", "depth", "accumulation"}` — the
    chunked eval renderer with params bound (CLI and viewer both use this).
    """
    h, w = cams.height, cams.width
    pts_all, rgb_all = [], []
    for i in range(len(cams)):
        rb = cams.generate_rays(camera_index=i, aabb=aabb)
        flat = rb.reshape((h * w,))
        out = render_fn(flat)
        depth = np.asarray(out["depth"]).reshape(-1, 1)
        acc = np.asarray(out["accumulation"]).reshape(-1)
        rgb = np.asarray(out["rgb"]).reshape(-1, 3)
        o = np.asarray(flat.origins).reshape(-1, 3)
        d = np.asarray(flat.directions).reshape(-1, 3)
        pts = o + d * depth  # depth is along-ray (geometry/raster.py note)
        keep = (acc > min_accumulation) & np.isfinite(depth[:, 0])
        pts_all.append(pts[keep])
        rgb_all.append(rgb[keep])
        log(f"camera {i}: kept {int(keep.sum())}/{h * w} rays")
    points = np.concatenate(pts_all, 0)
    colors = np.clip(np.concatenate(rgb_all, 0), 0.0, 1.0) * 255.0
    if points.shape[0] > num_points:
        idx = np.random.RandomState(0).choice(
            points.shape[0], num_points, replace=False
        )
        points, colors = points[idx], colors[idx]
    return points, colors.astype(np.uint8)


def mesh_from_density(
    density_fn,
    lo: np.ndarray,
    hi: np.ndarray,
    resolution: int = 256,
    iso: "float | str" = 15.0,
):
    """Sample `density_fn(positions [M,3]) -> [M]` on a grid over [lo, hi]
    and extract the iso-surface with marching tetrahedra. `iso` may be a
    "pNN" percentile string. Returns (verts, faces)."""
    from signerf_tpu.geometry.marching import marching_tetrahedra

    n = int(resolution)
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    axes = [np.linspace(lo[a], hi[a], n + 1, dtype=np.float32) for a in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    chunk = 1 << 16
    pad = (-grid.shape[0]) % chunk
    gpad = np.pad(grid, ((0, pad), (0, 0)))
    vals = np.concatenate(
        [
            np.asarray(density_fn(gpad[i:i + chunk]))
            for i in range(0, gpad.shape[0], chunk)
        ]
    )[: grid.shape[0]].reshape(n + 1, n + 1, n + 1)
    # "pNN": percentile of the sampled densities — handy when the field's
    # absolute scale is unknown (average_init_density rescaling, random
    # init smoke runs).
    iso_v = (
        float(np.percentile(vals, float(str(iso)[1:])))
        if str(iso).startswith("p")
        else float(iso)
    )
    spacing = (hi - lo) / n
    return marching_tetrahedra(vals, lo, spacing, iso_v)


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

    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    sub = argv.pop(0)
    if sub not in ("pointcloud", "mesh"):
        print(
            f"unknown export subcommand {sub!r} (supported: pointcloud, mesh)"
        )
        return 1
    opts = cfglib.parse_cli_overrides(argv)
    data = Path(opts.pop("data"))
    load_dir = opts.pop("load-dir", opts.pop("load_dir", None))
    default_out = "point_cloud.ply" if sub == "pointcloud" else "mesh.obj"
    out_path = Path(opts.pop("output", default_out))
    num_points = int(opts.pop("num-points", opts.pop("num_points", 1_000_000)))
    downscale = int(opts.pop("downscale", 2))
    min_acc = float(
        opts.pop("min-accumulation", opts.pop("min_accumulation", 0.5))
    )
    resolution = int(opts.pop("resolution", 256))
    iso_opt = str(opts.pop("iso", "15.0"))
    bbox_min = opts.pop("bbox-min", opts.pop("bbox_min", None))
    bbox_max = opts.pop("bbox-max", opts.pop("bbox_max", None))

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

    if sub == "mesh":
        from signerf_tpu.geometry.marching import save_obj

        if bbox_min is not None and bbox_max is not None:
            import ast

            lo = np.asarray(ast.literal_eval(str(bbox_min)), np.float32)
            hi = np.asarray(ast.literal_eval(str(bbox_max)), np.float32)
        else:
            box = np.asarray(dm.outputs.scene_box_aabb, np.float32)
            lo, hi = box[0], box[1]

        density_jit = jax.jit(
            lambda p: model.field.apply(
                {"params": params["field"]}, p, method="density"
            )[0]
        )
        verts, faces = mesh_from_density(
            lambda p: density_jit(jnp.asarray(p)), lo, hi, resolution, iso_opt
        )
        if len(faces) == 0:
            print(f"no surface at iso={iso_opt}")
            return 1
        out_path.parent.mkdir(parents=True, exist_ok=True)
        save_obj(out_path, verts, faces)
        print(
            f"wrote {len(verts)} vertices / {len(faces)} faces -> {out_path}"
        )
        return 0

    render = make_eval_render(model, chunk_size=8192)
    cams = dm.cameras
    if downscale > 1:
        cams = cams.rescaled(1.0 / downscale)
    aabb = jnp.asarray(dm.outputs.scene_box_aabb)
    points, colors = pointcloud_from_renders(
        lambda flat: render(params, flat, appearance_mode="index"),
        cams,
        aabb,
        min_accumulation=min_acc,
        num_points=num_points,
    )
    if bbox_min is not None and bbox_max is not None:
        import ast

        lo = np.asarray(ast.literal_eval(str(bbox_min)), np.float32)
        hi = np.asarray(ast.literal_eval(str(bbox_max)), np.float32)
        inside = ((points >= lo) & (points <= hi)).all(axis=1)
        points, colors = points[inside], colors[inside]
    if points.shape[0] == 0:
        print("no points survived filtering")
        return 1

    out_path.parent.mkdir(parents=True, exist_ok=True)
    write_ply(out_path, points, colors)
    print(f"wrote {points.shape[0]} points -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
