"""North-star scale demo: reference-scale SIGNeRF edit pass on ONE chip.

Reference scale (/root/reference/README.md:283): ~100 dataset views,
3x3 reference sheet, 20k refinement iterations (signerf method) — ~20 min
generation + ~40 min fine-tune on a 2080 Ti + 3090/4090 pair.

This script runs the same shape of work end to end on one TPU v5e chip
with the full-architecture SDXL (random weights — identical FLOPs/shapes
to real weights) and reports per-phase wall-clock + eval PSNR on the
edited dataset, plus the v5e-8 projection (generation is
embarrassingly data-parallel over views; training is DP over rays).

Usage: python examples/north_star_pass.py [n_views] [refine_steps]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax

from signerf_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.cameras.poses import circle_poses
from signerf_tpu.utils.images import save_array_png

N_VIEWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
REFINE_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
# The reference edits a FULLY-trained nerfacto (30k steps). 2k steps leaves
# geometry diffuse (accumulation < 0.5 at novel reference views), which
# breaks the aabb mask: median depth falls back past the selection box and
# the mask comes out empty (measured: step-2000 ckpt acc max 0.34 -> mask
# 0.0; step-20000 ckpt acc max 1.0 -> mask 0.11). 8k steps is where the
# refine log's PSNR plateaued (~38 dB) on this scene. Untimed phase.
PRETRAIN_STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8000
# Optional 4th arg: a checkpoint dir holding a pre-trained nerfacto on this
# scene. This is the reference's actual contract — `ns-train signerf
# --load_dir {checkpoint}` edits an EXISTING nerfacto
# (/root/reference/README.md:150-156) — so with a load dir the pretrain
# stand-in is skipped entirely.
LOAD_DIR = Path(sys.argv[4]) if len(sys.argv) > 4 else None
H = W = 1024

# Reduced-scale runs (warm re-measures, CI-ish smoke) get their own tree so
# they never clobber the headline 100-view artifacts.
ROOT = Path(
    "outputs/north_star" if N_VIEWS == 100 else f"outputs/north_star_{N_VIEWS}v"
)
ROOT.mkdir(parents=True, exist_ok=True)
DATA = ROOT / "data"


def analytic_rgb(o, d):
    """Shaded unit sphere + ground-ish gradient background."""
    b = jnp.sum(o * d, -1)
    c = jnp.sum(o * o, -1) - 1.0
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    p = o + d * t[..., None]
    bg = 0.55 + 0.3 * d  # direction-dependent backdrop
    return jnp.where(hit[..., None], jnp.abs(p), jnp.clip(bg, 0, 1))


def build_dataset():
    (DATA / "images").mkdir(parents=True, exist_ok=True)
    poses = np.asarray(
        circle_poses(
            N_VIEWS, radius=3.0, theta=60.0, phi=(0.0, 360.0 * (N_VIEWS - 1) / N_VIEWS)
        )
    )
    frames = []
    for i in range(N_VIEWS):
        cams = Cameras(
            camera_to_worlds=jnp.asarray(poses[i : i + 1, :3]),
            fx=jnp.array([1200.0]),
            fy=jnp.array([1200.0]),
            cx=jnp.array([W / 2]),
            cy=jnp.array([H / 2]),
            width=W,
            height=H,
        )
        rb = cams.generate_rays(0)
        img = analytic_rgb(rb.origins, rb.directions)
        save_array_png(np.asarray(img), DATA / "images" / f"frame_{i:05d}.png")
        frames.append(
            {
                "file_path": f"images/frame_{i:05d}.png",
                "transform_matrix": poses[i].tolist(),
            }
        )
        if i % 20 == 0:
            print(f"  dataset image {i}/{N_VIEWS}", flush=True)
    (DATA / "transforms.json").write_text(
        json.dumps(
            {
                "camera_model": "OPENCV",
                "fl_x": 1200.0,
                "fl_y": 1200.0,
                "cx": W / 2,
                "cy": H / 2,
                "w": W,
                "h": H,
                "frames": frames,
            }
        )
    )
    print("dataset written", flush=True)


if not (DATA / "transforms.json").exists():
    build_dataset()

from signerf_tpu.diffusion.diffuser import Diffuser  # noqa: E402
from signerf_tpu.engine.trainer import SIGNeRFTrainer  # noqa: E402
from signerf_tpu.method_configs import signerf_method  # noqa: E402

cfg = signerf_method()
cfg.output_dir = ROOT / "out"
cfg.pipeline.datamanager.dataparser.data = DATA
cfg.pipeline.datamanager.dataparser.downscale_factor = 1  # keep 1024px
cfg.pipeline.model.far_plane = 8.0
cfg.max_num_iterations = PRETRAIN_STEPS
cfg.steps_per_call = 100
cfg.steps_per_save = 10000
gen = cfg.pipeline.dataset_generator
gen.path = ROOT / "generations"
gen.dataset_name = "edit0"
gen.rows, gen.cols = 3, 3  # 3x3 sheet (paper scale), 8 reference views
gen.downscale_factor = 2  # 512px cells -> 1536px padded sheet
gen.masking_mode = "aabb"
# The aabb must contain VISIBLE scene surface: the mask is
# `near < rendered_depth < far` along each ray (reference semantics,
# editing/conditions.py:119-123), so a box buried inside the opaque unit
# sphere produces an empty mask. WORLD box below clips the sphere's top
# cap (z >= 0.6); it is converted to the dataparser's auto-oriented/scaled
# SCENE space after trainer.setup() (the generator, like the reference's
# viewer-driven selection, works in scene coordinates).
AABB_WORLD_MIN = np.array([-0.65, -0.65, 0.6], np.float32)
AABB_WORLD_MAX = np.array([0.65, 0.65, 1.05], np.float32)
gen.aabb_min = tuple(AABB_WORLD_MIN)  # placeholder; rewritten post-setup
gen.aabb_max = tuple(AABB_WORLD_MAX)
# Serial per-view generation: K=1 einsum-attention programs beat one K>1
# flash batch at sheet scale (sdxl_pipeline serial-views gate), and the
# device-resident diffuse path pipelines render(i+1) under diffusion(i).
gen.generation_batch_size = 1
gen.diffuser.mode = "jax_sdxl"
gen.diffuser.num_inference_steps = 20
gen.diffuser.prompt = "a stone sphere"

phases = {}

if LOAD_DIR is not None:
    cfg.load_dir = LOAD_DIR

t0 = time.time()
trainer = SIGNeRFTrainer(cfg)
trainer.setup()
phases["setup"] = time.time() - t0
print(f"setup: {phases['setup']:.0f}s", flush=True)

# --- pretrain (stands in for the pre-existing nerfacto checkpoint; NOT part
# of the reference's timed edit pass). Skipped when a trained checkpoint was
# loaded via LOAD_DIR (reference contract: edit an existing nerfacto). ---
t0 = time.time()
if LOAD_DIR is None:
    trainer.train()
    phases["pretrain"] = time.time() - t0
    print(f"pretrain {PRETRAIN_STEPS} steps: {phases['pretrain']:.0f}s", flush=True)
else:
    phases["pretrain"] = 0.0
    print(f"pretrain skipped (loaded checkpoint from {LOAD_DIR})", flush=True)

# --- world -> scene mapping (the dataparser auto-orients/centers/scales
# poses, nerfstudio semantics; the generator's AABB and reference poses are
# scene-space quantities, like the reference's viewer-set selection) ---
dpo = trainer.pipeline.datamanager.outputs
T_ds = np.asarray(dpo.dataparser_transform, np.float32)  # [3, 4]
s_ds = float(dpo.dataparser_scale)

corners = np.array(
    [
        [
            [AABB_WORLD_MIN, AABB_WORLD_MAX][i][0],
            [AABB_WORLD_MIN, AABB_WORLD_MAX][j][1],
            [AABB_WORLD_MIN, AABB_WORLD_MAX][k][2],
        ]
        for i in range(2)
        for j in range(2)
        for k in range(2)
    ],
    np.float32,
)
corners_scene = s_ds * (corners @ T_ds[:, :3].T + T_ds[:, 3])
gen.aabb_min = tuple(float(v) for v in corners_scene.min(axis=0))
gen.aabb_max = tuple(float(v) for v in corners_scene.max(axis=0))
print(f"scene-space edit AABB: {gen.aabb_min} .. {gen.aabb_max}", flush=True)


def world_to_scene_poses(c2w: np.ndarray) -> np.ndarray:
    rot = np.einsum("ij,njk->nik", T_ds[:, :3], c2w[:, :3, :3])
    t = s_ds * (c2w[:, :3, 3] @ T_ds[:, :3].T + T_ds[:, 3])
    return np.concatenate([rot, t[..., None]], axis=-1)


# --- timed edit pass: generation ---
trainer.step = 0
ref = world_to_scene_poses(
    np.asarray(circle_poses(8, radius=3.0, theta=55.0, phi=(0.0, 315.0)))[:, :3]
)
t0 = time.time()
generated = trainer.generate_dataset(reference_camera_to_worlds=ref)
phases["generation"] = time.time() - t0
timings = trainer.pipeline.dataset_generator.last_timings
view_s = timings.get("view_s", [])
warm_marginal = float(np.median(view_s[2:])) if len(view_s) > 4 else None
print(
    f"dataset generation ({N_VIEWS} views + 8 refs, 3x3 sheet 1536px, "
    f"full SDXL 20 steps, batch {gen.generation_batch_size}): "
    f"{phases['generation']:.0f}s  (sheet {timings.get('sheet_s', 0):.0f}s, "
    f"warm per-view marginal "
    f"{warm_marginal if warm_marginal is not None else float('nan'):.1f}s)",
    flush=True,
)

# --- warm sheet re-measure: the first sheet pays one-time compiles for the
# 1536px inpaint program (~36 min cold over the dev tunnel, persisted to the
# XLA compile cache); a second in-process call times the steady-state
# device compute, which is what a warm deployment (and the v5e-8
# projection) actually pays. ---
gen_obj = trainer.pipeline.dataset_generator
t0 = time.time()
*_, warm_refs = gen_obj.generate_reference_sheet(
    gen_obj._cameras_from_poses(ref)
)
# Force device completion: over the axon tunnel only a device->host fetch
# waits for execution (block_until_ready returns early — verify skill note).
float(np.asarray(warm_refs[-1]["edited"]).sum())
sheet_warm_s = time.time() - t0
print(f"warm sheet re-measure (steady-state): {sheet_warm_s:.1f}s", flush=True)

# --- timed edit pass: exchange + refinement ---
t0 = time.time()
trainer.exchange_training_dataset(generated)
phases["exchange"] = time.time() - t0
print(f"exchange: {phases['exchange']:.0f}s", flush=True)


def render_view(i):
    dm = trainer.pipeline.datamanager
    rb = dm.cameras.generate_rays(camera_index=i)
    hh, ww = dm.cameras.height, dm.cameras.width
    out = trainer.pipeline._render(
        trainer.state.params, rb.reshape((hh * ww,)), appearance_mode="index"
    )
    return np.asarray(out["rgb"]).reshape(hh, ww, 3)


# Pre-refinement render of view 0, untimed (the "did the edit land" check;
# VERDICT r2 weak #6 at scale: masked-region delta pre vs post refinement).
pre_render0 = render_view(0)

cfg.max_num_iterations = REFINE_STEPS
t0 = time.time()
trainer.train()
phases["refine"] = time.time() - t0
print(f"refine {REFINE_STEPS} steps: {phases['refine']:.0f}s", flush=True)

# --- eval PSNR on the edited dataset + masked-region edit delta ---
t0 = time.time()
dm = trainer.pipeline.datamanager
cams = dm.cameras
n_eval = min(4, len(cams))
psnrs = []
post_render0 = None
for i in range(n_eval):
    pred = render_view(i)
    target = np.asarray(dm.images[i], np.float32) / 255.0
    mse = float(np.mean((pred - target) ** 2))
    psnrs.append(-10 * np.log10(max(mse, 1e-12)))
    if i == 0:
        post_render0 = pred
        save_array_png(pred, ROOT / "refined_render_0.png")

# Did the edit land in the NeRF?  Mean |delta| of view 0's render across
# refinement must be concentrated inside the edit mask (the reference's
# product definition: the refined scene shows the edit,
# /root/reference/README.md:22-26).
from PIL import Image  # noqa: E402

mask_path = sorted((generated / "masks").glob("mask_*.png"))[0]
mask0 = np.asarray(Image.open(mask_path).convert("L"), np.float32)[..., None] / 255.0
if mask0.shape[:2] != pre_render0.shape[:2]:
    mask0 = np.asarray(
        Image.open(mask_path)
        .convert("L")
        .resize((pre_render0.shape[1], pre_render0.shape[0])),
        np.float32,
    )[..., None] / 255.0
delta = np.abs(post_render0 - pre_render0)
masked_delta = float((delta * mask0).sum() / np.maximum(mask0.sum() * 3, 1))
unmasked_delta = float(
    (delta * (1 - mask0)).sum() / np.maximum((1 - mask0).sum() * 3, 1)
)
print(
    f"edit-landing check (view 0): masked-region mean |delta| "
    f"{masked_delta:.4f} vs unmasked {unmasked_delta:.4f} "
    f"(ratio {masked_delta / max(unmasked_delta, 1e-9):.1f}x)",
    flush=True,
)
phases["eval"] = time.time() - t0
print(f"eval PSNR on edited dataset ({n_eval} views): "
      f"{np.mean(psnrs):.2f} dB (per-view {['%.1f' % p for p in psnrs]})",
      flush=True)

edit_pass = phases["generation"] + phases["exchange"] + phases["refine"]
print("\n==== NORTH STAR SUMMARY (1x v5e chip) ====", flush=True)
for k, v in phases.items():
    print(f"  {k:14s} {v:7.0f}s", flush=True)
print(f"  EDIT PASS      {edit_pass:7.0f}s  ({edit_pass/60:.1f} min)", flush=True)
print(
    "  v5e-8 projection: generation is DP over views (/8 => "
    f"{phases['generation']/8:.0f}s), refinement DP over rays at fixed "
    f"global batch (/~6 conservatively => {phases['refine']/6:.0f}s) => "
    f"~{(phases['generation']/8 + phases['exchange'] + phases['refine']/6)/60:.1f} min total",
    flush=True,
)
# v5e-8 projection built from MEASURED terms: the sheet is one inpaint
# (not parallelizable over views), per-view work is DP over views at the
# measured warm marginal, refinement is DP over rays (conservative /6).
proj_gen_s = (
    sheet_warm_s + (warm_marginal or 0.0) * int(np.ceil(N_VIEWS / 8))
    if warm_marginal is not None
    else phases["generation"] / 8
)
REFINE_DP_DIVISOR = 6.0
proj_total_s = proj_gen_s + phases["exchange"] + phases["refine"] / REFINE_DP_DIVISOR
try:
    import subprocess

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
except Exception:
    commit = "unknown"
result = {
    "script": f"examples/north_star_pass.py {' '.join(sys.argv[1:])}",
    "commit": commit,
    "date": time.strftime("%Y-%m-%d"),
    "hardware": "1x TPU v5e chip (axon dev tunnel)",
    "n_views": N_VIEWS,
    "refine_steps": REFINE_STEPS,
    "pretrain_steps": 0 if LOAD_DIR is not None else PRETRAIN_STEPS,
    "loaded_checkpoint": str(LOAD_DIR) if LOAD_DIR is not None else None,
    "phases_s": {k: round(v, 1) for k, v in phases.items()},
    "edit_pass_s": round(edit_pass, 1),
    "edit_pass_min": round(edit_pass / 60, 1),
    "sheet_s": round(timings.get("sheet_s", 0.0), 1),
    "sheet_warm_s": round(sheet_warm_s, 1),
    "refine_rays_per_s": int(
        REFINE_STEPS
        * cfg.pipeline.datamanager.train_num_rays_per_batch
        / max(phases["refine"], 1e-9)
    )
    if hasattr(cfg.pipeline.datamanager, "train_num_rays_per_batch")
    else None,
    "warm_per_view_marginal_s": (
        None if warm_marginal is None else round(warm_marginal, 2)
    ),
    "view_s_first": round(view_s[0], 1) if view_s else None,
    "eval_psnr_db": round(float(np.mean(psnrs)), 2),
    "edit_mask_coverage": round(float(mask0.mean()), 4),
    "edit_landing_masked_delta": round(masked_delta, 4),
    "edit_landing_unmasked_delta": round(unmasked_delta, 4),
    "edit_landing_ratio": round(masked_delta / max(unmasked_delta, 1e-9), 2),
    "v5e8_projection_min": round(proj_total_s / 60, 1),
    "v5e8_projection_generation_s": round(proj_gen_s, 1),
    # The projection is a MODEL over measured single-chip terms, not an
    # 8-chip measurement (one chip available in this env). Assumptions:
    # per-view work scales linearly DP over views (never measured at K=8 —
    # an UPPER BOUND on multi-chip throughput; K>1 batching measured slower
    # per view on ONE chip, but 8-way DP puts one view per chip, which is
    # exactly the measured K=1 program), and refinement DP over rays gets a
    # conservative /6 (not /8) speedup at fixed global batch.
    "v5e8_projection_inputs": {
        "sheet_warm_s": round(sheet_warm_s, 1),
        "warm_per_view_marginal_s": (
            None if warm_marginal is None else round(warm_marginal, 2)
        ),
        "n_view_chunks": int(np.ceil(N_VIEWS / 8)),
        "exchange_s": round(phases["exchange"], 1),
        "refine_s": round(phases["refine"], 1),
        "refine_dp_divisor": REFINE_DP_DIVISOR,
        "formula": "sheet_warm + marginal*ceil(N/8) + exchange + refine/divisor",
        "status": "unmeasured upper bound (single-chip terms, linear-DP model)",
    },
}
print(json.dumps(result), flush=True)
(ROOT / "north_star_result.json").write_text(json.dumps(result, indent=2))
