"""North-star drive: full SIGNeRF edit pass on TPU with full-architecture
SDXL (random weights = real FLOPs): train -> sheet -> per-view regen
(batched) -> exchange -> refine. Reports per-phase wall-clock."""
import json, time, sys
import numpy as np
# run from the repo root

import jax, jax.numpy as jnp

from signerf_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
from pathlib import Path
from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.cameras.poses import circle_poses
from signerf_tpu.utils.images import save_array_png

ROOT = Path('outputs/e2e_demo'); ROOT.mkdir(exist_ok=True)
DATA = ROOT / 'data'
H = W = 512
N_VIEWS = 8

def analytic_rgb(o, d):
    b = jnp.sum(o*d, -1); c = jnp.sum(o*o, -1) - 1.0
    disc = b*b - c; hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    p = o + d*t[..., None]
    return jnp.where(hit[..., None], jnp.abs(p), jnp.ones_like(p))

if not (DATA / 'transforms.json').exists():
    (DATA / 'images').mkdir(parents=True, exist_ok=True)
    poses = np.asarray(circle_poses(N_VIEWS, radius=3.0, theta=60.0, phi=(0.0, 315.0)))
    frames = []
    for i in range(N_VIEWS):
        cams = Cameras(camera_to_worlds=jnp.asarray(poses[i:i+1, :3]),
                       fx=jnp.array([600.]), fy=jnp.array([600.]),
                       cx=jnp.array([W/2]), cy=jnp.array([H/2]), width=W, height=H)
        rb = cams.generate_rays(0)
        img = analytic_rgb(rb.origins, rb.directions)
        save_array_png(np.asarray(img), DATA / 'images' / f'frame_{i:05d}.png')
        frames.append({"file_path": f"images/frame_{i:05d}.png",
                       "transform_matrix": poses[i].tolist()})
    (DATA / 'transforms.json').write_text(json.dumps({
        "camera_model": "OPENCV", "fl_x": 600.0, "fl_y": 600.0,
        "cx": W/2, "cy": H/2, "w": W, "h": H, "frames": frames}))
    print("dataset written", flush=True)

from signerf_tpu.method_configs import signerf_nerfacto_method
from signerf_tpu.engine.trainer import SIGNeRFTrainer
from signerf_tpu.diffusion.diffuser import Diffuser

cfg = signerf_nerfacto_method()
cfg.output_dir = ROOT / 'out'
cfg.pipeline.datamanager.dataparser.data = DATA
cfg.pipeline.model.far_plane = 8.0
cfg.max_num_iterations = 500
cfg.steps_per_call = 50
cfg.steps_per_save = 500
gen = cfg.pipeline.dataset_generator
gen.path = ROOT / 'generations'; gen.dataset_name = 'edit0'
gen.rows, gen.cols = 2, 3
gen.downscale_factor = 2
gen.masking_mode = 'aabb'
gen.aabb_min = (-0.5, -0.5, -0.5); gen.aabb_max = (0.5, 0.5, 0.5)
gen.generation_batch_size = 4
gen.diffuser.mode = 'jax_sdxl'
gen.diffuser.num_inference_steps = 20
gen.diffuser.prompt = 'a stone sphere'

t0 = time.time()
trainer = SIGNeRFTrainer(cfg)
trainer.setup()
print(f"setup: {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
trainer.train()
t_train1 = time.time()-t0
print(f"initial train 500 steps: {t_train1:.0f}s", flush=True)

trainer.step = 0  # allow refinement later
ref = np.asarray(circle_poses(5, radius=3.0, theta=55.0, phi=(0.0, 288.0)))[:, :3]
t0 = time.time()
generated = trainer.generate_dataset(reference_camera_to_worlds=ref)
t_gen = time.time()-t0
print(f"dataset generation ({N_VIEWS} views + 5 refs, full SDXL 20 steps): {t_gen:.0f}s", flush=True)

t0 = time.time()
trainer.exchange_training_dataset(generated)
trainer.train()
t_train2 = time.time()-t0
print(f"exchange + refine 500 steps: {t_train2:.0f}s", flush=True)
print(f"TOTAL edit pass: {t_train1+t_gen+t_train2:.0f}s (1 chip, incl. compiles)", flush=True)
