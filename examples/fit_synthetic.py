"""Fit the full-size nerfacto to an analytic scene on real hardware.

The standard verification drive (see .claude/skills/verify/SKILL.md): runs
the public training API end to end, prints train throughput + PSNR
trajectory + an eval render PSNR. Usage:

    python examples/fit_synthetic.py [num_dispatches] [rays_per_batch]
"""

from __future__ import annotations

import sys
import time

import jax

from signerf_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.cameras.poses import circle_poses
from signerf_tpu.engine.optimizers import OptimizersConfig, make_optimizer
from signerf_tpu.engine.train_step import (
    SamplerSettings,
    TrainState,
    make_eval_render,
    make_train_step,
)
from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig


def analytic_rgb(o, d):
    """Unit sphere at origin shaded by |hit point|, white background."""
    b = jnp.sum(o * d, -1)
    c = jnp.sum(o * o, -1) - 1.0
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    p = o + d * t[..., None]
    return jnp.where(hit[..., None], jnp.abs(p), jnp.ones_like(p))


def main(calls: int = 20, num_rays: int = 4096) -> None:
    cfg = NerfactoModelConfig(far_plane=6.0, use_appearance_embedding=False)
    model = NerfactoModel(cfg, num_train_images=16)
    params = model.init(jax.random.PRNGKey(0))
    print(
        "params:",
        f"{sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.2f}M",
    )

    H = W = 128
    poses = circle_poses(16, radius=3.0, theta=60.0, phi=(0.0, 337.5))[:, :3, :]
    cams = Cameras(
        camera_to_worlds=jnp.asarray(poses),
        fx=jnp.full((16,), 160.0),
        fy=jnp.full((16,), 160.0),
        cx=jnp.full((16,), W / 2),
        cy=jnp.full((16,), H / 2),
        width=W,
        height=H,
    )
    images = jnp.stack(
        [
            (
                analytic_rgb(
                    cams.generate_rays(camera_index=i).origins,
                    cams.generate_rays(camera_index=i).directions,
                )
                * 255
            ).astype(jnp.uint8)
            for i in range(16)
        ]
    )

    opt = make_optimizer(OptimizersConfig(), params)
    step_fn = make_train_step(
        model, opt, cams, SamplerSettings(num_rays=num_rays), steps_per_call=50
    )
    state = TrainState.create(params, opt)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = step_fn(state, images, None, key)
    print(f"first dispatch (compile): {time.time()-t0:.0f}s")
    t1 = time.time()
    for i in range(calls):
        state, m = step_fn(state, images, None, jax.random.fold_in(key, i))
        if i % 5 == 4:
            print(
                f"  step {int(state.step)}: loss={float(m['total_loss']):.4f}"
                f" psnr={float(m['psnr']):.2f}"
            )
    dt = time.time() - t1
    print(f"train: {calls*50*num_rays/dt/1e3:.0f}k rays/s")

    render = make_eval_render(model, chunk_size=8192)
    rb = cams.generate_rays(camera_index=0)
    out = render(state.params, rb.reshape((H * W,)))
    target = analytic_rgb(rb.origins, rb.directions)
    mse = float(jnp.mean((out["rgb"].reshape(H, W, 3) - target) ** 2))
    print(f"eval PSNR: {-10*np.log10(mse):.2f} dB")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 20,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4096,
    )
