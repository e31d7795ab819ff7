"""Benchmark: nerfacto render throughput (rays/sec/chip) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference renders eval images through nerfstudio's
chunked `get_outputs_for_camera_ray_bundle` (32768-ray chunks) on a 2080 Ti;
from the reference's documented wall-clocks (~20 min generation for ~100
views at ~1600x1000 with one NeRF render + one SDXL call per view, and
30k-iteration training at 4096 rays/batch in ~20 min => ~1.0e5 rays/s train),
we take 3.0e5 rays/s as the 2080 Ti full-pipeline render-throughput baseline.

Design: renders are dispatched as a scan over chunks inside ONE jit call so
host->device latency is amortized (the TPU link here is a tunnel); timing is
steady-state (post-compile), averaged over repeats.
"""

from __future__ import annotations

import json
import os
import subprocess
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_RAYS_PER_SEC = 3.0e5  # 2080 Ti nerfacto eval render (see docstring)
V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e peak bf16 matmul throughput / chip


def main():
    from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig

    # Full-size nerfacto (reference signerf_config dims): 16 levels, 2^19
    # table, 2048 max res, 48+:(256,96) samples.
    cfg = NerfactoModelConfig()
    model = NerfactoModel(cfg, num_train_images=8)
    params = model.init(jax.random.PRNGKey(0))

    chunk = 8192  # render chunk; XLA peak-memory-safe on 16GB v5e (the
    # reference uses 32768 on CUDA w/ tcnn streaming, signerf_config.py:32)
    # 192 chunks per dispatch: the axon tunnel's per-dispatch RTT (~100-200
    # ms) is a fixed cost amortized over the whole lax.map — at 48 chunks it
    # added ~2-4 ms/chunk to the measured time (48: 958k, 96: 1.036M,
    # 192: 1.070M rays/s; single-chunk scan differencing reads 6.5-6.8
    # ms/chunk = the 1.2M asymptote in RENDER_BREAKDOWN.json).
    num_chunks = 192
    total_rays = chunk * num_chunks

    key = jax.random.PRNGKey(1)
    dirs = jax.random.normal(key, (total_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    from signerf_tpu.cameras.cameras import RayBundle

    bundle = RayBundle(
        origins=jnp.zeros((total_rays, 3)),
        directions=dirs,
        pixel_area=jnp.full((total_rays, 1), 1e-6),
        camera_indices=jnp.zeros((total_rays, 1), jnp.int32),
        nears=jnp.full((total_rays, 1), 0.05),
        fars=jnp.full((total_rays, 1), 1000.0),
    )
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape(num_chunks, chunk, *x.shape[1:]), bundle
    )

    @jax.jit
    def render_all(params, chunked, salt):
        # `salt` perturbs ray origins so repeated reps can never be cached
        # or constant-folded anywhere in the dispatch path.
        chunked = chunked.replace(origins=chunked.origins + salt)

        def one(c):
            out = model.apply(params, c, train=False)
            return out["rgb"], out["depth"]

        rgb, depth = jax.lax.map(one, chunked)
        # Reduce to scalars on device; fetching them forces execution.
        return jnp.sum(rgb), jnp.sum(depth)

    # Warmup/compile.
    import numpy as np

    np.asarray(render_all(params, chunked, 0.0))

    reps = 3
    times = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        np.asarray(render_all(params, chunked, 1e-6 * r))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    rays_per_sec = total_rays / dt
    n_chips = len(jax.devices())
    per_chip = rays_per_sec / n_chips

    # Analytic executed-GEMM FLOPs (XLA cost_analysis can't see into the
    # Pallas encode kernels — it reports ~56 kFLOP/ray vs ~50 MFLOP actually
    # executed; see ops/flops.py).
    from signerf_tpu.ops.flops import mxu_util, nerfacto_flops

    fl = nerfacto_flops(cfg)
    render_mxu = round(
        mxu_util(fl.render_per_ray, per_chip, V5E_PEAK_BF16_FLOPS), 2
    )

    # --- train-step throughput + MFU (signerf_nerfacto regime: 4096 rays,
    # full-size model, scan-batched dispatch) ---
    from signerf_tpu.cameras.cameras import Cameras
    from signerf_tpu.engine.optimizers import OptimizersConfig, make_optimizer
    from signerf_tpu.engine.train_step import (
        SamplerSettings,
        TrainState,
        make_train_step,
    )

    H = W = 128
    cams = Cameras(
        camera_to_worlds=jnp.tile(jnp.eye(4)[None, :3, :], (8, 1, 1))
        .at[:, 2, 3]
        .set(3.0),
        fx=jnp.full((8,), 160.0),
        fy=jnp.full((8,), 160.0),
        cx=jnp.full((8,), W / 2),
        cy=jnp.full((8,), H / 2),
        width=W,
        height=H,
    )
    images = jnp.zeros((8, H, W, 3), jnp.uint8)
    steps_per_call = 20
    num_rays = 4096
    opt = make_optimizer(OptimizersConfig(), params)
    step_fn = make_train_step(
        model,
        opt,
        cams,
        SamplerSettings(num_rays=num_rays),
        steps_per_call=steps_per_call,
        donate=False,
    )
    state = TrainState.create(params, opt)
    key = jax.random.PRNGKey(2)
    state, m = step_fn(state, images, None, key)  # compile
    np.asarray(m["total_loss"])
    t0 = time.perf_counter()
    reps_t = 3
    for r in range(reps_t):
        state, m = step_fn(state, images, None, jax.random.fold_in(key, r))
    np.asarray(m["total_loss"])
    dt_t = (time.perf_counter() - t0) / reps_t
    train_rays = steps_per_call * num_rays / dt_t / n_chips
    train_mxu = round(
        mxu_util(fl.train_per_ray, train_rays, V5E_PEAK_BF16_FLOPS), 2
    )

    extras = {
        "render_mxu_util_pct": render_mxu,
        "render_mflop_per_ray": round(fl.render_per_ray / 1e6, 2),
        "train_rays_per_sec_per_chip": round(train_rays, 1),
        "train_mxu_util_pct": train_mxu,
        "train_mflop_per_ray": round(fl.train_per_ray / 1e6, 2),
        "sdxl_denoise_step_mxu_pct": 54.0,  # measured r1, README
    }
    # Per-stage attribution, measured on the real chip by
    # `scripts/profile_render.py --json RENDER_BREAKDOWN.json` and
    # `scripts/profile_train.py --json TRAIN_BREAKDOWN.json` (committed
    # artifacts; re-run the profilers after kernel changes to refresh them).
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=10,
        ).stdout.strip()
    except Exception:
        head = ""
    # code_paths include each breakdown's own profiler script (and the shared
    # microbench timer) so a methodology change also marks the artifact stale.
    for fname, extras_key, refresh_cmd, code_paths in [
        ("RENDER_BREAKDOWN.json", "render_stage_breakdown",
         "scripts/profile_render.py --json RENDER_BREAKDOWN.json",
         ["signerf_tpu/models", "signerf_tpu/ops", "signerf_tpu/cameras",
          "signerf_tpu/utils", "native", "scripts/profile_render.py"]),
        ("TRAIN_BREAKDOWN.json", "train_stage_breakdown",
         "scripts/profile_train.py --json TRAIN_BREAKDOWN.json",
         ["signerf_tpu/models", "signerf_tpu/ops", "signerf_tpu/engine",
          "signerf_tpu/cameras", "signerf_tpu/utils", "native",
          "scripts/profile_train.py"]),
        ("DIFFUSION_BREAKDOWN.json", "diffusion_stage_breakdown",
         "scripts/profile_diffusion.py --json DIFFUSION_BREAKDOWN.json",
         ["signerf_tpu/diffusion", "signerf_tpu/parallel",
          "signerf_tpu/utils", "native", "scripts/profile_diffusion.py"]),
    ]:
        bd_path = os.path.join(os.path.dirname(__file__), fname)
        if not os.path.exists(bd_path):
            continue
        with open(bd_path) as f:
            breakdown = json.load(f)
        # A breakdown profiled at an older kernel revision must not be
        # published as if it were current — mark it stale when code the
        # measurement depends on changed between its recorded commit and
        # HEAD (docs/tests/artifact commits don't invalidate a profile).
        bd_commit = str(breakdown.get("commit", "unknown"))
        stale = False
        if head and not (
            bd_commit.startswith(head) or head.startswith(bd_commit)
        ):
            try:
                changed = subprocess.run(
                    ["git", "diff", "--name-only",
                     f"{bd_commit}..HEAD", "--", *code_paths],
                    capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    timeout=10,
                )
                # Unknown commit (rc!=0) is stale; clean diff is fresh.
                stale = changed.returncode != 0 or bool(
                    changed.stdout.strip()
                )
            except Exception:
                stale = True
        if stale:
            # Never republish superseded measurements in a recorded
            # BENCH_r0N: keep only the pointer + stale reason, not the
            # stale numbers themselves.
            extras[extras_key] = {
                "stale": (
                    f"profiled at {bd_commit}, measured code changed by "
                    f"{head} — re-run {refresh_cmd}"
                ),
                "artifact": fname,
                "commit": bd_commit,
            }
        else:
            extras[extras_key] = breakdown

    print(
        json.dumps(
            {
                "metric": "nerfacto_render_rays_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(per_chip / BASELINE_RAYS_PER_SEC, 3),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
