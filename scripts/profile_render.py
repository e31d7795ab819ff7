"""Micro-profile the render hot path on the real chip.

Axon-tunnel caveat (measured): `block_until_ready` returns before device
completion; only a device->host transfer waits. So every timing here (a)
repeats the op K times inside ONE jit via lax.scan with a data dependence
between iterations (so XLA can't CSE them away), and (b) ends with a scalar
fetch. Per-op time = (t_K2 - t_K1) / (K2 - K1), which cancels RTT + transfer.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from signerf_tpu.utils.microbench import scan_time

# Collected (label -> milliseconds) for the optional --json artifact; bench.py
# attaches the artifact to its extras as `render_stage_breakdown` so the
# recorded BENCH_r{N}.json always carries the latest measured attribution.
RESULTS: dict = {"stages_ms": {}}


def record(label: str, ms: float) -> None:
    # Adaptive scan_time returns NaN when an op is too cheap to separate from
    # tunnel jitter; a physically-impossible (<=0) or NaN row must never be
    # published as a measurement — list it under "unresolved" instead.
    if not math.isfinite(ms) or ms <= 0:
        RESULTS.setdefault("unresolved_below_noise_floor", []).append(label)
        return
    RESULTS["stages_ms"][label] = round(ms, 3)


def main():
    print("devices:", jax.devices())
    from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
    from signerf_tpu.cameras.cameras import RayBundle
    from signerf_tpu.ops.factor_grid import FactorGridConfig, FactorGridEncoding
    from signerf_tpu.models.fields import HashMLPDensityField

    cfg = NerfactoModelConfig()
    model = NerfactoModel(cfg, num_train_images=8)
    params = model.init(jax.random.PRNGKey(0))

    chunk = 8192
    dirs = jax.random.normal(jax.random.PRNGKey(1), (chunk, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def render_step(c):
        bundle = RayBundle(
            origins=jnp.zeros((chunk, 3)) + c * 1e-9,
            directions=dirs,
            pixel_area=jnp.full((chunk, 1), 1e-6),
            camera_indices=jnp.zeros((chunk, 1), jnp.int32),
            nears=jnp.full((chunk, 1), 0.05),
            fars=jnp.full((chunk, 1), 1000.0),
        )
        out = model.apply(params, bundle, train=False)
        return jnp.sum(out["rgb"]) * 1e-9

    t = scan_time(render_step)
    print(f"full render chunk ({chunk} rays): {t*1e3:.2f} ms -> {chunk/t:,.0f} rays/s")
    record("full_render_chunk_8192_rays", t * 1e3)
    RESULTS["rays_per_s"] = round(chunk / t, 1)

    # encoding only, final-sampler density count
    n_samples = cfg.num_nerf_samples_per_ray
    N = chunk * n_samples
    pos0 = jax.random.uniform(jax.random.PRNGKey(2), (N, 3))
    enc = FactorGridEncoding(
        FactorGridConfig(num_levels=8, base_res=16, max_res=cfg.max_res, features_per_level=16)
    )
    enc_params = enc.init(jax.random.PRNGKey(3), pos0)

    def enc_step(c):
        x = pos0 + c * 1e-9
        return jnp.sum(enc.apply(enc_params, x)) * 1e-9

    t_enc = scan_time(enc_step)
    record("final_field_encode", t_enc * 1e3)
    print(
        f"factor encode [{N}]: {t_enc*1e3:.2f} ms -> {N/t_enc/1e6:.1f} M samp/s"
        f"  ({t_enc/t*100 if t else 0:.0f}% of chunk)"
    )

    # proposal fields at their sample counts
    for i, (ns, mres) in enumerate(
        zip(cfg.num_proposal_samples_per_ray, (128, 256))
    ):
        Np = chunk * ns
        prop = HashMLPDensityField(max_res=mres, num_levels=5)
        pp = prop.init(jax.random.PRNGKey(5), jnp.zeros((8, 3)))
        posp0 = jax.random.uniform(jax.random.PRNGKey(4), (Np, 3)) * 2 - 1

        def prop_step(c, _prop=prop, _pp=pp, _pos=posp0):
            return jnp.sum(_prop.apply(_pp, _pos + c * 1e-9)) * 1e-9

        t_p = scan_time(prop_step)
        record(f"proposal{i}_field_fused_encode_density", t_p * 1e3)
        print(f"proposal[{i}] field [{Np}] max_res {mres}: {t_p*1e3:.2f} ms")

    # field MLPs at final N (base+head proxy)
    w0 = jax.random.normal(jax.random.PRNGKey(6), (128, 64), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(7), (64, 64), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(8), (N, 128), jnp.bfloat16)

    def mlp_step(c):
        h = jnp.maximum((x0 + c.astype(jnp.bfloat16) * 1e-9) @ w0, 0)
        for _ in range(4):
            h = jnp.maximum(h @ w1, 0)
        return jnp.sum(h.astype(jnp.float32)) * 1e-9

    t_mlp = scan_time(mlp_step)
    record("mlp_5layer_64wide", t_mlp * 1e3)
    print(f"5-layer 64-wide MLP [{N}]: {t_mlp*1e3:.2f} ms")

    # ---- sampling machinery (the non-MXU remainder) -------------------
    from signerf_tpu.models.samplers import (
        bins_to_ray_samples,
        make_spacing,
        proposal_sample,
        render_weights,
        sample_pdf_bins,
        sample_uniform_bins,
    )
    from signerf_tpu.cameras.cameras import RayBundle as RB

    nears = jnp.full((chunk, 1), 0.05)
    fars = jnp.full((chunk, 1), 1000.0)
    bundle0 = RayBundle(
        origins=jnp.zeros((chunk, 3)),
        directions=dirs,
        pixel_area=jnp.full((chunk, 1), 1e-6),
        camera_indices=jnp.zeros((chunk, 1), jnp.int32),
        nears=nears,
        fars=fars,
    )
    key = jax.random.PRNGKey(9)

    def sampling_only_step(c):
        # full proposal_sample with FREE density fns: isolates uniform bins
        # + 2 PDF resamples + 3 bins_to_ray_samples + weights machinery
        fns = [lambda p: jnp.sum(p, -1) * 0 + 0.1 + c * 1e-9] * 2
        s, wl, sl = proposal_sample(
            key, bundle0, fns,
            num_proposal_samples=cfg.num_proposal_samples_per_ray,
            num_nerf_samples=cfg.num_nerf_samples_per_ray,
        )
        return jnp.sum(s.positions) * 1e-12

    t_sampling = scan_time(sampling_only_step)
    record("sampling_machinery_free_densities", t_sampling * 1e3)
    print(
        f"sampling machinery (prop chain, free densities): "
        f"{t_sampling*1e3:.2f} ms ({t_sampling/t*100:.0f}% of chunk)"
    )

    s_to_t, _ = make_spacing(nears, fars)
    for (S_from, Q_to) in [
        (cfg.num_proposal_samples_per_ray[0], cfg.num_proposal_samples_per_ray[1]),
        (cfg.num_proposal_samples_per_ray[1], cfg.num_nerf_samples_per_ray),
    ]:
        bins0 = sample_uniform_bins(key, chunk, S_from)
        w0_ = jax.random.uniform(jax.random.PRNGKey(10), (chunk, S_from))

        def pdf_step(c, _b=bins0, _w=w0_, _q=Q_to):
            nb = sample_pdf_bins(key, _b, _w + c * 1e-9, _q)
            return jnp.sum(nb) * 1e-9

        t_pdf = scan_time(pdf_step)
        record(f"pdf_resample_{S_from}_to_{Q_to}", t_pdf * 1e3)
        print(f"pdf resample [{chunk}x{S_from}->{Q_to}]: {t_pdf*1e3:.2f} ms")

    def b2s_step(c):
        bins0 = sample_uniform_bins(key, chunk, cfg.num_proposal_samples_per_ray[0])
        s = bins_to_ray_samples(bundle0, bins0 + c * 1e-12, s_to_t)
        return jnp.sum(s.positions) * 1e-12

    t_b2s = scan_time(b2s_step)
    record("bins_to_ray_samples_positions", t_b2s * 1e3)
    print(f"bins_to_ray_samples+positions [{chunk}x{cfg.num_proposal_samples_per_ray[0]}]: {t_b2s*1e3:.2f} ms")

    from signerf_tpu.ops.contraction import contract

    pos_c0 = jax.random.normal(jax.random.PRNGKey(11), (chunk * cfg.num_proposal_samples_per_ray[0], 3))

    def contract_step(c):
        return jnp.sum(contract(pos_c0 + c * 1e-9)) * 1e-9

    t_con = scan_time(contract_step)
    record("contraction", t_con * 1e3)
    print(f"contraction [{chunk*cfg.num_proposal_samples_per_ray[0]}]: {t_con*1e3:.2f} ms")


def write_json(path: str) -> None:
    try:
        RESULTS["commit"] = (
            subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        )
    except Exception:
        RESULTS["commit"] = "unknown"
    RESULTS["note"] = (
        "ms per 8192-ray render chunk, measured on the real chip by "
        "scripts/profile_render.py (scan-K differencing; values under ~1 ms "
        "are within tunnel timing noise)"
    )
    with open(path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    # Validate --json BEFORE the (slow, on-chip) profile runs so a missing
    # path fails fast instead of dropping the results at the very end.
    json_path = None
    if "--json" in sys.argv:
        idx = sys.argv.index("--json")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("usage: profile_render.py [--json OUTPUT_PATH]")
        json_path = sys.argv[idx + 1]
    main()
    if json_path is not None:
        write_json(json_path)
