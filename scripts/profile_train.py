"""Micro-profile the TRAIN hot path on the real chip.

Companion to scripts/profile_render.py (which attributes the render chunk):
this attributes one optimizer step of the bench's train regime
(signerf_nerfacto: 4096 rays, full-size model, MSE — the
`train_rays_per_sec_per_chip` number in BENCH_r0N.json) so kernel work
targets the largest measured term instead of ad-hoc prose (VERDICT r3
missing #4 / next #3). Also records a signerf-regime (16384 rays, patch 32,
LPIPS, normals) total for the refine-phase wall-clock model.

Timing methodology: signerf_tpu.utils.microbench.scan_time (scan-K
differencing + scalar fetch; see that module's header for the axon-tunnel
caveat). Values under ~1 ms are within tunnel timing noise.

Usage: python scripts/profile_train.py [--json TRAIN_BREAKDOWN.json]
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
import numpy as np

from signerf_tpu.utils.microbench import scan_time

RESULTS: dict = {"stages_ms": {}}


def record(label: str, ms: float) -> None:
    # NaN (= below the adaptive timer's noise floor) and non-positive rows are
    # never published as measurements; see signerf_tpu/utils/microbench.py.
    if not math.isfinite(ms) or ms <= 0:
        RESULTS.setdefault("unresolved_below_noise_floor", []).append(label)
        print(f"  {label}: unresolved (below noise floor)")
        return
    RESULTS["stages_ms"][label] = round(ms, 3)
    print(f"  {label}: {ms:.3f} ms")


def time_train_step(step_fn_builder, state_builder, images, key, K1=2, K2=10):
    """Per-optimizer-step seconds by differencing steps_per_call=K1 vs K2
    (cancels dispatch RTT + the metrics fetch)."""

    def run(K):
        fn = step_fn_builder(K)
        state = state_builder()
        state, m = fn(state, images, None, key)  # compile
        np.asarray(m["total_loss"])
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            state, m = fn(state, images, None, jax.random.fold_in(key, r))
            np.asarray(m["total_loss"])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tA, tB = run(K1), run(K2)
    return (tB - tA) / (K2 - K1)


def main(signerf_only: bool = False):
    print("devices:", jax.devices())
    from signerf_tpu.cameras.cameras import Cameras, RayBundle
    from signerf_tpu.engine.optimizers import OptimizersConfig, make_optimizer
    from signerf_tpu.engine.train_step import (
        SamplerSettings,
        TrainState,
        make_train_step,
    )
    from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig

    cfg = NerfactoModelConfig()
    model = NerfactoModel(cfg, num_train_images=8)
    params = model.init(jax.random.PRNGKey(0))
    num_rays = 4096

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
    opt = make_optimizer(OptimizersConfig(), params)
    key = jax.random.PRNGKey(2)

    if signerf_only:
        _signerf_sections(model, cfg, params, cams, images, key)
        return

    # ---- 1. whole optimizer step (the bench number's numerator) ----------
    t_step = time_train_step(
        lambda K: make_train_step(
            model, opt, cams, SamplerSettings(num_rays=num_rays),
            steps_per_call=K, donate=False,
        ),
        lambda: TrainState.create(params, opt),
        images, key,
    )
    record("train_step_total", t_step * 1e3)
    RESULTS["train_rays_per_s"] = round(num_rays / t_step, 1)
    print(f"  -> {num_rays / t_step:,.0f} rays/s")

    # ---- 2. forward/backward split at the same shapes ---------------------
    # Fixed ray batch (sampling machinery is probed separately below).
    dirs = jax.random.normal(jax.random.PRNGKey(1), (num_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    bundle = RayBundle(
        origins=jnp.zeros((num_rays, 3)),
        directions=dirs,
        pixel_area=jnp.full((num_rays, 1), 1e-6),
        camera_indices=jnp.zeros((num_rays, 1), jnp.int32),
        nears=jnp.full((num_rays, 1), 0.05),
        fars=jnp.full((num_rays, 1), 1000.0),
    )
    target = jax.random.uniform(jax.random.PRNGKey(3), (num_rays, 3))
    mkey = jax.random.PRNGKey(4)

    def loss_of(p, c):
        b = bundle.replace(origins=bundle.origins + c * 1e-9)
        out = model.apply(p, b, rng=mkey, train=True, anneal=1.0)
        ld = model.loss_dict(out, {"image": target})
        return sum(jax.tree_util.tree_leaves(ld))

    t_fwd = scan_time(lambda c: loss_of(params, c) * 1e-9)
    record("model_fwd_plus_losses", t_fwd * 1e3)

    def fwdbwd(c):
        val, grads = jax.value_and_grad(loss_of)(params, c)
        # fold grad leaves into the carry so the grad compute chains
        # Sum EVERY grad leaf: consuming only a subset lets XLA dead-code
        # -eliminate the rest of the backward, understating it (the r4
        # first-pass artifact recorded model_fwd_bwd 6.6 ms this way while
        # the step total implied more).
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(grads))
        return (val + gsum) * 1e-9

    t_fb = scan_time(fwdbwd)
    record("model_fwd_bwd", t_fb * 1e3)
    record("model_bwd_implied", (t_fb - t_fwd) * 1e3)

    # ---- 3. optimizer update alone ----------------------------------------
    _, grads0 = jax.value_and_grad(loss_of)(params, jnp.float32(0.0))
    opt_state0 = opt.init(params)

    def opt_step(c):
        import optax

        g = jax.tree_util.tree_map(lambda x: x * (1.0 + c * 1e-9), grads0)
        updates, _ = opt.update(g, opt_state0, params)
        p2 = optax.apply_updates(params, updates)
        return jnp.sum(jax.tree_util.tree_leaves(p2)[0]) * 1e-9

    t_opt = scan_time(opt_step)
    record("optimizer_update", t_opt * 1e3)

    # ---- 4. per-field fwd / fwd+bwd at train sample counts -----------------
    from signerf_tpu.models.fields import HashMLPDensityField

    N_final = num_rays * cfg.num_nerf_samples_per_ray
    pos_f = jax.random.uniform(jax.random.PRNGKey(5), (N_final, 3)) * 2 - 1

    def field_density_fwd(c):
        d, geo = model.field.apply(
            {"params": params["field"]},
            pos_f + c * 1e-9,
            method="density",
        )
        return (jnp.sum(d) + jnp.sum(geo)) * 1e-9

    t_ff = scan_time(field_density_fwd)
    record(f"final_field_density_fwd_N{N_final}", t_ff * 1e3)

    def field_density_fwdbwd(c):
        def f(fp):
            d, geo = model.field.apply(
                {"params": fp}, pos_f + c * 1e-9, method="density"
            )
            return jnp.sum(d) + jnp.sum(geo) * 1e-3

        val, g = jax.value_and_grad(f)(params["field"])
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return (val + gsum) * 1e-9

    t_ffb = scan_time(field_density_fwdbwd)
    record(f"final_field_density_fwd_bwd_N{N_final}", t_ffb * 1e3)

    for i, ns in enumerate(cfg.num_proposal_samples_per_ray):
        Np = num_rays * ns
        args = cfg.proposal_net_args_list[min(i, len(cfg.proposal_net_args_list) - 1)]
        prop = HashMLPDensityField(
            num_levels=args.num_levels, max_res=args.max_res,
            hidden_dim=args.hidden_dim,
        )
        pp = params[f"proposal_{i}"]
        posp = jax.random.uniform(jax.random.PRNGKey(6 + i), (Np, 3)) * 2 - 1

        def prop_fwd(c, _prop=prop, _pp=pp, _pos=posp):
            return jnp.sum(_prop.apply({"params": _pp}, _pos + c * 1e-9)) * 1e-9

        t_pf = scan_time(prop_fwd)
        record(f"proposal{i}_fwd_N{Np}", t_pf * 1e3)

        def prop_fwdbwd(c, _prop=prop, _pp=pp, _pos=posp):
            def f(p):
                return jnp.sum(_prop.apply({"params": p}, _pos + c * 1e-9))

            val, g = jax.value_and_grad(f)(_pp)
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return (val + gsum) * 1e-9

        t_pfb = scan_time(prop_fwdbwd)
        record(f"proposal{i}_fwd_bwd_N{Np}", t_pfb * 1e3)

    # ---- 5. encode / MLP kernel split (final-field shapes) -----------------
    from signerf_tpu.ops.factor_grid import (
        _encode_fused,
        mlp2_reference,
        use_fused_kernel,
    )

    if use_fused_kernel():
        from signerf_tpu.ops.factor_grid import FactorGridConfig

        # Final-field encoding shapes (NerfactoField.setup: factor backend).
        enc_cfg = FactorGridConfig(
            num_levels=8, base_res=cfg.base_res, max_res=cfg.max_res,
            features_per_level=16,
        )
        lkey = jax.random.PRNGKey(7)
        lines = tuple(
            tuple(
                jax.random.normal(
                    jax.random.fold_in(lkey, lvl * 3 + ax),
                    (res, enc_cfg.features_per_level),
                )
                * 0.2
                for ax in range(3)
            )
            for lvl, res in enumerate(enc_cfg.resolutions)
        )
        x01 = jax.random.uniform(jax.random.PRNGKey(8), (N_final, 3))

        def enc_fwd(c):
            return jnp.sum(_encode_fused(enc_cfg, lines, x01 + c * 1e-9)) * 1e-9

        t_ef = scan_time(enc_fwd)
        record(f"encode_kernel_fwd_N{N_final}", t_ef * 1e3)

        def enc_fwdbwd(c):
            def f(l):
                return jnp.sum(_encode_fused(enc_cfg, l, x01 + c * 1e-9))

            val, g = jax.value_and_grad(f)(lines)
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return (val + gsum) * 1e-9

        t_eb = scan_time(enc_fwdbwd)
        record(f"encode_kernel_fwd_bwd_N{N_final}", t_eb * 1e3)
        record(f"encode_kernel_bwd_implied_N{N_final}", (t_eb - t_ef) * 1e3)

        feats0 = jax.random.normal(
            jax.random.PRNGKey(9), (N_final, enc_cfg.out_dim)
        )
        k0 = jax.random.normal(
            jax.random.PRNGKey(10), (enc_cfg.out_dim, cfg.hidden_dim)
        ) * 0.1
        b0 = jnp.zeros((cfg.hidden_dim,))
        k1 = jax.random.normal(
            jax.random.PRNGKey(11), (cfg.hidden_dim, 16)
        ) * 0.1
        b1 = jnp.zeros((16,))

        def mlp_fwdbwd(c):
            def f(ws):
                return jnp.sum(mlp2_reference(feats0 + c * 1e-9, ws))

            val, g = jax.value_and_grad(f)(((k0, b0), (k1, b1)))
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return (val + gsum) * 1e-9

        t_mb = scan_time(mlp_fwdbwd)
        record(f"density_mlp_xla_fwd_bwd_N{N_final}", t_mb * 1e3)

    # ---- 6. sampling machinery + losses ------------------------------------
    from signerf_tpu.models import losses as L
    from signerf_tpu.models.samplers import proposal_sample

    skey = jax.random.PRNGKey(12)

    def sampling_fwd(c):
        fns = [lambda p: jnp.sum(p, -1) * 0 + 0.1 + c * 1e-9] * 2
        s, wl, sl = proposal_sample(
            skey, bundle, fns,
            num_proposal_samples=cfg.num_proposal_samples_per_ray,
            num_nerf_samples=cfg.num_nerf_samples_per_ray,
        )
        return jnp.sum(s.positions) * 1e-12

    t_s = scan_time(sampling_fwd)
    record("sampling_machinery_fwd_free_densities", t_s * 1e3)

    def sampling_losses_fwdbwd(c):
        def f(bias):
            fns = [lambda p: jnp.sum(p, -1) * 0 + 0.1 + bias] * 2
            s, wl, sl = proposal_sample(
                skey, bundle, fns,
                num_proposal_samples=cfg.num_proposal_samples_per_ray,
                num_nerf_samples=cfg.num_nerf_samples_per_ray,
            )
            from signerf_tpu.models.samplers import render_weights

            w = render_weights(
                jnp.full(s.positions.shape[:-1], 0.1) + bias, s.deltas
            )
            return (
                L.interlevel_loss(wl, sl, w, s)
                + 0.002 * L.distortion_loss(w, s)
            )

        val, g = jax.value_and_grad(f)(c * 1e-9)
        return (val + g) * 1e-9

    t_sl = scan_time(sampling_losses_fwdbwd)
    record("sampling_plus_interlevel_distortion_fwd_bwd", t_sl * 1e3)

    # ---- 7. pixel sampling + raygen + gather --------------------------------
    from signerf_tpu.data.pixel_samplers import gather_pixels, sample_pixels

    def data_step(c):
        k = jax.random.fold_in(jax.random.PRNGKey(13), jnp.int32(c * 1e9))
        idx = sample_pixels(k, num_rays, 8, H, W)
        rb = cams.generate_rays_at(idx)
        tgt = gather_pixels(images, idx).astype(jnp.float32) / 255.0
        return (jnp.sum(rb.origins) + jnp.sum(tgt)) * 1e-9

    t_d = scan_time(data_step)
    record("pixel_sample_raygen_gather", t_d * 1e3)

    _signerf_sections(model, cfg, params, cams, images, key)


def _signerf_sections(model, cfg, params, cams, images, key):
    """Sections 8-10: the signerf-method (product) regime — 16384 rays,
    patch 32, LPIPS + gradient normals (reference signerf_config.py:27-29).
    Runs standalone via --signerf for fast iteration."""
    from signerf_tpu.engine.optimizers import OptimizersConfig, make_optimizer
    from signerf_tpu.engine.train_step import (
        SamplerSettings,
        TrainState,
        make_train_step,
    )

    # ---- 8. signerf regime total (refine-phase model) -----------------------
    from signerf_tpu.data.datamanager import auto_micro_batches
    from signerf_tpu.models.signerf import SIGNeRFModel, SIGNeRFModelConfig

    scfg = SIGNeRFModelConfig(
        predict_normals=True, use_lpips=True, use_l1=True,
        patch_size=32, average_init_density=0.01,
    )
    smodel = SIGNeRFModel(scfg, num_train_images=8)
    sparams = smodel.init(jax.random.PRNGKey(14))
    sopt = make_optimizer(OptimizersConfig(), sparams)
    s_rays = 16384
    micro = auto_micro_batches(s_rays, 32, False)
    t_sstep = time_train_step(
        lambda K: make_train_step(
            smodel, sopt, cams,
            SamplerSettings(num_rays=s_rays, patch_size=32, micro_batches=micro),
            steps_per_call=K, donate=False,
        ),
        lambda: TrainState.create(sparams, sopt),
        images, key, K1=1, K2=5,
    )
    record("signerf_step_total_16384rays_patch32", t_sstep * 1e3)
    RESULTS["signerf_train_rays_per_s"] = round(s_rays / t_sstep, 1)
    print(f"  -> signerf regime {s_rays / t_sstep:,.0f} rays/s")

    # ---- 8b. micro-batch split A/B at the signerf regime --------------------
    # auto_micro_batches' 8192-ray sweet spot was measured BEFORE the fused
    # density kernels removed the [N, D] f32 feature intermediates; if the
    # spill boundary moved, a monolithic 16384-ray step saves a whole
    # sequential fwd/bwd pass.
    for mlabel, m_override in [("micro1_monolithic", 1), ("micro4", 4)]:
        if micro == m_override:
            continue
        t_m = time_train_step(
            lambda K, _m=m_override: make_train_step(
                smodel, sopt, cams,
                SamplerSettings(
                    num_rays=s_rays, patch_size=32, micro_batches=_m
                ),
                steps_per_call=K, donate=False,
            ),
            lambda: TrainState.create(sparams, sopt),
            images, key, K1=1, K2=5,
        )
        record(f"signerf_step_{mlabel}", t_m * 1e3)

    # ---- 9. signerf regime ablations (attribute the refine step) -----------
    # Same step with one loss subsystem disabled each: the delta vs the
    # total above attributes that subsystem's cost (incl. its backward).
    for label, kw in [
        ("signerf_step_no_normals", dict(predict_normals=False)),
        ("signerf_step_no_lpips", dict(use_lpips=False)),
        ("signerf_step_fast_normals", dict(fast_normals_losses=True)),
    ]:
        base = dict(
            predict_normals=True, use_lpips=True, use_l1=True,
            patch_size=32, average_init_density=0.01,
        )
        base.update(kw)
        vcfg = SIGNeRFModelConfig(**base)
        vmodel = SIGNeRFModel(vcfg, num_train_images=8)
        vparams = vmodel.init(jax.random.PRNGKey(14))
        vopt = make_optimizer(OptimizersConfig(), vparams)
        t_v = time_train_step(
            lambda K, _m=vmodel, _o=vopt: make_train_step(
                _m, _o, cams,
                SamplerSettings(
                    num_rays=s_rays, patch_size=32, micro_batches=micro
                ),
                steps_per_call=K, donate=False,
            ),
            lambda _p=vparams, _o=vopt: TrainState.create(_p, _o),
            images, key, K1=1, K2=5,
        )
        record(label, t_v * 1e3)
        record(label + "_delta_vs_total", (t_sstep - t_v) * 1e3)

    # ---- 10. direct sub-probes of the signerf-only stages -------------------
    # 10a. LPIPS fwd+bwd on the exact patch batch (16 patches of 32x32; grad
    # w.r.t. the predicted patches, which is the path that feeds the NeRF
    # backward).
    from signerf_tpu.ops.lpips import lpips

    n_patches = s_rays // (32 * 32)
    xp0 = jax.random.uniform(
        jax.random.PRNGKey(20), (n_patches, 32, 32, 3)
    ) * 2 - 1
    yp0 = jax.random.uniform(
        jax.random.PRNGKey(21), (n_patches, 32, 32, 3)
    ) * 2 - 1
    lp = smodel.lpips_params

    def lpips_fwd(c):
        return jnp.sum(lpips(lp, xp0 + c * 1e-9, yp0)) * 1e-9

    record(f"lpips_fwd_{n_patches}patch32", scan_time(lpips_fwd) * 1e3)

    def lpips_fwdbwd(c):
        def f(x):
            return jnp.sum(lpips(lp, x, yp0))

        val, g = jax.value_and_grad(f)(xp0 + c * 1e-9)
        return (val + jnp.sum(g)) * 1e-9

    record(f"lpips_fwd_bwd_{n_patches}patch32", scan_time(lpips_fwdbwd) * 1e3)

    # 10b. patch sampling + raygen + gather at the signerf batch.
    from signerf_tpu.data.pixel_samplers import gather_pixels, sample_patches

    H = int(cams.height)
    W = int(cams.width)

    def patch_data_step(c):
        k = jax.random.fold_in(jax.random.PRNGKey(22), jnp.int32(c * 1e9))
        idx = sample_patches(k, s_rays, 32, 8, H, W)
        rb = cams.generate_rays_at(idx)
        tgt = gather_pixels(images, idx).astype(jnp.float32) / 255.0
        return (jnp.sum(rb.origins) + jnp.sum(tgt)) * 1e-9

    record("patch_sample_raygen_gather_16384", scan_time(patch_data_step) * 1e3)

    # 10c. analytic normals: density+geo+grad vs density+geo at the final
    # field's sample count, fwd and fwd+bwd (differentiable dhat path = the
    # exact-semantics training configuration).
    from signerf_tpu.models.fields import factor_density_geo_and_grad

    N_norm = (s_rays // micro) * cfg.num_nerf_samples_per_ray
    posn = jax.random.uniform(
        jax.random.PRNGKey(23), (s_rays // micro, cfg.num_nerf_samples_per_ray, 3)
    ) * 2 - 1

    def grad_fwd(c, diff):
        d, geo, g = factor_density_geo_and_grad(
            sparams["field"], posn + c * 1e-9, smodel.field,
            differentiable_grad=diff,
        )
        return (jnp.sum(d) + jnp.sum(g)) * 1e-9

    record(
        f"normals_density_geo_grad_fwd_N{N_norm}",
        scan_time(lambda c: grad_fwd(c, True)) * 1e3,
    )

    def grad_fwdbwd(c):
        def f(fp):
            d, geo, g = factor_density_geo_and_grad(
                fp, posn + c * 1e-9, smodel.field, differentiable_grad=True
            )
            # orientation-loss-like consumer: normals from grad, plus the
            # density path, so BOTH vjp routes stay live.
            n = -g / jnp.sqrt(jnp.sum(g * g, -1, keepdims=True) + 1e-12)
            return jnp.sum(d) + jnp.sum(n * 1e-3)

        val, gr = jax.value_and_grad(f)(sparams["field"])
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(gr))
        return (val + gsum) * 1e-9

    record(
        f"normals_density_geo_grad_fwd_bwd_N{N_norm}",
        scan_time(grad_fwdbwd) * 1e3,
    )


def write_json(path: str) -> None:
    try:
        RESULTS["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
    except Exception:
        RESULTS["commit"] = "unknown"
    RESULTS["note"] = (
        "ms per optimizer step at the bench train regime (4096 rays "
        "signerf_nerfacto unless labeled), measured on the real chip by "
        "scripts/profile_train.py (scan-K differencing; sub-ms values are "
        "tunnel noise). fwd/bwd probes use a fixed ray batch, so "
        "train_step_total also includes sampling/raygen/optimizer terms "
        "probed separately."
    )
    with open(path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    json_path = None
    if "--json" in sys.argv:
        idx = sys.argv.index("--json")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("usage: profile_train.py [--json OUTPUT_PATH] [--signerf]")
        json_path = sys.argv[idx + 1]
    main(signerf_only="--signerf" in sys.argv)
    if json_path is not None:
        write_json(json_path)
