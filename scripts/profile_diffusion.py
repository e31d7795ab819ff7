"""Stage-attribute the sheet-scale SDXL inpaint (the north-star generation
term: 20-step 3x3 1536px sheet per dataset view, SURVEY.md §3.2 hot loop).

Probes (full architecture, random-init bf16 weights — identical FLOPs and
shapes to calibrated weights):
  * 20-step and 4-step inpaint totals -> per-UNet-step marginal by
    differencing (cancels VAE encode/decode + prompt encode + blends).
  * vae_plus_overhead = 4-step total − 4 × marginal.
  * raw self-attention at the sheet's two transformer sequence lengths
    (S=9216 @ 10 heads, S=2304 @ 20 heads for a 192x192 latent), einsum vs
    the pallas flash kernel — the gate evidence in unet.py:132-150.

Timing: scalar-fetch wall clock over the axon tunnel (dispatch RTT is
amortized by the one-jit sampler; attention micro-probes use
microbench.scan_time).

Usage: python scripts/profile_diffusion.py [--json DIFFUSION_BREAKDOWN.json]
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

RESULTS: dict = {"stages_ms": {}}


def record(label: str, ms: float) -> None:
    # NaN (= below the adaptive timer's noise floor) and non-positive rows are
    # never published as measurements; see signerf_tpu/utils/microbench.py.
    if not math.isfinite(ms) or ms <= 0:
        RESULTS.setdefault("unresolved_below_noise_floor", []).append(label)
        print(f"  {label}: unresolved (below noise floor)", flush=True)
        return
    RESULTS["stages_ms"][label] = round(ms, 3)
    print(f"  {label}: {ms:.3f} ms", flush=True)


SHEET = 1536  # 3x3 of 512px cells (downscale 2 of 1024px views)


def main():
    print("devices:", jax.devices(), flush=True)
    from signerf_tpu.diffusion.sdxl_pipeline import SDXLInpaintPipeline
    from signerf_tpu.utils.microbench import scan_time

    pipe = SDXLInpaintPipeline.create()
    rng = np.random.default_rng(0)
    # Device-resident inputs: the production per-view loop splices sheets ON
    # DEVICE (generator/datasetgenerator.py), so host->device transfer of
    # the ~47 MB sheet+mask+cond per call is NOT part of the real regime —
    # over the axon tunnel it alone measured ~1 s/call and polluted the
    # round-4 "vae_prompt_blend_overhead" number.
    img = jnp.asarray(rng.random((SHEET, SHEET, 3), np.float32))
    mask_np = np.zeros((SHEET, SHEET, 1), np.float32)
    mask_np[-512:, -512:] = 1.0  # last cell = the spliced view
    mask = jnp.asarray(mask_np)
    cond = jnp.asarray(rng.random((SHEET, SHEET, 1), np.float32))

    def run_inpaint(steps: int) -> float:
        def once(seed):
            t0 = time.perf_counter()
            out = pipe.img2img(
                img,
                "a photo",
                mask=mask,
                control_image=cond,
                num_steps=steps,
                seed=seed,
                device_out=True,
            )
            np.asarray(jnp.sum(out))  # fetch a scalar: real completion
            return time.perf_counter() - t0

        once(0)  # compile
        return min(once(s) for s in (1, 2, 3))

    t20 = run_inpaint(20)
    record("inpaint_20step_total", t20 * 1e3)
    t4 = run_inpaint(4)
    record("inpaint_4step_total", t4 * 1e3)
    per_step = (t20 - t4) / 16.0
    record("unet_step_marginal_seqcfg", per_step * 1e3)
    record("vae_prompt_blend_overhead", (t4 - 4 * per_step) * 1e3)
    RESULTS["note_cfg"] = (
        "unet_step_marginal_seqcfg is ONE sampler step = TWO sequential "
        "CFG branches (uncond + cond), each a UNet+ControlNet forward."
    )

    # ---- the windowed last-cell fast path (SheetEncodeCache) --------------
    # Per-view regeneration changes only the sheet's last cell and consumes
    # only the last cell of the output, so the full-res VAE conv stages run
    # on a padded window. Same inpaint, with the cache:
    cell = 512
    cache = pipe.prepare_sheet_cache(img, (cell, cell))

    def run_inpaint_cached(steps: int) -> float:
        def once(seed):
            t0 = time.perf_counter()
            out = pipe.img2img(
                img, "a photo", mask=mask, control_image=cond,
                num_steps=steps, seed=seed, device_out=True,
                sheet_cache=cache,
            )
            np.asarray(jnp.sum(out))
            return time.perf_counter() - t0

        once(0)
        return min(once(s) for s in (1, 2, 3))

    t20c = run_inpaint_cached(20)
    record("inpaint_20step_total_windowed_vae", t20c * 1e3)
    t4c = run_inpaint_cached(4)
    record("inpaint_4step_total_windowed_vae", t4c * 1e3)
    per_step_c = (t20c - t4c) / 16.0
    record(
        "vae_prompt_blend_overhead_windowed",
        (t4c - 4 * per_step_c) * 1e3,
    )

    # ---- split the overhead: encode / decode / prompt separately ----------
    vparams = pipe.params["vae"]
    img_dev = jnp.asarray(img)[None]

    enc_fn = jax.jit(
        lambda p, x: pipe.vae.apply({"params": p}, x * 2.0 - 1.0, method="encode")
    )
    z = enc_fn(vparams, img_dev)
    np.asarray(jnp.sum(z))

    def wall(fn, *args):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jnp.sum(fn(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    record("vae_encode_full_sheet", wall(enc_fn, vparams, img_dev) * 1e3)

    dec_fn = jax.jit(
        lambda p, zz: pipe.vae.apply({"params": p}, zz, method="decode")
    )
    np.asarray(jnp.sum(dec_fn(vparams, z)))
    record("vae_decode_full_sheet", wall(dec_fn, vparams, z) * 1e3)

    # windowed variants at the same shapes the cached _run dispatches
    eh, ew, sp_h, sp_w, dh, dw = cache.window_lat
    f = pipe.config.vae_downscale
    win_img = img_dev[:, -eh * f :, -ew * f :, :]

    def enc_win(p, wi, feats):
        wf = pipe.vae.apply({"params": p}, wi * 2.0 - 1.0, method="encode_down")
        merged = feats.at[:, -sp_h:, -sp_w:, :].set(
            wf[:, -sp_h:, -sp_w:, :].astype(feats.dtype)
        )
        return pipe.vae.apply({"params": p}, merged, method="encode_from_features")

    enc_win_j = jax.jit(enc_win)
    np.asarray(jnp.sum(enc_win_j(vparams, win_img, cache.down_feats)))
    record(
        "vae_encode_windowed",
        wall(enc_win_j, vparams, win_img, cache.down_feats) * 1e3,
    )

    def dec_win(p, zz):
        feats = pipe.vae.apply({"params": p}, zz, method="decode_mid")
        return pipe.vae.apply(
            {"params": p}, feats[:, -dh:, -dw:, :], method="decode_up"
        )

    dec_win_j = jax.jit(dec_win)
    np.asarray(jnp.sum(dec_win_j(vparams, z)))
    record("vae_decode_windowed", wall(dec_win_j, vparams, z) * 1e3)

    # prompt encode (the per-view loop hits the cache; this is the one-time
    # cost per distinct prompt)
    pipe._prompt_cache.clear()
    t0 = time.perf_counter()
    ctx, pooled = pipe.encode_prompt("a photo", "")
    np.asarray(jnp.sum(ctx))
    record("prompt_encode_uncached", (time.perf_counter() - t0) * 1e3)

    # ---- raw attention at the sheet's sequence lengths --------------------
    from signerf_tpu.diffusion import unet as U

    lat = SHEET // pipe.config.vae_downscale  # 192
    for S, heads, label in (
        ((lat // 2) ** 2, 10, "attn_S9216_h10"),
        ((lat // 4) ** 2, 20, "attn_S2304_h20"),
    ):
        D = 64
        # [B, S, H, D] — the layout unet.py's attention paths use.
        q = jax.random.normal(jax.random.PRNGKey(0), (1, S, heads, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (1, S, heads, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (1, S, heads, D), jnp.bfloat16)

        def einsum_attn(c):
            qq = q + c.astype(jnp.bfloat16) * 0
            s = jnp.einsum("bqhd,bkhd->bhqk", qq, k) / np.sqrt(D)
            a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v)
            return jnp.sum(o).astype(jnp.float32) * 1e-9

        t_e = scan_time(einsum_attn)
        record(f"{label}_einsum", t_e * 1e3)

        def flash_attn(c):
            qq = q + c.astype(jnp.bfloat16) * 0
            o = U._flash_self_attention(qq, k, v, 1.0 / np.sqrt(D))
            return jnp.sum(o).astype(jnp.float32) * 1e-9

        try:
            t_f = scan_time(flash_attn)
            record(f"{label}_flash", t_f * 1e3)
        except Exception as e:  # pragma: no cover - probe resilience
            print(f"  {label}_flash FAILED: {type(e).__name__}: {e}")


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
        "ms at the 3x3 1536px sheet regime (192x192 latent), full SDXL "
        "architecture, one v5e chip, measured by scripts/profile_diffusion.py."
    )
    with open(path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    json_path = None
    if "--json" in sys.argv:
        idx = sys.argv.index("--json")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("usage: profile_diffusion.py [--json OUTPUT_PATH]")
        json_path = sys.argv[idx + 1]
    main()
    if json_path is not None:
        write_json(json_path)
