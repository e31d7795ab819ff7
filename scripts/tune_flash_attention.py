"""Sweep flash-attention block sizes at the SDXL sheet-scale regimes.

DIFFUSION_BREAKDOWN.json (measured @49fa2f3 on v5e) says the stock pallas
flash kernel with default BlockSizes is ~3x SLOWER than a plain einsum at
the 3x3-sheet self-attention shapes:

    S=9216,  h=10, d=64:  einsum 6.8 ms   flash 20.6 ms
    S=2304,  h=20, d=64:  einsum 1.37 ms  flash  3.96 ms

while the einsum itself is ~6x off roofline (it is HBM-bound on the
[h, S, S] score matrix; the attention FLOPs at S=9216 are ~217 GFLOP ->
~1.1 ms at v5e peak). A correctly-blocked flash kernel keeps scores in
VMEM and should land between those bounds. This script sweeps
`BlockSizes` for the stock kernel over the shapes the UNet actually
dispatches (both CFG-sequential B=1 and CFG-batched B=2) and prints a
table + the best config per shape, so `unet._flash_self_attention` can
pass tuned blocks instead of defaults.

Timing: scan-K differencing via utils.microbench.scan_time (axon-tunnel
safe). Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
        scripts/tune_flash_attention.py [--json ATTN_SWEEP.json]
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from signerf_tpu.utils.microbench import scan_time_stats

RESULTS: dict = {"shapes": {}}

# The self-attention shapes the SDXL UNet+ControlNet dispatch at the 3x3
# 1536px sheet (192x192 latent): stage-2 blocks at 96x96 (S=9216, 10
# heads) and stage-3/mid at 48x48 (S=2304, 20 heads). B=1 is today's
# sequential-CFG program; B=2 is the CFG-batched candidate.
SHAPES = [
    dict(B=1, S=9216, H=10, D=64),
    dict(B=2, S=9216, H=10, D=64),
    dict(B=1, S=2304, H=20, D=64),
    dict(B=2, S=2304, H=20, D=64),
]

# Candidate (block_q, block_kv) tilings. block_kv_compute == block_kv and
# block_q_major == block_q (no causal masking here, full attention).
BLOCKS = [
    (256, 256),
    (512, 512),
    (512, 1024),
    (1024, 512),
    (1024, 1024),
    (1024, 2304),
    (2304, 512),
    (2304, 1024),
    (512, 2304),
    (1536, 1536),
    # power-of-two kv for the per-view shapes (S=4096/1024, latent 128)
    (256, 512),
    (512, 2048),
    (512, 4096),
    (256, 1024),
    # 2304-divisible tilings (S=2304 admits only (256,256) from the list
    # above; 384/768/1152 are the other 128-multiple divisors)
    (384, 768),
    (768, 768),
    (384, 2304),
    (768, 2304),
    (1152, 1152),
    (2304, 2304),
]


def make_inputs(B, S, H, D, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, S, D), dtype)
    k = jax.random.normal(k2, (B, H, S, D), dtype)
    v = jax.random.normal(k3, (B, H, S, D), dtype)
    return q, k, v


def time_einsum(q, k, v, sm_scale):
    def f(c):
        qq = q + c * jnp.bfloat16(1e-9)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qq, k) * sm_scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return jnp.sum(out).astype(jnp.float32) * 1e-9

    return scan_time_stats(f, K1=4, K2=32, max_K2=64)


def time_flash(q, k, v, sm_scale, block_q=None, block_kv=None):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    S = q.shape[2]
    kwargs = {}
    if block_q is not None:
        bq = min(block_q, S)
        bkv = min(block_kv, S)
        kwargs["block_sizes"] = BlockSizes(
            block_q=bq,
            block_k_major=bkv,
            block_k=bkv,
            block_b=1,
            # backward blocks: unused in this fwd-only sweep but the
            # dataclass requires them; keep them legal.
            block_q_major_dkv=bq,
            block_k_major_dkv=bkv,
            block_k_dkv=bkv,
            block_q_dkv=bq,
            block_k_major_dq=bkv,
            block_k_dq=bkv,
            block_q_dq=bq,
        )

    def f(c):
        qq = q + c * jnp.bfloat16(1e-9)
        out = flash_attention(qq, k, v, sm_scale=sm_scale, **kwargs)
        return jnp.sum(out).astype(jnp.float32) * 1e-9

    # Bounded K growth: every new scan length is a fresh compile over the
    # tunnel, and the unbounded adaptive ladder made a full sweep take
    # hours. One doubling (32 -> 64) resolves everything >= ~0.3 ms;
    # cheaper candidates come back NaN and are honestly skipped.
    return scan_time_stats(f, K1=4, K2=32, max_K2=64)


def main():
    print("devices:", jax.devices())
    sm_scale = 1.0 / (64.0 ** 0.5)
    for shp in SHAPES:
        B, S, H, D = shp["B"], shp["S"], shp["H"], shp["D"]
        label = f"B{B}_S{S}_h{H}_d{D}"
        q, k, v = make_inputs(B, S, H, D)
        entry = {}
        noise_floor = 0.0

        def keep(name, st):
            # Only publish resolved, positive timings; track the worst noise
            # floor so "best" can be gated on clearing it (round-5 fix: the
            # r4 artifact's argmin selected negative scan-differencing noise).
            nonlocal noise_floor
            noise_floor = max(noise_floor, st.noise_floor_s * 1e3)
            if not st.resolved or st.per_s <= 0:
                entry.setdefault("unresolved", []).append(name)
                print(f"{label}: {name} unresolved (below noise floor)")
                return None
            ms = st.per_s * 1e3
            entry[f"{name}_ms"] = round(ms, 3)
            print(f"{label}: {name} {ms:.3f} ms")
            return ms

        t_e = keep("einsum", time_einsum(q, k, v, sm_scale))
        keep("flash_default", time_flash(q, k, v, sm_scale))
        best = None
        for bq, bkv in BLOCKS:
            if bq > S or bkv > S:
                continue
            if S % min(bq, S) or S % min(bkv, S):
                continue
            try:
                st = time_flash(q, k, v, sm_scale, bq, bkv)
            except Exception as e:  # noqa: BLE001 — sweep must survive bad tilings
                print(f"{label}: flash bq={bq} bkv={bkv} FAILED {type(e).__name__}")
                continue
            t = keep(f"flash_bq{bq}_bkv{bkv}", st)
            if t is None:
                continue
            if best is None or t < best[0]:
                best = (t, bq, bkv)
        entry["noise_floor_ms"] = round(noise_floor, 4)
        # Emit "best" only when the winner itself clears the sweep's noise
        # floor — otherwise the ranking among candidates is not trustworthy
        # and an automated consumer (FLASH_BLOCK_TABLE refresh) would adopt
        # a garbage tiling.
        if best and best[0] > 2.0 * noise_floor:
            entry["best"] = {
                "ms": round(best[0], 3), "block_q": best[1], "block_kv": best[2],
            }
            if t_e:
                entry["best"]["vs_einsum"] = round(best[0] / t_e, 3)
            print(f"{label}: BEST flash bq={best[1]} bkv={best[2]} "
                  f"{best[0]:.3f} ms")
        elif best:
            entry["best_suppressed"] = (
                f"winner {best[0]:.3f} ms within 2x noise floor "
                f"{noise_floor:.3f} ms — not publishable"
            )
            print(f"{label}: best suppressed (within noise floor)")
        RESULTS["shapes"][label] = entry


def write_json(path: str) -> None:
    try:
        RESULTS["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
    except Exception:
        RESULTS["commit"] = "unknown"
    with open(path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    json_path = None
    if "--json" in sys.argv:
        idx = sys.argv.index("--json")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("usage: tune_flash_attention.py [--json OUT] [--shapes B,S,H,D;...]")
        json_path = sys.argv[idx + 1]
    if "--shapes" in sys.argv:
        # Override the sheet-scale defaults, e.g. the per-view 1024px-image
        # regime (latent 128): "2,4096,10,64;2,1024,20,64".
        idx = sys.argv.index("--shapes")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            sys.exit("usage: tune_flash_attention.py [--json OUT] [--shapes B,S,H,D;...]")
        SHAPES = [
            dict(zip(("B", "S", "H", "D"), map(int, part.split(","))))
            for part in sys.argv[idx + 1].split(";")
        ]
    main()
    if json_path is not None:
        write_json(json_path)
