"""Scan-differencing micro-timer for the axon-tunneled TPU.

Measured tunnel caveat (see scripts/profile_render.py header): over the axon
backend `block_until_ready` returns before device completion — only a
device->host fetch waits — and per-dispatch RTT is large and noisy. So every
timing here (a) repeats the op K times inside ONE jit via `lax.scan` with a
scalar data dependence between iterations (so XLA cannot CSE the repeats
away), and (b) ends with a scalar fetch. Per-op time is the slope
(t_K2 - t_K1) / (K2 - K1), which cancels both the RTT and the fetch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def scan_time(make_step, K1: int = 2, K2: int = 10, repeats: int = 3) -> float:
    """``make_step(carry_scalar) -> scalar``; returns seconds per step.

    The carry scalar must be threaded into the step's inputs (e.g.
    ``x + c * 1e-9``) so consecutive iterations form a data chain.
    """

    def run(K):
        @jax.jit
        def f(c0):
            def body(c, _):
                return make_step(c), None

            c, _ = jax.lax.scan(body, c0, None, length=K)
            return c

        v = float(f(jnp.float32(0.01)))  # compile + run
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.01 + v * 1e-20)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tA, tB = run(K1), run(K2)
    return (tB - tA) / (K2 - K1)
