"""Scan-differencing micro-timer for the axon-tunneled TPU.

Measured tunnel caveat (see scripts/profile_render.py header): over the axon
backend `block_until_ready` returns before device completion — only a
device->host fetch waits — and per-dispatch RTT is large and noisy. So every
timing here (a) repeats the op K times inside ONE jit via `lax.scan` with a
scalar data dependence between iterations (so XLA cannot CSE the repeats
away), and (b) ends with a scalar fetch. Per-op time is the slope
(t_K2 - t_K1) / (K2 - K1), which cancels both the RTT and the fetch.

Noise guard (round-5 fix for negative published timings): the raw slope of two
noisy endpoints can go negative for sub-ms ops, and round 4 committed several
such rows (ATTN_SWEEP_PERVIEW "best" = -0.056 ms; TRAIN_BREAKDOWN
proposal0_fwd = -18 ms). `scan_time` now *adapts*: it grows K2 until the
measured total-time difference clears the observed run-to-run jitter by a
configurable ratio, and returns NaN — never a negative or noise-dominated
number — when the op is too cheap to resolve within the K budget. Callers that
publish artifacts must drop or label NaN rows (`math.isnan`).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class ScanTiming:
    """Result of one adaptive scan-differencing measurement."""

    per_s: float          # seconds per op; NaN if unresolved within budget
    noise_floor_s: float  # per-op uncertainty implied by endpoint jitter
    k2: int               # final (largest) scan length used
    resolved: bool        # True iff signal cleared jitter * min_signal_ratio

    def ms(self) -> float:
        return self.per_s * 1e3


def _run_lengths(make_step, K: int, repeats: int):
    """Time a K-iteration scan; returns (min seconds, jitter seconds).

    Jitter is (second-best - best) of the repeats — a cheap spread estimate
    robust to a single slow outlier inflating it.
    """

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
    ts.sort()
    jitter = ts[1] - ts[0] if len(ts) > 1 else 0.0
    return ts[0], jitter


def scan_time_stats(
    make_step,
    K1: int = 2,
    K2: int = 10,
    repeats: int = 3,
    min_signal_ratio: float = 4.0,
    max_K2: int = 320,
) -> ScanTiming:
    """``make_step(carry_scalar) -> scalar``; adaptive per-op timing.

    The carry scalar must be threaded into the step's inputs (e.g.
    ``x + c * 1e-9``) so consecutive iterations form a data chain.

    Doubles K2 until ``t(K2) - t(K1)`` exceeds ``min_signal_ratio`` times the
    endpoint jitter, then reports slope and a per-op noise floor. If the
    budget (max_K2) is exhausted without resolving, per_s is NaN — callers
    must not publish NaN rows as measurements.
    """

    tA, jA = _run_lengths(make_step, K1, repeats)
    while True:
        tB, jB = _run_lengths(make_step, K2, repeats)
        signal = tB - tA
        jitter = max(jA, jB, 1e-9)
        floor = jitter / (K2 - K1)
        if signal > min_signal_ratio * jitter:
            return ScanTiming(signal / (K2 - K1), floor, K2, True)
        if K2 >= max_K2:
            # Unresolved: op cost is below what this K budget can separate
            # from tunnel jitter. Report the floor, refuse to report a value.
            return ScanTiming(float("nan"), floor, K2, False)
        K2 = min(K2 * 2, max_K2)


def scan_time(make_step, K1: int = 2, K2: int = 10, repeats: int = 3) -> float:
    """Back-compat wrapper: seconds per step, or NaN if below noise floor."""

    return scan_time_stats(make_step, K1=K1, K2=K2, repeats=repeats).per_s
