"""Metrics/event writer + profiler hooks.

Capability parity (SURVEY.md §5 "Metrics / logging / observability" and
"Tracing / profiling"): the reference uses nerfstudio's event writer
(wandb/tensorboard/comet toggles + config dump, signerf_trainer.py:152-164)
and its function-timing profiler (:165), with TRAIN_RAYS_PER_SEC driving
viewer throttling (viewer.py:485-498).

Here: JSONL event log + console lines (always available), optional wandb
if importable, `jax.profiler` trace capture on demand, and a rays/sec
EMA published for the viewer to throttle against.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

# global buffer the viewer reads (parity: nerfstudio writer.GLOBAL_BUFFER)
GLOBAL_BUFFER: Dict[str, float] = {}


class EventWriter:
    def __init__(self, log_dir: Path, use_wandb: bool = False, run_name: str = "run"):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.events_path = self.log_dir / "events.jsonl"
        self._fh = open(self.events_path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="signerf-tpu", name=run_name, dir=str(log_dir))
            except Exception:
                self._wandb = None

    def write_scalars(self, step: int, scalars: Dict[str, Any]) -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        for k, v in row.items():
            if k not in ("step", "time"):
                GLOBAL_BUFFER[k] = v
        if self._wandb is not None:
            self._wandb.log(row, step=int(step))

    def write_config(self, config_yaml: str) -> None:
        (self.log_dir / "config.yml").write_text(config_yaml)

    def close(self) -> None:
        self._fh.close()


class RaysPerSecTracker:
    """EMA rays/sec, published to GLOBAL_BUFFER as train_rays_per_sec."""

    def __init__(self, alpha: float = 0.2):
        self.alpha = alpha
        self.value: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, num_rays: int) -> float:
        now = time.time()
        if self._last is not None:
            rate = num_rays / max(now - self._last, 1e-9)
            self.value = (
                rate
                if self.value is None
                else self.alpha * rate + (1 - self.alpha) * self.value
            )
            GLOBAL_BUFFER["train_rays_per_sec"] = self.value
        self._last = now
        return self.value or 0.0


class Profiler:
    """Thin jax.profiler wrapper (trace dir served to TensorBoard)."""

    def __init__(self, log_dir: Path):
        self.trace_dir = Path(log_dir) / "profile"

    def start(self) -> None:
        import jax

        self.trace_dir.mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(str(self.trace_dir))

    def stop(self) -> None:
        import jax

        jax.profiler.stop_trace()
