"""Checkpoint save/load with SIGNeRF's selective-restore surgery.

Capability parity (SURVEY.md §5 "Checkpoint / resume"):
  * `step-{step:09d}.ckpt` files holding pipeline + optimizer state
    (/root/reference/signerf/signerf_trainer.py:279-306), keep-all,
    `steps_per_save=1000` (signerf_config.py:20-22).
  * Load path always restarts the step counter at 0 in practice
    (signerf_trainer.py:321-325) with optional reset of optimizers/schedulers.
  * Editing-specific surgery on load (signerf_pipeline.py:93-144):
      - strip DDP ``module.`` prefixes (not applicable here — no DDP names);
      - drop appearance embeddings + camera-opt pose adjustments (:110-121);
      - optionally drop all ``proposal*`` weights so proposal nets retrain
        fresh on the edited scene (:126-131, :135-144).
  * Checkpoint save filters diffusion (``ip2p.``) weights
    (signerf_trainer.py:289) — our diffusion params live outside the NeRF
    state entirely, so that rule holds by construction.

Format: flax.serialization msgpack of the {params, opt_state, step} pytree —
single-file, host-portable; on restore the caller re-places arrays onto the
mesh (replication is the trainer's job, keeping IO layout-agnostic).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import serialization


def checkpoint_path(directory: Path, step: int) -> Path:
    return Path(directory) / f"step-{step:09d}.ckpt"


def latest_checkpoint(directory: Path) -> Optional[Path]:
    directory = Path(directory)
    if not directory.exists():
        return None
    ckpts = sorted(directory.glob("step-*.ckpt"))
    return ckpts[-1] if ckpts else None


def save_checkpoint(directory: Path, step: int, params, opt_state) -> Path:
    """Write a single-file msgpack checkpoint (host copies of all arrays)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    state = {
        "step": jnp.asarray(step, jnp.int32),
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
    }
    path = checkpoint_path(directory, step)
    path.write_bytes(serialization.to_bytes(state))
    return path


def load_checkpoint(path: Path, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of ``template`` ({params, opt_state, step})."""
    return serialization.from_bytes(template, Path(path).read_bytes())


def load_params(path: Path, params_template) -> Tuple[Any, int]:
    """Restore only params (+ the saved step) against a params template."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    params = serialization.from_state_dict(params_template, raw["params"])
    return params, int(raw["step"])


# ---------------------------------------------------------------------------
# surgery (reference: signerf_pipeline.py:93-144)
# ---------------------------------------------------------------------------


def strip_appearance_and_camera_opt(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return params with appearance embedding + camera_opt re-initialized
    to be filled from the current init (parity: signerf_pipeline.py:110-121
    deletes `embedding_appearance` and `camera_optimizer.pose_adjustment`)."""
    out = dict(params)
    out.pop("camera_opt", None)
    if "field" in out and isinstance(out["field"], dict):
        field = dict(out["field"])
        field.pop("appearance", None)
        out["field"] = field
    return out


def strip_proposals(params: Dict[str, Any]) -> Dict[str, Any]:
    """Drop every top-level ``proposal*`` subtree (parity:
    signerf_pipeline.py:126-131, :135-144)."""
    return {k: v for k, v in params.items() if not re.match(r"proposal", k)}


def merge_with_init(
    loaded: Dict[str, Any], init: Dict[str, Any]
) -> Dict[str, Any]:
    """Overlay ``loaded`` subtrees onto a freshly-initialized params tree,
    keeping init values for anything the surgery dropped."""

    def merge(a, b):
        if isinstance(a, dict) and isinstance(b, dict):
            out = dict(b)
            for k, v in a.items():
                out[k] = merge(v, b[k]) if k in b else v
            return out
        return a

    return merge(loaded, init)


def surgical_restore(
    path: Path,
    init_params: Dict[str, Any],
    drop_proposals: bool = False,
) -> Dict[str, Any]:
    """Full SIGNeRF restore: load -> strip appearance/camera-opt ->
    optionally strip proposals -> overlay onto fresh init."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    loaded_sd = raw["params"]
    # Restore against the init template subtree-by-subtree so dropped keys
    # simply fall back to init.
    loaded = serialization.from_state_dict(init_params, loaded_sd)
    loaded = strip_appearance_and_camera_opt(loaded)
    if drop_proposals:
        loaded = strip_proposals(loaded)
    return merge_with_init(loaded, init_params)
