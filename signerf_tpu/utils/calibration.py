"""One canonical warning for every uncalibrated-weights surface.

The reference runs calibrated torchmetrics LPIPS and real SDXL checkpoints
(/root/reference/signerf/signerf.py:39, README.md:36-76). This environment
has no egress, so pretrained weights may be absent; every entry point that
falls back to random init (LPIPS loss, LPIPS eval metric, SDXL pipeline)
must warn through THIS helper so the message is loud, consistent, and
greppable — a silent random-LPIPS eval prints numbers that look calibrated.
"""

from __future__ import annotations

import warnings

_SEEN: set = set()


def warn_uncalibrated(component: str, detail: str, once_key: str | None = None) -> None:
    """Emit the canonical uncalibrated-weights warning.

    component: short name ("LPIPS", "SDXL"); detail: what the fallback means
    and how to fix it. `once_key` dedupes repeats of the same surface within
    a process (the per-view loop would otherwise spam it hundreds of times).
    """
    if once_key is not None:
        if once_key in _SEEN:
            return
        _SEEN.add(once_key)
    msg = f"{component} running with RANDOM-INIT (uncalibrated) weights: {detail}"
    warnings.warn(msg, stacklevel=3)
    print(f"[signerf-tpu] WARNING: {msg}")
