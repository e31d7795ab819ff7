"""Ray sample containers (pytree structs), static shapes throughout.

Mirrors the *capability* of nerfstudio's `RaySamples`/`Frustums` consumed by
the reference via `NerfactoModel` (/root/reference/signerf/signerf.py:65-79:
`weights_list`, `ray_samples_list` feed the interlevel loss), re-designed as
flat jnp struct dataclasses so everything shards/jits cleanly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RaySamples:
    """[R, S] samples along R rays.

    ``starts``/``ends`` are euclidean bin edges along the ray;
    ``spacing_starts``/``spacing_ends`` are the same bins in normalized
    s-space (the proposal/PDF samplers and the interlevel/distortion losses
    operate in s-space, matching mipnerf360 semantics).
    """

    origins: jnp.ndarray  # [R, 3]
    directions: jnp.ndarray  # [R, 3]
    starts: jnp.ndarray  # [R, S]
    ends: jnp.ndarray  # [R, S]
    spacing_starts: jnp.ndarray  # [R, S]
    spacing_ends: jnp.ndarray  # [R, S]
    camera_indices: Optional[jnp.ndarray] = None  # [R] int32
    pixel_area: Optional[jnp.ndarray] = None  # [R]

    @property
    def num_samples(self) -> int:
        return self.starts.shape[-1]

    @property
    def deltas(self) -> jnp.ndarray:
        return self.ends - self.starts  # [R, S]

    @property
    def midpoints(self) -> jnp.ndarray:
        return 0.5 * (self.starts + self.ends)  # [R, S]

    @property
    def positions(self) -> jnp.ndarray:
        """Frustum center positions [R, S, 3]."""
        return (
            self.origins[:, None, :]
            + self.directions[:, None, :] * self.midpoints[..., None]
        )

    @property
    def spacing_bins(self) -> jnp.ndarray:
        """[R, S+1] s-space bin edges (starts + last end)."""
        return jnp.concatenate(
            [self.spacing_starts, self.spacing_ends[..., -1:]], axis=-1
        )
