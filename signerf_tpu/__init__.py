"""signerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for generative
NeRF scene editing with the capabilities of SIGNeRF (CVPR 2024).

Built from scratch, TPU-first:
  * ``cameras``   — camera models, ray generation, pose synthesis
  * ``ops``       — Pallas/jnp compute kernels (hash grid, MLP, compositing, raster)
  * ``models``    — nerfacto-class NeRF field + LPIPS
  * ``diffusion`` — in-process JAX SDXL + ControlNet-depth inpainting
  * ``data``      — transforms.json parsing, pixel/patch samplers, prefetch
  * ``generator`` — reference-sheet dataset generation (the SIGNeRF algorithm)
  * ``engine``    — train loop, checkpointing (with selective-restore surgery)
  * ``parallel``  — device mesh + sharding helpers (ICI-aware)
  * ``interface`` — headless editing API (+ optional viser frontend)

Capability parity map is documented in SURVEY.md at the repo root; reference
citations in docstrings use ``file:line`` paths inside /root/reference.
"""

__version__ = "0.1.0"
