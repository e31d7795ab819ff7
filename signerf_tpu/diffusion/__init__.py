"""Diffusion subsystem: the Diffuser interface and the in-process JAX
SDXL + ControlNet-depth denoiser that replaces the reference's HTTP hop."""

from signerf_tpu.diffusion.diffuser import Diffuser, DiffuserConfig

__all__ = ["Diffuser", "DiffuserConfig"]
