"""Interface layer: headless Generation API + built-in web viewer."""

from signerf_tpu.interface.api import GenerationInterface

__all__ = ["GenerationInterface"]
