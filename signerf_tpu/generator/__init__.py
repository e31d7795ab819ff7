"""Dataset generator: the SIGNeRF editing algorithm (reference sheet +
per-view splice-and-inpaint + dataset merge + transforms.json)."""

from signerf_tpu.generator.datasetgenerator import (
    DatasetGenerator,
    DatasetGeneratorConfig,
    RendererConfig,
)

__all__ = ["DatasetGenerator", "DatasetGeneratorConfig", "RendererConfig"]
