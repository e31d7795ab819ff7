"""Method registry: `signerf` (high quality) and `signerf_nerfacto` (fast).

Capability parity (SURVEY.md §2a "Method configs"):
/root/reference/signerf/signerf_config.py:17-65 and
signerf_nerfacto_config.py:17-62 — same hyperparameters, exposed through
this package's CLI (`python -m signerf_tpu.train <method> ...`) instead of
nerfstudio entry points.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from signerf_tpu.data.datamanager import SIGNeRFDataManagerConfig
from signerf_tpu.data.dataparser import SIGNeRFDataParserConfig
from signerf_tpu.diffusion.diffuser import DiffuserConfig
from signerf_tpu.engine.optimizers import OptimizerGroupConfig, OptimizersConfig
from signerf_tpu.engine.trainer import SIGNeRFTrainerConfig
from signerf_tpu.generator.datasetgenerator import (
    DatasetGeneratorConfig,
    RendererConfig,
)
from signerf_tpu.models.signerf import SIGNeRFModelConfig
from signerf_tpu.pipeline import SIGNeRFPipelineConfig


def signerf_method() -> SIGNeRFTrainerConfig:
    """Parity: signerf_config.py:17-65 (high quality)."""
    return SIGNeRFTrainerConfig(
        method_name="signerf",
        steps_per_save=1000,
        max_num_iterations=20000,
        save_only_latest_checkpoint=False,
        mixed_precision=True,
        pipeline=SIGNeRFPipelineConfig(
            datamanager=SIGNeRFDataManagerConfig(
                dataparser=SIGNeRFDataParserConfig(),
                train_num_rays_per_batch=16384,
                eval_num_rays_per_batch=4096,
                patch_size=32,
            ),
            model=SIGNeRFModelConfig(
                eval_num_rays_per_chunk=1 << 15,
                predict_normals=True,
                use_lpips=True,
                use_l1=True,
                patch_size=32,
                average_init_density=0.01,
            ),
            dataset_generator=DatasetGeneratorConfig(
                renderer=RendererConfig(),
                diffuser=DiffuserConfig(),
            ),
        ),
        optimizers=OptimizersConfig(
            proposal_networks=OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200_000
            ),
            fields=OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200_000
            ),
            camera_opt=OptimizerGroupConfig(lr=1e-15, eps=1e-15, lr_final=None),
        ),
    )


def signerf_nerfacto_method() -> SIGNeRFTrainerConfig:
    """Parity: signerf_nerfacto_config.py:17-62 (fast; plain nerfacto
    losses — MSE rgb, no LPIPS/patches)."""
    return SIGNeRFTrainerConfig(
        method_name="signerf_nerfacto",
        steps_per_save=1000,
        max_num_iterations=30000,
        save_only_latest_checkpoint=False,
        mixed_precision=True,
        pipeline=SIGNeRFPipelineConfig(
            datamanager=SIGNeRFDataManagerConfig(
                dataparser=SIGNeRFDataParserConfig(),
                train_num_rays_per_batch=4096,
                eval_num_rays_per_batch=4096,
                patch_size=1,
            ),
            model=SIGNeRFModelConfig(
                eval_num_rays_per_chunk=1 << 15,
                use_lpips=False,
                use_l1=False,
                predict_normals=False,
            ),
            dataset_generator=DatasetGeneratorConfig(
                renderer=RendererConfig(),
                diffuser=DiffuserConfig(),
            ),
        ),
        optimizers=OptimizersConfig(),
    )


METHODS: Dict[str, Callable[[], SIGNeRFTrainerConfig]] = {
    "signerf": signerf_method,
    "signerf_nerfacto": signerf_nerfacto_method,
}
