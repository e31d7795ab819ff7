"""SIGNeRF pipeline: datamanager + model + dataset generator glue.

Capability parity (SURVEY.md §2a "Pipeline"):
/root/reference/signerf/signerf_pipeline.py:20-157 —
  * instantiates the DatasetGenerator with the dataparser's transform/scale
    and a pose-space inverse-transform callback (:52-57);
  * backfills generator intrinsics from the first train camera (:60-88);
  * checkpoint surgery on load: drop appearance embedding + camera-opt pose
    adjustments (:110-121), optionally drop all ``proposal*`` weights so
    proposal nets retrain fresh on the edited scene (:126-144). (DDP
    ``module.`` prefix stripping is moot — no DDP names exist here.)

The pipeline also owns the jitted render function handed to the generator
(chunked full-image renders, SURVEY.md §3.3) and the training step builder.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.data.datamanager import (
    SIGNeRFDataManager,
    SIGNeRFDataManagerConfig,
)
from signerf_tpu.diffusion.diffuser import Diffuser
from signerf_tpu.engine.checkpoints import surgical_restore
from signerf_tpu.engine.train_step import make_eval_render
from signerf_tpu.generator.datasetgenerator import (
    DatasetGenerator,
    DatasetGeneratorConfig,
)
from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from signerf_tpu.models.signerf import SIGNeRFModel, SIGNeRFModelConfig


@dataclasses.dataclass
class SIGNeRFPipelineConfig:
    """Parity: SIGNeRFPipelineConfig (signerf_pipeline.py:20-33)."""

    datamanager: SIGNeRFDataManagerConfig = dataclasses.field(
        default_factory=SIGNeRFDataManagerConfig
    )
    model: SIGNeRFModelConfig = dataclasses.field(
        default_factory=SIGNeRFModelConfig
    )
    dataset_generator: DatasetGeneratorConfig = dataclasses.field(
        default_factory=DatasetGeneratorConfig
    )


class SIGNeRFPipeline:
    def __init__(
        self,
        config: SIGNeRFPipelineConfig,
        diffuser: Optional[Diffuser] = None,
        mesh=None,
        seed: int = 42,
    ):
        self.config = config
        self.mesh = mesh
        self.datamanager = SIGNeRFDataManager(config.datamanager)
        self.model = SIGNeRFModel(
            config.model, num_train_images=self.datamanager.num_images
        )
        self.params = self.model.init(jax.random.PRNGKey(seed))
        self._render = make_eval_render(
            self.model,
            chunk_size=min(config.model.eval_num_rays_per_chunk, 8192),
            mesh=mesh,
        )

        outputs = self.datamanager.outputs
        # The default in-process diffuser must see the SAME mesh as the rest
        # of the pipeline: on the production ("data", "tensor") layout the
        # per-view sheet inpaints — the edit pass's dominant phase — run
        # TP-sharded over "tensor" and view-batched over "data". A caller-
        # provided diffuser (tests, remote mode) is used as-is.
        if diffuser is None:
            diffuser = Diffuser(config.dataset_generator.diffuser, mesh=mesh)
        self.dataset_generator = DatasetGenerator(
            config.dataset_generator,
            original_transform_matrix=outputs.dataparser_transform,
            original_scale_factor=outputs.dataparser_scale,
            transform_poses_to_original_space=outputs.transform_poses_to_original_space,
            render_fn=self.render_camera_fn,
            diffuser=diffuser,
            mesh=mesh,
        )
        # intrinsics backfill (parity: signerf_pipeline.py:60-88)
        self.dataset_generator.backfill_intrinsics(self.datamanager.cameras)

    # ------------------------------------------------------------------

    def render_camera_fn(self, cameras: Cameras, index: int) -> Dict[str, Any]:
        """Full-image render -> {"rgb" [H,W,3], "depth" [H,W,1]} (the
        generator's `render_fn` contract; parity datasetgenerator.py:677-701,
        chunked like get_outputs_for_camera_ray_bundle)."""
        aabb = jnp.asarray(self.datamanager.outputs.scene_box_aabb)
        rb = cameras.generate_rays(camera_index=index, aabb=aabb)
        h, w = cameras.height, cameras.width
        flat = rb.reshape((h * w,))
        # Known train cameras render with their own appearance code (the
        # mean code is off-manifold — fields.py rationale); novel
        # reference/synthetic poses use the mean.
        mode = "index" if cameras is self.datamanager.cameras else "mean"
        out = self._render(self.params, flat, appearance_mode=mode)
        return {
            "rgb": out["rgb"].reshape(h, w, 3),
            "depth": out["depth"].reshape(h, w, 1),
            "accumulation": out["accumulation"].reshape(h, w, 1),
        }

    # ------------------------------------------------------------------
    # checkpoint surgery (parity: signerf_pipeline.py:93-144)
    # ------------------------------------------------------------------

    def load_state_dict(self, ckpt_path: Path) -> None:
        """Load nerfacto weights, dropping appearance + camera-opt."""
        fresh = self.model.init(jax.random.PRNGKey(0))
        self.params = surgical_restore(ckpt_path, fresh, drop_proposals=False)

    def reload_model_state_dict_without_proposal_weights(
        self, ckpt_path: Path
    ) -> None:
        """Same, additionally dropping all proposal subtrees (:135-144)."""
        fresh = self.model.init(jax.random.PRNGKey(0))
        self.params = surgical_restore(ckpt_path, fresh, drop_proposals=True)
