"""SIGNeRF trainer: orchestrates load -> (interface pause) -> generate ->
dataset hot-swap -> fine-tune.

Capability parity (SURVEY.md §2a "Trainer", §3.1/3.2 call stacks):
/root/reference/signerf/signerf_trainer.py:36-340 —
  * flags `skip_interface`, `skip_generation`, `previous_experiment_dir`,
    `generated_dataset_dir` (:47-52) and the headless path (:209-235);
  * restores a previous experiment's DatasetGeneratorConfig from its
    config.yml (:87-94);
  * `exchange_training_dataset` rebuilds the pipeline on the generated
    dataset, reloads the checkpoint without proposal weights, and resets
    the step counter (:238-276);
  * checkpoints `step-{step:09d}.ckpt`, keep-all, `steps_per_save=1000`
    (:279-306, signerf_config.py:20-22); `_load_checkpoint` restarts the
    step at 0 (:321-325) with optional optimizer/step resets;
  * training_state machine "paused" -> "training" -> "completed" that the
    interface/viewer toggles (:196-207).

TPU shape: the hot loop dispatches `steps_per_call` optimizer steps per
host round-trip (scan inside jit); data lives on device (uint8 stacks);
multi-chip via the shard_map data-parallel step when a mesh is given.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from signerf_tpu import config as cfglib
from signerf_tpu.data.dataparser import load_previous_experiment_cameras
from signerf_tpu.diffusion.diffuser import Diffuser
from signerf_tpu.engine.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from signerf_tpu.engine.optimizers import OptimizersConfig, make_optimizer
from signerf_tpu.engine.train_step import (
    SamplerSettings,
    TrainState,
    make_train_step,
)
from signerf_tpu.engine.writer import EventWriter, RaysPerSecTracker
from signerf_tpu.pipeline import SIGNeRFPipeline, SIGNeRFPipelineConfig


@dataclasses.dataclass
class SIGNeRFTrainerConfig:
    """Parity: SIGNeRFTrainerConfig (signerf_trainer.py:36-56) +
    method-level knobs from signerf_config.py:17-32."""

    method_name: str = "signerf"
    output_dir: Path = Path("outputs")
    experiment_name: str = "experiment"
    pipeline: SIGNeRFPipelineConfig = dataclasses.field(
        default_factory=SIGNeRFPipelineConfig
    )
    optimizers: OptimizersConfig = dataclasses.field(
        default_factory=OptimizersConfig
    )
    max_num_iterations: int = 20000
    steps_per_save: int = 1000
    save_only_latest_checkpoint: bool = False
    mixed_precision: bool = True  # bf16 compute is always-on; kept for parity
    steps_per_call: int = 25  # scan-batched steps per dispatch (TPU addition)
    # SIGNeRF flow flags (signerf_trainer.py:47-52)
    skip_interface: bool = False
    skip_generation: bool = False
    previous_experiment_dir: Optional[Path] = None
    generated_dataset_dir: Optional[Path] = None
    load_dir: Optional[Path] = None
    load_checkpoint: Optional[Path] = None
    reset_optimizer: bool = True
    reset_scheduler: bool = True
    reset_step: bool = True
    use_wandb: bool = False
    seed: int = 42


class SIGNeRFTrainer:
    def __init__(self, config: SIGNeRFTrainerConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        self.training_state: str = "paused"  # paused | training | completed
        self.pipeline: Optional[SIGNeRFPipeline] = None
        self.state: Optional[TrainState] = None
        self.step: int = 0
        self._train_fn = None
        self._images_dev = None
        self._mask_idx_dev = None

        # Restore a previous experiment's generator config (parity :87-94).
        if config.previous_experiment_dir is not None:
            prev_cfg_path = Path(config.previous_experiment_dir) / "config.yml"
            if prev_cfg_path.exists():
                from signerf_tpu.generator.datasetgenerator import (
                    DatasetGeneratorConfig,
                )

                config.pipeline.dataset_generator = cfglib.load_yaml(
                    DatasetGeneratorConfig, prev_cfg_path
                )

    # ------------------------------------------------------------------

    @property
    def checkpoint_dir(self) -> Path:
        return (
            Path(self.config.output_dir)
            / self.config.experiment_name
            / self.config.method_name
            / "checkpoints"
        )

    def setup(self, diffuser: Optional[Diffuser] = None) -> None:
        c = self.config
        self.pipeline = SIGNeRFPipeline(
            c.pipeline, diffuser=diffuser, mesh=self.mesh, seed=c.seed
        )
        log_dir = Path(c.output_dir) / c.experiment_name / c.method_name
        self.writer = EventWriter(
            log_dir, use_wandb=c.use_wandb, run_name=c.experiment_name
        )
        self.writer.write_config(cfglib.to_yaml(c))
        self.rays_tracker = RaysPerSecTracker()

        self._load_initial_checkpoint()
        self._build_train_fn()

        # previous experiment cameras (parity :170-175)
        self.previous_cameras: Optional[Dict[str, Any]] = None
        if c.previous_experiment_dir is not None:
            tp = Path(c.previous_experiment_dir) / "transforms.json"
            if tp.exists():
                self.previous_cameras = load_previous_experiment_cameras(tp)

    def _load_initial_checkpoint(self) -> None:
        c = self.config
        ckpt = None
        if c.load_checkpoint is not None:
            ckpt = Path(c.load_checkpoint)
        elif c.load_dir is not None:
            ckpt = latest_checkpoint(Path(c.load_dir))
        if ckpt is not None and ckpt.exists():
            # step always restarts at 0 in practice (parity :321-325)
            self.pipeline.load_state_dict(ckpt)
            print(f"[trainer] loaded checkpoint {ckpt} (step reset to 0)")
        self.step = 0

    def _build_train_fn(self) -> None:
        c = self.config
        pipeline = self.pipeline
        dm = pipeline.datamanager
        self.optimizer = make_optimizer(c.optimizers, pipeline.params)
        self.state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, pipeline.params), self.optimizer
        )
        settings = dm.sampler_settings()
        self._train_fn = make_train_step(
            pipeline.model,
            self.optimizer,
            dm.cameras,
            settings,
            mesh=self.mesh,
            steps_per_call=c.steps_per_call,
        )
        self._images_dev = jnp.asarray(dm.images)
        self._mask_idx_dev = (
            None if dm.mask_indices is None else jnp.asarray(dm.mask_indices)
        )
        if self.mesh is not None:
            from signerf_tpu.parallel import replicate

            self.state = replicate(self.state, self.mesh)
            self._images_dev = replicate(self._images_dev, self.mesh)
            if self._mask_idx_dev is not None:
                self._mask_idx_dev = replicate(self._mask_idx_dev, self.mesh)
        self._num_rays_per_call = settings.num_rays * c.steps_per_call

    # ------------------------------------------------------------------
    # dataset generation + hot swap (parity :238-276 + §3.2)
    # ------------------------------------------------------------------

    def generate_dataset(self, **kwargs) -> Path:
        """Run the full dataset generation using current NeRF weights."""
        self.pipeline.params = (
            self.state.params if self.state is not None else self.pipeline.params
        )
        gen = self.pipeline.dataset_generator
        dm = self.pipeline.datamanager
        defaults: Dict[str, Any] = {}
        if self.previous_cameras is not None:
            defaults["reference_camera_to_worlds"] = self.previous_cameras[
                "reference_camera_to_worlds"
            ]
            if self.previous_cameras["synthetic_camera_to_worlds"] is not None:
                defaults["synthetic_camera_to_worlds"] = self.previous_cameras[
                    "synthetic_camera_to_worlds"
                ]
        defaults.setdefault(
            "original_cameras", dm.cameras
        )
        defaults.setdefault(
            "original_filenames", list(dm.outputs.image_filenames)
        )
        defaults.setdefault(
            "original_images", dm.images.astype(np.float32) / 255.0
        )
        defaults.update(kwargs)
        return gen.generate_dataset(**defaults)

    def exchange_training_dataset(self, generated_dir: Path) -> None:
        """Hot-swap training data to the generated dataset (parity :238-276):
        rebuild the pipeline against the generated dir, reload the latest
        checkpoint WITHOUT proposal weights, reset step to 0."""
        c = self.config
        # checkpoint current weights so the swap can restore them
        ckpt = self.save_checkpoint()
        c.pipeline.datamanager.dataparser.data = Path(generated_dir)
        diffuser = self.pipeline.dataset_generator.diffuser
        self.pipeline = SIGNeRFPipeline(
            c.pipeline, diffuser=diffuser, mesh=self.mesh, seed=c.seed
        )
        self.pipeline.reload_model_state_dict_without_proposal_weights(ckpt)
        self.step = 0
        self._build_train_fn()
        print(f"[trainer] exchanged training dataset -> {generated_dir}")

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def train_iteration(self) -> Dict[str, float]:
        key = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), self.step)
        self.state, metrics = self._train_fn(
            self.state, self._images_dev, self._mask_idx_dev, key
        )
        self.step += self.config.steps_per_call
        return metrics

    def train(self) -> None:
        c = self.config
        self.training_state = "training"
        t_start = time.time()
        while self.step < c.max_num_iterations:
            if self.training_state == "paused":  # viewer pause button parity
                time.sleep(0.1)
                continue
            metrics = self.train_iteration()
            if (self.step // c.steps_per_call) % 4 == 0:
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["rays_per_sec"] = self.rays_tracker.tick(
                    self._num_rays_per_call * 4
                )
                self.writer.write_scalars(self.step, scalars)
                print(
                    f"[train] step {self.step}: loss="
                    f"{scalars.get('total_loss', float('nan')):.4f} "
                    f"psnr={scalars.get('psnr', float('nan')):.2f} "
                    f"({scalars['rays_per_sec'] / 1e3:.0f}k rays/s)"
                )
            if self.step % c.steps_per_save < c.steps_per_call:
                self.save_checkpoint()
        self.save_checkpoint()
        self.training_state = "completed"
        print(
            f"[trainer] finished {self.step} steps in "
            f"{(time.time() - t_start) / 60:.1f} min"
        )

    # ------------------------------------------------------------------
    # checkpoints (parity :279-340)
    # ------------------------------------------------------------------

    def save_checkpoint(self) -> Path:
        params = self.state.params if self.state is not None else self.pipeline.params
        opt_state = (
            self.state.opt_state
            if self.state is not None
            else make_optimizer(self.config.optimizers, params).init(params)
        )
        path = save_checkpoint(self.checkpoint_dir, self.step, params, opt_state)
        if self.config.save_only_latest_checkpoint:
            for old in sorted(self.checkpoint_dir.glob("step-*.ckpt"))[:-1]:
                old.unlink()
        return path

    # ------------------------------------------------------------------
    # headless end-to-end (parity :209-235)
    # ------------------------------------------------------------------

    def run_headless(self, **generate_kwargs) -> None:
        """skip_interface path: generate -> exchange -> train."""
        c = self.config
        if c.skip_generation and c.generated_dataset_dir is not None:
            generated = Path(c.generated_dataset_dir)
        else:
            generated = self.generate_dataset(**generate_kwargs)
        self.exchange_training_dataset(generated)
        self.train()
