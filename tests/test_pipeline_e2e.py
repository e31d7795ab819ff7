"""Full-system end-to-end test: tiny dataset -> nerfacto train -> dataset
generation (fake diffuser) -> hot swap -> refinement train.

This is the reference's §3.1/3.2 flow (SURVEY.md) driven headless with a
fake denoiser — the pipeline seam the reference itself exposes
(diffuser custom mode)."""

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full e2e flow, minutes of compiles

from signerf_tpu.cameras.poses import circle_poses
from signerf_tpu.data.datamanager import SIGNeRFDataManagerConfig
from signerf_tpu.data.dataparser import SIGNeRFDataParserConfig
from signerf_tpu.diffusion.diffuser import Diffuser, DiffuserConfig
from signerf_tpu.engine.optimizers import OptimizersConfig
from signerf_tpu.engine.trainer import SIGNeRFTrainer, SIGNeRFTrainerConfig
from signerf_tpu.generator.datasetgenerator import DatasetGeneratorConfig
from signerf_tpu.models.nerfacto import ProposalNetArgs
from signerf_tpu.models.signerf import SIGNeRFModelConfig
from signerf_tpu.pipeline import SIGNeRFPipelineConfig

H = W = 24
N_CAMS = 4


def write_tiny_dataset(root: Path) -> Path:
    """Synthetic sphere views + nerfstudio transforms.json."""
    from PIL import Image

    root.mkdir(parents=True, exist_ok=True)
    (root / "images").mkdir(exist_ok=True)
    poses = np.asarray(circle_poses(N_CAMS, radius=2.0, theta=70.0, phi=(0.0, 270.0)))
    frames = []
    rng = np.random.RandomState(0)
    for i in range(N_CAMS):
        img = np.full((H, W, 3), 255, np.uint8)
        img[6:18, 6:18] = [200, 60, 60]
        img += rng.randint(0, 5, img.shape).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"frame_{i:05d}.png")
        frames.append(
            {
                "file_path": f"images/frame_{i:05d}.png",
                "transform_matrix": poses[i].tolist(),
            }
        )
    meta = {
        "camera_model": "OPENCV",
        "fl_x": 30.0,
        "fl_y": 30.0,
        "cx": W / 2,
        "cy": H / 2,
        "w": W,
        "h": H,
        "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


def tiny_trainer_config(data_dir: Path, out_dir: Path) -> SIGNeRFTrainerConfig:
    model = SIGNeRFModelConfig(
        num_levels=4,
        log2_hashmap_size=8,
        max_res=64,
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embed_dim=4,
        num_proposal_samples_per_ray=(12, 8),
        num_nerf_samples_per_ray=6,
        proposal_net_args_list=(
            ProposalNetArgs(num_levels=2, log2_hashmap_size=6, max_res=32, hidden_dim=8),
            ProposalNetArgs(num_levels=2, log2_hashmap_size=6, max_res=64, hidden_dim=8),
        ),
        use_lpips=False,
        use_l1=True,
        far_plane=8.0,
        eval_num_rays_per_chunk=256,
    )
    return SIGNeRFTrainerConfig(
        method_name="signerf_test",
        output_dir=out_dir,
        experiment_name="e2e",
        pipeline=SIGNeRFPipelineConfig(
            datamanager=SIGNeRFDataManagerConfig(
                dataparser=SIGNeRFDataParserConfig(data=data_dir),
                train_num_rays_per_batch=64,
                patch_size=1,
            ),
            model=model,
            dataset_generator=DatasetGeneratorConfig(
                path=out_dir / "generations",
                dataset_name="edit0",
                downscale_factor=2,
                rows=2,
                cols=2,
                masking_mode="aabb",
                aabb_min=(-0.4, -0.4, -0.4),
                aabb_max=(0.4, 0.4, 0.4),
                mask_dilation=(3, 3),
                diffuser=DiffuserConfig(mode="custom"),
            ),
        ),
        optimizers=OptimizersConfig(),
        max_num_iterations=8,
        steps_per_call=2,
        steps_per_save=8,
        skip_interface=True,
    )


def fake_diffuse(original, rendered, mask, condition):
    out = np.array(original)
    if mask is not None:
        m = mask[..., 0] > 0.5
        out[m] = [0.2, 0.2, 0.9]
    return out


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    data = write_tiny_dataset(tmp / "data")
    cfg = tiny_trainer_config(data, tmp / "out")
    trainer = SIGNeRFTrainer(cfg)
    diffuser = Diffuser(cfg.pipeline.dataset_generator.diffuser, custom_fn=fake_diffuse)
    trainer.setup(diffuser=diffuser)
    return trainer, tmp


class TestEndToEnd:
    def test_initial_train_steps(self, e2e):
        trainer, _ = e2e
        m0 = trainer.train_iteration()
        for _ in range(3):
            m = trainer.train_iteration()
        assert trainer.step == 8
        assert np.isfinite(float(m["total_loss"]))

    def test_full_headless_flow(self, e2e):
        trainer, tmp = e2e
        # reference poses for a 2x2 grid (3 cameras)
        ref = np.asarray(
            circle_poses(3, radius=2.0, theta=60.0, phi=(0.0, 240.0))
        )[:, :3]
        generated = trainer.generate_dataset(reference_camera_to_worlds=ref)
        assert (generated / "transforms.json").exists()
        t = json.loads((generated / "transforms.json").read_text())
        assert len(t["frames"]) == 3 + N_CAMS  # refs + regenerated views

        trainer.exchange_training_dataset(generated)
        assert trainer.step == 0
        # post-swap training runs on the edited data
        trainer.train()
        assert trainer.training_state == "completed"
        assert trainer.step >= trainer.config.max_num_iterations
        ckpts = list(trainer.checkpoint_dir.glob("step-*.ckpt"))
        assert ckpts, "checkpoints written"

    def test_events_logged(self, e2e):
        trainer, tmp = e2e
        events = trainer.writer.events_path
        assert events.exists()
        lines = events.read_text().strip().split("\n")
        assert len(lines) >= 1
        row = json.loads(lines[-1])
        assert "total_loss" in row or "psnr" in row
