"""Image metrics + eval CLI tests."""

import json

import pytest

import jax.numpy as jnp
import numpy as np

from signerf_tpu.eval import main as eval_main
from signerf_tpu.ops.image_metrics import psnr, ssim
from tests.test_pipeline_e2e import write_tiny_dataset


class TestMetrics:
    def test_psnr_identity_and_known(self):
        x = jnp.full((16, 16, 3), 0.5)
        assert float(psnr(x, x)) > 100
        y = x + 0.1
        np.testing.assert_allclose(float(psnr(x, y)), 20.0, atol=0.01)

    def test_ssim_identity_is_one(self):
        import jax

        x = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)

    def test_ssim_decreases_with_noise(self):
        import jax

        x = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        n = jax.random.normal(jax.random.PRNGKey(1), x.shape)
        s1 = float(ssim(x, jnp.clip(x + 0.05 * n, 0, 1)))
        s2 = float(ssim(x, jnp.clip(x + 0.3 * n, 0, 1)))
        assert 1.0 > s1 > s2


class TestEvalCLI:
    @pytest.mark.slow
    def test_eval_dataset(self, tmp_path):
        data = write_tiny_dataset(tmp_path / "data")
        out = tmp_path / "eval.json"
        rc = eval_main(
            [
                "--data", str(data),
                "--output", str(out),
                "--model.num-levels", "2",
                "--model.max-res", "32",
                "--model.hidden-dim", "8",
                "--model.hidden-dim-color", "8",
                "--model.num-proposal-samples-per-ray", "[8, 6]",
                "--model.num-nerf-samples-per-ray", "4",
            ]
        )
        assert rc == 0
        summary = json.loads(out.read_text())
        from tests.test_pipeline_e2e import N_CAMS
        assert summary["num_images"] == N_CAMS
        assert "psnr" in summary and "ssim" in summary
        assert len(summary["per_image"]) == N_CAMS
