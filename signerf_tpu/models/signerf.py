"""SIGNeRF model: nerfacto with L1 rgb loss + LPIPS patch loss.

Capability parity: /root/reference/signerf/signerf.py:14-82 —
`SIGNeRFModelConfig(NerfactoModelConfig)` adds `use_lpips`, `use_l1`,
`patch_size=32`, `lpips_loss_mult=1.0` (:14-26); `get_loss_dict` swaps the
rgb loss to L1 (:35-38, configurable MSE), adds LPIPS over patch_size^2
patches normalized to [-1, 1] and clamped (:49-62), and keeps the inherited
interlevel / distortion / orientation / pred-normal losses while training
(:64-81).

The LPIPS module runs in-process and in-jit (signerf_tpu.ops.lpips), so the
patch loss fuses into the same training step as everything else.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from signerf_tpu.models import losses as L
from signerf_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from signerf_tpu.ops.lpips import LPIPSParams, init_lpips, load_weights, lpips


@dataclasses.dataclass
class SIGNeRFModelConfig(NerfactoModelConfig):
    """Parity: signerf.py:14-26 + signerf_config.py:33-41 defaults."""

    use_lpips: bool = True
    use_l1: bool = True
    patch_size: int = 32
    lpips_loss_mult: float = 1.0
    lpips_net: str = "alex"
    lpips_weights_path: Optional[str] = None  # .npz export; random init if None


class SIGNeRFModel(NerfactoModel):
    """Nerfacto with SIGNeRF's refinement losses.

    LPIPS parameters are frozen (not part of the trainable pytree) and held
    on the model object, mirroring the reference where the torchmetrics
    module is excluded from checkpoints (`ip2p.` filter,
    signerf_trainer.py:289).
    """

    config: SIGNeRFModelConfig

    def __init__(self, config: SIGNeRFModelConfig, num_train_images: int):
        super().__init__(config, num_train_images)
        if config.use_lpips:
            if config.lpips_weights_path:
                self.lpips_params: Optional[LPIPSParams] = load_weights(
                    config.lpips_weights_path, config.lpips_net
                )
            else:
                from signerf_tpu.utils.calibration import warn_uncalibrated

                warn_uncalibrated(
                    "LPIPS",
                    "the logged 'lpips_loss' is a random-feature perceptual "
                    "distance, NOT calibrated LPIPS. Export real weights to "
                    ".npz (scripts/export_lpips_weights.py) and set "
                    "lpips_weights_path.",
                )
                self.lpips_params = init_lpips(
                    jax.random.PRNGKey(0), config.lpips_net
                )
        else:
            self.lpips_params = None

    def loss_dict(
        self,
        outputs: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        target = batch["image"]  # [R, 3]
        pred = outputs["rgb"]

        loss: Dict[str, jnp.ndarray] = {}
        if cfg.use_l1:
            loss["rgb_loss"] = L.l1_loss(pred, target)
        else:
            loss["rgb_loss"] = L.mse_loss(pred, target)

        if cfg.use_lpips and self.lpips_params is not None:
            ps = cfg.patch_size
            out_p = jnp.clip(
                pred.reshape(-1, ps, ps, 3) * 2.0 - 1.0, -1.0, 1.0
            )
            gt_p = jnp.clip(
                target.reshape(-1, ps, ps, 3) * 2.0 - 1.0, -1.0, 1.0
            )
            loss["lpips_loss"] = cfg.lpips_loss_mult * jnp.mean(
                lpips(self.lpips_params, out_p, gt_p)
            )

        if train:
            loss["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
                outputs["weights_list"],
                outputs["ray_samples_list"],
                outputs["weights"],
                outputs["ray_samples"],
            )
            loss["distortion_loss"] = cfg.distortion_loss_mult * L.distortion_loss(
                outputs["weights"], outputs["ray_samples"]
            )
            if cfg.predict_normals and "normals_samples" in outputs:
                # shared with nerfacto: detached weights, reference detach
                # points (signerf.py:64-81 inherits them unchanged).
                loss.update(self.normals_losses(outputs))
        return loss
