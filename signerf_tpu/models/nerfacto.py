"""Nerfacto model: hash-grid field + proposal sampling + volumetric rendering,
as a pure-functional model over explicit param pytrees.

Capability parity (SURVEY.md §2b "Nerfacto model"): replaces
`nerfstudio.models.nerfacto.NerfactoModel` (reference import at
/root/reference/signerf/signerf.py:12 and signerf_nerfacto_config.py:7).
Outputs consumed by the reference: `rgb`, `depth`
(datasetgenerator.py:700-701), `accumulation`, `weights_list`,
`ray_samples_list` (signerf.py:65-79).

Design (TPU-first): `NerfactoModel` is NOT a linen module — it is a thin
orchestrator holding linen *fields* and exposing pure functions
(`init(rng)` -> params pytree, `apply(params, ray_bundle, ...)` -> outputs).
That makes checkpoint surgery (drop `proposal*`, `appearance`, `camera_opt`
subtrees — signerf_pipeline.py:110-144) a plain dict operation, and lets the
trainer pjit `apply`/`loss` over a device mesh with params replicated and
rays sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from signerf_tpu.cameras.camera_opt import apply_camera_opt, init_camera_opt
from signerf_tpu.cameras.cameras import RayBundle
from signerf_tpu.models import losses as L
from signerf_tpu.models import renderers as R
from signerf_tpu.models.fields import HashMLPDensityField, NerfactoField
from signerf_tpu.models.samplers import proposal_sample, render_weights


@dataclasses.dataclass
class ProposalNetArgs:
    hidden_dim: int = 16
    log2_hashmap_size: int = 17
    num_levels: int = 5
    max_res: int = 128
    use_linear: bool = False


@dataclasses.dataclass
class NerfactoModelConfig:
    """Mirrors the nerfacto knob surface the reference configures
    (signerf_config.py:33-46, signerf_nerfacto_config.py:33-45)."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    appearance_embed_dim: int = 32
    use_appearance_embedding: bool = True
    average_init_density: float = 1.0
    # spatial encoding backend: "factor" (MXU-native, TPU default) or
    # "hash" (instant-ngp parity; gather-bound on TPU) — see
    # ops/factor_grid.py for the measured rationale.
    encoding_backend: str = "factor"
    # Debug escape hatch: False forces the unfused XLA encode+MLP path on
    # TPU (the fused Pallas density kernel is also skipped automatically
    # for configs it doesn't support — fused_density_eligible).
    use_fused_density: bool = True
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: Tuple[ProposalNetArgs, ...] = (
        ProposalNetArgs(max_res=128),
        ProposalNetArgs(max_res=256),
    )
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    single_jitter: bool = True
    predict_normals: bool = False
    use_gradient_normals: bool = True  # only active when predict_normals
    # TPU-fast DEVIATION from nerfstudio 1.0.2 (off by default). When True:
    # gradient normals are stop_gradient'd at creation (deleting the whole
    # reverse pass through the density JVPs / analytic dhat GEMMs — measured
    # 142 -> ~90 ms per signerf train step) and the orientation penalty is
    # applied to the PRED normals (Ref-NeRF-style). When False (default),
    # semantics match the reference exactly: orientation_loss takes the
    # density-gradient normals UNDETACHED (so it regularizes the density
    # field), and only pred_normal_loss sees them detached.
    fast_normals_losses: bool = False
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    orientation_loss_mult: float = 0.0001
    pred_normal_loss_mult: float = 0.001
    use_camera_opt: bool = False
    eval_num_rays_per_chunk: int = 1 << 15  # signerf_config.py:32


class NerfactoModel:
    """Pure-functional nerfacto. Params pytree layout::

        {"field": ..., "proposal_0": ..., "proposal_1": ...[, "camera_opt": ...]}
    """

    def __init__(self, config: NerfactoModelConfig, num_train_images: int):
        self.config = config
        self.num_train_images = num_train_images
        self.field = NerfactoField(
            num_images=num_train_images,
            num_levels=config.num_levels,
            features_per_level=config.features_per_level,
            log2_hashmap_size=config.log2_hashmap_size,
            base_res=config.base_res,
            max_res=config.max_res,
            hidden_dim=config.hidden_dim,
            hidden_dim_color=config.hidden_dim_color,
            appearance_embed_dim=config.appearance_embed_dim,
            use_appearance_embedding=config.use_appearance_embedding,
            predict_normals=config.predict_normals,
            average_init_density=config.average_init_density,
            encoding_backend=config.encoding_backend,
            use_fused_density=config.use_fused_density,
        )
        self.proposal_fields = []
        n_props = config.num_proposal_iterations
        for i in range(n_props):
            args = config.proposal_net_args_list[
                min(i, len(config.proposal_net_args_list) - 1)
            ]
            if config.use_same_proposal_network:
                args = config.proposal_net_args_list[0]
            self.proposal_fields.append(
                HashMLPDensityField(
                    num_levels=args.num_levels,
                    log2_hashmap_size=args.log2_hashmap_size,
                    max_res=args.max_res,
                    hidden_dim=args.hidden_dim,
                    use_linear=args.use_linear,
                    encoding_backend=config.encoding_backend,
                    use_fused_density=config.use_fused_density,
                )
            )

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init(self, rng: jax.Array) -> Dict[str, Any]:
        keys = jax.random.split(rng, 2 + len(self.proposal_fields))
        dummy_pos = jnp.zeros((2, 4, 3))
        dummy_dir = jnp.ones((2, 3)) / jnp.sqrt(3.0)
        dummy_idx = jnp.zeros((2,), jnp.int32)
        params: Dict[str, Any] = {
            "field": self.field.init(
                keys[0], dummy_pos, dummy_dir, dummy_idx, False
            )["params"]
        }
        for i, prop in enumerate(self.proposal_fields):
            if self.config.use_same_proposal_network and i > 0:
                # All levels route to proposal_0 (see _density_fns); a
                # duplicated subtree would silently diverge under its own
                # gradients and bloat checkpoints.
                continue
            params[f"proposal_{i}"] = prop.init(keys[1 + i], dummy_pos)["params"]
        if self.config.use_camera_opt:
            params["camera_opt"] = init_camera_opt(self.num_train_images)
        return params

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def _density_fns(self, params, train: bool = False):
        fns = []
        for i, prop in enumerate(self.proposal_fields):
            key = f"proposal_{0 if self.config.use_same_proposal_network else i}"

            def fn(positions, _prop=prop, _key=key):
                return _prop.apply({"params": params[_key]}, positions, train=train)

            fns.append(fn)
        return fns

    def anneal(self, step: jnp.ndarray | int) -> jnp.ndarray:
        """Proposal-weight annealing factor in [0, 1] -> bias."""
        n = self.config.proposal_weights_anneal_max_num_iters
        train_frac = jnp.clip(jnp.asarray(step, jnp.float32) / n, 0.0, 1.0)
        slope = self.config.proposal_weights_anneal_slope

        def bias(x, b):
            return b * x / ((b - 1.0) * x + 1.0)

        return bias(train_frac, slope)

    def apply(
        self,
        params: Dict[str, Any],
        ray_bundle: RayBundle,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        anneal: float | jnp.ndarray = 1.0,
        appearance_mode: Optional[str] = None,  # None=auto | index|mean|zero
    ) -> Dict[str, Any]:
        """Forward pass over a flat ray batch [R]."""
        cfg = self.config
        origins = ray_bundle.origins
        directions = ray_bundle.directions
        cam_idx = (
            ray_bundle.camera_indices[..., 0]
            if ray_bundle.camera_indices is not None
            else None
        )
        if cfg.use_camera_opt and "camera_opt" in params and train and cam_idx is not None:
            origins, directions = apply_camera_opt(
                params["camera_opt"], origins, directions, cam_idx
            )
        num_rays = origins.shape[0]
        nears = (
            ray_bundle.nears
            if ray_bundle.nears is not None
            else jnp.full((num_rays, 1), cfg.near_plane, origins.dtype)
        )
        fars = (
            ray_bundle.fars
            if ray_bundle.fars is not None
            else jnp.full((num_rays, 1), cfg.far_plane, origins.dtype)
        )
        bundle = RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=ray_bundle.pixel_area,
            camera_indices=ray_bundle.camera_indices,
            nears=jnp.maximum(nears, cfg.near_plane),
            fars=jnp.minimum(fars, cfg.far_plane),
        )

        samples, weights_list, samples_list = proposal_sample(
            rng,
            bundle,
            self._density_fns(params, train=train),
            num_proposal_samples=cfg.num_proposal_samples_per_ray,
            num_nerf_samples=cfg.num_nerf_samples_per_ray,
            single_jitter=cfg.single_jitter,
            anneal=anneal,
        )

        positions = samples.positions  # [R, S, 3]
        grad: Optional[jnp.ndarray] = None
        if (
            cfg.predict_normals
            and cfg.use_gradient_normals
            and cfg.encoding_backend == "factor"
        ):
            # Analytic density gradient (dhat-matrix GEMMs) — one shared
            # primal, no autodiff through the encode; the color head runs
            # over the precomputed (density, geo).
            from signerf_tpu.models.fields import factor_density_geo_and_grad

            density, geo, grad = factor_density_geo_and_grad(
                params["field"],
                positions,
                self.field,
                # Reference orientation-loss semantics backprop through the
                # gradient normals into the encoding — needs the
                # differentiable XLA dhat path during training.
                differentiable_grad=train and not cfg.fast_normals_losses,
            )
            field_out = self.field.apply(
                {"params": params["field"]},
                density,
                geo,
                directions,
                cam_idx,
                train,
                appearance_mode,
                method="head_only",
            )
            field_out["density"] = density
        else:
            field_out = self.field.apply(
                {"params": params["field"]},
                positions,
                directions,
                cam_idx,
                train,
                appearance_mode,
            )
        density = field_out["density"]  # [R, S]
        weights = render_weights(density, samples.deltas)

        outputs: Dict[str, Any] = {
            "rgb": R.render_rgb(weights, field_out["rgb"], cfg.background_color),
            "accumulation": R.render_accumulation(weights),
            "depth": R.render_depth_median(weights, samples.starts, samples.ends),
            "expected_depth": R.render_depth_expected(
                weights, samples.starts, samples.ends
            ),
            "weights": weights,
            "ray_samples": samples,
            "weights_list": weights_list,
            "ray_samples_list": samples_list,
            "directions": directions,
        }

        if cfg.predict_normals:
            outputs["pred_normals_samples"] = field_out["pred_normals"]
            outputs["pred_normals"] = R.render_normals(
                weights, field_out["pred_normals"]
            )
            if cfg.use_gradient_normals:
                if grad is None:
                    # Non-factor backends: three unrolled forward-mode JVPs
                    # through the density. (jax.grad would make the training
                    # loss reverse-over-REVERSE — measured ~2x the whole
                    # step; vmapping the JVPs triples retained residuals and
                    # OOMs at the signerf batch size.)
                    def density_fn(p):
                        d, _ = self.field.apply(
                            {"params": params["field"]}, p, method="density"
                        )
                        return d

                    eye = jnp.eye(3, dtype=positions.dtype)
                    grad = jnp.stack(
                        [
                            jax.jvp(
                                density_fn,
                                (positions,),
                                (jnp.broadcast_to(eye[i], positions.shape),),
                            )[1]
                            for i in range(3)
                        ],
                        axis=-1,
                    )  # [R, S, 3]
                # nerfstudio-1.0.2 parity (consumed via rendered_*_loss at
                # /root/reference/signerf/signerf.py:65-79): gradient normals
                # stay DIFFERENTIABLE here — orientation_loss backprops
                # through them into the density field; pred_normal_loss
                # detaches them at its use site. fast_normals_losses=True
                # instead detaches at creation, letting XLA drop the whole
                # reverse pass through the analytic dhat GEMMs (measured
                # 142 -> ~90 ms per signerf step) at the cost of diverging
                # from reference loss semantics. sqrt(sum^2 + eps) keeps the
                # norm's fwd value finite at grad=0.
                if cfg.fast_normals_losses:
                    grad = jax.lax.stop_gradient(grad)
                n = -grad / jnp.sqrt(
                    jnp.sum(grad * grad, axis=-1, keepdims=True) + 1e-12
                )
                outputs["normals_samples"] = n
                outputs["normals"] = R.render_normals(weights, n)
        return outputs

    # ------------------------------------------------------------------
    # losses / metrics
    # ------------------------------------------------------------------

    def loss_dict(
        self,
        outputs: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        target = batch["image"]  # [R, 3]
        loss: Dict[str, jnp.ndarray] = {
            "rgb_loss": L.mse_loss(outputs["rgb"], target)
        }
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
                loss.update(self.normals_losses(outputs))
        return loss

    def normals_losses(self, outputs: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Orientation + predicted-normal losses, shared by nerfacto/signerf.

        Reference semantics (nerfstudio 1.0.2 NerfactoModel.get_loss_dict,
        inherited by /root/reference/signerf/signerf.py:64-81): both losses
        take DETACHED weights; orientation_loss penalizes the density-
        gradient normals UNDETACHED (gradient flows into the density field);
        pred_normal_loss detaches the gradient normals and trains only the
        pred-normal head. fast_normals_losses=True is the documented TPU
        deviation: normals_samples were stopped at creation, so the
        orientation penalty is applied to PRED normals instead (Ref-NeRF
        style) — otherwise it would carry no gradient at all.
        """
        cfg = self.config
        w_sg = jax.lax.stop_gradient(outputs["weights"])
        orient_normals = (
            outputs["pred_normals_samples"]
            if cfg.fast_normals_losses
            else outputs["normals_samples"]
        )
        return {
            "orientation_loss": cfg.orientation_loss_mult
            * L.orientation_loss(w_sg, orient_normals, outputs["directions"]),
            "pred_normal_loss": cfg.pred_normal_loss_mult
            * L.pred_normal_loss(
                w_sg,
                jax.lax.stop_gradient(outputs["normals_samples"]),
                outputs["pred_normals_samples"],
            ),
        }

    def metrics_dict(self, outputs, batch) -> Dict[str, jnp.ndarray]:
        return {"psnr": L.psnr(outputs["rgb"], batch["image"])}
