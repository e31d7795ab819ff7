"""The jitted/sharded training step: on-device pixel sampling -> ray
generation -> model forward -> losses -> grads -> optimizer update.

Capability parity (SURVEY.md §3.4 hot loop): replaces the reference's
`Trainer.train` iteration — mp-queue ray batches (signerf_datamanager.py:148-179),
nerfacto forward, `SIGNeRFModel.get_loss_dict` (signerf.py:41-82), Adam steps
with AMP grad scaler (signerf_config.py:23).

TPU-first design:
  * The *entire* data path lives on device: images sit in HBM as uint8, pixel
    or patch indices are sampled with the TPU PRNG, rays are generated in-jit.
    There is no host round-trip and no mp queue at all.
  * `steps_per_call` chains multiple optimizer steps in one dispatch via
    `lax.scan`, amortizing host->device latency (critical when the host link
    is thin — and free speedup anyway).
  * Multi-chip: `shard_map` over a 1-D "data" mesh; every device samples its
    own ray sub-batch (PRNG folded by axis index), computes local grads, and
    `psum` merges — the canonical DP recipe, collectives riding ICI.
  * bf16 compute happens inside the model; grads/optimizer are fp32, which is
    the TPU replacement for the reference's CUDA AMP grad scaler (bf16 needs
    no loss scaling).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.data.pixel_samplers import (
    gather_pixels,
    sample_patches,
    sample_pixels,
    sample_pixels_masked,
)


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation):
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


@dataclasses.dataclass
class SamplerSettings:
    """Static sampling knobs (shapes must be compile-time constants)."""

    num_rays: int = 4096
    """GLOBAL ray batch per optimizer step (reference semantics:
    train_num_rays_per_batch, signerf_config.py:27). With a mesh,
    make_train_step divides this across the data axis so a v5e-8 run
    trains with the same effective batch as a single chip."""
    patch_size: int = 1  # >1 -> patch sampling (signerf: 32)
    use_mask: bool = False  # mask present -> plain sampling (reference rule)
    micro_batches: int = 1
    """Gradient-accumulation splits per optimizer step. Large ray batches
    (signerf: 16384) blow past v5e HBM headroom and force XLA into
    spill/remat — measured 71k rays/s at 16384 monolithic vs 317k at 4096.
    M sequential micro-batches keep transients 1/M. Gradients are exact
    (equal-size micro-means average to the global mean) for the
    deterministic parts of the model; the per-forward rng is folded per
    micro-batch, so rng-driven stochasticity (proposal jitter) takes
    different — equally valid — draws than the monolithic step."""


def _sample_indices(
    key: jax.Array,
    settings: SamplerSettings,
    num_images: int,
    height: int,
    width: int,
    mask_indices: Optional[jnp.ndarray],
) -> jnp.ndarray:
    # Reference rule (signerf_patch_pixel_sampler.py:53-57): masks force
    # plain pixel sampling even when patch_size > 1.
    if settings.use_mask and mask_indices is not None:
        return sample_pixels_masked(key, settings.num_rays, mask_indices)
    if settings.patch_size > 1:
        return sample_patches(
            key, settings.num_rays, settings.patch_size, num_images, height, width
        )
    return sample_pixels(key, settings.num_rays, num_images, height, width)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    cameras: Cameras,
    settings: SamplerSettings,
    loss_fn: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    steps_per_call: int = 1,
    donate: bool = True,
):
    """Build the jitted train function.

    Returns ``fn(state, images_u8, mask_indices, key) -> (state, metrics)``
    where ``images_u8`` is [N, H, W, 3] uint8 on device and ``metrics`` is a
    dict of scalars averaged over the inner steps.

    ``loss_fn(model, params, outputs, batch) -> (total, dict)`` defaults to
    summing ``model.loss_dict``.
    """
    num_images = len(cameras)
    height, width = cameras.height, cameras.width

    if mesh is not None:
        # settings.num_rays is the GLOBAL batch: each device samples
        # num_rays / n_dev and pmean merges grads, so the effective batch
        # matches a single-device run (reference hyperparameters are tuned
        # for 16,384 global rays, signerf_config.py:27). Micro-batching
        # shrinks by the same factor — per-device transients already
        # dropped by n_dev, keeping each micro-step at the same ray count.
        #
        # NeRF training has no tensor parallelism, so DP spans EVERY mesh
        # axis: on the production ("data", "tensor") edit-pass mesh
        # (parallel/mesh.py:production_mesh) all data*tensor devices train
        # independent ray sub-batches — the "tensor" axis only means
        # something to the SDXL phase.
        mesh_axes = tuple(mesh.axis_names)
        n_dev = int(np.prod([mesh.shape[a] for a in mesh_axes]))
        assert settings.num_rays % n_dev == 0, (
            f"global num_rays={settings.num_rays} must be divisible by "
            f"mesh device count {n_dev} (axes {mesh.shape})"
        )
        settings = dataclasses.replace(
            settings,
            num_rays=settings.num_rays // n_dev,
            micro_batches=max(1, settings.micro_batches // n_dev),
        )

    if loss_fn is None:

        def loss_fn(mdl, params, outputs, batch):
            ld = mdl.loss_dict(outputs, batch)
            return sum(jax.tree_util.tree_leaves(ld)), ld

    micro = max(1, int(settings.micro_batches))
    assert settings.num_rays % micro == 0, (settings.num_rays, micro)
    rays_per_patch = settings.patch_size * settings.patch_size
    if settings.patch_size > 1 and not settings.use_mask:
        assert (settings.num_rays // micro) % rays_per_patch == 0, (
            "micro-batches must hold whole patches (LPIPS is patch-local)"
        )

    def single_step(params, opt_state, step, images_u8, mask_indices, key):
        k_pix, k_model = jax.random.split(key)
        idx = _sample_indices(
            k_pix, settings, num_images, height, width, mask_indices
        )
        rb = cameras.generate_rays_at(idx)
        target = gather_pixels(images_u8, idx).astype(jnp.float32) / 255.0
        anneal = model.anneal(step)

        def compute_loss(p, rb, target, idx, k_model):
            outputs = model.apply(p, rb, rng=k_model, train=True, anneal=anneal)
            total, ld = loss_fn(model, p, outputs, {"image": target, "indices": idx})
            return total, (ld, outputs)

        if micro == 1:
            (total, (ld, outputs)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(params, rb, target, idx, k_model)
            mse = jnp.mean((outputs["rgb"] - target) ** 2)
        else:
            # Gradient accumulation: lax.scan serializes the micro-batches,
            # so XLA's live transients cover only num_rays/micro rays.
            split = lambda x: x.reshape(micro, -1, *x.shape[1:])
            rb_m = jax.tree_util.tree_map(split, rb)
            tgt_m = split(target)
            idx_m = split(idx)

            def micro_body(carry, xs):
                gsum, tsum, ldsum, msesum, i = carry
                rb_i, tg_i, ix_i = xs
                (tot, (ld, outputs)), g = jax.value_and_grad(
                    compute_loss, has_aux=True
                )(params, rb_i, tg_i, ix_i, jax.random.fold_in(k_model, i))
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
                ldsum = jax.tree_util.tree_map(jnp.add, ldsum, ld)
                mse_i = jnp.mean((outputs["rgb"] - tg_i) ** 2)
                return (gsum, tsum + tot, ldsum, msesum + mse_i, i + 1), ()

            zeros_like_tree = lambda t: jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, x.dtype), t
            )
            g0 = zeros_like_tree(params)
            # trace once to get loss-dict structure for the accumulator
            _, (ld_struct, _) = jax.eval_shape(
                lambda p: compute_loss(
                    p,
                    jax.tree_util.tree_map(lambda x: x[0], rb_m),
                    tgt_m[0],
                    idx_m[0],
                    k_model,
                ),
                params,
            )
            ld0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), ld_struct
            )
            (gsum, tsum, ldsum, msesum, _), _ = jax.lax.scan(
                micro_body,
                (g0, jnp.zeros(()), ld0, jnp.zeros(()), jnp.zeros((), jnp.int32)),
                (rb_m, tgt_m, idx_m),
            )
            inv = 1.0 / micro
            grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
            total = tsum * inv
            ld = jax.tree_util.tree_map(lambda x: x * inv, ldsum)
            mse = msesum * inv
        # Proposal update throttling (nerfacto parity: update every step
        # during warmup, then every `proposal_update_every` steps).
        mcfg = getattr(model, "config", None)
        if mcfg is not None and getattr(mcfg, "proposal_update_every", 1) > 1:
            gate = (
                (step < mcfg.proposal_warmup)
                | (step % mcfg.proposal_update_every == 0)
            ).astype(jnp.float32)
            for key_name in list(grads.keys()):
                if key_name.startswith("proposal"):
                    grads[key_name] = jax.tree_util.tree_map(
                        lambda g: g * gate, grads[key_name]
                    )
        if mesh is not None:
            grads = jax.lax.pmean(grads, mesh_axes)
            total = jax.lax.pmean(total, mesh_axes)
            ld = jax.lax.pmean(ld, mesh_axes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(ld)
        metrics["total_loss"] = total
        if mesh is not None:
            mse = jax.lax.pmean(mse, mesh_axes)
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
        return params, opt_state, metrics

    def multi_step(state: TrainState, images_u8, mask_indices, key):
        if mesh is not None:
            # Decorrelate per-device sampling (linear index over ALL axes).
            key = jax.random.fold_in(key, jax.lax.axis_index(mesh_axes))

        def body(carry, i):
            params, opt_state, step = carry
            k = jax.random.fold_in(key, i)
            params, opt_state, metrics = single_step(
                params, opt_state, step, images_u8, mask_indices, k
            )
            return (params, opt_state, step + 1), metrics

        (params, opt_state, step), metrics = jax.lax.scan(
            body,
            (state.params, state.opt_state, state.step),
            jnp.arange(steps_per_call),
        )
        metrics = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return TrainState(params=params, opt_state=opt_state, step=step), metrics

    if mesh is None:
        return jax.jit(multi_step, donate_argnums=(0,) if donate else ())

    # shard_map: params/images replicated, collectives explicit.
    repl = P()
    sharded = jax.shard_map(
        multi_step,
        mesh=mesh,
        in_specs=(repl, repl, repl, repl),
        out_specs=(repl, repl),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_render(
    model,
    chunk_size: int = 1 << 15,
    mesh: Optional[Mesh] = None,
):
    """Chunked full-image renderer (parity:
    `get_outputs_for_camera_ray_bundle`, eval_num_rays_per_chunk=1<<15,
    /root/reference/signerf/signerf_config.py:32, datasetgenerator.py:694).

    Returns ``render(params, ray_bundle_flat) -> outputs`` where the flat
    bundle is padded to a chunk multiple and processed by `lax.map` over
    chunks (static shapes, single compile). With ``mesh``, rays shard over
    ALL mesh axes (params replicated) — rendering, like training, is pure
    DP, so the production ("data", "tensor") mesh renders full frames over
    every device, ~linearly over ICI.
    """
    mesh_axes = tuple(mesh.axis_names) if mesh is not None else ()
    n_shards = (
        int(np.prod([mesh.shape[a] for a in mesh_axes])) if mesh is not None else 1
    )

    @functools.partial(
        jax.jit, static_argnames=("num_rays", "appearance_mode")
    )
    def _render_padded(params, bundle, num_rays: int, appearance_mode):
        def render_chunks(p, chunked_local):
            def chunk_fn(c):
                out = model.apply(
                    p, c, train=False, appearance_mode=appearance_mode
                )
                return {
                    "rgb": out["rgb"],
                    "depth": out["depth"],
                    "expected_depth": out["expected_depth"],
                    "accumulation": out["accumulation"],
                }

            return jax.lax.map(chunk_fn, chunked_local)

        num_chunks = num_rays // chunk_size
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape(num_chunks, chunk_size, *x.shape[1:]), bundle
        )
        if mesh is None:
            return render_chunks(params, chunked)

        return jax.shard_map(
            render_chunks,
            mesh=mesh,
            in_specs=(
                P(),
                jax.tree_util.tree_map(lambda _: P(mesh_axes), chunked),
            ),
            out_specs=P(mesh_axes),
            check_vma=False,
        )(params, chunked)

    def render(params, bundle_flat, appearance_mode=None):
        n = bundle_flat.origins.shape[0]
        quantum = chunk_size * n_shards
        padded_n = ((n + quantum - 1) // quantum) * quantum
        pad = padded_n - n
        bundle = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
            if pad
            else x,
            bundle_flat,
        )
        out = _render_padded(params, bundle, padded_n, appearance_mode)
        out = jax.tree_util.tree_map(
            lambda x: x.reshape(padded_n, *x.shape[2:])[:n], out
        )
        return out

    return render
