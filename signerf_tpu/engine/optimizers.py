"""Optimizer construction: per-group Adam + exponential-decay schedules.

Capability parity (SURVEY.md §2b "Train engine"): the reference builds three
param groups via nerfstudio optimizers config
(/root/reference/signerf/signerf_config.py:47-60):
  * proposal_networks: Adam(lr=1e-2, eps=1e-15) + ExponentialDecay to 1e-4
    over 200_000 steps
  * fields:            same schedule
  * camera_opt:        Adam(lr=1e-15) — effectively frozen (:57-60)

Implemented with optax: one `optax.multi_transform` keyed by top-level param
subtree, so optimizer state checkpoints/restores with the same surgery rules
as params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import optax


@dataclasses.dataclass
class OptimizerGroupConfig:
    lr: float = 1e-2
    eps: float = 1e-15
    lr_final: Optional[float] = 1e-4
    max_steps: int = 200_000
    warmup_steps: int = 0


@dataclasses.dataclass
class OptimizersConfig:
    """Reference parity: signerf_config.py:47-60."""

    fields: OptimizerGroupConfig = dataclasses.field(
        default_factory=OptimizerGroupConfig
    )
    proposal_networks: OptimizerGroupConfig = dataclasses.field(
        default_factory=OptimizerGroupConfig
    )
    camera_opt: OptimizerGroupConfig = dataclasses.field(
        default_factory=lambda: OptimizerGroupConfig(lr=1e-15, lr_final=None)
    )
    # Weight decay on the per-image appearance embeddings only. Without it
    # the codes drift apart freely (nothing couples them), and eval's
    # *mean*-embedding renders collapse (measured: 10-15 dB eval vs 34 dB
    # train on a perfectly consistent scene). Decay keeps codes near their
    # mean so eval/generation renders stay faithful.
    appearance_weight_decay: float = 0.1
    # Flatten each param group into ONE contiguous vector for the Adam
    # elementwise math. The nerfacto tree has ~150 small leaves (factor
    # tables are [R, 16] — 16 of 128 lanes), so per-leaf Adam lowers to
    # hundreds of tiny padded TPU fusions: measured 4.49 ms of the 11.85 ms
    # optimizer step at the bench regime (TRAIN_BREAKDOWN.json). The fused
    # update runs the same math on one [P] f32 vector per group — bitwise
    # identical updates (Adam is elementwise; see
    # tests/test_engine.py::TestFusedOptimizer).
    fused_update: bool = True


def make_schedule(cfg: OptimizerGroupConfig) -> optax.Schedule:
    if cfg.lr_final is None:
        sched: optax.Schedule = optax.constant_schedule(cfg.lr)
    else:
        sched = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=cfg.max_steps,
            decay_rate=cfg.lr_final / cfg.lr,
            end_value=cfg.lr_final,
        )
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        sched = optax.join_schedules([warmup, sched], [cfg.warmup_steps])
    return sched


def _group_of(top_key: str) -> str:
    if top_key.startswith("proposal"):
        return "proposal_networks"
    if top_key == "camera_opt":
        return "camera_opt"
    return "fields"


def _label_fn(p):
    import jax

    def leaf_label(path, _leaf):
        names = [getattr(x, "key", str(x)) for x in path]
        if "appearance" in names:
            return "appearance"
        return _group_of(names[0])

    return jax.tree_util.tree_map_with_path(leaf_label, p)


def make_optimizer(
    cfg: OptimizersConfig, params: Dict[str, Any]
) -> optax.GradientTransformation:
    """Build the grouped optimizer for a nerfacto-style params dict."""
    if cfg.fused_update:
        return _make_fused_optimizer(cfg, params)

    transforms = {
        name: optax.adam(
            learning_rate=make_schedule(getattr(cfg, name)),
            eps=getattr(cfg, name).eps,
        )
        for name in ("fields", "proposal_networks", "camera_opt")
    }
    transforms["appearance"] = optax.adamw(
        learning_rate=make_schedule(cfg.fields),
        eps=cfg.fields.eps,
        weight_decay=cfg.appearance_weight_decay,
    )
    return optax.multi_transform(transforms, _label_fn)


def _make_fused_optimizer(
    cfg: OptimizersConfig, params: Dict[str, Any]
) -> optax.GradientTransformation:
    """Grouped Adam with each group's elementwise math on ONE flat vector.

    Exact optax semantics per group (`optax.adam` = scale_by_adam(b1=0.9,
    b2=0.999, eps, eps_root=0) then scale by -schedule(pre-increment
    count); `optax.adamw` additionally adds weight_decay * param before the
    lr scale). Flattening is exact: Adam touches each element
    independently, so concatenation order cannot change any update. What
    changes is the lowering — one fusion over a [P] vector per group
    instead of ~150 lane-padded per-leaf fusions (measured 4.49 ms -> the
    flat update is bandwidth-bound on ~3 vectors).

    The state tree is {"groups": {name: {"count", "m", "v"}}} — group names
    align with the checkpoint-surgery boundaries (proposal*/appearance/
    camera_opt), and the trainer re-inits optimizer state on load
    (`_load_initial_checkpoint` restores params only), so old checkpoints
    stay loadable.
    """
    import jax.numpy as jnp
    from jax import tree_util

    b1, b2 = 0.9, 0.999

    labels_tree = _label_fn(params)
    leaves, treedef = tree_util.tree_flatten(params)
    # tree_flatten(labels_tree) yields one label per leaf in leaf order
    # (labels_tree has the same structure with str leaves).
    flat_labels = tree_util.tree_leaves(labels_tree)
    assert len(flat_labels) == len(leaves)

    group_ix = {}
    for i, lab in enumerate(flat_labels):
        group_ix.setdefault(lab, []).append(i)
    meta = {
        g: [(i, leaves[i].size, leaves[i].shape, leaves[i].dtype) for i in ix]
        for g, ix in group_ix.items()
    }

    def _sched_and_eps(group: str):
        src = cfg.fields if group == "appearance" else getattr(cfg, group)
        return make_schedule(src), src.eps

    schedules = {g: _sched_and_eps(g) for g in group_ix}

    def _flatten_group(tree_leaves_list, g):
        parts = [
            tree_leaves_list[i].reshape(-1).astype(jnp.float32)
            for i, _, _, _ in meta[g]
        ]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def init_fn(params):
        del params  # sizes come from meta captured at build time
        groups = {}
        for g in group_ix:
            n = sum(sz for _, sz, _, _ in meta[g])
            groups[g] = {
                "count": jnp.zeros([], jnp.int32),
                "m": jnp.zeros((n,), jnp.float32),
                "v": jnp.zeros((n,), jnp.float32),
            }
        return {"groups": groups}

    def update_fn(grads, state, params=None):
        g_leaves = treedef.flatten_up_to(grads)
        p_leaves = None if params is None else treedef.flatten_up_to(params)
        upd_leaves = [None] * len(g_leaves)
        new_groups = {}
        for g in group_ix:
            st = state["groups"][g]
            vec = _flatten_group(g_leaves, g)
            m = b1 * st["m"] + (1.0 - b1) * vec
            v = b2 * st["v"] + (1.0 - b2) * vec * vec
            cnt = st["count"] + 1
            c = cnt.astype(jnp.float32)
            mhat = m / (1.0 - b1**c)
            vhat = v / (1.0 - b2**c)
            sched, eps = schedules[g]
            u = mhat / (jnp.sqrt(vhat) + eps)
            if g == "appearance" and p_leaves is not None:
                u = u + cfg.appearance_weight_decay * _flatten_group(
                    p_leaves, g
                )
            u = -sched(st["count"]) * u
            off = 0
            for i, sz, shape, dtype in meta[g]:
                upd_leaves[i] = u[off : off + sz].reshape(shape).astype(dtype)
                off += sz
            new_groups[g] = {"count": cnt, "m": m, "v": v}
        updates = treedef.unflatten(upd_leaves)
        return updates, {"groups": new_groups}

    return optax.GradientTransformation(init_fn, update_fn)
