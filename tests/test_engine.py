"""Engine tests: optimizer groups, train step (single + 8-device mesh),
checkpoint surgery. SURVEY.md §4(d): multi-chip on CPU via device-count
override."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signerf_tpu.cameras.cameras import Cameras
from signerf_tpu.engine.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    strip_appearance_and_camera_opt,
    strip_proposals,
    surgical_restore,
)
from signerf_tpu.engine.optimizers import (
    OptimizerGroupConfig,
    OptimizersConfig,
    make_optimizer,
    make_schedule,
)
from signerf_tpu.engine.train_step import (
    SamplerSettings,
    TrainState,
    make_eval_render,
    make_train_step,
)
from signerf_tpu.models.nerfacto import NerfactoModel
from signerf_tpu.parallel import get_mesh, replicate
from tests.test_nerfacto_core import tiny_config


def fresh(params):
    """Deep-copy params so donated train states can't delete fixture arrays."""
    return jax.tree_util.tree_map(jnp.copy, params)


@pytest.fixture(scope="module")
def setup():
    model = NerfactoModel(tiny_config(), num_train_images=2)
    params = model.init(jax.random.PRNGKey(0))
    H = W = 16
    cams = Cameras(
        camera_to_worlds=jnp.tile(
            jnp.eye(4)[None, :3, :], (2, 1, 1)
        ).at[:, 2, 3].set(2.0),
        fx=jnp.full((2,), 20.0),
        fy=jnp.full((2,), 20.0),
        cx=jnp.full((2,), W / 2),
        cy=jnp.full((2,), H / 2),
        width=W,
        height=H,
    )
    # Smooth, learnable targets (per-pixel random noise saturates the loss
    # immediately and makes trend assertions flaky).
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    grad_img = jnp.stack(
        [xx / W, yy / H, jnp.full_like(xx, 0.5, dtype=jnp.float32)], -1
    )
    images = (
        jnp.stack([grad_img, 1.0 - grad_img]) * 255
    ).astype(jnp.uint8)
    return model, params, cams, images


class TestFusedOptimizer:
    """The flat-group fused update must reproduce optax multi_transform
    exactly (Adam is elementwise, so flattening cannot change any update)."""

    def _tree(self):
        k = jax.random.PRNGKey(11)
        ks = jax.random.split(k, 8)
        return {
            "field": {
                "lines": {
                    f"l{i}": jax.random.normal(ks[i], (17 + 3 * i, 16))
                    for i in range(3)
                },
                "appearance": {"embedding": jax.random.normal(ks[3], (5, 8))},
                "mlp": {"w": jax.random.normal(ks[4], (16, 8))},
            },
            "proposal_0": {"w": jax.random.normal(ks[5], (9, 4))},
            "proposal_1": {"w": jax.random.normal(ks[6], (7, 4))},
            "camera_opt": {"pose": jax.random.normal(ks[7], (5, 6)) * 0.01},
        }

    def test_matches_multi_transform(self):
        params = self._tree()
        cfg_ref = OptimizersConfig(fused_update=False)
        cfg_fused = OptimizersConfig(fused_update=True)
        opt_ref = make_optimizer(cfg_ref, params)
        opt_fused = make_optimizer(cfg_fused, params)
        s_ref = opt_ref.init(params)
        s_fused = opt_fused.init(params)
        p_ref = jax.tree_util.tree_map(jnp.copy, params)
        p_fused = jax.tree_util.tree_map(jnp.copy, params)
        key = jax.random.PRNGKey(0)
        for step in range(4):
            grads = jax.tree_util.tree_map(
                lambda p: jax.random.normal(
                    jax.random.fold_in(key, step), p.shape
                ),
                p_ref,
            )
            u_ref, s_ref = opt_ref.update(grads, s_ref, p_ref)
            u_fused, s_fused = opt_fused.update(grads, s_fused, p_fused)
            for path_u, (a, b) in zip(
                jax.tree_util.tree_leaves_with_path(u_ref),
                zip(
                    jax.tree_util.tree_leaves(u_ref),
                    jax.tree_util.tree_leaves(u_fused),
                ),
            ):
                np.testing.assert_allclose(
                    np.asarray(a),
                    np.asarray(b),
                    rtol=1e-6,
                    atol=1e-9,
                    err_msg=str(path_u[0]),
                )
            import optax

            p_ref = optax.apply_updates(p_ref, u_ref)
            p_fused = optax.apply_updates(p_fused, u_fused)

    def test_state_groups_align_with_surgery(self):
        params = self._tree()
        opt = make_optimizer(OptimizersConfig(), params)
        state = opt.init(params)
        assert set(state["groups"]) == {
            "fields",
            "proposal_networks",
            "camera_opt",
            "appearance",
        }


class TestSchedules:
    def test_exponential_decay_endpoints(self):
        cfg = OptimizerGroupConfig(lr=1e-2, lr_final=1e-4, max_steps=1000)
        s = make_schedule(cfg)
        np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(s(1000)), 1e-4, rtol=1e-3)

    def test_optimizer_group_routing(self, setup):
        model, params, _, _ = setup
        opt = make_optimizer(OptimizersConfig(), params)
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        # fields and proposal get real updates
        f_leaf = jax.tree_util.tree_leaves(updates["field"])[0]
        p_leaf = jax.tree_util.tree_leaves(updates["proposal_0"])[0]
        assert float(jnp.abs(f_leaf).max()) > 1e-6
        assert float(jnp.abs(p_leaf).max()) > 1e-6


class TestTrainStep:
    @pytest.mark.slow
    def test_single_device_loss_decreases(self, setup):
        model, params, cams, images = setup
        opt = make_optimizer(OptimizersConfig(), params)
        step_fn = make_train_step(
            model, opt, cams, SamplerSettings(num_rays=64), steps_per_call=4
        )
        state = TrainState.create(fresh(params), opt)
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(8):
            state, m = step_fn(state, images, None, jax.random.fold_in(key, i))
            losses.append(float(m["total_loss"]))
        assert int(state.step) == 32
        # trend check (single-batch losses are noisy): late avg < early avg
        assert np.mean(losses[-3:]) < np.mean(losses[:3])
        assert all(np.isfinite(l) for l in losses)

    def test_micro_batched_grads_match_monolithic(self, setup):
        """Gradient accumulation (SamplerSettings.micro_batches) must be an
        exact refactor of the monolithic step for an rng-independent model:
        same key -> same sampled rays -> same averaged grads/metrics."""
        _, _, cams, images = setup

        class DummyModel:
            """Deterministic toy 'field': rgb = sigmoid(W @ dir)."""

            def init(self, rng):
                return {"field": {"w": jax.random.normal(rng, (3, 3)) * 0.1}}

            def anneal(self, step):
                return 1.0

            def apply(self, params, rb, rng=None, train=False, anneal=1.0):
                rgb = jax.nn.sigmoid(rb.directions @ params["field"]["w"])
                return {"rgb": rgb}

            def loss_dict(self, outputs, batch):
                return {
                    "rgb_loss": jnp.mean(
                        jnp.abs(outputs["rgb"] - batch["image"])
                    )
                }

        model = DummyModel()
        params = model.init(jax.random.PRNGKey(3))
        opt = make_optimizer(OptimizersConfig(), params)
        key = jax.random.PRNGKey(7)
        results = []
        for micro in (1, 4):
            fn = make_train_step(
                model, opt, cams,
                SamplerSettings(num_rays=64, micro_batches=micro),
                steps_per_call=2, donate=False,
            )
            state = TrainState.create(fresh(params), opt)
            state, m = fn(state, images, None, key)
            results.append((state.params, m))
        (p1, m1), (p4, m4) = results
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(
            float(m1["total_loss"]), float(m4["total_loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m1["psnr"]), float(m4["psnr"]), rtol=1e-4
        )

    @pytest.mark.slow
    def test_micro_batched_nerfacto_step_runs(self, setup):
        model, params, cams, images = setup
        opt = make_optimizer(OptimizersConfig(), params)
        step_fn = make_train_step(
            model, opt, cams,
            SamplerSettings(num_rays=64, patch_size=4, micro_batches=2),
            steps_per_call=2,
        )
        state = TrainState.create(fresh(params), opt)
        state, m = step_fn(state, images, None, jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(m["total_loss"]))
        assert int(state.step) == 2

    @pytest.mark.slow
    def test_patch_sampling_step(self, setup):
        model, params, cams, images = setup
        opt = make_optimizer(OptimizersConfig(), params)
        step_fn = make_train_step(
            model,
            opt,
            cams,
            SamplerSettings(num_rays=64, patch_size=4),
            steps_per_call=1,
        )
        state = TrainState.create(fresh(params), opt)
        state, m = step_fn(state, images, None, jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(m["total_loss"]))

    @pytest.mark.slow
    def test_mesh_train_step_matches_metrics_shape(self, setup):
        model, params, cams, images = setup
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = get_mesh(8)
        opt = make_optimizer(OptimizersConfig(), params)
        step_fn = make_train_step(
            model,
            opt,
            cams,
            SamplerSettings(num_rays=32),
            mesh=mesh,
            steps_per_call=2,
        )
        state = TrainState.create(fresh(params), opt)
        state = replicate(state, mesh)
        images_r = replicate(images, mesh)
        state, m = step_fn(state, images_r, None, jax.random.PRNGKey(0))
        assert int(state.step) == 2
        assert bool(jnp.isfinite(m["total_loss"]))
        # params stay replicated and identical across devices
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_global_batch_divided_across_mesh(self, setup):
        """settings.num_rays is the GLOBAL batch: an 8-device run must train
        with the same effective batch as single-device (VERDICT r1 weak #3 —
        reference hyperparameters assume 16,384 global rays,
        /root/reference/signerf/signerf_config.py:27). Same global batch +
        same lr -> statistically matching loss trajectories."""
        model, params, cams, images = setup
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        opt = make_optimizer(OptimizersConfig(), params)
        key = jax.random.PRNGKey(7)

        def run(mesh):
            fn = make_train_step(
                model,
                opt,
                cams,
                SamplerSettings(num_rays=128),
                mesh=mesh,
                steps_per_call=10,
            )
            state = TrainState.create(fresh(params), opt)
            if mesh is not None:
                state = replicate(state, mesh)
                imgs = replicate(images, mesh)
            else:
                imgs = images
            losses = []
            for i in range(3):
                state, m = fn(state, imgs, None, jax.random.fold_in(key, i))
                losses.append(float(m["total_loss"]))
            return losses

        l1 = run(None)
        l8 = run(get_mesh(8))
        assert all(np.isfinite(l) for l in l1 + l8)
        # both descend and land in the same regime (same effective batch)
        assert l1[-1] < l1[0] and l8[-1] < l8[0]
        assert abs(l8[-1] - l1[-1]) / max(l1[-1], 1e-6) < 0.35, (l1, l8)

    def test_mesh_requires_divisible_global_batch(self, setup):
        model, params, cams, _ = setup
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        opt = make_optimizer(OptimizersConfig(), params)
        with pytest.raises(AssertionError):
            make_train_step(
                model,
                opt,
                cams,
                SamplerSettings(num_rays=129),
                mesh=get_mesh(8),
            )

    def test_eval_render_chunked_padding(self, setup):
        model, params, cams, _ = setup
        render = make_eval_render(model, chunk_size=128)
        rb = cams.generate_rays(0)
        flat = rb.reshape((cams.height * cams.width,))
        out = render(params, flat)
        assert out["rgb"].shape == (256, 3)
        # non-multiple ray count exercises the padding path
        sub = jax.tree_util.tree_map(lambda x: x[:100], flat)
        out2 = render(params, sub)
        assert out2["rgb"].shape == (100, 3)
        np.testing.assert_allclose(
            np.asarray(out2["rgb"]), np.asarray(out["rgb"][:100]), atol=1e-5
        )

    @pytest.mark.slow
    def test_eval_render_mesh_sharded_matches_single(self, setup):
        """Ray-sharded full-frame render (generation path on a mesh) must
        match the single-device renderer."""
        model, params, cams, _ = setup
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = get_mesh(8)
        render1 = make_eval_render(model, chunk_size=16)
        render8 = make_eval_render(model, chunk_size=16, mesh=mesh)
        rb = cams.generate_rays(0)
        flat = rb.reshape((cams.height * cams.width,))
        ref = render1(params, flat)
        out = render8(params, flat)
        assert out["rgb"].shape == ref["rgb"].shape
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=2e-2
        )
        # non-multiple ray count exercises the chunk*n_shards padding path
        sub = jax.tree_util.tree_map(lambda x: x[:100], flat)
        out2 = render8(params, sub)
        assert out2["rgb"].shape == (100, 3)


class TestCheckpoints:
    def test_roundtrip(self, setup, tmp_path):
        model, params, _, _ = setup
        opt = make_optimizer(OptimizersConfig(), params)
        opt_state = opt.init(params)
        save_checkpoint(tmp_path, 42, params, opt_state)
        path = latest_checkpoint(tmp_path)
        assert path is not None and "000000042" in path.name
        template = {
            "step": jnp.zeros((), jnp.int32),
            "params": params,
            "opt_state": opt_state,
        }
        restored = load_checkpoint(path, template)
        assert int(restored["step"]) == 42
        a = jax.tree_util.tree_leaves(params)[0]
        b = jax.tree_util.tree_leaves(restored["params"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_strip_surgery(self, setup):
        _, params, _, _ = setup
        stripped = strip_proposals(params)
        assert "proposal_0" not in stripped and "field" in stripped
        s2 = strip_appearance_and_camera_opt(params)
        assert "appearance" not in s2["field"]

    def test_surgical_restore_drops_proposals(self, setup, tmp_path):
        model, params, _, _ = setup
        opt = make_optimizer(OptimizersConfig(), params)
        save_checkpoint(tmp_path, 7, params, opt.init(params))
        fresh = model.init(jax.random.PRNGKey(99))
        restored = surgical_restore(
            latest_checkpoint(tmp_path), fresh, drop_proposals=True
        )
        # proposals come from fresh init, field from checkpoint
        p_fresh = jax.tree_util.tree_leaves(fresh["proposal_0"])[0]
        p_rest = jax.tree_util.tree_leaves(restored["proposal_0"])[0]
        np.testing.assert_allclose(np.asarray(p_fresh), np.asarray(p_rest))
        f_ckpt = jax.tree_util.tree_leaves(params["field"]["mlp_base"])[0]
        f_rest = jax.tree_util.tree_leaves(restored["field"]["mlp_base"])[0]
        np.testing.assert_allclose(np.asarray(f_ckpt), np.asarray(f_rest))
        # appearance embedding must come from fresh init (dropped on load)
        a_fresh = fresh["field"]["appearance"]["embedding"]
        a_rest = restored["field"]["appearance"]["embedding"]
        np.testing.assert_allclose(np.asarray(a_fresh), np.asarray(a_rest))


class TestAutoMicroBatches:
    def test_patch_constraint_respected(self):
        from signerf_tpu.data.datamanager import auto_micro_batches

        # 9216 rays = 9 patches of 32x32: ceil(9216/4096)=3 holds whole
        # patches (3072 = 3 patches)
        m = auto_micro_batches(9216, 32, False)
        assert m == 3
        assert (9216 // m) % (32 * 32) == 0

        # 16384 with 32px patches: 4 splits of 4096 = 4 patches each
        # (the round-5 measured sweet spot; see auto_micro_batches)
        assert auto_micro_batches(16384, 32, False) == 4
        # masks force plain sampling -> no patch constraint
        assert auto_micro_batches(16384, 32, True) == 4
        # small batches stay monolithic
        assert auto_micro_batches(4096, 1, False) == 1

    def test_prime_ray_count_falls_back_to_monolithic(self):
        from signerf_tpu.data.datamanager import auto_micro_batches

        assert auto_micro_batches(8209, 1, False) == 1  # prime
        assert auto_micro_batches(65536, 1, False) == 16
