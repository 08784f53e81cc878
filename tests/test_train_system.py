"""End-to-end training-system tests on a synthetic scene: the renderer
generates both 'real' (gt-pose) and reference-pose inputs, and a few
optimizer steps must reduce the loss.  Also exercises the data-parallel
sharded path on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scflow_tpu.losses.point_matching import sym_mask_from_types
from scflow_tpu.parallel import make_mesh, replicate, shard_batch
from scflow_tpu.refiners import SCFlowRefiner
from scflow_tpu.refiners.system import (
    LossAssets,
    RenderAssets,
    make_scflow_infer_fn,
    make_scflow_train_step,
    render_and_normalize,
)
from scflow_tpu.render.meshbank import make_synthetic_bank
from scflow_tpu.runtime import TrainState, build_optimizer
from scflow_tpu.runtime.optim import onecycle_lr

H = W = 64
NCLASS = 3


def make_assets():
    bank = make_synthetic_bank(NCLASS)
    render_assets = RenderAssets.from_bank(bank)
    loss_assets = LossAssets(
        points=jnp.asarray(bank.verts),
        valid=jnp.asarray(bank.vert_valid),
        sym=sym_mask_from_types({"cls_2": {}}, NCLASS),
        diameters=jnp.asarray(bank.diameters),
    )
    return bank, render_assets, loss_assets


def make_batch(render_assets, n=4, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.spatial.transform import Rotation

    gt_R = Rotation.random(n, rng).as_matrix().astype(np.float32)
    gt_t = np.stack(
        [rng.normal(size=n) * 10, rng.normal(size=n) * 10, rng.uniform(380, 450, n)], -1
    ).astype(np.float32)
    # jittered reference pose
    dR = Rotation.from_euler(
        "xyz", rng.normal(size=(n, 3)) * 8, degrees=True
    ).as_matrix().astype(np.float32)
    ref_R = np.einsum("nij,njk->nik", dR, gt_R)
    ref_t = gt_t + rng.normal(size=(n, 3)).astype(np.float32) * np.array([5, 5, 15], np.float32)
    K = np.tile(np.array([[[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]]], np.float32), (n, 1, 1))
    labels = rng.integers(0, NCLASS, n)

    real_images, _, gt_masks = render_and_normalize(
        render_assets, jnp.asarray(ref_R) * 0 + jnp.asarray(gt_R), jnp.asarray(gt_t),
        jnp.asarray(K), jnp.asarray(labels), (H, W), (0.0, 0.0, 0.0), (255.0,) * 3,
        chunk=16,
    )
    return {
        "real_images": real_images,
        "ref_rotations": jnp.asarray(ref_R),
        "ref_translations": jnp.asarray(ref_t),
        "gt_rotations": jnp.asarray(gt_R),
        "gt_translations": jnp.asarray(gt_t),
        "labels": jnp.asarray(labels, jnp.int32),
        "k": jnp.asarray(K),
        "gt_masks": gt_masks,
    }


@pytest.fixture(scope="module")
def setup():
    bank, render_assets, loss_assets = make_assets()
    model = SCFlowRefiner(
        iters=2,
        pose_head_cfg=dict(type="MultiClassPoseHead", num_class=NCLASS, in_channels=224),
    )
    batch = make_batch(render_assets)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key,
        batch["real_images"],
        batch["real_images"],
        batch["ref_rotations"],
        batch["ref_translations"],
        jnp.zeros((4, H, W)),
        batch["k"],
        batch["labels"],
    )
    return bank, render_assets, loss_assets, model, batch, variables


class TestTrainStep:
    def test_loss_decreases(self, setup):
        bank, render_assets, loss_assets, model, batch, variables = setup
        tx, _ = build_optimizer(
            dict(type="AdamW", lr=1e-3, weight_decay=1e-4), None, grad_clip=10.0
        )
        state = TrainState.create(
            variables["params"], tx, variables.get("batch_stats")
        )
        step = make_scflow_train_step(
            model, render_assets, loss_assets, image_size=(H, W),
            render_chunk=16, donate=False,
        )
        state, logs0 = step(state, batch)
        l0 = float(logs0["loss"])
        assert np.isfinite(l0)
        for _ in range(5):
            state, logs = step(state, batch)
        l5 = float(logs["loss"])
        assert np.isfinite(l5)
        assert l5 < l0, (l0, l5)
        assert float(logs["grad_norm"]) > 0
        assert "seq_1_pose_loss" in logs

    def test_infer_improves_under_training_signal(self, setup):
        """At init (identity pose head) inference returns the reference pose."""
        bank, render_assets, loss_assets, model, batch, variables = setup
        infer = make_scflow_infer_fn(model, render_assets, image_size=(H, W),
                                     render_chunk=16)
        out = infer(variables, batch)
        np.testing.assert_allclose(
            np.asarray(out["rotations"]), np.asarray(batch["ref_rotations"]), atol=1e-4
        )

    def test_slim_infer_matches_full(self, setup):
        """slim=True (pose-only output surface, the reference's test-time
        return) must produce the same poses as the full infer fn — the
        skipped work (dense depth lift + full-res flow/mask reconstruction)
        is downstream of the pose recurrence."""
        bank, render_assets, loss_assets, model, batch, variables = setup
        full = make_scflow_infer_fn(model, render_assets, image_size=(H, W),
                                    render_chunk=16)
        slim = make_scflow_infer_fn(model, render_assets, image_size=(H, W),
                                    render_chunk=16, slim=True)
        out_f = full(variables, batch)
        out_s = slim(variables, batch)
        assert set(out_s) == {"rotations", "translations"}
        np.testing.assert_allclose(np.asarray(out_s["rotations"]),
                                   np.asarray(out_f["rotations"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_s["translations"]),
                                   np.asarray(out_f["translations"]), atol=1e-5)

    def test_sharded_train_step_multichip(self, setup):
        """Data-parallel step over the 8-device CPU mesh: batch sharded,
        params replicated; gradient all-reduce is implicit."""
        bank, render_assets, loss_assets, model, batch, variables = setup
        mesh = make_mesh(8)
        tx, _ = build_optimizer(
            dict(type="AdamW", lr=1e-3, weight_decay=1e-4), None, grad_clip=10.0
        )
        state = TrainState.create(variables["params"], tx, variables.get("batch_stats"))
        state = jax.tree_util.tree_map(
            lambda x: x, state
        )
        with mesh:
            sharded_state = replicate(state, mesh)
            big_batch = {
                k: jnp.concatenate([v] * 2, axis=0) for k, v in batch.items()
            }  # batch 8 over 8 devices
            sharded_batch = shard_batch(big_batch, mesh)
            step = make_scflow_train_step(
                model, render_assets, loss_assets, image_size=(H, W),
                render_chunk=16, donate=False,
            )
            new_state, logs = step(sharded_state, sharded_batch)
        assert np.isfinite(float(logs["loss"]))
        # params actually updated
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(new_state.params)[0]
        assert a.shape == b.shape


class TestOneCycle:
    def test_matches_torch_onecycle(self):
        import torch

        total = 1000
        sched = onecycle_lr(4e-4, total, pct_start=0.05, anneal_strategy="linear")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=4e-4)
        tsched = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=4e-4, total_steps=total, pct_start=0.05,
            anneal_strategy="linear",
        )
        torch_lrs = []
        for _ in range(total):
            torch_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            tsched.step()
        mine = np.array([float(sched(i)) for i in range(total)])
        np.testing.assert_allclose(mine, np.array(torch_lrs), rtol=0.02, atol=2e-6)


class TestCycledInfer:
    def test_cycles_match_identity_at_init(self, setup):
        """Zero-init pose head: every cycle re-renders at the same pose, so
        the cycled output equals the reference pose too."""
        from scflow_tpu.refiners.system import make_scflow_cycled_infer_fn

        bank, render_assets, loss_assets, model, batch, variables = setup
        infer2 = make_scflow_cycled_infer_fn(
            model, render_assets, cycles=2, image_size=(H, W), render_chunk=16
        )
        out = infer2(variables, batch)
        np.testing.assert_allclose(
            np.asarray(out["rotations"]), np.asarray(batch["ref_rotations"]),
            atol=1e-4,
        )


class TestCheckpointAsync:
    def test_async_save_restore_roundtrip(self, setup, tmp_path):
        """Async orbax save (no inline wait) must still restore exactly
        after wait(): the runner's after_run barrier is what commits the
        last checkpoint before process exit."""
        from scflow_tpu.runtime import TrainState, build_optimizer
        from scflow_tpu.runtime.checkpoint import CheckpointManager

        bank, render_assets, loss_assets, model, batch, variables = setup
        tx, _ = build_optimizer(
            dict(type="AdamW", lr=1e-3, weight_decay=1e-4), None
        )
        state = TrainState.create(
            variables["params"], tx, variables.get("batch_stats")
        )
        mgr = CheckpointManager(str(tmp_path), async_save=True)
        mgr.save(7, state)
        mgr.wait()
        template = TrainState.create(
            jax.tree_util.tree_map(np.zeros_like, variables["params"]), tx,
            variables.get("batch_stats"),
        )
        restored, step = mgr.restore(template)
        assert step == 7
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_restore_waits_on_inflight_save(self, setup, tmp_path):
        """restore()/latest_step() immediately after an async save must see
        the just-written step (the internal wait barrier)."""
        from scflow_tpu.runtime import TrainState, build_optimizer
        from scflow_tpu.runtime.checkpoint import CheckpointManager

        bank, render_assets, loss_assets, model, batch, variables = setup
        tx, _ = build_optimizer(
            dict(type="AdamW", lr=1e-3, weight_decay=1e-4), None
        )
        state = TrainState.create(
            variables["params"], tx, variables.get("batch_stats")
        )
        mgr = CheckpointManager(str(tmp_path), async_save=True)
        mgr.save(3, state)  # no explicit wait
        assert mgr.latest_step() == 3


class TestBackendResolution:
    def test_auto_resolves_off_tpu(self):
        from scflow_tpu.utils.platform import resolve_backend

        assert resolve_backend("auto") == "xla"  # tests run on CPU
        assert resolve_backend("pallas") == "pallas"
        assert resolve_backend("xla") == "xla"


class TestInstanceNormBF16:
    def test_bf16_stats_match_fp32(self):
        """IN statistics accumulate in fp32 even for bf16 activations —
        output matches the fp32 path to bf16 resolution."""
        from scflow_tpu.models.layers import InstanceNorm

        rng = np.random.default_rng(0)
        x = (rng.normal(size=(2, 32, 32, 8)) * 1.3 + 0.7).astype(np.float32)
        m = InstanceNorm()
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ref = np.asarray(m.apply(v, jnp.asarray(x)))
        out = np.asarray(
            m.apply(v, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32)
        )
        np.testing.assert_allclose(out, ref, atol=2e-2)


class TestFrozenParams:
    def test_frozen_prefixes_block_weight_decay(self):
        """AdamW's decoupled decay is grad-independent: without the mask a
        'frozen' (zero-grad) param still shrinks every step.  With
        frozen_prefixes the leaf must come back bit-identical."""
        params = {
            "encoder": {"conv": {"kernel": jnp.ones((3, 3))}},
            "head": {"dense": {"kernel": jnp.ones((3, 3))}},
        }
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads["head"]["dense"]["kernel"] = jnp.full((3, 3), 0.1)

        import optax

        tx, _ = build_optimizer(
            dict(type="AdamW", lr=1e-2, weight_decay=1e-2),
            frozen_prefixes=["encoder"],
        )
        st = tx.init(params)
        updates, _ = tx.update(grads, st, params)
        new = optax.apply_updates(params, updates)
        np.testing.assert_array_equal(
            np.asarray(new["encoder"]["conv"]["kernel"]),
            np.asarray(params["encoder"]["conv"]["kernel"]),
        )
        assert not np.allclose(
            np.asarray(new["head"]["dense"]["kernel"]),
            np.asarray(params["head"]["dense"]["kernel"]),
        )

        # unmasked control: decay alone moves the zero-grad leaf
        tx2, _ = build_optimizer(dict(type="AdamW", lr=1e-2, weight_decay=1e-2))
        st2 = tx2.init(params)
        up2, _ = tx2.update(grads, st2, params)
        new2 = optax.apply_updates(params, up2)
        assert not np.allclose(
            np.asarray(new2["encoder"]["conv"]["kernel"]),
            np.asarray(params["encoder"]["conv"]["kernel"]),
        )

    def test_resnet_frozen_stage_norm_stats_fixed(self):
        """Frozen stages run eval-mode norms: their BN batch_stats must not
        move in train mode (reference _freeze_stages .eval() semantics,
        resnet.py:613-629)."""
        from scflow_tpu.models.resnet import ResNet

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        m = ResNet(depth=18, frozen_stages=1, out_indices=(3,))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        bs_old, bs_new = v["batch_stats"], mut["batch_stats"]
        assert any(k.startswith(("norm1", "stage1_")) for k in bs_old)
        frozen_moved = jax.tree_util.tree_map(
            lambda a, b: bool(np.allclose(a, b)),
            {k: bs_old[k] for k in bs_old if k.startswith(("norm1", "stage1_"))},
            {k: bs_new[k] for k in bs_new if k.startswith(("norm1", "stage1_"))},
        )
        assert all(jax.tree_util.tree_leaves(frozen_moved))
        # a non-frozen stage's stats DO move
        s4_old = {k: bs_old[k] for k in bs_old if k.startswith("stage4_")}
        s4_new = {k: bs_new[k] for k in bs_new if k.startswith("stage4_")}
        moved = jax.tree_util.tree_map(
            lambda a, b: bool(np.allclose(a, b)), s4_old, s4_new
        )
        assert not all(jax.tree_util.tree_leaves(moved))


class TestTensorboardHookOptional:
    def test_degrades_without_tensorboardx(self, tmp_path, monkeypatch):
        """Shipped configs enable the TB hook unconditionally while
        tensorboardX is only the [tb] extra — the hook must warn and no-op,
        not crash the train entry point."""
        import sys

        monkeypatch.setitem(sys.modules, "tensorboardX", None)
        monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", None)
        from scflow_tpu.runtime import TensorboardHook

        with pytest.warns(UserWarning, match="TensorboardHook disabled"):
            hook = TensorboardHook(str(tmp_path))
        assert hook.writer is None

        class R:
            step = 50
            last_log = {"loss": 1.0}

            def current_lr(self):
                return 1e-4

        hook.after_train_iter(R())  # no-op, no crash
        hook.after_run(R())


class TestTBImagePanels:
    def test_simple_forward_warp_numpy(self):
        from scflow_tpu.utils.visualize import simple_forward_warp

        img = np.zeros((8, 8, 3), np.float32)
        img[2, 3] = 1.0
        mask = np.zeros((8, 8), np.float32)
        mask[2, 3] = 1.0
        flow = np.zeros((8, 8, 2), np.float32)
        flow[2, 3] = [2.0, 1.0]  # dx, dy
        out = simple_forward_warp(img, flow, mask, background=(0.5, 0.5, 0.5))
        assert np.all(out[3, 5] == 1.0)  # moved pixel
        assert np.all(out[2, 3] == 0.5)  # source is background now

    def test_build_tb_image_fn_panels(self, setup):
        """image_fn returns the reference's debug panels (real image,
        pred/gt flow, pred mask, forward-warped render) in [0, 1]."""
        from types import SimpleNamespace

        from scflow_tpu.apis import build_tb_image_fn
        from scflow_tpu.config import Config

        bank, render_assets, loss_assets, model, batch, variables = setup
        cfg = Config({
            "model": {
                "type": "SCFlowRefiner",
                "renderer": {"image_size": (H, W)},
                "test_cfg": {"iters": 2},
            },
        })
        image_fn = build_tb_image_fn(cfg, model, render_assets,
                                     image_size=(H, W))
        tx, _ = build_optimizer(
            dict(type="AdamW", lr=1e-3, weight_decay=1e-4), None,
            grad_clip=10.0)
        state = TrainState.create(variables["params"], tx,
                                  variables.get("batch_stats"))
        runner = SimpleNamespace(last_batch=batch, state=state)
        imgs = image_fn(runner)
        for key in ("train/real_image", "train/pred_flow", "train/pred_mask",
                    "train/gt_flow", "train/warped_render"):
            assert key in imgs, f"missing panel {key}"
            panel = imgs[key]
            assert panel.ndim == 3 and panel.shape[-1] == 3
            assert float(panel.min()) >= 0.0 and float(panel.max()) <= 1.0
