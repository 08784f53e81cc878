"""Unit tests for IterRunner (runtime/runner.py): hook protocol, nan
guard, checkpoint interval + resume round trip — previously covered only
through the full CLI e2e."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from scflow_tpu.runtime import CheckpointHook, IterRunner, TrainState
from scflow_tpu.runtime.runner import Hook


def make_state():
    return TrainState.create({"w": jnp.zeros((3,))}, optax.sgd(0.1))


def fake_step(loss_value=1.0):
    def step(state, batch):
        grads = {"w": jnp.ones((3,))}
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": jnp.asarray(loss_value)}

    return step


def batches():
    while True:
        yield {"x": np.zeros((2,), np.float32)}


class RecorderHook(Hook):
    def __init__(self):
        self.calls = []

    def before_run(self, runner):
        self.calls.append(("before_run", runner.step))

    def after_train_iter(self, runner):
        self.calls.append(("after_iter", runner.step))

    def after_run(self, runner):
        self.calls.append(("after_run", runner.step))


class TestIterRunner:
    def test_runs_hooks_and_counts_steps(self, tmp_path):
        rec = RecorderHook()
        runner = IterRunner(fake_step(), make_state(), batches(), 3,
                            work_dir=str(tmp_path), hooks=[rec])
        state = runner.run()
        assert int(jax.device_get(state.step)) == 3
        assert rec.calls == [("before_run", 0), ("after_iter", 1),
                             ("after_iter", 2), ("after_iter", 3),
                             ("after_run", 3)]
        # sgd with lr 0.1 on unit grads: w = -0.3
        np.testing.assert_allclose(
            np.asarray(jax.device_get(state.params["w"])), -0.3, rtol=1e-6)

    def test_checkpoint_interval_and_resume(self, tmp_path):
        runner = IterRunner(
            fake_step(), make_state(), batches(), 4, work_dir=str(tmp_path),
            hooks=[CheckpointHook(interval=2)])
        state = runner.run()
        # a fresh runner resumes from the latest checkpoint (iter 4)
        r2 = IterRunner(fake_step(), make_state(), batches(), 6,
                        work_dir=str(tmp_path), hooks=[])
        assert r2.resume() == 4
        np.testing.assert_allclose(
            np.asarray(jax.device_get(r2.state.params["w"])),
            np.asarray(jax.device_get(state.params["w"])))
        # and an explicit earlier step restores that step
        r3 = IterRunner(fake_step(), make_state(), batches(), 6,
                        work_dir=str(tmp_path), hooks=[])
        assert r3.resume(2) == 2

    def test_nan_check_raises(self, tmp_path):
        runner = IterRunner(fake_step(float("nan")), make_state(), batches(),
                            3, work_dir=str(tmp_path), nan_check=True)
        with pytest.raises(FloatingPointError, match="non-finite loss"):
            runner.run()

    def test_nan_passes_without_flag(self, tmp_path):
        runner = IterRunner(fake_step(float("nan")), make_state(), batches(),
                            2, work_dir=str(tmp_path), nan_check=False)
        state = runner.run()  # reference behavior: no guard unless asked
        assert int(jax.device_get(state.step)) == 2


class TestFrozenPrefixes:
    def test_frozen_params_do_not_update(self, tmp_path):
        """optimizer_config.frozen_prefixes (the freeze_encoder/freeze_bn
        analog, optim.py) must zero updates under the prefix while the rest
        trains."""
        from scflow_tpu.runtime import build_optimizer

        tx, _ = build_optimizer(
            dict(type="SGD", lr=0.1, momentum=0.0), None, None,
            frozen_prefixes=["encoder"])
        params = {"encoder": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
        state = TrainState.create(params, tx)
        grads = {"encoder": {"w": jnp.ones((2,))}, "head": {"w": jnp.ones((2,))}}
        state = state.apply_gradients(grads=grads)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(state.params["encoder"]["w"])), 1.0)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(state.params["head"]["w"])), 0.9,
            rtol=1e-6)
