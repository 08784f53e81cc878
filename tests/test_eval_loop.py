"""Unit tests for eval-loop batching helpers."""

import numpy as np

from scflow_tpu.runtime.eval_loop import _bucket, pad_batch


class TestBucket:
    def test_pow2_buckets_below_max(self):
        assert _bucket(1) == 1
        assert _bucket(3) == 4
        assert _bucket(5) == 8
        assert _bucket(64) == 64

    def test_oversized_crowds_share_pow2_buckets(self):
        # n > max_bucket must still bucket to the next power of two —
        # returning raw n would give every crowd size its own jit
        # specialization
        assert _bucket(65) == 128
        assert _bucket(100) == 128
        assert _bucket(128) == 128
        assert _bucket(129) == 256

    def test_fixed_mode(self):
        assert _bucket(3, fixed=True) == 64
        assert _bucket(64, fixed=True) == 64
        # oversized crowd in fixed mode: bigger pow2, never a negative pad
        assert _bucket(65, fixed=True) == 128

    def test_never_smaller_than_n(self):
        for n in range(1, 300):
            for fixed in (False, True):
                assert _bucket(n, fixed=fixed) >= n


def test_pad_batch_repeats_row0():
    batch = {"a": np.arange(6).reshape(3, 2), "b": np.ones(3)}
    out = pad_batch(batch, 8)
    assert out["a"].shape == (8, 2)
    np.testing.assert_array_equal(out["a"][3:], np.tile(batch["a"][:1], (5, 1)))
    assert out["b"].shape == (8,)


class _StubCkpt:
    def __init__(self):
        self.best_calls = []
        self._best = None

    def maybe_save_best(self, step, state, name, value, rule):
        better = self._best is None or (
            value > self._best if rule == "greater" else value < self._best
        )
        if better:
            self._best = value
            self.best_calls.append((step, value))
        return better


def test_eval_hook_persists_history_and_tracks_best(tmp_path):
    """EvalHook dumps the full metric-table history to work_dir each eval
    and only re-saves best on improvement (VERDICT r1 weak item 6)."""
    import json
    import logging

    from scflow_tpu.runtime.runner import EvalHook

    values = iter([0.5, 0.8, 0.7])

    class Stub:
        step = 0
        state = None
        work_dir = str(tmp_path)
        hooks = []
        eval_history = []
        ckpt_manager = _StubCkpt()
        logger = logging.getLogger("t")

    hook = EvalHook(
        lambda state: {"average/add_10": next(values), "obj_a/add_10": 0.9},
        interval=10, save_best="average/add_10", rule="greater",
    )
    runner = Stub()
    for step in (10, 20, 30):
        runner.step = step
        hook.after_train_iter(runner)
    hist = json.loads((tmp_path / "eval_history.json").read_text())
    assert [h["step"] for h in hist] == [10, 20, 30]
    assert hist[1]["metrics"]["average/add_10"] == 0.8
    assert hist[2]["metrics"]["obj_a/add_10"] == 0.9
    # best saved at 0.5 then 0.8; the 0.7 eval must NOT re-save
    assert [v for _, v in runner.ckpt_manager.best_calls] == [0.5, 0.8]
