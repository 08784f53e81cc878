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
