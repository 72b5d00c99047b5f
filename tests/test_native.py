"""Native C++ sampler tests: constraint satisfaction, determinism,
distribution sanity vs the NumPy implementation."""

import numpy as np
import pytest

from deepfm_tpu.native import sampler


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    n_users, n_items = 30, 200
    seen = rng.random((n_users, n_items)) < 0.3
    weights = np.maximum(rng.integers(0, 50, n_items), 1).astype(np.float64) ** 0.75
    return seen, weights


@pytest.mark.skipif(not sampler.available(), reason="g++ build unavailable")
class TestWeighted:
    def test_unseen_and_counts(self, world):
        seen, weights = world
        uids = np.array([0, 0, 5, 7], dtype=np.int64)
        items, counts = sampler.weighted_unseen_batch(seen, weights, uids, 50, 123)
        assert counts.sum() == len(items)
        pos = 0
        for uid, c in zip(uids, counts):
            chunk = items[pos : pos + c]
            assert (~seen[uid, chunk]).all()
            pos += c

    def test_deterministic_by_seed(self, world):
        seen, weights = world
        uids = np.array([1, 2, 3], dtype=np.int64)
        a, _ = sampler.weighted_unseen_batch(seen, weights, uids, 20, 99)
        b, _ = sampler.weighted_unseen_batch(seen, weights, uids, 20, 99)
        c, _ = sampler.weighted_unseen_batch(seen, weights, uids, 20, 100)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_popularity_bias(self, world):
        seen, weights = world
        # one very popular unseen item should be drawn far above uniform rate
        w = weights.copy()
        uid = 3
        unseen = np.flatnonzero(~seen[uid])
        hot = unseen[0]
        w[:] = 1.0
        w[hot] = 1000.0
        items, _ = sampler.weighted_unseen_batch(
            seen, w, np.array([uid], np.int64), 2000, 5
        )
        frac = (items == hot).mean()
        assert frac > 0.5  # 1000/(1000+|unseen|-1) ~ 0.88

    def test_capped_by_available(self, world):
        seen, weights = world
        seen2 = seen.copy()
        seen2[4, :] = True
        seen2[4, :7] = False  # only 7 unseen
        items, counts = sampler.weighted_unseen_batch(
            seen2, weights, np.array([4], np.int64), 100, 1
        )
        assert counts[0] == 7


@pytest.mark.skipif(not sampler.available(), reason="g++ build unavailable")
class TestUniform:
    def test_unseen_and_unique_per_row(self, world):
        seen, _ = world
        uids = np.array([0, 1, 2, 3, 4], dtype=np.int64)
        out = sampler.uniform_unseen_batch(seen, uids, 8, 42)
        assert out.shape == (5, 8)
        for k, uid in enumerate(uids):
            row = out[k]
            assert (~seen[uid, row]).all()
            assert len(np.unique(row)) == 8

    def test_deterministic(self, world):
        seen, _ = world
        uids = np.array([0, 1], dtype=np.int64)
        a = sampler.uniform_unseen_batch(seen, uids, 8, 7)
        b = sampler.uniform_unseen_batch(seen, uids, 8, 7)
        np.testing.assert_array_equal(a, b)
