"""Dataset container + batch iteration tests (reference:
tests/test_dataset.py surface, adapted to the packed-batch design)."""

import numpy as np

from conftest import make_synth_batch, make_synth_schema
from deepfm_tpu.data.dataset import TabularDataset, iterate_batches, num_batches
from deepfm_tpu.data.packing import pack_schema


def _packed(n=20, seed=0):
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, n, seed=seed)
    ds = TabularDataset(feats, labels)
    return ds, ds.pack(packed)


def test_dtype_policy():
    ds, _ = _packed()
    assert ds.features["user"].dtype == np.int64
    assert ds.features["tags"].dtype == np.int64
    assert ds.features["price"].dtype == np.float32
    assert ds.labels.dtype == np.float32


def test_len():
    ds, arr = _packed(n=17)
    assert len(ds) == 17
    assert len(arr) == 17


def test_full_batches_and_padding():
    _, arr = _packed(n=10)
    batches = list(iterate_batches(arr, 4))
    assert len(batches) == 3
    for b in batches:
        assert b.ids.shape == (4, arr.ids.shape[1])
        assert b.weights.shape == (4,)
    # last batch: 2 real rows + 2 padded
    np.testing.assert_array_equal(batches[-1].weights, [1, 1, 0, 0])
    assert (batches[-1].ids[2:] == 0).all()
    assert (batches[-1].labels[2:] == 0).all()


def test_drop_remainder():
    _, arr = _packed(n=10)
    batches = list(iterate_batches(arr, 4, drop_remainder=True))
    assert len(batches) == 2
    assert num_batches(10, 4, drop_remainder=True) == 2
    assert num_batches(10, 4) == 3


def test_shuffle_is_permutation():
    _, arr = _packed(n=12)
    rng = np.random.default_rng(0)
    batches = list(iterate_batches(arr, 12, shuffle=True, rng=rng))
    assert len(batches) == 1
    got = np.sort(batches[0].labels)
    np.testing.assert_array_equal(got, np.sort(arr.labels))


def test_shuffle_deterministic_by_rng():
    _, arr = _packed(n=12)
    b1 = list(iterate_batches(arr, 6, shuffle=True, rng=np.random.default_rng(7)))
    b2 = list(iterate_batches(arr, 6, shuffle=True, rng=np.random.default_rng(7)))
    np.testing.assert_array_equal(b1[0].ids, b2[0].ids)
