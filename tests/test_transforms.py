"""Encoder tests: golden mappings, OOV conventions (reference:
tests/test_transforms.py surface)."""

import numpy as np

from deepfm_tpu.data.transforms import LabelEncoder, MinMaxScaler, MultiHotEncoder


class TestLabelEncoder:
    def test_sorted_golden_mapping(self):
        enc = LabelEncoder().fit(["c", "a", "b", "a"])
        out = enc.transform(["a", "b", "c"])
        np.testing.assert_array_equal(out, [1, 2, 3])
        assert out.dtype == np.int64

    def test_oov_maps_to_zero(self):
        enc = LabelEncoder().fit(["a", "b"])
        np.testing.assert_array_equal(enc.transform(["z", "a"]), [0, 1])

    def test_vocab_size_is_n_plus_one(self):
        enc = LabelEncoder().fit(["a", "b", "c"])
        assert enc.vocabulary_size == 4

    def test_integer_values(self):
        enc = LabelEncoder().fit([10, 2, 5])
        np.testing.assert_array_equal(enc.transform([2, 5, 10, 99]), [1, 2, 3, 0])

    def test_large_vectorized_matches_dict(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 1000, 5000)
        enc = LabelEncoder().fit(vals[:2500].tolist())
        fast = enc.transform(vals)
        slow = np.array([enc._mapping.get(v, 0) for v in vals])
        np.testing.assert_array_equal(fast, slow)


class TestMinMaxScaler:
    def test_scales_to_unit(self):
        s = MinMaxScaler().fit([0.0, 5.0, 10.0])
        np.testing.assert_allclose(s.transform([0, 5, 10]), [0, 0.5, 1])

    def test_constant_input_gives_zero(self):
        s = MinMaxScaler().fit([3.0, 3.0])
        np.testing.assert_array_equal(s.transform([3.0, 3.0]), [0.0, 0.0])

    def test_out_of_range_not_clipped(self):
        s = MinMaxScaler().fit([0.0, 10.0])
        assert s.transform([20.0])[0] == 2.0
        assert s.transform([-10.0])[0] == -1.0


class TestMultiHotEncoder:
    def test_padding_and_mapping(self):
        enc = MultiHotEncoder(max_length=4).fit([["b", "a"], ["c"]])
        out = enc.transform([["a", "c"], ["b"]])
        np.testing.assert_array_equal(out, [[1, 3, 0, 0], [2, 0, 0, 0]])

    def test_truncation(self):
        enc = MultiHotEncoder(max_length=2).fit([["a", "b", "c"]])
        out = enc.transform([["a", "b", "c"]])
        assert out.shape == (1, 2)
        np.testing.assert_array_equal(out, [[1, 2]])

    def test_oov_token(self):
        enc = MultiHotEncoder(max_length=3).fit([["a"]])
        np.testing.assert_array_equal(enc.transform([["z", "a"]]), [[0, 1, 0]])

    def test_vocab_size(self):
        enc = MultiHotEncoder().fit([["a", "b"], ["c"]])
        assert enc.vocabulary_size == 4

    def test_empty_list(self):
        enc = MultiHotEncoder(max_length=3).fit([["a"]])
        np.testing.assert_array_equal(enc.transform([[]]), [[0, 0, 0]])
