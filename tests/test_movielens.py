"""MovieLens adapter tests on a generated ML-100K-format dataset:
schema parity, split protocol, negative-sampling invariants
(reference behavior: deepfm/data/movielens.py)."""

import numpy as np
import pytest

from deepfm_tpu.config import DataConfig
from deepfm_tpu.data.movielens import (
    MovieLensAdapter,
    bucket_movie_age,
    bucket_release_year,
    bucketize_age,
)
from deepfm_tpu.data.schema import FeatureType
from deepfm_tpu.data.synthetic import generate_movielens_like

EXPECTED_FIELDS = [
    "user_id", "movie_id", "gender", "age", "occupation", "zip_prefix",
    "genres", "release_year_bucket", "movie_age_at_rating", "num_genres",
    "dow_sin", "dow_cos", "hour_sin", "hour_cos",
    "user_rating_count", "item_rating_count",
]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ml")
    generate_movielens_like(d, num_users=60, num_items=80, num_rows=3000, seed=0)
    return d


@pytest.fixture(scope="module")
def built(data_dir):
    cfg = DataConfig(
        data_dir=str(data_dir), num_neg_train=2, num_neg_eval=20,
        use_native_sampler=False,
    )
    ad = MovieLensAdapter(cfg, seed=7)
    schema, train, val, test = ad.build()
    return ad, schema, train, val, test


def test_bucketize_age():
    np.testing.assert_array_equal(
        bucketize_age(np.array([0, 17, 18, 30, 56, 90])),
        [1, 1, 18, 25, 56, 56],
    )


def test_bucket_release_year():
    out = bucket_release_year(np.array([1994.0, 1990.0, np.nan]))
    assert list(out) == ["1990-1994", "1990-1994", "unknown"]


def test_bucket_movie_age():
    out = bucket_movie_age(np.array([0.5, 2.0, 5.0, 10.0, 20.0, 50.0, -1.0, np.nan]))
    assert list(out) == [
        "<1yr", "1-3yr", "3-7yr", "7-15yr", "15-30yr", "30+yr",
        "unknown", "unknown",
    ]


def test_schema_matches_reference_contract(built):
    _, schema, *_ = built
    assert schema.field_names == EXPECTED_FIELDS
    assert schema.num_fields == 16
    dims = {f.name: f.embedding_dim for f in schema.fields.values()}
    assert dims["user_id"] == 16 and dims["movie_id"] == 16
    assert dims["genres"] == 8 and dims["gender"] == 4
    assert schema.fields["genres"].feature_type == FeatureType.SEQUENCE
    assert schema.fields["genres"].max_length == 6
    assert schema.fields["dow_sin"].feature_type == FeatureType.DENSE
    # reference CLAUDE-doc invariant: total embedding dim = 108
    assert schema.total_embedding_dim == 108


def test_train_has_expected_negative_ratio(built):
    ad, schema, train, *_ = built
    # every train row got num_neg_train=2 negatives appended
    n_orig = len(ad._train_idx)
    assert len(train) == n_orig * 3


def test_eval_sets_one_positive_per_user(built):
    ad, schema, train, val, test = built
    for ds in (val, test):
        uids = ds.features["user_id"]
        labels = ds.labels
        for u in np.unique(uids):
            rows = labels[uids == u]
            assert rows.sum() == 1.0  # exactly one positive
            assert len(rows) >= 2  # plus negatives


def test_negatives_are_unseen(built):
    ad, schema, train, val, test = built
    # decode: encoded movie id -> item idx via the encoded table
    enc_to_idx = {
        int(e): i for i, e in enumerate(ad._item_enc["movie_id"]) if e > 0
    }
    uid_enc_to_idx = {
        int(e): i for i, e in enumerate(ad._user_enc["user_id"]) if e > 0
    }
    labels = val.labels
    uids = val.features["user_id"]
    mids = val.features["movie_id"]
    neg = labels == 0.0
    checked = 0
    for ue, me in zip(uids[neg][:500], mids[neg][:500]):
        if int(ue) in uid_enc_to_idx and int(me) in enc_to_idx:
            assert not ad._seen[uid_enc_to_idx[int(ue)], enc_to_idx[int(me)]]
            checked += 1
    assert checked > 0


def test_resample_changes_negatives(built):
    ad, schema, train, *_ = built
    t2 = ad.resample_train()
    assert len(t2) == len(train)
    # same positives, different negative items (overwhelmingly likely)
    assert not np.array_equal(
        np.sort(train.features["movie_id"]), np.sort(t2.features["movie_id"])
    )


def test_deterministic_given_seed(data_dir):
    cfg = DataConfig(
        data_dir=str(data_dir), num_neg_train=1, num_neg_eval=5,
        use_native_sampler=False,
    )
    a1 = MovieLensAdapter(cfg, seed=3)
    a2 = MovieLensAdapter(cfg, seed=3)
    _, t1, v1, _ = a1.build()
    _, t2, v2, _ = a2.build()
    np.testing.assert_array_equal(t1.features["movie_id"], t2.features["movie_id"])
    np.testing.assert_array_equal(v1.features["movie_id"], v2.features["movie_id"])


def test_temporal_split_ordering(built):
    ad, *_ = built
    ts = ad._inter["timestamp"]
    assert ts[ad._train_idx].max() <= ts[ad._val_idx].min() + 1e-9
    assert ts[ad._val_idx].max() <= ts[ad._test_idx].min() + 1e-9


def test_leave_one_out_split(data_dir):
    cfg = DataConfig(
        data_dir=str(data_dir), split_strategy="leave_one_out",
        num_neg_train=1, num_neg_eval=5, min_interactions=3,
        use_native_sampler=False,
    )
    ad = MovieLensAdapter(cfg, seed=1)
    schema, train, val, test = ad.build()
    inter = ad._inter
    # per eligible user: exactly one val and one test row
    uid_val = inter["user_idx"][ad._val_idx]
    uid_test = inter["user_idx"][ad._test_idx]
    assert len(np.unique(uid_val)) == len(uid_val)
    assert len(np.unique(uid_test)) == len(uid_test)
    # test row is the chronologically last interaction of its user
    for k in range(min(10, len(ad._test_idx))):
        u = uid_test[k]
        user_rows = np.flatnonzero(inter["user_idx"] == u)
        assert inter["timestamp"][ad._test_idx[k]] == inter["timestamp"][user_rows].max()


def test_oov_encoding_for_cold_items(built):
    """Items never seen in train encode to 0 (padding row)."""
    ad, schema, train, val, test = built
    vocab = schema.fields["movie_id"].vocabulary_size
    assert train.features["movie_id"].max() < vocab
    assert (val.features["movie_id"] >= 0).all()
