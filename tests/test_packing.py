"""Packed-layout tests: slot ordering, offsets, round-trip."""

import numpy as np

from conftest import make_synth_batch, make_synth_schema
from deepfm_tpu.data.packing import pack_features, pack_schema


def test_group_structure():
    packed = pack_schema(make_synth_schema())
    # widths present: 16 (user,item), 8 (tags seq); dense widths 8, 4
    widths = [g.width for g in packed.lookup_groups]
    assert widths == [8, 16]
    tags_group = packed.lookup_groups[0]
    assert tags_group.field_names == ["tags"]
    assert tags_group.slot_end - tags_group.slot_start == 4  # max_length
    big = packed.lookup_groups[1]
    assert big.field_names == ["user", "item"]
    # user occupies local rows [0, 50), item [50, 130)
    np.testing.assert_array_equal(big.local_offsets, [0, 50])
    assert big.total_rows == 130
    assert packed.num_slots == 6
    assert packed.num_dense == 2
    assert packed.fo_rows == 50 + 80 + 12


def test_fo_offsets_partition_vocab():
    packed = pack_schema(make_synth_schema())
    # every slot's fo offset + its field's vocab stays within fo_rows
    assert packed.fo_offsets.shape == (packed.num_slots,)
    assert packed.fo_offsets.max() < packed.fo_rows


def test_pack_features_roundtrip():
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 16, seed=3)
    arr = pack_features(packed, feats, labels)
    assert arr.ids.shape == (16, 6)
    assert arr.dense.shape == (16, 2)
    assert arr.ids.dtype == np.int32
    # locate the 'user' field slot and check values round-trip
    big = packed.lookup_groups[1]
    user_slot = big.slot_start  # first member
    np.testing.assert_array_equal(arr.ids[:, user_slot], feats["user"])
    item_slot = big.slot_start + 1
    np.testing.assert_array_equal(arr.ids[:, item_slot], feats["item"])
    tags = packed.lookup_groups[0]
    np.testing.assert_array_equal(
        arr.ids[:, tags.slot_start : tags.slot_end], feats["tags"]
    )
    # dense grouped by width ascending: hour (4) then price (8)
    assert packed.dense_groups[0].field_names == ["hour"]
    assert packed.dense_groups[1].field_names == ["price"]
    np.testing.assert_allclose(arr.dense[:, 0], feats["hour"])
    np.testing.assert_allclose(arr.dense[:, 1], feats["price"])


def test_labels_and_user_ids():
    schema = make_synth_schema()
    packed = pack_schema(schema)
    feats, labels = make_synth_batch(schema, 8, seed=4)
    feats["user_id"] = feats["user"]  # alias for grouping
    arr = pack_features(packed, feats, labels)
    np.testing.assert_array_equal(arr.labels, labels)
    np.testing.assert_array_equal(arr.user_ids, feats["user"])
