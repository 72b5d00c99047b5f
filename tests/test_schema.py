"""Schema contract tests (reference: tests/test_schema.py surface)."""

from deepfm_tpu.data.schema import DatasetSchema, FeatureType, FieldSchema


def test_field_defaults():
    f = FieldSchema("x", FeatureType.SPARSE)
    assert f.vocabulary_size == 0
    assert f.embedding_dim == 8
    assert f.max_length == 1
    assert f.combiner == "mean"
    assert f.group == ""


def test_type_filters(synth_schema):
    s = synth_schema
    assert [f.name for f in s.sparse_fields] == ["user", "item"]
    assert [f.name for f in s.sequence_fields] == ["tags"]
    assert [f.name for f in s.dense_fields] == ["price", "hour"]
    assert s.num_fields == 5


def test_total_embedding_dim(synth_schema):
    assert synth_schema.total_embedding_dim == 16 + 16 + 8 + 8 + 4


def test_empty_schema():
    s = DatasetSchema()
    assert s.num_fields == 0
    assert s.total_embedding_dim == 0
    assert s.sparse_fields == []
    assert s.total_vocabulary_size == 0


def test_lookup_fields_and_vocab(synth_schema):
    names = [f.name for f in synth_schema.lookup_fields]
    assert names == ["user", "item", "tags"]
    assert synth_schema.total_vocabulary_size == 50 + 80 + 12


def test_field_order_is_insertion_order(synth_schema):
    assert synth_schema.field_names == ["user", "item", "tags", "price", "hour"]
