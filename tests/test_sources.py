import pytest

from search_replica_spark.corpus import generate_corpus
from search_replica_spark.sources.code_table import (
    SchemaMismatch,
    read_corpus,
    validate_input_schema,
)


def test_read_corpus_parquet(spark, tmp_path):
    p = str(tmp_path / "c.parquet")
    generate_corpus(50).to_parquet(p, index=False)
    df = read_corpus(spark, p)
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    assert df.count() == 50


def test_surplus_columns_pruned(spark, tmp_path):
    pdf = generate_corpus(10)
    pdf["extra"] = 1
    p = str(tmp_path / "c.parquet")
    pdf.to_parquet(p, index=False)
    df = read_corpus(spark, p)
    assert "extra" not in df.columns


def test_missing_column_raises(spark, tmp_path):
    pdf = generate_corpus(10).drop(columns=["lang"])
    p = str(tmp_path / "c.parquet")
    pdf.to_parquet(p, index=False)
    with pytest.raises(SchemaMismatch, match="missing column lang"):
        read_corpus(spark, p)


def test_mistyped_column_raises(spark, tmp_path):
    pdf = generate_corpus(10)
    pdf["commit"] = 1
    p = str(tmp_path / "c.parquet")
    pdf.to_parquet(p, index=False)
    with pytest.raises(SchemaMismatch, match="column commit"):
        read_corpus(spark, p)


def test_snapshot_id_on_parquet_rejected(spark, tmp_path):
    p = str(tmp_path / "c.parquet")
    generate_corpus(10).to_parquet(p, index=False)
    with pytest.raises(ValueError, match="Iceberg"):
        read_corpus(spark, p, snapshot_id=7)


def test_validate_passthrough(spark):
    df = spark.createDataFrame(generate_corpus(5))
    assert validate_input_schema(df).count() == 5
