"""Source adapters: snapshot reads of the code-corpus table + schema checks.

Reference analogues:
  S1 snapshot table scan  — COPY of the slot-creation snapshot
                            (postgres/reindex.go:29-91) → here: one
                            parquet/Iceberg snapshot read.
  S4 catalog discovery    — discover_query.sql config tree
                            (postgres/discovery.go:35-84) → here: schema
                            validation against the fixed input contract
                            (BASELINE.json#input_hint); Spark's catalog IS
                            the discovery mechanism.
  S2 PGCOPY wire decoder  — obsolete: Spark's vectorized Parquet reader
                            replaces it (SURVEY §2A S2).

Iceberg proper needs its runtime jars (not in this container); the
snapshot-id path is gated behind a capability check so the same call works
on a real lakehouse unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)


class SchemaMismatch(ValueError):
    pass


def validate_input_schema(df: DataFrame) -> DataFrame:
    """Assert the input contract; surplus columns are pruned, missing or
    mistyped ones raise (the reference fails fast on undecodable types too,
    postgres/config.go:93-108)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in INPUT_SCHEMA.fields:
        if f.name not in have:
            problems.append(f"missing column {f.name}")
        elif have[f.name] != f.dataType:
            problems.append(f"column {f.name}: {have[f.name]} != {f.dataType}")
    if problems:
        raise SchemaMismatch("; ".join(problems))
    return df.select(*[f.name for f in INPUT_SCHEMA.fields])


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def read_corpus(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the corpus table from a path (parquet) or catalog table name.

    With a real Iceberg catalog, ``snapshot_id`` pins the read to one
    consistent snapshot (reference: USE_SNAPSHOT slot creation,
    postgres/replication.go:100-112). On plain parquet the directory
    contents at read time are the snapshot.
    """
    if "/" in source or source.endswith(".parquet"):
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg table, not a parquet path")
        df = spark.read.parquet(source)
    else:
        reader = spark.read
        if snapshot_id is not None:
            if not _iceberg_available(spark):
                raise RuntimeError(
                    "snapshot_id requested but Iceberg runtime is not on the classpath"
                )
            reader = reader.option("snapshot-id", str(snapshot_id)).format("iceberg")
        df = reader.table(source)
    return validate_input_schema(df)


def incremental_read(
    spark: SparkSession,
    source: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Changed rows between two snapshots (reference: CDC stream, S3 —
    replication.go:136-227). Requires a real Iceberg catalog."""
    if not _iceberg_available(spark):
        raise RuntimeError("incremental reads need the Iceberg runtime on the classpath")
    reader = (
        spark.read.format("iceberg").option("start-snapshot-id", str(start_snapshot_id))
    )
    if end_snapshot_id is not None:
        reader = reader.option("end-snapshot-id", str(end_snapshot_id))
    return validate_input_schema(reader.table(source))
