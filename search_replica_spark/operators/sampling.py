"""Training-mix construction operators — the sampling/packing half of a
large-scale pretraining-data pipeline (task brief: "operations a
large-scale training-data pipeline would need").

All selections are DETERMINISTIC (md5-hash order, not rand()) so runs are
reproducible across cluster sizes and retries — the property a training
pipeline actually needs from its sampler — and every operator is an exact
DuckDB twin. Plan shapes: per-group window top-k (partitioned by the
stratum key, never a global sort) and one partial-aggregating groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from search_replica_spark.operators import load, register

STRATUM_QUOTA = 40  # docs kept per lang in the stratified sample
PACK_TOKENS = 2048  # token budget per training pack


# Stratified sampling: a fixed quota per stratum (lang), selected by
# deterministic hash order — the "N docs per language" mix step. At 100 TB
# the window is partitioned by the stratum, so each language sorts only
# its own partition slice (and a quota-sized heap would do; Spark's
# WindowExec + filter prunes equivalently after AQE).
@register(
    "sample_stratified_by_lang",
    f"""SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents) WHERE rk <= {STRATUM_QUOTA}""",
)
def sample_stratified_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= STRATUM_QUOTA)
        .select("lang", "doc_id")
    )


# Sequence packing: stream documents (in deterministic doc_id order) into
# fixed token-budget packs — the standard greedy streaming pack used to
# build fixed-length training sequences. pack_id = floor(cumulative tokens
# before this doc / budget): one running-sum window. Token count =
# whitespace tokens (documents.text contract). At 100 TB packing runs
# per-shard (partition by a shard key, pack within), which this same
# expression does once a shard column joins the partition clause.
@register(
    "pack_sequences",
    f"""SELECT doc_id, n_tokens,
              CAST(FLOOR(CAST((SUM(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                   AS DOUBLE) / {PACK_TOKENS}) AS BIGINT) AS pack_id
       FROM (SELECT doc_id,
                    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                      AS n_tokens
             FROM documents)""",
)
def pack_sequences(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).cast("long").alias("n_tokens"),
    )
    # global running sum WITHOUT a single-partition window sort: the same
    # two-pass partition-offset pattern as assign_dense_doc_idx — range
    # partition by doc_id, collect per-partition token sums (O(P) driver
    # state), then each partition cumsums locally from its offset. The
    # numbers are identical to the window formulation; the plan scales.
    P = 8
    ds = (
        toks.repartitionByRange(P, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ds.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    def fn(batches):
        import pandas as pd

        run = None
        for pdf in batches:
            if pdf.empty:
                continue
            if run is None:
                run = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            cum = pdf["n_tokens"].cumsum() + run
            run = int(cum.iloc[-1])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "pack_id": (cum - pdf["n_tokens"]) // PACK_TOKENS,
            })

    return ds.mapInPandas(fn, schema="doc_id long, n_tokens long, pack_id long")
