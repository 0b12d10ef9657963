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
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return toks.select(
        "doc_id",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_TOKENS)
        .cast("long")
        .alias("pack_id"),
    )
