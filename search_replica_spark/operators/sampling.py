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


# ~rows per packing partition: small enough that a partition's rows fit
# comfortably in one Arrow batch stream, large enough that P stays modest
PACK_ROWS_PER_PART = 100_000


def _pack_partitions(spark, n_rows: int) -> int:
    """Shuffle width for packing, scaled by DATA (like build_index's
    segment width): a fixed width funnels a 100-TB corpus through a
    constant number of tasks; a data-scaled one keeps per-task row counts
    flat as the corpus grows. Floored at the cluster's parallelism so
    small inputs still use every core."""
    return max(spark.sparkContext.defaultParallelism, n_rows // PACK_ROWS_PER_PART + 1)


def _token_counts(d):
    return d.select(
        "doc_id",
        "lang",
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).cast("long").alias("n_tokens"),
    )


# Sequence packing: stream documents (in deterministic doc_id order) into
# fixed token-budget packs — the standard greedy streaming pack used to
# build fixed-length training sequences. pack_id = floor(cumulative tokens
# before this doc / budget): one running-sum window. Token count =
# whitespace tokens (documents.text contract).
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
    toks = _token_counts(d).drop("lang")
    # global running sum WITHOUT a single-partition window sort: the same
    # two-pass partition-offset pattern as assign_dense_doc_idx — range
    # partition by doc_id, collect per-partition token sums (O(P) driver
    # state), then each partition cumsums locally from its offset. The
    # numbers are identical to the window formulation; the plan scales
    # because P grows with the data, not a constant.
    P = _pack_partitions(spark, toks.count())
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


# Sharded sequence packing: one independent pack stream PER SHARD KEY
# (lang here; a real pipeline shards by data source / curriculum bucket).
# This is the form that actually runs at 100 TB — shards pack in parallel
# with no global sequence at all. Same two-pass cumsum, but the offsets
# are per (partition, shard): O(P × shards) driver state.
@register(
    "pack_sequences_by_lang",
    f"""SELECT doc_id, lang, n_tokens,
              CAST(FLOOR(CAST((SUM(n_tokens) OVER (PARTITION BY lang
                     ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                   AS DOUBLE) / {PACK_TOKENS}) AS BIGINT) AS pack_id
       FROM (SELECT doc_id, lang,
                    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
                      AS n_tokens
             FROM documents)""",
)
def pack_sequences_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # a NULL shard key is a real partition in SQL window semantics, but
    # pandas groupby drops NaN groups (and a None dict key would not match
    # the NaN the Arrow batch carries) — shard on a non-null sentinel
    # internally and emit the original lang untouched
    toks = _token_counts(d).withColumn(
        "_shard", F.coalesce(F.col("lang"), F.lit("\x00null"))
    )
    P = _pack_partitions(spark, toks.count())
    # range partition on (shard, doc_id): a shard may span partitions, but
    # its rows stay doc_id-ordered ACROSS partitions, so per-(pid, shard)
    # sums compose into exact per-shard running offsets
    ds = (
        toks.repartitionByRange(P, "_shard", "doc_id")
        .sortWithinPartitions("_shard", "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    shard_sums = (
        ds.groupBy("_pid", "_shard").agg(F.sum("n_tokens").alias("s")).collect()
    )
    offsets: dict[tuple[int, str], int] = {}
    seen: dict[str, int] = {}
    for r in sorted(shard_sums, key=lambda r: r["_pid"]):
        offsets[(int(r["_pid"]), r["_shard"])] = seen.get(r["_shard"], 0)
        seen[r["_shard"]] = seen.get(r["_shard"], 0) + int(r["s"])

    def fn(batches):
        import pandas as pd

        run: dict[str, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            pdf = pdf.reset_index(drop=True)
            pack = pd.Series(0, index=pdf.index, dtype="int64")
            for sh, g in pdf.groupby("_shard", sort=False):
                start = run.get(sh)
                if start is None:
                    start = offsets.get((pid, sh), 0)
                cum = g["n_tokens"].cumsum() + start
                run[sh] = int(cum.iloc[-1])
                pack.loc[g.index] = (cum - g["n_tokens"]) // PACK_TOKENS
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "n_tokens": pdf["n_tokens"],
                "pack_id": pack,
            })

    return ds.mapInPandas(
        fn, schema="doc_id long, lang string, n_tokens long, pack_id long"
    )


# Training-data source mixing by TEMPERATURE rebalancing (the multilingual
# pretraining scheme: sampling weight ∝ n^α with α=0.5, so large sources
# are down-weighted and small ones up-weighted without exploding their
# epoch count). Per-source quota = TARGET * floor(sqrt(n_src)) / Σ — the
# sqrt of an exact BIGINT count is IEEE-correctly-rounded in both engines,
# so floor(sqrt(n)) is deterministic cross-engine; quota arithmetic is
# pure integer. Selection within a source is the same md5-hash-order
# window as stratified sampling: the window partitions by source, so at
# 100 TB each source ranks only its own slice, and the quota table is a
# broadcast. TARGET docs total (up to floor rounding).
MIX_TARGET = 200


@register(
    "sample_temperature_mix",
    f"""WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        w AS (SELECT source, CAST(floor(sqrt(n)) AS BIGINT) AS s FROM cnt),
        tot AS (SELECT CAST(sum(s) AS BIGINT) AS ts FROM w),
        q AS (SELECT w.source, CAST(({MIX_TARGET} * w.s) // t.ts AS BIGINT) AS quota
              FROM w CROSS JOIN tot t),
        rk AS (SELECT source, doc_id,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                        AS rk
               FROM documents)
        SELECT rk.source, rk.doc_id
        FROM rk JOIN q USING (source) WHERE rk.rk <= q.quota""",
)
def sample_temperature_mix(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count("*").alias("n"))
    w = cnt.select("source", F.expr("CAST(floor(sqrt(n)) AS BIGINT)").alias("s"))
    tot = w.agg(F.expr("CAST(sum(s) AS BIGINT)").alias("ts"))
    q = w.crossJoin(F.broadcast(tot)).select(
        "source", F.expr(f"CAST(({MIX_TARGET} * s) DIV ts AS BIGINT)").alias("quota")
    )
    win = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    rk = d.select("source", "doc_id", F.row_number().over(win).alias("rk"))
    return (
        rk.join(F.broadcast(q), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .select("source", "doc_id")
    )
