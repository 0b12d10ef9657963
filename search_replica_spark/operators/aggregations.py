"""Elasticsearch search-API aggregations, Spark-first (SURVEY §2B family).

The reference serves its index through the full ES search API, and real ES
users pair every query with aggregations — so an engine a reference user
could "switch to" needs them. Each aggregation here is the exact ES
semantics re-expressed as one Catalyst-optimized groupBy (partial
aggregation map-side, one shuffle on the bucket key — the plan that holds
at 100 TB), with a DuckDB twin:

  - ``terms``           — top-N buckets of a keyword field, ES tie-break
                          (doc_count desc, key asc)
  - ``stats``           — count/min/max/sum/avg, here as a sub-aggregation
                          inside a terms bucket (the idiomatic ES nesting)
  - ``percentiles``     — exact linear-interpolation percentiles (ES uses
                          TDigest approximations; we spec the exact value
                          so the oracle can verify it bit-for-bit)

Sums/avgs run over an integer column (n_chars), so cross-engine float
summation order cannot perturb the EXACT value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_replica_spark.operators import load, register

TOP_N = 3


# ES terms aggregation over a keyword field: {"terms": {"field": "lang"}}.
@register(
    "agg_terms_lang",
    f"""SELECT lang AS key, count(*) AS doc_count FROM documents
        GROUP BY lang ORDER BY doc_count DESC, key LIMIT {TOP_N}""",
)
def agg_terms_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.col("lang").alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(TOP_N)
    )


# ES stats sub-aggregation inside a terms bucket:
# {"terms": {"field": "lang"}, "aggs": {"stats": {"field": "n_chars"}}}.
@register(
    "agg_stats_by_lang",
    """SELECT lang AS key, count(*) AS cnt,
              min(n_chars) AS min_chars, max(n_chars) AS max_chars,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              CAST((1000000 * sum(n_chars)) // count(*) AS BIGINT)
                  AS avg_chars_micro
       FROM documents GROUP BY lang""",
)
def agg_stats_by_lang(spark, sf_dir):
    # Every output column is a BIGINT so the cross-engine value-hash is
    # bit-stable: DuckDB's HUGEINT sum is cast down, and the avg is an
    # integer-scaled micro value (floor(1e6 * sum / cnt)) instead of a
    # rounded DOUBLE whose last bits depend on the engine's division.
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("lang").alias("key")).agg(
        F.count("*").alias("cnt"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
        F.expr("(1000000 * sum(n_chars)) DIV count(*)").alias("avg_chars_micro"),
    )


# ES percentiles aggregation (exact-interpolation spec; ES's own numbers are
# TDigest approximations, so the deterministic exact value IS the contract
# here): {"percentiles": {"field": "n_chars", "percents": [50, 95]}}.
@register(
    "agg_percentiles_by_lang",
    """SELECT lang AS key,
              round(quantile_cont(n_chars, 0.5), 6) AS p50,
              round(quantile_cont(n_chars, 0.95), 6) AS p95
       FROM documents GROUP BY lang""",
)
def agg_percentiles_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("lang").alias("key")).agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("p95"),
    )


# ES cardinality aggregation: {"cardinality": {"field": "lang"}} per source
# bucket. The EXACT spec (twinnable); at 10^12 rows the engine swaps in
# Spark's approx_count_distinct (the same HyperLogLog++ family ES uses) —
# one flag, same plan shape (partial HLL sketches merge map-side).
@register(
    "agg_cardinality_langs",
    """SELECT source AS key, count(DISTINCT lang) AS langs,
              count(DISTINCT doc_id % 100) AS id_buckets
       FROM documents GROUP BY source""",
)
def agg_cardinality_langs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("source").alias("key")).agg(
        F.countDistinct("lang").alias("langs"),
        F.countDistinct(F.col("doc_id") % 100).alias("id_buckets"),
    )


# ES top_hits sub-aggregation: the top-2 docs per terms bucket, sorted by
# a field: {"terms": {"field": "lang"}, "aggs": {"top": {"top_hits":
# {"sort": [{"n_chars": "desc"}], "size": 2}}}}. Window top-k per bucket —
# partitioned by the bucket key, so the sort never goes global.
@register(
    "agg_top_hits_by_lang",
    """SELECT lang AS key, doc_id, n_chars FROM (
         SELECT lang, doc_id, n_chars,
                row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id) AS rk
         FROM documents) WHERE rk <= 2""",
)
def agg_top_hits_by_lang(spark, sf_dir):
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 2)
        .select(F.col("lang").alias("key"), "doc_id", "n_chars")
    )


# ES date_histogram with calendar_interval=day: calendar buckets (their
# lengths follow the calendar/zone — the thing fixed_interval windows
# cannot express) as one date_trunc groupBy.
@register(
    "agg_date_histogram_day",
    """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
              count(*) AS doc_count,
              round(sum(value), 6) AS total_value
       FROM events GROUP BY 1""",
)
def agg_date_histogram_day(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(
        F.count("*").alias("doc_count"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
