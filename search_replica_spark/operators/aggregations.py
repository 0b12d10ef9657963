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
              CAST((sum(n_chars) // count(*)) * 1000000
                   + ((sum(n_chars) % count(*)) * 1000000) // count(*)
                   AS BIGINT) AS avg_chars_micro
       FROM documents GROUP BY lang""",
)
def agg_stats_by_lang(spark, sf_dir):
    # Every output column is a BIGINT so the cross-engine value-hash is
    # bit-stable: DuckDB's HUGEINT sum is cast down, and the avg is an
    # integer-scaled micro value instead of a rounded DOUBLE whose last
    # bits depend on the engine's division. The micro value is computed as
    # quotient*1e6 + (remainder*1e6)//cnt — identical to
    # floor(1e6*sum/cnt) for non-negative inputs but never forms the
    # sum*1e6 product, which would wrap int64 in Spark's LONG arithmetic
    # once a bucket's char sum passes ~9.2e12 (DuckDB promotes to HUGEINT,
    # so a naive form diverges between engines exactly at scale).
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("lang").alias("key")).agg(
        F.count("*").alias("cnt"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
        F.expr(
            "(sum(n_chars) DIV count(*)) * 1000000"
            " + ((sum(n_chars) % count(*)) * 1000000) DIV count(*)"
        ).alias("avg_chars_micro"),
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


# ES histogram aggregation (numeric interval buckets):
# {"histogram": {"field": "n_chars", "interval": 100}} — one groupBy on the
# floored bucket key, partial-aggregating map-side like every bucket agg.
@register(
    "agg_histogram_nchars",
    """SELECT (n_chars // 100) * 100 AS bucket, count(*) AS doc_count
       FROM documents GROUP BY 1""",
)
def agg_histogram_nchars(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        (F.expr("n_chars DIV 100") * 100).alias("bucket")
    ).agg(F.count("*").alias("doc_count"))


# ES significant_terms aggregation: terms OVERREPRESENTED in a foreground
# set vs the background corpus ({"significant_terms": {"field": "text"}}
# under a lang filter). Scored by the integer-scaled RATE DIFFERENCE
# fg_rate_micro - bg_rate_micro (the first factor of ES's JLH heuristic)
# over terms with fg_df >= 3 — deterministic and bit-stable, and every
# intermediate product is df*1e6 <= ~1e18 even at 10^12 docs (a
# cross-multiplied lift ratio would wrap Spark's int64 at moderate corpus
# sizes while DuckDB promotes to HUGEINT — the exact cross-engine
# divergence this spec must avoid). Foreground docs counted once per term
# (document frequency, like ES); two partial aggregations, one shuffle
# each, then a top-N.
@register(
    "agg_significant_terms_de",
    """WITH tok AS (
         SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS term
         FROM documents
       ),
       tots AS (
         SELECT count(DISTINCT doc_id) AS bg_total,
                count(DISTINCT CASE WHEN lang = 'de' THEN doc_id END) AS fg_total
         FROM documents
       ),
       stats AS (
         SELECT term,
                count(*) AS bg_df,
                count(CASE WHEN lang = 'de' THEN 1 END) AS fg_df
         FROM tok GROUP BY term
       )
       SELECT term, fg_df, bg_df,
              CAST((fg_df * 1000000) // fg_total
                   - (bg_df * 1000000) // bg_total AS BIGINT) AS score_micro
       FROM stats, tots
       WHERE fg_df >= 3
       ORDER BY score_micro DESC, term LIMIT 10""",
)
def agg_significant_terms_de(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    tots = d.agg(
        F.countDistinct("doc_id").alias("bg_total"),
        F.countDistinct(F.when(F.col("lang") == "de", F.col("doc_id"))).alias(
            "fg_total"
        ),
    )
    stats = tok.groupBy("term").agg(
        F.count("*").alias("bg_df"),
        F.count(F.when(F.col("lang") == "de", 1)).alias("fg_df"),
    )
    return (
        stats.crossJoin(F.broadcast(tots))
        .filter(F.col("fg_df") >= 3)
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.expr(
                "(fg_df * 1000000) DIV fg_total - (bg_df * 1000000) DIV bg_total"
            ).alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), "term")
        .limit(10)
    )


# ES composite aggregation — PAGINATED buckets over a compound key with
# an after_key cursor ({"composite": {"sources": [lang, source],
# "after": {...}}}): the scalable way to enumerate ALL buckets (terms agg
# caps at size; composite streams pages). One groupBy + a tuple-compare
# cursor filter + ordered limit — the filter sits above the aggregate, so
# every page is one shuffle, and the cursor means no OFFSET skip-scan.
_AFTER = ("de", "src12")  # after_key from "page 1"


@register(
    "agg_composite_page2",
    f"""SELECT lang, source, count(*) AS doc_count FROM documents
        GROUP BY lang, source
        HAVING (lang, source) > ('{_AFTER[0]}', '{_AFTER[1]}')
        ORDER BY lang, source LIMIT 10""",
)
def agg_composite_page2(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    after = (F.col("lang") > _AFTER[0]) | (
        (F.col("lang") == _AFTER[0]) & (F.col("source") > _AFTER[1])
    )
    return (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("doc_count"))
        .filter(after)
        .orderBy("lang", "source")
        .limit(10)
    )


# ES filters aggregation — NAMED predicate buckets in one pass:
# {"filters": {"filters": {"short": {...}, "medium": {...}, "long":
# {...}}}}. One scan with conditional partial aggregation (no per-filter
# rescan), unpivoted to (bucket, doc_count) rows.
@register(
    "agg_filters_buckets",
    """SELECT 'long' AS bucket, count(CASE WHEN n_chars >= 1500 THEN 1 END) AS doc_count
       FROM documents
       UNION ALL
       SELECT 'medium', count(CASE WHEN n_chars >= 500 AND n_chars < 1500 THEN 1 END)
       FROM documents
       UNION ALL
       SELECT 'short', count(CASE WHEN n_chars < 500 THEN 1 END) FROM documents""",
)
def agg_filters_buckets(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    one = d.agg(
        F.count(F.when(F.col("n_chars") < 500, 1)).alias("short"),
        F.count(
            F.when((F.col("n_chars") >= 500) & (F.col("n_chars") < 1500), 1)
        ).alias("medium"),
        F.count(F.when(F.col("n_chars") >= 1500, 1)).alias("long"),
    )
    return one.selectExpr(
        "stack(3, 'short', short, 'medium', medium, 'long', long)"
        " AS (bucket, doc_count)"
    )


# ES range aggregation with explicit bounds (ES key format "from-to"):
# {"range": {"field": "n_chars", "ranges": [{"to": 500},
#  {"from": 500, "to": 1500}, {"from": 1500}]}}. Like every ES bucket agg
# this is one partial-aggregating pass — here a single stack() unpivot of
# three conditional counts, no shuffle per bucket.
@register(
    "agg_range_nchars",
    """SELECT '*-500.0' AS key, count(CASE WHEN n_chars < 500 THEN 1 END) AS doc_count
       FROM documents
       UNION ALL
       SELECT '500.0-1500.0',
              count(CASE WHEN n_chars >= 500 AND n_chars < 1500 THEN 1 END)
       FROM documents
       UNION ALL
       SELECT '1500.0-*', count(CASE WHEN n_chars >= 1500 THEN 1 END)
       FROM documents""",
)
def agg_range_nchars(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    one = d.agg(
        F.count(F.when(F.col("n_chars") < 500, 1)).alias("lo"),
        F.count(
            F.when((F.col("n_chars") >= 500) & (F.col("n_chars") < 1500), 1)
        ).alias("mid"),
        F.count(F.when(F.col("n_chars") >= 1500, 1)).alias("hi"),
    )
    return one.selectExpr(
        "stack(3, '*-500.0', lo, '500.0-1500.0', mid, '1500.0-*', hi)"
        " AS (key, doc_count)"
    )


# ES missing aggregation: {"missing": {"field": "label"}} — docs that lack
# an indexed value. The synthetic corpus has no null columns, so the agg
# runs over a DERIVED nullable field (label = lang unless 'go'), exercising
# the exact null-bucket semantics ES applies to absent values.
@register(
    "agg_missing_label",
    """SELECT count(*) - count(nullif(lang, 'go')) AS doc_count,
              CAST(count(nullif(lang, 'go')) AS BIGINT) AS present
       FROM documents""",
)
def agg_missing_label(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    label = F.expr("nullif(lang, 'go')")
    return d.agg(
        (F.count(F.lit(1)) - F.count(label)).alias("doc_count"),
        F.count(label).cast("long").alias("present"),
    )


# ES value_count + weighted_avg metric aggregations:
# {"value_count": {"field": "n_chars"}} and
# {"weighted_avg": {"value": {"field": "n_chars"},
#                   "weight": {"field": "w"}}} with a deterministic integer
# weight (doc_id % 10 + 1). The weighted mean is integer-scaled to
# micro-units in BOTH engines (quotient*1e6 + scaled remainder), so the
# value-hash gate compares exact integers — never engine float rounding.
@register(
    "agg_value_count_weighted_avg",
    """SELECT count(n_chars) AS value_count,
              CAST(sum(n_chars * (doc_id % 10 + 1)) AS BIGINT) AS wsum,
              CAST(sum(doc_id % 10 + 1) AS BIGINT) AS wtotal,
              CAST((sum(n_chars * (doc_id % 10 + 1)) // sum(doc_id % 10 + 1))
                   * 1000000
                   + ((sum(n_chars * (doc_id % 10 + 1))
                       % sum(doc_id % 10 + 1)) * 1000000)
                     // sum(doc_id % 10 + 1) AS BIGINT) AS weighted_avg_micro
       FROM documents""",
)
def agg_value_count_weighted_avg(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.agg(
        F.count("n_chars").alias("value_count"),
        F.expr("CAST(sum(n_chars * (doc_id % 10 + 1)) AS BIGINT)").alias("wsum"),
        F.expr("CAST(sum(doc_id % 10 + 1) AS BIGINT)").alias("wtotal"),
        F.expr(
            "CAST((sum(n_chars * (doc_id % 10 + 1)) DIV sum(doc_id % 10 + 1))"
            " * 1000000"
            " + ((sum(n_chars * (doc_id % 10 + 1)) % sum(doc_id % 10 + 1))"
            " * 1000000) DIV sum(doc_id % 10 + 1) AS BIGINT)"
        ).alias("weighted_avg_micro"),
    )


# ES PIPELINE aggregations — second-pass aggs over another agg's buckets:
# derivative, cumulative_sum, and moving_fn (trailing 3-bucket average)
# chained onto a date_histogram. The pipeline pass runs over n_buckets
# rows (already reduced by the histogram's map-side partial agg + one
# shuffle), so the global window here is post-aggregation and O(buckets),
# not O(corpus) — the same cost shape ES's reduce phase has. The moving
# average is integer-scaled micro (quotient form) so the value-hash is
# bit-stable cross-engine.
@register(
    "agg_pipeline_day",
    """WITH h AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1)
       SELECT bucket_start, doc_count,
              doc_count - lag(doc_count) OVER (ORDER BY bucket_start) AS derivative,
              CAST(sum(doc_count) OVER (ORDER BY bucket_start
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative,
              CAST((sum(doc_count) OVER w3 // count(*) OVER w3) * 1000000
                   + ((sum(doc_count) OVER w3 % count(*) OVER w3) * 1000000)
                     // count(*) OVER w3 AS BIGINT) AS moving_avg3_micro
       FROM h
       WINDOW w3 AS (ORDER BY bucket_start ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       ORDER BY bucket_start""",
)
def agg_pipeline_day(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(F.count("*").alias("doc_count"))
    w = Window.orderBy("bucket_start")
    w3 = w.rowsBetween(-2, 0)
    return (
        h.withColumn("s3", F.sum("doc_count").over(w3))
        .withColumn("n3", F.count("*").over(w3))
        .select(
            "bucket_start",
            "doc_count",
            (F.col("doc_count") - F.lag("doc_count").over(w)).alias("derivative"),
            F.sum("doc_count")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cumulative"),
            F.expr("(s3 DIV n3) * 1000000 + ((s3 % n3) * 1000000) DIV n3").alias(
                "moving_avg3_micro"
            ),
        )
        .orderBy("bucket_start")
    )


# ES max_bucket sibling pipeline agg: which bucket of the histogram has
# the largest doc_count ({"max_bucket": {"buckets_path": "days>_count"}}).
@register(
    "agg_max_bucket_day",
    """WITH h AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1)
       SELECT bucket_start AS key, doc_count AS value FROM h
       ORDER BY doc_count DESC, bucket_start LIMIT 1""",
)
def agg_max_bucket_day(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(F.count("*").alias("doc_count"))
    return (
        h.select(F.col("bucket_start").alias("key"), F.col("doc_count").alias("value"))
        .orderBy(F.col("value").desc(), F.col("key").asc())
        .limit(1)
    )


# ES rare_terms aggregation: buckets whose doc_count is at or below a
# threshold, ordered ASCENDING by count (the long tail the terms agg's
# top-N misses). Run over corpus tokens — the field with a real long
# tail here. One groupBy on the term, threshold filter above it; at scale
# this is the same single shuffle as terms (ES itself needs a CuckooFilter
# only because it streams — a batch engine just filters the aggregate).
# Threshold is RELATIVE (≤ 10% of corpus docs) so the spec is
# scale-invariant: the synthetic vocabulary is closed, so an absolute
# max_doc_count (ES's knob) would flip between vacuous and all-matching
# across scale factors.
@register(
    "agg_rare_terms_tokens",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
       n AS (SELECT count(*) AS total FROM documents)
       SELECT term AS key, count(DISTINCT doc_id) AS doc_count
       FROM tok CROSS JOIN n GROUP BY term, n.total
       HAVING count(DISTINCT doc_id) <= n.total // 10
       ORDER BY doc_count, key""",
)
def agg_rare_terms_tokens(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    total = d.count()
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        tok.groupBy(F.col("term").alias("key"))
        .agg(F.countDistinct("doc_id").alias("doc_count"))
        .where(F.col("doc_count") <= total // 10)
        .orderBy("doc_count", "key")
    )


# ES multi_terms aggregation: buckets keyed by a COMPOSITE of fields
# ({"multi_terms": {"terms": [{"field": "lang"}, {"field": "source"}]}}),
# ES tie-break (doc_count desc, then each key ascending).
@register(
    "agg_multi_terms_lang_source",
    """SELECT lang, source, count(*) AS doc_count,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM documents GROUP BY lang, source
       ORDER BY doc_count DESC, lang, source LIMIT 10""",
)
def agg_multi_terms_lang_source(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(F.count("*").alias("doc_count"), F.sum("n_chars").alias("sum_chars"))
        .orderBy(F.col("doc_count").desc(), "lang", "source")
        .limit(10)
    )


# ES bucket_selector + bucket_sort pipeline aggs: histogram buckets are
# FILTERED by a metric predicate (bucket_selector ≈ HAVING) then SORTED by
# a metric with a size cut (bucket_sort ≈ ORDER BY … LIMIT). Metric kept
# integer (sum) so the value-hash is float-free.
@register(
    "agg_bucket_selector_sort",
    """WITH h AS (
         SELECT (n_chars // 100) * 100 AS bucket,
                count(*) AS doc_count,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1)
       SELECT bucket, doc_count, sum_chars FROM h
       WHERE doc_count >= 20
       ORDER BY sum_chars DESC, bucket LIMIT 3""",
)
def agg_bucket_selector_sort(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    h = d.groupBy((F.expr("n_chars DIV 100") * 100).alias("bucket")).agg(
        F.count("*").alias("doc_count"), F.sum("n_chars").alias("sum_chars")
    )
    return (
        h.where(F.col("doc_count") >= 20)
        .orderBy(F.col("sum_chars").desc(), "bucket")
        .limit(3)
    )


# ES serial_diff pipeline agg with lag=7: value minus the value 7 buckets
# earlier in the date-histogram — the de-seasonalized week-over-week
# signal ({"serial_diff": {"buckets_path": "the_sum", "lag": 7}}).
@register(
    "agg_serial_diff_week",
    """WITH h AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1)
       SELECT bucket_start, doc_count,
              doc_count - lag(doc_count, 7) OVER (ORDER BY bucket_start)
                AS serial_diff_7
       FROM h ORDER BY bucket_start""",
)
def agg_serial_diff_week(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(F.count("*").alias("doc_count"))
    w = Window.orderBy("bucket_start")
    return h.select(
        "bucket_start",
        "doc_count",
        (F.col("doc_count") - F.lag("doc_count", 7).over(w)).alias("serial_diff_7"),
    ).orderBy("bucket_start")


# ES adjacency_matrix aggregation: named filters, one bucket per filter
# AND per intersecting PAIR ({"adjacency_matrix": {"filters": {...}}} —
# ES names intersections "a&b"). Filters here are term-presence predicates
# over the token set; the whole matrix is ONE pass: per-doc filter flags,
# then an aggregate per bucket key — no per-pair scans.
_ADJ_FILTERS = (("has_hash", "hash"), ("has_join", "join"), ("has_spark", "spark"))


def _adjacency_sql() -> str:
    flags = ",\n       ".join(
        f"max(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS {n}"
        for n, t in _ADJ_FILTERS
    )
    singles = [
        f"SELECT '{n}' AS key, CAST(sum({n}) AS BIGINT) AS doc_count FROM flags"
        for n, _t in _ADJ_FILTERS
    ]
    pairs = [
        f"SELECT '{a}&{b}' AS key, CAST(sum(CASE WHEN {a} = 1 AND {b} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS doc_count FROM flags"
        for i, (a, _x) in enumerate(_ADJ_FILTERS)
        for b, _y in [f for f in _ADJ_FILTERS[i + 1:]]
    ]
    union = "\nUNION ALL\n".join(singles + pairs)
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
flags AS (SELECT doc_id,
       {flags}
          FROM tok GROUP BY doc_id)
SELECT key, doc_count FROM ({union}) WHERE doc_count > 0 ORDER BY key
"""


@register("agg_adjacency_matrix", _adjacency_sql())
def agg_adjacency_matrix(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    flags = tok.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, 1).otherwise(0)).alias(n)
            for n, t in _ADJ_FILTERS
        ]
    )
    aggs = [F.sum(n).cast("long").alias(n) for n, _t in _ADJ_FILTERS]
    aggs += [
        F.sum(F.when((F.col(a) == 1) & (F.col(b) == 1), 1).otherwise(0))
        .cast("long")
        .alias(f"{a}&{b}")
        for i, (a, _x) in enumerate(_ADJ_FILTERS)
        for b, _y in _ADJ_FILTERS[i + 1:]
    ]
    wide = flags.agg(*aggs)
    names = [c for c in wide.columns]
    stacked = wide.select(
        F.expr(
            "stack({}, {})".format(
                len(names),
                ", ".join(f"'{n}', `{n}`" for n in names),
            )
        ).alias("key", "doc_count")
    )
    return stacked.where(F.col("doc_count") > 0).orderBy("key")


# ES diversified_sampler aggregation: a deterministic sample capped at
# max_docs_per_value per diversity field (lang), feeding a sub-agg. ES
# samples by shard order; the reproducible spec here takes each lang's
# LOWEST doc_ids (rank over a window partitioned by lang) — same dedup-
# the-dominant-value behavior, exactly twinnable. The sub-agg (avg via
# integer micro) runs over the diversified sample only.
_DIV_MAX_PER_LANG = 20


@register(
    "agg_diversified_sampler_stats",
    f"""WITH r AS (SELECT doc_id, lang, n_chars,
                          row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                            AS rn
                   FROM documents)
        SELECT count(*) AS sample_size,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               (1000000 * CAST(sum(n_chars) AS BIGINT)) // count(*)
                 AS avg_chars_micro
        FROM r WHERE rn <= {_DIV_MAX_PER_LANG}""",
)
def agg_diversified_sampler_stats(spark, sf_dir):
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    r = d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
    return (
        r.where(F.col("rn") <= _DIV_MAX_PER_LANG)
        .agg(
            F.count("*").alias("sample_size"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.expr("(1000000 * CAST(sum(n_chars) AS BIGINT)) DIV count(*)").alias(
                "avg_chars_micro"
            ),
        )
    )


# ES top_metrics aggregation: per bucket, the metric value carried by the
# doc that wins the sort ({"top_metrics": {"metrics": {"field": "n_chars"},
# "sort": {"doc_id": "desc"}}}) — one max_by/arg_max per bucket, a single
# partial-aggregable shuffle (cheaper than top_hits when only the metric
# is wanted).
@register(
    "agg_top_metrics_by_lang",
    """SELECT lang AS key,
              arg_max(n_chars, doc_id) AS top_n_chars,
              max(doc_id) AS top_sort
       FROM documents GROUP BY lang""",
)
def agg_top_metrics_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("lang").alias("key")).agg(
        F.expr("max_by(n_chars, doc_id)").alias("top_n_chars"),
        F.max("doc_id").alias("top_sort"),
    )


# ES median_absolute_deviation aggregation over n_chars per lang. Exact
# spec: MAD = median(|x − median(x)|); medians are linear-interpolated
# (Spark `percentile` / DuckDB quantile_cont — both exact). Integer
# n_chars makes median granularity 0.5 and the inner |x − med| granularity
# 0.5, so the outer median has granularity 0.25: ×4 scaling emits an
# exact BIGINT (no float hash hazard).
@register(
    "agg_mad_by_lang",
    """WITH med AS (SELECT lang, quantile_cont(n_chars, 0.5) AS m
                    FROM documents GROUP BY lang)
       SELECT d.lang AS key,
              CAST(4 * quantile_cont(abs(d.n_chars - med.m), 0.5) AS BIGINT)
                AS mad_x4
       FROM documents d JOIN med USING (lang)
       GROUP BY d.lang""",
)
def agg_mad_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(F.expr("percentile(n_chars, 0.5)").alias("m"))
    return (
        d.join(F.broadcast(med), "lang")
        .groupBy(F.col("lang").alias("key"))
        .agg(
            F.expr("CAST(4 * percentile(abs(n_chars - m), 0.5) AS BIGINT)").alias(
                "mad_x4"
            )
        )
    )


# ES string_stats aggregation over the lang field: count, min/max/avg
# length, and Shannon CHARACTER entropy. Entropy terms are floored to
# integer micro-nats per distinct character before the sum, so the value
# is exact integer arithmetic in both engines (same pattern as the
# bigram-LM scorer).
@register(
    "agg_string_stats_lang",
    """WITH ch AS (SELECT unnest(string_split(lang, '')) AS c FROM documents),
       hist AS (SELECT c, count(*) AS cnt FROM ch GROUP BY c),
       tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM hist),
       ent AS (SELECT CAST(sum(CAST(floor(-(hist.cnt * 1.0 / tot.t)
                                           * ln(hist.cnt * 1.0 / tot.t)
                                           * 1000000) AS BIGINT)) AS BIGINT)
                 AS entropy_micro
               FROM hist CROSS JOIN tot)
       SELECT count(*) AS cnt,
              min(length(lang)) AS min_len,
              max(length(lang)) AS max_len,
              CAST((sum(length(lang)) // count(*)) * 1000000
                   + ((sum(length(lang)) % count(*)) * 1000000) // count(*)
                   AS BIGINT) AS avg_len_micro,
              (SELECT entropy_micro FROM ent) AS entropy_micro
       FROM documents""",
)
def agg_string_stats_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    ch = d.select(F.explode(F.split("lang", "")).alias("c")).where(F.col("c") != "")
    hist = ch.groupBy("c").agg(F.count("*").alias("cnt"))
    t = int(hist.agg(F.sum("cnt")).collect()[0][0])
    ent = int(
        hist.select(
            F.floor(
                -(F.col("cnt") / F.lit(float(t)))
                * F.log(F.col("cnt") / F.lit(float(t)))
                * 1000000
            )
            .cast("long")
            .alias("e")
        )
        .agg(F.sum("e"))
        .collect()[0][0]
    )
    return d.agg(
        F.count("*").alias("cnt"),
        F.min(F.length("lang")).alias("min_len"),
        F.max(F.length("lang")).alias("max_len"),
        F.expr(
            "CAST((sum(length(lang)) DIV count(*)) * 1000000"
            " + ((sum(length(lang)) % count(*)) * 1000000) DIV count(*) AS BIGINT)"
        ).alias("avg_len_micro"),
        F.lit(ent).alias("entropy_micro"),
    )

# ES extended_stats aggregation ({"extended_stats": {"field": "n_chars"}}):
# stats plus sum_of_squares and variance. All outputs are BIGINT: variance
# is emitted in integer micro units via the quotient-remainder pattern
# (never 1e6 * a raw sum, which wraps in Spark while DuckDB promotes to
# HUGEINT), composed as E[x^2]_micro - mean_milli^2 with identical floor
# order in both engines. The mean rides at MILLI scale so its square (=
# micro units) stays far inside BIGINT — a micro-scale mean would wrap
# Spark's non-ANSI multiply once the bucket mean passes ~3e3, milli is
# safe to ~3e6. std_deviation is omitted by spec: sqrt is the one factor
# that cannot be made exact-integer cross-engine.
_MEAN_MILLI = (
    "(sum(n_chars) {d} count(*)) * 1000"
    " + ((sum(n_chars) % count(*)) * 1000) {d} count(*)"
)
_EX2_MICRO = (
    "(sum(n_chars * n_chars) {d} count(*)) * 1000000"
    " + ((sum(n_chars * n_chars) % count(*)) * 1000000) {d} count(*)"
)


@register(
    "agg_extended_stats_by_lang",
    f"""SELECT lang AS key, count(*) AS cnt,
              min(n_chars) AS min_chars, max(n_chars) AS max_chars,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq,
              CAST(({_EX2_MICRO.format(d='//')})
                   - (({_MEAN_MILLI.format(d='//')})
                      * ({_MEAN_MILLI.format(d='//')}))
                   AS BIGINT) AS variance_micro
       FROM documents GROUP BY lang""",
)
def agg_extended_stats_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("lang").alias("key")).agg(
        F.count("*").alias("cnt"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.expr("CAST(sum(n_chars) AS BIGINT)").alias("sum_chars"),
        F.expr("CAST(sum(n_chars * n_chars) AS BIGINT)").alias("sum_sq"),
        F.expr(
            f"CAST(({_EX2_MICRO.format(d='DIV')})"
            f" - (({_MEAN_MILLI.format(d='DIV')})"
            f" * ({_MEAN_MILLI.format(d='DIV')})) AS BIGINT)"
        ).alias("variance_micro"),
    )


# ES boxplot aggregation ({"boxplot": {"field": "n_chars"}}): min, max and
# the three quartiles. Linear-interpolated quartiles over integers have
# granularity 1/4 (fractional position is a multiple of 0.25), so x4
# scaling emits an exact BIGINT — the same trick as agg_mad_by_lang.
@register(
    "agg_boxplot_by_lang",
    """SELECT lang AS key,
              min(n_chars) AS min_chars, max(n_chars) AS max_chars,
              CAST(4 * quantile_cont(n_chars, 0.25) AS BIGINT) AS q1_x4,
              CAST(4 * quantile_cont(n_chars, 0.50) AS BIGINT) AS q2_x4,
              CAST(4 * quantile_cont(n_chars, 0.75) AS BIGINT) AS q3_x4
       FROM documents GROUP BY lang""",
)
def agg_boxplot_by_lang(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.col("lang").alias("key")).agg(
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.expr("CAST(4 * percentile(n_chars, 0.25D) AS BIGINT)").alias("q1_x4"),
        F.expr("CAST(4 * percentile(n_chars, 0.50D) AS BIGINT)").alias("q2_x4"),
        F.expr("CAST(4 * percentile(n_chars, 0.75D) AS BIGINT)").alias("q3_x4"),
    )


# ES matrix_stats aggregation over (n_chars, token count): the exact
# per-bucket second-moment sums a distributed engine actually shuffles
# (count, sum_x, sum_y, sum_xx, sum_yy, sum_xy — all exact BIGINT; any
# mean/variance/covariance/correlation is a driver-side O(buckets)
# arithmetic step over them), plus covariance in integer micro units with
# the same floor-order-matched composition as extended_stats. One
# partial-aggregable shuffle; moments merge associatively at 100 TB.
# covariance_micro = E[xy]_micro - mean_x_milli * mean_y_milli: the means
# ride at MILLI scale so their product (= micro units) cannot wrap
# Spark's non-ANSI BIGINT multiply (micro-scale means would overflow once
# mean_x * mean_y passes ~9.2e6)
_MS_COV = (
    "((sum(x * y) {d} count(*)) * 1000000"
    " + ((sum(x * y) % count(*)) * 1000000) {d} count(*))"
    " - ( ((sum(x) {d} count(*)) * 1000"
    "      + ((sum(x) % count(*)) * 1000) {d} count(*))"
    "   * ((sum(y) {d} count(*)) * 1000"
    "      + ((sum(y) % count(*)) * 1000) {d} count(*)) )"
)


@register(
    "agg_matrix_stats_moments",
    f"""WITH xy AS (SELECT lang, n_chars AS x,
                           CAST(length(string_split(text, ' ')) AS BIGINT) AS y
                    FROM documents)
       SELECT lang AS key, count(*) AS cnt,
              CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
              CAST(sum(x * x) AS BIGINT) AS sum_xx,
              CAST(sum(y * y) AS BIGINT) AS sum_yy,
              CAST(sum(x * y) AS BIGINT) AS sum_xy,
              CAST({_MS_COV.format(d='//')} AS BIGINT) AS cov_micro
       FROM xy GROUP BY lang""",
)
def agg_matrix_stats_moments(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    xy = d.select(
        "lang",
        F.col("n_chars").alias("x"),
        F.size(F.split("text", " ")).cast("long").alias("y"),
    )
    return xy.groupBy(F.col("lang").alias("key")).agg(
        F.count("*").alias("cnt"),
        F.expr("CAST(sum(x) AS BIGINT)").alias("sum_x"),
        F.expr("CAST(sum(y) AS BIGINT)").alias("sum_y"),
        F.expr("CAST(sum(x * x) AS BIGINT)").alias("sum_xx"),
        F.expr("CAST(sum(y * y) AS BIGINT)").alias("sum_yy"),
        F.expr("CAST(sum(x * y) AS BIGINT)").alias("sum_xy"),
        F.expr(f"CAST({_MS_COV.format(d='DIV')} AS BIGINT)").alias("cov_micro"),
    )


# ES random_sampler aggregation ({"random_sampler": {"probability":
# 3/16}}): aggregate over a deterministic sample and report the
# probability-corrected estimate. The "random" stream is the first hex
# digit of md5(doc_id) — identical in both engines, shuffle-free to
# evaluate, and stable across runs (ES seeds its sampler the same way).
# Estimate emitted in integer micro-docs ((cnt * 16e6) DIV 3).
@register(
    "agg_random_sampler_stats",
    """WITH s AS (SELECT n_chars FROM documents
                  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2'))
       SELECT count(*) AS sampled_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              CAST((count(*) * 16000000) // 3 AS BIGINT) AS est_doc_count_micro
       FROM s""",
)
def agg_random_sampler_stats(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    s = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1", "2")
    )
    return s.agg(
        F.count("*").alias("sampled_docs"),
        F.expr("CAST(sum(n_chars) AS BIGINT)").alias("sum_chars"),
        F.expr("CAST((count(*) * 16000000) DIV 3 AS BIGINT)").alias(
            "est_doc_count_micro"
        ),
    )


# ES stats_bucket sibling pipeline aggregation ({"stats_bucket":
# {"buckets_path": "langs>chars"}}): stats over the per-lang sum(n_chars)
# bucket values — subsumes avg_bucket/min_bucket/max_bucket/sum_bucket.
# Two tiny cascaded aggregations; the second runs over O(buckets) rows.
@register(
    "agg_stats_bucket_chars",
    """WITH b AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS v
                  FROM documents GROUP BY lang)
       SELECT count(*) AS n_buckets, min(v) AS min_bucket, max(v) AS max_bucket,
              CAST(sum(v) AS BIGINT) AS sum_buckets,
              CAST((sum(v) // count(*)) * 1000000
                   + ((sum(v) % count(*)) * 1000000) // count(*)
                   AS BIGINT) AS avg_bucket_micro
       FROM b""",
)
def agg_stats_bucket_chars(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(F.expr("CAST(sum(n_chars) AS BIGINT)").alias("v"))
    return b.agg(
        F.count("*").alias("n_buckets"),
        F.min("v").alias("min_bucket"),
        F.max("v").alias("max_bucket"),
        F.expr("CAST(sum(v) AS BIGINT)").alias("sum_buckets"),
        F.expr(
            "CAST((sum(v) DIV count(*)) * 1000000"
            " + ((sum(v) % count(*)) * 1000000) DIV count(*) AS BIGINT)"
        ).alias("avg_bucket_micro"),
    )


# ES bucket_script pipeline aggregation: a per-bucket script over sibling
# metrics — here each lang bucket's share of total docs
# ("params.count / params.total"), in integer micro units. The total is a
# 1-row broadcast joined back to the buckets (same shape as
# significant_terms' background join — no second scan of the fact table).
@register(
    "agg_bucket_script_share",
    """WITH b AS (SELECT lang, count(*) AS doc_count FROM documents GROUP BY lang),
       t AS (SELECT CAST(sum(doc_count) AS BIGINT) AS tot FROM b)
       SELECT b.lang AS key, b.doc_count,
              CAST((b.doc_count * 1000000) // t.tot AS BIGINT) AS share_micro
       FROM b CROSS JOIN t""",
)
def agg_bucket_script_share(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(F.count("*").alias("doc_count"))
    t = b.agg(F.expr("CAST(sum(doc_count) AS BIGINT)").alias("tot"))
    return b.crossJoin(F.broadcast(t)).select(
        F.col("lang").alias("key"),
        "doc_count",
        F.expr("CAST((doc_count * 1000000) DIV tot AS BIGINT)").alias("share_micro"),
    )


# ES nested + reverse_nested aggregations: bucket over NESTED docs (order
# items, histogram on quantity band), each bucket reporting both the
# nested doc_count (items) and the reverse_nested parent count (distinct
# orders). The Spark side goes through the ACTUAL assembled array column
# (collect_list → explode — the nested doc store a P11-inlined index
# holds, same modeling as b7_nested_array_query), then one
# partial-aggregable groupBy; count(DISTINCT parent) IS reverse_nested.
@register(
    "agg_nested_reverse_orders",
    """SELECT CAST(l_quantity AS BIGINT) // 10 AS qband,
              count(*) AS item_count,
              count(DISTINCT l_orderkey) AS order_count
       FROM lineitem GROUP BY qband ORDER BY qband""",
)
def agg_nested_reverse_orders(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_partkey", "l_quantity")).alias("items")
    )
    ex = nested.select("l_orderkey", F.explode("items").alias("it"))
    return (
        ex.groupBy(F.expr("CAST(it.l_quantity AS BIGINT) DIV 10").alias("qband"))
        .agg(
            F.count("*").alias("item_count"),
            F.countDistinct("l_orderkey").alias("order_count"),
        )
        .orderBy("qband")
    )


# ES percentile_ranks aggregation ({"percentile_ranks": {"field":
# "n_chars", "values": [100, 200, 400]}}): for each given value, the
# percentage of docs at or below it. rank_micro = (1e6 * count(x <= v))
# DIV count(*) — pure integer, one scan with three conditional counts
# (no per-value subquery).
@register(
    "agg_percentile_ranks",
    """SELECT lang AS key,
              (1000000 * CAST(sum(CASE WHEN n_chars <= 100 THEN 1 ELSE 0 END) AS BIGINT))
                // count(*) AS rank_100_micro,
              (1000000 * CAST(sum(CASE WHEN n_chars <= 200 THEN 1 ELSE 0 END) AS BIGINT))
                // count(*) AS rank_200_micro,
              (1000000 * CAST(sum(CASE WHEN n_chars <= 400 THEN 1 ELSE 0 END) AS BIGINT))
                // count(*) AS rank_400_micro
       FROM documents GROUP BY lang""",
)
def agg_percentile_ranks(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    cols = [
        F.expr(
            f"(1000000 * CAST(sum(CASE WHEN n_chars <= {v} THEN 1 ELSE 0 END) AS BIGINT))"
            f" DIV count(*)"
        ).alias(f"rank_{v}_micro")
        for v in (100, 200, 400)
    ]
    return d.groupBy(F.col("lang").alias("key")).agg(*cols)


# ES auto_date_histogram: the engine PICKS the calendar interval — the
# smallest rung of the day→week→month ladder whose bucket count fits the
# target (ES's rounding ladder, target_buckets=10). Both engines derive
# the choice from the data's day span (one O(1) min/max aggregate,
# broadcast as a 1-row join — the same reduce-phase shape ES uses), so
# the interval is part of the verified output. One groupBy on the chosen
# truncation; calendar weeks are ISO Monday-start in Spark and DuckDB.
_AUTO_DH_TARGET = 10


@register(
    "agg_auto_date_histogram",
    f"""WITH bounds AS (
          SELECT date_diff('day', date_trunc('day', min(ts)),
                           date_trunc('day', max(ts))) + 1 AS nd
          FROM events),
        ch AS (SELECT CASE WHEN nd <= {_AUTO_DH_TARGET} THEN 'day'
                           WHEN nd <= {7 * _AUTO_DH_TARGET} THEN 'week'
                           ELSE 'month' END AS iv FROM bounds)
        SELECT iv AS interval,
               CAST(epoch(CASE WHEN iv = 'day'  THEN date_trunc('day', ts)
                               WHEN iv = 'week' THEN date_trunc('week', ts)
                               ELSE date_trunc('month', ts) END) AS BIGINT)
                 AS bucket_start,
               count(*) AS doc_count
        FROM events CROSS JOIN ch GROUP BY 1, 2 ORDER BY bucket_start""",
)
def agg_auto_date_histogram(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    ch = e.agg(
        F.expr(
            "datediff(date_trunc('day', max(ts)), date_trunc('day', min(ts))) + 1"
        ).alias("nd")
    ).select(
        F.expr(
            f"CASE WHEN nd <= {_AUTO_DH_TARGET} THEN 'day'"
            f" WHEN nd <= {7 * _AUTO_DH_TARGET} THEN 'week'"
            " ELSE 'month' END"
        ).alias("iv")
    )
    return (
        e.crossJoin(F.broadcast(ch))
        .groupBy(
            F.col("iv").alias("interval"),
            F.unix_timestamp(
                F.expr(
                    "CASE WHEN iv = 'day' THEN date_trunc('day', ts)"
                    " WHEN iv = 'week' THEN date_trunc('week', ts)"
                    " ELSE date_trunc('month', ts) END"
                )
            ).alias("bucket_start"),
        )
        .agg(F.count("*").alias("doc_count"))
        .orderBy("bucket_start")
    )


# ES date_range aggregation: explicit half-open [from, to) calendar
# buckets, keyed the way ES keys them ("*-to" / "from-to" / "from-*").
# One CASE groupBy — a single map-side-combining shuffle.
_DR_LO, _DR_HI = "2024-01-10", "2024-01-20"


@register(
    "agg_date_range",
    f"""SELECT CASE WHEN ts < TIMESTAMP '{_DR_LO}' THEN '*-{_DR_LO}'
                    WHEN ts < TIMESTAMP '{_DR_HI}' THEN '{_DR_LO}-{_DR_HI}'
                    ELSE '{_DR_HI}-*' END AS key,
               count(*) AS doc_count,
               CAST(min(event_id) AS BIGINT) AS min_event,
               CAST(max(event_id) AS BIGINT) AS max_event
        FROM events GROUP BY 1 ORDER BY key""",
)
def agg_date_range(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    key = F.expr(
        f"CASE WHEN ts < TIMESTAMP '{_DR_LO}' THEN '*-{_DR_LO}'"
        f" WHEN ts < TIMESTAMP '{_DR_HI}' THEN '{_DR_LO}-{_DR_HI}'"
        f" ELSE '{_DR_HI}-*' END"
    )
    return (
        e.groupBy(key.alias("key"))
        .agg(
            F.count("*").alias("doc_count"),
            F.min("event_id").cast("long").alias("min_event"),
            F.max("event_id").cast("long").alias("max_event"),
        )
        .orderBy("key")
    )


# ES cumulative_cardinality pipeline agg: distinct users seen up to and
# including each day bucket. Exact form: each user's FIRST day (one
# groupBy on user), histogram of firsts, running sum stitched onto the
# day histogram — counts every user once, which is precisely what the
# cumulative cardinality is; the running window is post-aggregation and
# O(buckets). ES computes this approximately from merged HLL sketches;
# we spec the exact value so the oracle verifies bit-for-bit.
@register(
    "agg_cumulative_cardinality",
    """WITH days AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1),
       firsts AS (
         SELECT user_id,
                min(CAST(epoch(date_trunc('day', ts)) AS BIGINT)) AS bucket_start
         FROM events GROUP BY user_id),
       nu AS (SELECT bucket_start, count(*) AS new_users FROM firsts GROUP BY 1)
       SELECT days.bucket_start, days.doc_count,
              CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
              CAST(sum(coalesce(nu.new_users, 0))
                   OVER (ORDER BY days.bucket_start) AS BIGINT)
                AS cumulative_users
       FROM days LEFT JOIN nu USING (bucket_start)
       ORDER BY bucket_start""",
)
def agg_cumulative_cardinality(spark, sf_dir):
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts")))
    days = e.groupBy(day.alias("bucket_start")).agg(F.count("*").alias("doc_count"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("bucket_start"))
    nu = firsts.groupBy("bucket_start").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("bucket_start").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(nu, "bucket_start", "left")
        .withColumn("new_users", F.coalesce(F.col("new_users"), F.lit(0)).cast("long"))
        .withColumn("cumulative_users", F.sum("new_users").over(w).cast("long"))
        .orderBy("bucket_start")
    )


# ES normalize pipeline agg (method=percent_of_sum): each day bucket's
# doc_count as a share of the histogram total, in integer MICRO-PERCENT
# (doc_count·100·1e6 // total — exact cross-engine; a float percentage
# would hash-diverge). The total is a 1-row broadcast join, the same
# shape as bucket_script; everything after the histogram is O(buckets).
@register(
    "agg_normalize_percent",
    """WITH h AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1),
       t AS (SELECT sum(doc_count) AS total FROM h)
       SELECT bucket_start, doc_count,
              CAST((doc_count * 100000000) // total AS BIGINT)
                AS percent_of_sum_micro
       FROM h CROSS JOIN t ORDER BY bucket_start""",
)
def agg_normalize_percent(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(F.count("*").alias("doc_count"))
    t = h.agg(F.sum("doc_count").alias("total"))
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "bucket_start",
            "doc_count",
            F.expr("CAST((doc_count * 100000000) DIV total AS BIGINT)").alias(
                "percent_of_sum_micro"
            ),
        )
        .orderBy("bucket_start")
    )


# ES percentiles_bucket sibling pipeline agg: percentiles OVER the bucket
# values of another agg ({"percentiles_bucket": {"buckets_path":
# "days>_count"}}). Values are the day-histogram doc_counts; quartiles at
# 1/4 granularity are emitted ×4 (exact BIGINT — the boxplot pattern), so
# the hash gate sees integers, never interpolated floats.
@register(
    "agg_percentiles_bucket_day",
    """WITH h AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1)
       SELECT CAST(4 * quantile_cont(doc_count, 0.25) AS BIGINT) AS p25_x4,
              CAST(4 * quantile_cont(doc_count, 0.50) AS BIGINT) AS p50_x4,
              CAST(4 * quantile_cont(doc_count, 0.75) AS BIGINT) AS p75_x4
       FROM h""",
)
def agg_percentiles_bucket_day(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(F.count("*").alias("doc_count"))
    return h.agg(
        F.expr("CAST(4 * percentile(doc_count, 0.25) AS BIGINT)").alias("p25_x4"),
        F.expr("CAST(4 * percentile(doc_count, 0.50) AS BIGINT)").alias("p50_x4"),
        F.expr("CAST(4 * percentile(doc_count, 0.75) AS BIGINT)").alias("p75_x4"),
    )


# ES rate aggregation: a bucket's count re-scaled to a smaller calendar
# unit ({"rate": {"unit": "day"}} inside a WEEK date_histogram) — emitted
# in integer micro-events-per-day so the twin is bit-stable.
@register(
    "agg_rate_per_day",
    """SELECT CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_start,
              count(*) AS doc_count,
              CAST((count(*) * 1000000) // 7 AS BIGINT) AS rate_per_day_micro
       FROM events GROUP BY 1 ORDER BY week_start""",
)
def agg_rate_per_day(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("week_start")
        )
        .agg(
            F.count("*").alias("doc_count"),
            F.expr("CAST((count(*) * 1000000) DIV 7 AS BIGINT)").alias(
                "rate_per_day_micro"
            ),
        )
        .orderBy("week_start")
    )


# ES variable_width_histogram: buckets that ADAPT to the data rather than
# a fixed interval. ES clusters greedily (shard-local, order-sensitive —
# unreproducible by design); the deterministic batch form is the
# EQUAL-FREQUENCY histogram: ntile(4) over the value order (tie-broken by
# doc_id), each bucket reporting min/max/count. Same one-shuffle cost as
# a fixed histogram; the quantile boundaries are what the adaptive
# clusters converge to on smooth data.
@register(
    "agg_variable_width_histogram",
    """WITH t AS (
         SELECT n_chars,
                ntile(4) OVER (ORDER BY n_chars, doc_id) AS bucket
         FROM documents)
       SELECT bucket, min(n_chars) AS lo, max(n_chars) AS hi,
              count(*) AS doc_count
       FROM t GROUP BY bucket ORDER BY bucket""",
)
def agg_variable_width_histogram(spark, sf_dir):
    # scale shape: a global ntile over corpus ROWS is a single-partition
    # window — instead, reduce to the per-VALUE histogram first (one
    # groupBy), rank-range each value over |distinct values| rows, and
    # intersect with ntile's bucket rank ranges. Bucket counts/lo/hi only
    # depend on how many rows of each value land in each bucket, never on
    # which doc_ids, so the output is bit-identical to row-level ntile.
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    g = d.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("n_chars")  # O(|distinct n_chars|), not O(corpus)
    g = (
        g.withColumn("hi_rank", F.sum("cnt").over(w))
        .withColumn("lo_rank", F.col("hi_rank") - F.col("cnt") + 1)
    )
    total = g.agg(F.sum("cnt").alias("n"))
    # ntile(4): bucket i (1-based) holds n//4 rows, +1 for the first n%4
    bspec = total.selectExpr(
        "explode(sequence(1, 4)) AS bucket", "n"
    ).selectExpr(
        "bucket",
        "(bucket - 1) * (n DIV 4) + least(bucket - 1, n % 4) + 1 AS b_lo",
        "bucket * (n DIV 4) + least(bucket, n % 4) AS b_hi",
    )
    j = g.crossJoin(F.broadcast(bspec)).filter(
        (F.col("lo_rank") <= F.col("b_hi")) & (F.col("hi_rank") >= F.col("b_lo"))
    )
    return (
        j.groupBy("bucket")
        .agg(
            F.min("n_chars").alias("lo"),
            F.max("n_chars").alias("hi"),
            F.sum(
                F.least("hi_rank", "b_hi") - F.greatest("lo_rank", "b_lo") + 1
            ).alias("doc_count"),
        )
        .orderBy("bucket")
    )


# ES moving_percentiles pipeline agg: a percentile over the trailing
# window of another agg's buckets ({"moving_percentiles": {"buckets_path":
# "days>_count", "window": 7}}). The window median at 1/2 granularity is
# emitted ×2 (exact BIGINT); the window runs over n_buckets rows —
# post-aggregation, O(buckets), same reduce-phase shape as ES.
@register(
    "agg_moving_percentiles_week",
    """WITH h AS (
         SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_start,
                count(*) AS doc_count
         FROM events GROUP BY 1)
       SELECT bucket_start, doc_count,
              CAST(2 * quantile_cont(doc_count, 0.5) OVER
                   (ORDER BY bucket_start ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS moving_median_x2
       FROM h ORDER BY bucket_start""",
)
def agg_moving_percentiles_week(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("bucket_start")
    ).agg(F.count("*").alias("doc_count"))
    h.createOrReplaceTempView("ssr_mp_h")
    return spark.sql(
        """SELECT bucket_start, doc_count,
                  CAST(2 * percentile(doc_count, 0.5) OVER
                       (ORDER BY bucket_start ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS moving_median_x2
           FROM ssr_mp_h ORDER BY bucket_start"""
    )
