"""Deduplication family over the ``documents`` table — the training-data
pipeline ops a 100 TB corpus engine needs (exact, MinHash+LSH, n-gram
Jaccard; SimHash lives in textstats.fingerprints for now).

Scale notes: exact dedup is a hash groupBy (one shuffle on the content
hash). MinHash banding turns all-pairs similarity into an equi-join on
(band_id, band_hash) — the join key is high-cardinality, so the shuffle is
balanced; candidate verification happens only within buckets. All hashes
are md5 (identical hex output in Spark and DuckDB) so the oracle SQL is an
exact twin, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_replica_spark.operators import load, register

N_HASHES = 8
N_BANDS = 4  # rows-per-band = 2


# Exact dedup: last-wins keeper per content hash (reference analogue: P16
# upsert-by-_id dedup, postgres/table.go:56-63 — ours keys on content).
@register(
    "dedup_exact",
    """SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keeper
       FROM documents GROUP BY md5(text)""",
)
def dedup_exact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )


def _minhash_sig(spark, sf_dir):
    """(doc_id, m0..m7) MinHash signature over the distinct-token set."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).distinct()
    aggs = [
        F.min(F.md5(F.concat(F.col("term"), F.lit(f"#{s}")))).alias(f"m{s}")
        for s in range(N_HASHES)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


_MINHASH_SQL_SIG = (
    "SELECT doc_id, "
    + ", ".join(f"min(md5(term || '#{s}')) AS m{s}" for s in range(8))
    + " FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term"
    "   FROM documents) GROUP BY doc_id"
)


# MinHash signatures themselves (deterministic, md5-based) — direct SQL twin.
@register("dedup_minhash_signatures", _MINHASH_SQL_SIG)
def dedup_minhash_signatures(spark, sf_dir):
    return _minhash_sig(spark, sf_dir)


_LSH_SQL = f"""
WITH sig AS ({_MINHASH_SQL_SIG}),
bands AS (
  SELECT doc_id, 0 AS band, md5(m0 || m1) AS bh FROM sig UNION ALL
  SELECT doc_id, 1 AS band, md5(m2 || m3) AS bh FROM sig UNION ALL
  SELECT doc_id, 2 AS band, md5(m4 || m5) AS bh FROM sig UNION ALL
  SELECT doc_id, 3 AS band, md5(m6 || m7) AS bh FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


# MinHash + LSH banding: candidate near-dup pairs = docs sharing any band.
@register("dedup_minhash_lsh", _LSH_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    sig = _minhash_sig(spark, sf_dir)
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.md5(F.concat(F.col(f"m{2 * i}"), F.col(f"m{2 * i + 1}"))).alias("bh"),
        )
        for i in range(N_BANDS)
    ]
    bands = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# n-gram (token-set) Jaccard similarity: exact pairwise via shared-token
# equi-join (inverted-index style join, not a cross join).
_JACCARD_SQL = """
WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""


@register("dedup_ngram_jaccard", _JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).distinct()
    sz = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jac", F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")))
        .filter(F.col("jac") >= 0.5)
    )
    return j.select("doc_a", "doc_b", F.round("jac", 6).alias("jaccard"))
