"""Deduplication family over the ``documents`` table — the training-data
pipeline ops a 100 TB corpus engine needs: exact, MinHash+LSH, n-gram
Jaccard, SimHash, embedding-cosine near-dup.

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


# SimHash signatures (16-bit, md5-derived bit weights — identical hex math
# in Spark and DuckDB, so the oracle is an exact twin). Near-dup candidates
# are then pairs with small hamming distance on the signature.
_SIMHASH_SQL = """
WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
bits AS (
  SELECT doc_id, t.b,
         sum(CASE WHEN (strpos('0123456789abcdef', substr(md5(term), CAST(t.b AS INT) + 1, 1)) - 1) % 2 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM tok, range(16) t(b) GROUP BY doc_id, t.b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


@register("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).distinct()
    withb = tok.select("doc_id", "term", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"))
    contrib = F.when(
        ((F.instr(F.lit("0123456789abcdef"), F.substring(F.md5("term"), F.col("b") + 1, 1)) - 1) % 2)
        == 1,
        1,
    ).otherwise(-1)
    bits = withb.groupBy("doc_id", "b").agg(F.sum(contrib).alias("s"))
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("b")).cast("long")).otherwise(0)
        ).alias("simhash")
    )


# Embedding-cosine near-duplicates over the embeddings table: all pairs with
# cosine >= 0.3 (the scale path replaces the pairwise join with the IVF /
# LSH bucketing in operators.similarity; this is the exact reference).
_EMB_DUP_SQL = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                 x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / ( sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) ),
         5) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
                              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      / ( sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) ) >= 0.3
"""


@register("dedup_embedding_cosine", _EMB_DUP_SQL)
def dedup_embedding_cosine(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    sim = dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(dot(F.col("ea"), F.col("ea"))) * F.sqrt(dot(F.col("eb"), F.col("eb")))
    )
    return (
        pairs.withColumn("sim_raw", sim)
        .filter(F.col("sim_raw") >= 0.3)
        .select("vec_a", "vec_b", F.round("sim_raw", 5).alias("sim"))
    )
