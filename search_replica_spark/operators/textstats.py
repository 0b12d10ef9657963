"""Text analysis operators over ``documents``: token counting, quality
scoring, language-ID heuristic, fingerprinting. All pure JVM-side
expressions (split/explode/agg) — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_replica_spark.operators import load, register

STOPWORDS = ("data", "table", "row", "value", "query")
LANG_HINTS = {
    "en": ("the", "and", "for", "with", "this"),
    "de": ("der", "und", "das", "ist", "nicht"),
    "fr": ("le", "les", "des", "est", "une"),
}


@register(
    "text_token_count",
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents",
)
def text_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))


_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

_QUALITY_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
SELECT doc_id,
       count(*) AS n_tokens,
       count(DISTINCT term) AS n_uniq,
       round(avg(CAST(strlen(term) AS DOUBLE)), 6) AS avg_token_len,
       round(avg(CASE WHEN term IN ({_SW}) THEN 1.0 ELSE 0.0 END), 6) AS stopword_ratio
FROM tok GROUP BY doc_id
"""


@register("text_quality_scores", _QUALITY_SQL)
def text_quality_scores(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_uniq"),
        F.round(F.avg(F.length("term").cast("double")), 6).alias("avg_token_len"),
        F.round(
            F.avg(F.when(F.col("term").isin(*STOPWORDS), 1.0).otherwise(0.0)), 6
        ).alias("stopword_ratio"),
    )


def _lang_case_sql() -> str:
    hits = {
        lg: f"sum(CASE WHEN term IN ({', '.join(repr(w) for w in ws)}) THEN 1 ELSE 0 END)"
        for lg, ws in LANG_HINTS.items()
    }
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
h AS (SELECT doc_id, {hits['en']} AS en, {hits['de']} AS de, {hits['fr']} AS fr
      FROM tok GROUP BY doc_id)
SELECT doc_id,
       CASE WHEN en >= de AND en >= fr THEN 'en'
            WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_guess
FROM h
"""


@register("text_lang_id", _lang_case_sql())
def text_lang_id(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    hit = lambda ws: F.sum(F.when(F.col("term").isin(*ws), 1).otherwise(0))  # noqa: E731
    h = tok.groupBy("doc_id").agg(
        hit(LANG_HINTS["en"]).alias("en"),
        hit(LANG_HINTS["de"]).alias("de"),
        hit(LANG_HINTS["fr"]).alias("fr"),
    )
    return h.select(
        "doc_id",
        F.when((F.col("en") >= F.col("de")) & (F.col("en") >= F.col("fr")), "en")
        .when(F.col("de") >= F.col("fr"), "de")
        .otherwise("fr")
        .alias("lang_guess"),
    )


@register(
    "doc_fingerprint",
    "SELECT doc_id, md5(text) AS fingerprint FROM documents",
)
def doc_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5("text").alias("fingerprint"))


# BPE-ish token counting: approximate subword count as ceil(len/4) per word
# — a stand-in for a real BPE vocabulary (not in this container) with the
# same plumbing and cost shape (per-token arithmetic, one aggregation).
@register(
    "text_bpe_token_count",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       SELECT doc_id, CAST(sum(ceil(strlen(term) / 4.0)) AS BIGINT) AS n_bpe
       FROM tok GROUP BY doc_id""",
)
def text_bpe_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return tok.groupBy("doc_id").agg(
        F.sum(F.ceil(F.length("term") / 4.0)).cast("long").alias("n_bpe")
    )


# Winnowing document fingerprint (rolling k-gram hashes + window minimum —
# the MOSS scheme): 3-token grams hashed with md5, minimum per 4-gram
# window, fingerprint = md5 of the sorted distinct selected hashes.
_WINNOW_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
grams AS (
  SELECT doc_id, pos,
         md5(term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w) AS gh,
         lead(term, 2) OVER w AS t2
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sel AS (
  SELECT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
  FROM grams WHERE t2 IS NOT NULL
)
SELECT doc_id, md5(string_agg(DISTINCT mh, ',' ORDER BY mh)) AS winnow_fp
FROM sel GROUP BY doc_id
"""


@register("doc_winnow_fingerprint", _WINNOW_SQL)
def doc_winnow_fingerprint(spark, sf_dir):
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term"))
    w = W.partitionBy("doc_id").orderBy("pos")
    grams = tok.select(
        "doc_id",
        "pos",
        F.md5(
            F.concat_ws(" ", F.col("term"), F.lead("term", 1).over(w), F.lead("term", 2).over(w))
        ).alias("gh"),
        F.lead("term", 2).over(w).alias("t2"),
    ).filter(F.col("t2").isNotNull())
    wmin = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    sel = grams.select("doc_id", F.min("gh").over(wmin).alias("mh"))
    return sel.groupBy("doc_id").agg(
        F.md5(F.array_join(F.array_sort(F.collect_set("mh")), ",")).alias("winnow_fp")
    )
