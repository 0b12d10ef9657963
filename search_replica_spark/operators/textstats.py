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
