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
       round(avg(CAST(length(term) AS DOUBLE)), 6) AS avg_token_len,
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
       SELECT doc_id, CAST(sum(ceil(length(term) / 4.0)) AS BIGINT) AS n_bpe
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


# Benchmark-contamination check: train docs sharing any SHINGLE_K-token shingle
# with an EVAL set (doc_id % 97 == 0 stands in for the benchmark corpus) —
# the n-gram-overlap decontamination step every pretraining pipeline runs
# before shipping a mix. Shape: shingle hashes (JVM transform/slice, no
# Python), then ONE equi-join on the hash with the (tiny) eval side
# collected per-bucket inside a single groupBy — candidates are
# (train, eval) pairs only, O(train-shingles × collisions), never
# corpus²; the same split-inside-one-groupBy as incremental dedup.
SHINGLE_K = 4  # production pipelines use 8-13; the synthetic corpus
# has low n-gram repetition, so 4 keeps the check non-vacuous at test SFs

_CONTAM_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id, md5(array_to_string(toks[p:p+{SHINGLE_K - 1}], ' ')) AS h
  FROM t, UNNEST(range(1, greatest(len(toks) - {SHINGLE_K - 2}, 1))) AS s(p)
)
SELECT DISTINCT tr.doc_id AS train_doc, ev.doc_id AS eval_doc
FROM sh tr JOIN sh ev ON tr.h = ev.h
WHERE tr.doc_id % 97 <> 0 AND ev.doc_id % 97 = 0
"""


@register("contamination_ngram", _CONTAM_SQL)
def contamination_ngram(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    sh = toks.select(
        "doc_id",
        # IF guard, not greatest(…, 0): Spark's sequence(1, 0) yields the
        # DESCENDING [1, 0], not an empty array
        F.explode(
            F.expr(
                f"IF(size(toks) >= {SHINGLE_K},"
                f" transform(sequence(1, size(toks) - {SHINGLE_K - 1}),"
                f" p -> md5(concat_ws(' ', slice(toks, p, {SHINGLE_K})))),"
                " array())"
            )
        ).alias("h"),
    )
    is_eval = F.col("doc_id") % 97 == 0
    buckets = (
        sh.groupBy("h")
        .agg(
            F.collect_set(F.when(~is_eval, F.col("doc_id"))).alias("train_ids"),
            F.collect_set(F.when(is_eval, F.col("doc_id"))).alias("eval_ids"),
        )
        .filter((F.size("train_ids") > 0) & (F.size("eval_ids") > 0))
    )
    return (
        buckets.select(F.explode("train_ids").alias("train_doc"), "eval_ids")
        .select("train_doc", F.explode("eval_ids").alias("eval_doc"))
        .distinct()
    )


# Gopher-style repetition filter: the fraction of a doc's 2-grams that are
# duplicates (1 - distinct/total), integer-scaled to stay bit-stable
# across engines. One JVM shingle transform + per-doc agg — the repeated-
# n-gram quality gate applied before training.
_REP_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT doc_id, array_to_string(toks[p:p+1], ' ') AS g
  FROM t, UNNEST(range(1, greatest(len(toks), 1))) AS s(p)
)
SELECT doc_id, count(*) AS n_2grams,
       count(DISTINCT g) AS n_uniq_2grams,
       CAST((1000000 * (count(*) - count(DISTINCT g))) // count(*) AS BIGINT)
           AS dup_ratio_micro
FROM bg GROUP BY doc_id
"""


@register("text_repetition_2gram", _REP_SQL)
def text_repetition_2gram(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("toks"))
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "IF(size(toks) >= 2,"
                " transform(sequence(1, size(toks) - 1),"
                " p -> concat_ws(' ', slice(toks, p, 2))), array())"
            )
        ).alias("g"),
    )
    return bg.groupBy("doc_id").agg(
        F.count("*").alias("n_2grams"),
        F.countDistinct("g").alias("n_uniq_2grams"),
        F.expr("(1000000 * (count(*) - count(DISTINCT g))) DIV count(*)").alias(
            "dup_ratio_micro"
        ),
    )


# Gopher-style quality GATE: the boolean keep/drop verdict a pretraining
# mix applies before packing — document-length bounds, mean-token-length
# band, and a lexical-diversity floor (unique-token ratio), each
# integer-scaled so the verdict is bit-stable across engines. One
# partial-aggregating groupBy; the gate composes with sampling/packing
# downstream (filter keep, then pack).
GATE_MIN_TOKENS, GATE_MAX_TOKENS = 20, 90
GATE_MIN_AVG_LEN, GATE_MAX_AVG_LEN = 4_000_000, 5_000_000  # micro-chars
GATE_MIN_UNIQ = 400_000  # micro-ratio

_GATE_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
m AS (SELECT doc_id, count(*) AS n, count(DISTINCT t) AS u,
             CAST(sum(length(t)) AS BIGINT) AS lsum
      FROM tok GROUP BY doc_id)
SELECT doc_id, n AS n_tokens,
       CAST((lsum * 1000000) // n AS BIGINT) AS avg_len_micro,
       CAST((u * 1000000) // n AS BIGINT) AS uniq_micro,
       (n BETWEEN {GATE_MIN_TOKENS} AND {GATE_MAX_TOKENS})
        AND ((lsum * 1000000) // n
             BETWEEN {GATE_MIN_AVG_LEN} AND {GATE_MAX_AVG_LEN})
        AND ((u * 1000000) // n >= {GATE_MIN_UNIQ}) AS keep
FROM m
"""


@register("text_quality_gate", _GATE_SQL)
def text_quality_gate(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    m = tok.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("t").alias("u"),
        F.sum(F.length("t")).alias("lsum"),
    )
    avg_len = F.expr("(lsum * 1000000) DIV n")
    uniq = F.expr("(u * 1000000) DIV n")
    return m.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        avg_len.alias("avg_len_micro"),
        uniq.alias("uniq_micro"),
        (
            F.col("n").between(GATE_MIN_TOKENS, GATE_MAX_TOKENS)
            & avg_len.between(GATE_MIN_AVG_LEN, GATE_MAX_AVG_LEN)
            & (uniq >= GATE_MIN_UNIQ)
        ).alias("keep"),
    )


# PII scrubbing for training data: mask identifier-like digit runs (>=4
# digits) and replace the direct identifier with a STABLE pseudonym (md5
# prefix) so downstream joins/dedup still line up without exposing the
# original key — the standard pre-training anonymization pass. Pure JVM
# expressions (regexp_replace + md5), embarrassingly parallel, no shuffle;
# at 100 TB this runs at scan speed with full column pruning. The digit
# pattern is RE2-safe (no lookarounds) so the Spark and DuckDB regexes are
# the same string.
@register(
    "pii_redact_customers",
    r"""SELECT c_custkey,
               regexp_replace(c_name, '[0-9]{4,}', '[ID]', 'g') AS name_redacted,
               substr(md5(c_name), 1, 12) AS pseudonym
        FROM customer ORDER BY c_custkey""",
)
def pii_redact_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]{4,}", "[ID]").alias("name_redacted"),
        F.md5("c_name").substr(1, 12).alias("pseudonym"),
    ).orderBy("c_custkey")


# --- corpus-level duplicate-chunk fraction (RefinedWeb-style) ------------
# The document-level "fraction of the text living in chunks that appear
# verbatim elsewhere in the corpus" filter: tokens are cut into
# NON-OVERLAPPING windows of DUP_CHUNK_TOKENS, each chunk is counted
# corpus-wide, and a doc reports how much of it is duplicated material.
# Exactly one wide shuffle (groupBy chunk) + one equi-join back — the
# shape that survives 100 TB (chunk keys are high-cardinality, skew-free;
# no pairwise comparisons anywhere). Complements dedup_* (whole-doc /
# near-dup) and text_repetition_2gram (WITHIN-doc repetition): this one
# measures CROSS-doc verbatim reuse below whole-doc granularity.
DUP_CHUNK_TOKENS = 4

_DUP_CHUNK_SQL = f"""
WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
ch AS (SELECT doc_id,
              array_to_string(
                a[(i - 1) * {DUP_CHUNK_TOKENS} + 1 : (i - 1) * {DUP_CHUNK_TOKENS} + {DUP_CHUNK_TOKENS}],
                ' ') AS chunk
       FROM arr, unnest(generate_series(1, len(a) // {DUP_CHUNK_TOKENS})) AS t(i)),
g AS (SELECT chunk, count(*) AS cnt FROM ch GROUP BY chunk)
SELECT ch.doc_id,
       count(*) AS n_chunks,
       sum(CASE WHEN g.cnt >= 2 THEN 1 ELSE 0 END) AS n_dup_chunks,
       (1000000 * sum(CASE WHEN g.cnt >= 2 THEN 1 ELSE 0 END)) // count(*)
         AS dup_frac_micro
FROM ch JOIN g USING (chunk)
GROUP BY ch.doc_id
"""


@register("text_dup_chunk_fraction", _DUP_CHUNK_SQL)
def text_dup_chunk_fraction(spark, sf_dir):
    C = DUP_CHUNK_TOKENS
    d = load(spark, sf_dir, "documents")
    arr = d.select("doc_id", F.split("text", " ").alias("a"))
    # Spark sequence(1, 0) is DESCENDING — gate short docs to an empty
    # chunk list instead (docs with < C tokens emit no chunks, like the
    # DuckDB generate_series twin)
    idxs = F.when(
        F.size("a") >= C, F.sequence(F.lit(1), (F.size("a") / C).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    ch = arr.select(
        "doc_id",
        F.explode(idxs).alias("i"),
        F.col("a"),
    ).select(
        "doc_id",
        F.array_join(F.slice("a", (F.col("i") - 1) * C + 1, C), " ").alias("chunk"),
    )
    g = ch.groupBy("chunk").agg(F.count("*").alias("cnt"))
    dup = F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0))
    return (
        ch.join(g, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            dup.alias("n_dup_chunks"),
            F.expr("(1000000 * sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END)) DIV count(*)").alias("dup_frac_micro"),
        )
    )


# --- corpus bigram LM scoring (CCNet-style quality signal) ---------------
# Train an add-one-smoothed bigram language model ON the corpus itself and
# score every doc by its average per-bigram negative log-likelihood — the
# classic "perplexity vs the corpus LM" filter (CCNet buckets docs by LM
# score; docs that look nothing like the collection score high). Spec kept
# bit-reproducible: p(w2|w1) = (c12 + 1) / (c1 + V) with c1 = prefix
# occurrences and V = distinct corpus tokens; each bigram's NLL is floored
# to integer MICRO-NATS before aggregation, so the per-doc sums are exact
# integer arithmetic (float summation order never matters) in both
# engines. Plan shape: one explode, two groupBy shuffles (bigram model +
# prefix counts), two equi-joins back — no driver-side model, scales to
# any corpus the shuffle fits.
_BIGRAM_NLL_SQL = """
WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
bi AS (SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
       FROM arr, unnest(generate_series(1, len(a) - 1)) AS t(i)),
m AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
pf AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
v AS (SELECT count(DISTINCT term) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)),
sc AS (SELECT bi.doc_id,
              CAST(floor(-ln((m.c12 + 1.0) / (pf.c1 + v.v)) * 1000000) AS BIGINT)
                AS nll
       FROM bi JOIN m USING (w1, w2) JOIN pf USING (w1) CROSS JOIN v)
SELECT doc_id,
       count(*) AS n_bigrams,
       CAST(sum(nll) AS BIGINT) AS sum_nll_micro,
       CAST(sum(nll) AS BIGINT) // count(*) AS avg_nll_micro
FROM sc GROUP BY doc_id
"""


@register("text_bigram_lm_nll", _BIGRAM_NLL_SQL)
def text_bigram_lm_nll(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    arr = d.select("doc_id", F.split("text", " ").alias("a"))
    # docs with < 2 tokens emit no bigrams (generate_series(1, 0) is empty
    # in the twin; Spark's sequence would turn DESCENDING — filter instead)
    bi = (
        arr.where(F.size("a") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(a[i - 1] AS w1, a[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    m = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    pf = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    v = int(
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .agg(F.countDistinct("term"))
        .collect()[0][0]
    )
    sc = bi.join(m, ["w1", "w2"]).join(pf, "w1").select(
        "doc_id",
        F.floor(-F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(v))) * 1000000)
        .cast("long")
        .alias("nll"),
    )
    return sc.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("nll").alias("sum_nll_micro"),
        F.expr("sum(nll) DIV count(*)").alias("avg_nll_micro"),
    )


# LLM-pipeline chunking: split each document into fixed-size sliding token
# windows (size 8, stride 4 — 50% overlap), the unit a training/RAG
# pipeline actually embeds and packs. Pure JVM expressions: one tokenize
# (split), one sequence() of window starts, one explode — no Python, no
# shuffle (chunk rows stay in their document's partition), so at 100 TB
# this is a map-only stage whose output feeds pack_sequences / embedding
# directly. Emits (doc_id, chunk_id, n_tokens, chunk_text); short tails
# (< 2 tokens past a full window) are kept iff they start new content —
# i.e. a window starts at every stride boundary < n_tokens.
CHUNK_SIZE = 8
CHUNK_STRIDE = 4


@register(
    "text_chunk_sliding",
    f"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        st AS (SELECT doc_id, toks,
                      generate_series(1, greatest(1, len(toks)), {CHUNK_STRIDE}) AS starts
               FROM tok),
        ex AS (SELECT doc_id, toks, unnest(starts) AS s FROM st)
        SELECT doc_id,
               CAST((s - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               CAST(least({CHUNK_SIZE}, len(toks) - s + 1) AS BIGINT) AS n_tokens,
               array_to_string(toks[s : least(s + {CHUNK_SIZE} - 1, len(toks))], ' ')
                 AS chunk_text
        FROM ex""",
)
def text_chunk_sliding(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split("text", " ").alias("toks"))
    ex = tok.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(f"sequence(1, greatest(1, size(toks)), {CHUNK_STRIDE})")
        ).alias("s"),
    )
    return ex.select(
        "doc_id",
        F.expr(f"CAST((s - 1) DIV {CHUNK_STRIDE} AS BIGINT)").alias("chunk_id"),
        F.expr(f"CAST(least({CHUNK_SIZE}, size(toks) - s + 1) AS BIGINT)").alias(
            "n_tokens"
        ),
        F.expr(
            f"array_join(slice(toks, s, least({CHUNK_SIZE}, size(toks) - s + 1)), ' ')"
        ).alias("chunk_text"),
    )


# WIMBD-style corpus analytics: the most common word trigrams corpus-wide
# ("what's in my big data" — the first question asked of any new training
# corpus). One explode over per-doc trigram positions + one count groupBy:
# the same two-shuffle shape as every corpus-wide count here, partial
# aggregation first, so the hot trigrams never concentrate raw rows.
# sequence(1, n) is DESCENDING when n < 1 — guarded (see shingle ops).
@register(
    "text_top_trigrams",
    """WITH tok AS (SELECT string_split(text, ' ') AS toks FROM documents),
       tri AS (SELECT toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS tg
               FROM tok, unnest(CASE WHEN len(toks) >= 3
                                     THEN generate_series(1, len(toks) - 2)
                                     ELSE [] END) AS u(i))
       SELECT tg, count(*) AS n FROM tri
       GROUP BY tg ORDER BY n DESC, tg LIMIT 10""",
)
def text_top_trigrams(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    tok = d.select(F.split("text", " ").alias("toks"))
    tri = tok.select(
        F.explode(
            F.expr("IF(size(toks) >= 3, sequence(1, size(toks) - 2), array())")
        ).alias("i"),
        "toks",
    ).select(
        F.expr(
            "concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
            " element_at(toks, i + 2))"
        ).alias("tg")
    )
    return (
        tri.groupBy("tg")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tg")
        .limit(10)
    )
