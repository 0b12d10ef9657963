"""Per-field analysis — ES mapping parity (reference: demo/mapping.json:22-29
declares mixed ``keyword``/``text`` fields; the reference ships raw JSON and
lets Elasticsearch apply the mapping's analyzers).

Two analyzers, matching the ES semantics the reference relies on:

  - ``text``    — the engine's standard code-aware analyzer (TOKEN_PATTERN
                  extraction + lowercase), applied JVM-side.
  - ``keyword`` — the exact field value as ONE untokenized term, case
                  preserved (ES keyword fields are not analyzed).

An index built with ``IndexConfig(field_analyzers=...)`` qualifies every
term as ``field:term`` (Lucene's per-field term space), so one inverted
index serves all mapped fields and a query can target a field the way ES
does (``{"term": {"lang": "go"}}`` → term ``lang:go``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_replica_spark.analysis.tokenizer import TOKEN_PATTERN, tokenize_text

ANALYZERS = ("text", "keyword")


def field_tokens(col: str, kind: str) -> Column:
    """Array-of-terms Column for one field under the given analyzer —
    entirely JVM-side expressions (whole-stage codegen, no Python)."""
    if kind == "text":
        return F.transform(
            F.regexp_extract_all(F.col(col).cast("string"), F.lit(TOKEN_PATTERN), 0),
            lambda t: F.lower(t),
        )
    if kind == "keyword":
        c = F.col(col).cast("string")
        return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(F.array(c))
    raise ValueError(f"unknown analyzer {kind!r} (expected one of {ANALYZERS})")


def field_query_terms(field: str, value: str, kind: str = "text") -> list[str]:
    """Query-side twin of the index-side analysis: the ``field:term`` list a
    query against a fielded index should pass to a scorer's ``terms=``."""
    if kind == "keyword":
        return [f"{field}:{value}"]
    if kind == "text":
        return [f"{field}:{t}" for t in tokenize_text(value)]
    raise ValueError(f"unknown analyzer {kind!r} (expected one of {ANALYZERS})")
