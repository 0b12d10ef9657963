"""Per-field analysis — ES mapping parity (reference: demo/mapping.json:22-29
declares mixed ``keyword``/``text`` fields; the reference ships raw JSON and
lets Elasticsearch apply the mapping's analyzers).

Analyzer kinds, matching the ES semantics the reference relies on:

  - ``text``       — the engine's standard code-aware analyzer
                     (TOKEN_PATTERN extraction + lowercase), JVM-side.
  - ``keyword``    — the exact field value as ONE untokenized term, case
                     preserved (ES keyword fields are not analyzed).
  - ``keyword:N``  — keyword with ES ``ignore_above: N``
                     (demo/mapping.json:27 sets ignore_above: 256): values
                     longer than N characters are NOT indexed (no term),
                     but still stored in _source — exactly ES's contract.
  - ``noindex``    — ES ``"index": false`` (demo/mapping.json:7 sets it on
                     the ``id`` keyword field): the field is stored but
                     contributes no terms; querying it raises, mirroring
                     ES's "Cannot search on field since it is not indexed".

An index built with ``IndexConfig(field_analyzers=...)`` qualifies every
term as ``field:term`` (Lucene's per-field term space), so one inverted
index serves all mapped fields and a query can target a field the way ES
does (``{"term": {"lang": "go"}}`` → term ``lang:go``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_replica_spark.analysis.tokenizer import TOKEN_PATTERN, tokenize_text

ANALYZERS = ("text", "keyword", "keyword:N", "noindex")


def _ignore_above(kind: str) -> int | None:
    if kind.startswith("keyword:"):
        n = int(kind.split(":", 1)[1])
        if n <= 0:
            raise ValueError(f"ignore_above must be positive, got {kind!r}")
        return n
    return None


def field_tokens(col: str, kind: str) -> Column:
    """Array-of-terms Column for one field under the given analyzer —
    entirely JVM-side expressions (whole-stage codegen, no Python)."""
    if kind == "text":
        return F.transform(
            F.regexp_extract_all(F.col(col).cast("string"), F.lit(TOKEN_PATTERN), 0),
            lambda t: F.lower(t),
        )
    if kind == "noindex":
        # index: false — stored (docs/_source keeps the column) but never
        # analyzed: zero terms, so the field is absent from the dictionary
        return F.array().cast("array<string>")
    cap = _ignore_above(kind)
    if kind == "keyword" or cap is not None:
        c = F.col(col).cast("string")
        empty = F.array().cast("array<string>")
        out = F.when(c.isNull(), empty).otherwise(F.array(c))
        if cap is not None:
            out = F.when(F.length(c) > cap, empty).otherwise(out)
        return out
    raise ValueError(f"unknown analyzer {kind!r} (expected one of {ANALYZERS})")


def field_query_terms(field: str, value: str, kind: str = "text") -> list[str]:
    """Query-side twin of the index-side analysis: the ``field:term`` list a
    query against a fielded index should pass to a scorer's ``terms=``."""
    if kind == "noindex":
        raise ValueError(
            f"cannot search on field {field!r}: it is not indexed "
            "(mapping sets index: false)"
        )
    if kind == "keyword" or _ignore_above(kind) is not None:
        # ignore_above is an INDEX-side cutoff; ES still analyzes the query
        # value as-is (an over-length value simply matches nothing)
        return [f"{field}:{value}"]
    if kind == "text":
        return [f"{field}:{t}" for t in tokenize_text(value)]
    raise ValueError(f"unknown analyzer {kind!r} (expected one of {ANALYZERS})")
