"""Code-aware tokenizer — the single analysis definition for the whole engine.

This is the Spark-native replacement for the text analysis the reference
delegates to Elasticsearch (reference: demo/mapping.json:22-29 declares the
field types; the reference itself ships raw JSON and lets ES analyze it).
Both the pure-Python oracle and the Spark engine import THIS module, so
rank-identity (BASELINE.json#north_rule) is checked against one shared
analyzer, mirroring how the reference's consistency test compares against
the very ES instance it configured (reference: demo/consistency_test.go:29-82).

Analysis (code-aware, deterministic), as ONE extraction regex:
  token := acronym run      [A-Z]+ not followed by [a-z]   ("HTTP" of HTTPServer)
         | capitalized word [A-Z][a-z0-9]*                 ("Server2x", camel parts)
         | lowercase run    [a-z0-9]+                      (snake_case parts, words)
then lowercased. Underscores and punctuation break tokens.

The single-pass extraction (vs replace-replace-findall) halves the full-
content passes — this loop is memory-bandwidth-bound at high parallelism,
so fewer passes directly buys scaling (measured on 32-core local mode).
"""

from __future__ import annotations

import re
from itertools import chain

import numpy as np
import pandas as pd

# One pattern, two engines: compiled here for Python (oracle + Arrow path),
# passed verbatim to JVM regexp_extract_all (codegen path). Plain NFA
# alternation + lookahead — semantics identical in `re` and java.util.regex.
TOKEN_PATTERN = r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+"
_TOKEN_SPLIT = re.compile(TOKEN_PATTERN)


def tokenize_text(text: str) -> list[str]:
    """Scalar reference implementation (oracle, query strings, tests)."""
    if text is None:
        return []
    return [t.lower() for t in _TOKEN_SPLIT.findall(text)]


def tokenize_flat(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized hot path: Series[str] → (tokens_per_row, flat_lower_tokens).

    One findall pass over the content + one lowercase pass over the (much
    smaller) token array; no per-row Python in between.
    """
    toks = s.fillna("").astype(str).str.findall(_TOKEN_SPLIT)
    lens = toks.str.len().to_numpy(np.int64)
    total = int(lens.sum())
    if total == 0:
        return lens, np.empty(0, dtype=object)
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    flat = pd.Series(flat, dtype=object).str.lower().to_numpy()
    return lens, flat


def tokenize_series(s: pd.Series) -> pd.Series:
    """Series[str] → Series[list[str]] of analyzed tokens (same analysis as
    tokenize_flat, regrouped per row)."""
    lens, flat = tokenize_flat(s)
    parts = np.split(flat, np.cumsum(lens)[:-1]) if len(lens) else []
    return pd.Series(parts, index=s.index, dtype=object)
