"""Code-aware tokenizer — the single analysis definition for the whole engine.

This is the Spark-native replacement for the text analysis the reference
delegates to Elasticsearch (reference: demo/mapping.json:22-29 declares the
field types; the reference itself ships raw JSON and lets ES analyze it).
Both the pure-Python oracle and the Spark engine import THIS module, so
rank-identity (BASELINE.json#north_rule) is checked against one shared
analyzer, mirroring how the reference's consistency test compares against
the very ES instance it configured (reference: demo/consistency_test.go:29-82).

Analysis chain (code-aware, deterministic):
  1. camelCase / PascalCase boundary split  (``getFooBar`` → ``get Foo Bar``)
  2. acronym boundary split                  (``HTTPServer`` → ``HTTP Server``)
  3. lowercase
  4. token = maximal run of [a-z0-9]         (underscores & punct are breaks)

Everything is pandas-vectorized (`Series.str` ops) — no per-row Python in
the hot path, per BASELINE.json#input_hint.
"""

from __future__ import annotations

import re

import pandas as pd

# Insert a boundary between an acronym and a following capitalized word:
# "HTTPServer" -> "HTTP Server". Must run before the lower->upper rule.
_CAMEL_ACRONYM = re.compile(r"([A-Z]+)([A-Z][a-z])")
# Insert a boundary at a lower/digit -> upper transition: "getFoo" -> "get Foo".
_CAMEL_LOWER_UPPER = re.compile(r"([a-z0-9])([A-Z])")
# A token is a maximal run of lowercase alphanumerics (input is lowercased).
_TOKEN = re.compile(r"[a-z0-9]+")


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized: Series[str] -> Series[list[str]] of analyzed tokens."""
    s = s.fillna("").astype(str)
    s = s.str.replace(_CAMEL_ACRONYM, r"\1 \2", regex=True)
    s = s.str.replace(_CAMEL_LOWER_UPPER, r"\1 \2", regex=True)
    s = s.str.lower()
    return s.str.findall(_TOKEN)


def tokenize_text(text: str) -> list[str]:
    """Scalar convenience wrapper (query strings, tests)."""
    if text is None:
        return []
    text = _CAMEL_ACRONYM.sub(r"\1 \2", text)
    text = _CAMEL_LOWER_UPPER.sub(r"\1 \2", text)
    return _TOKEN.findall(text.lower())
