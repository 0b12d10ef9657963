"""Highlighting — ES's `highlight` search option re-expressed over the
engine's stored fields (reference users get this from Elasticsearch for
free once search-replica has shipped the doc; the repo's analogue reads
the ``IndexConfig(store_source=True)`` docs store, never the source table).

Semantics = ES's *plain* highlighter, simplified to a deterministic,
oracle-twinnable rule (the unified highlighter's passage scoring is
IR-heuristic and not SQL-expressible):

  - fragment selection: the earliest case-insensitive occurrence of any
    query term in the stored field, with ``lead`` characters of context
    before it and ``frag_size`` total characters;
  - tagging: every case-insensitive occurrence of any query term inside
    the fragment is wrapped in pre/post tags (leftmost, non-overlapping —
    the shared regex semantics of Java, RE2 and Python).

Serving-path shape: highlighting runs on the top-k hits only (k rows on
the driver), after scoring — identical to ES, which highlights the fetch
phase, never the query phase.
"""

from __future__ import annotations

import re


def highlight_fragment(
    content: str | None,
    terms: list[str],
    frag_size: int = 80,
    lead: int = 30,
    pre: str = "<em>",
    post: str = "</em>",
) -> str | None:
    """One highlighted fragment of ``content``, or None when no term occurs
    (ES omits the highlight entry for non-matching stored fields)."""
    if content is None or not terms:
        return None
    low = content.lower()
    positions = [p for p in (low.find(t.lower()) for t in terms) if p >= 0]
    if not positions:
        return None
    start = max(0, min(positions) - lead)
    frag = content[start : start + frag_size]
    pat = re.compile("(" + "|".join(re.escape(t) for t in terms) + ")", re.IGNORECASE)
    return pat.sub(lambda m: pre + m.group(1) + post, frag)


def highlight_hits(
    hits: list[tuple[int, float]],
    contents: dict[int, str],
    terms: list[str],
    **kwargs,
) -> list[tuple[int, float, str | None]]:
    """Attach fragments to scored hits: (doc_id, score) + stored content →
    (doc_id, score, fragment)."""
    return [
        (d, s, highlight_fragment(contents.get(d), terms, **kwargs)) for d, s in hits
    ]
