"""Pure-Python/pandas reference engine — the rank-identity ground truth.

Plays the role Elasticsearch plays for the reference: the reference's
consistency test loads CSVs, runs the binary, then fetches every doc from a
live ES 7.10.2 and asserts equality (reference: demo/consistency_test.go:29-82,
.github/workflows/integration.yaml:16-45). We have no live ES, so this module
IS the reference scorer: an exhaustive inverted index + textbook BM25 with
ES 7.x / Lucene defaults (k1=1.2, b=0.75 — the reference's demo/mapping.json
sets no ``similarity`` override, so Lucene defaults apply), exact float64
math, deterministic tie-break (score desc, doc_id asc).

The Spark engine must be rank-identical in docIDs and scores to this module
on the fixed query set (BASELINE.json#north_rule).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd

from search_replica_spark import B, K1
from search_replica_spark.analysis import tokenize_text


def doc_id_of(repo: str, path: str) -> int:
    """Deterministic 60-bit docID from (repo, path).

    Mirrors the Spark-side expression exactly (see index.build.with_doc_ids):
    first 15 hex chars of sha256(repo || \\x00 || path), base-16 → int.
    (Reference analogue: ``_id = {table}_{pk}`` key construction,
    postgres/table.go:119-128 — ours hashes the natural key instead.)
    """
    h = hashlib.sha256(f"{repo}\x00{path}".encode()).hexdigest()
    return int(h[:15], 16)


def content_sha256(content: str) -> str:
    return hashlib.sha256(content.encode()).hexdigest()


@dataclass
class OracleIndex:
    """Exhaustive in-memory inverted index over a corpus DataFrame."""

    n_docs: int = 0
    avg_dl: float = 0.0
    doc_len: dict[int, int] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc_id: tf}

    @classmethod
    def build(cls, corpus: pd.DataFrame) -> "OracleIndex":
        idx = cls()
        for repo, path, text in zip(corpus["repo"], corpus["path"], corpus["content"]):
            did = doc_id_of(repo, path)
            toks = tokenize_text(text)
            idx.doc_len[did] = len(toks)
            for t, tf in Counter(toks).items():
                idx.postings.setdefault(t, {})[did] = tf
        idx.n_docs = len(idx.doc_len)
        idx.avg_dl = (sum(idx.doc_len.values()) / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        # Lucene BM25Similarity.idfExplain: ln(1 + (N - df + 0.5)/(df + 0.5))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, query: str, k: int = 10, mode: str = "or") -> list[tuple[int, float]]:
        """BM25 top-k. ``mode="or"`` is ES match default (disjunctive);
        ``mode="and"`` is ES ``operator: and`` — every analyzed query term
        must match (a term absent from the corpus yields zero hits).

        Returns [(doc_id, score)] sorted score desc, doc_id asc.
        """
        terms = sorted(set(tokenize_text(query)))
        scores: dict[int, float] = {}
        matched: dict[int, int] = {}
        # sorted-term summation order: keeps float64 sums bit-identical with
        # the engine's NumPy paths, which also sum in sorted-term order
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for did, tf in plist.items():
                dl = self.doc_len[did]
                norm = tf / (tf + K1 * (1.0 - B + B * dl / self.avg_dl))
                scores[did] = scores.get(did, 0.0) + w * norm
                matched[did] = matched.get(did, 0) + 1
        if mode == "and":
            need = len(terms)
            scores = {d: s for d, s in scores.items() if matched[d] == need}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def golden(self, queries: pd.DataFrame) -> pd.DataFrame:
        """(query_id, rank, doc_id, score) golden table for the query set."""
        rows = []
        for qid, qtext, k in zip(queries["query_id"], queries["query_text"], queries["k"]):
            for rank, (did, s) in enumerate(self.score(qtext, int(k)), start=1):
                rows.append((int(qid), rank, did, s))
        return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"]).astype(
            {"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"}
        )
