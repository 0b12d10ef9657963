import math

import pandas as pd

from search_replica_spark.corpus import generate_corpus, reference_queries
from search_replica_spark.oracle import OracleIndex, doc_id_of


def test_corpus_deterministic_and_shaped():
    a = generate_corpus(500)
    b = generate_corpus(500)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == ["repo", "path", "commit", "lang", "content"]
    assert len(a) == 500
    assert a["commit"].str.len().eq(40).all()
    assert a["content"].str.len().gt(0).all()
    # zipf skew: top repo owns many files
    top = a["repo"].value_counts().iloc[0]
    assert top > len(a) / a["repo"].nunique() * 2


def test_doc_ids_unique():
    a = generate_corpus(2000)
    ids = [doc_id_of(r, p) for r, p in zip(a["repo"], a["path"])]
    assert len(set(ids)) == len(ids)


def test_queries_deterministic():
    q1, q2 = reference_queries(), reference_queries()
    pd.testing.assert_frame_equal(q1, q2)
    assert len(q1) == 50


def test_oracle_bm25_hand_computed():
    # 3 tiny docs, hand-computable BM25
    corpus = pd.DataFrame(
        {
            "repo": ["r/a"] * 3,
            "path": ["p1", "p2", "p3"],
            "commit": ["c"] * 3,
            "lang": ["python"] * 3,
            "content": ["cat dog", "cat cat fish", "bird"],
        }
    )
    idx = OracleIndex.build(corpus)
    assert idx.n_docs == 3
    assert idx.avg_dl == (2 + 3 + 1) / 3
    # term 'cat': df=2, N=3 → idf = ln(1 + (3-2+0.5)/(2+0.5))
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    res = dict(idx.score("cat", k=10))
    d1 = doc_id_of("r/a", "p1")
    d2 = doc_id_of("r/a", "p2")
    tf1 = 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 2.0))
    tf2 = 2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.0))
    assert res[d1] == idf * tf1
    assert res[d2] == idf * tf2
    assert len(res) == 2


def test_oracle_tie_break_and_absent():
    corpus = pd.DataFrame(
        {
            "repo": ["r/a"] * 4,
            "path": ["p1", "p2", "p3", "p4"],
            "commit": ["c"] * 4,
            "lang": ["python"] * 4,
            "content": ["same text", "same text", "same text", "other words"],
        }
    )
    idx = OracleIndex.build(corpus)
    top = idx.score("same", k=3)
    ids = [d for d, _ in top]
    assert ids == sorted(ids)  # equal scores → doc_id asc
    assert idx.score("absentterm", k=5) == []
