"""End-to-end rank-identity: Spark engine vs pure-Python oracle.

Mirrors the reference's consistency test (demo/consistency_test.go:29-82):
it loads the input, runs the engine, then compares every result against the
independent reference implementation.
"""

import numpy as np
import pytest

from search_replica_spark.corpus import reference_queries
from search_replica_spark.query.bm25 import (
    IndexReader,
    TermAtATimeScorer,
    bm25_topk_spark,
    wand_topk,
)

TOL = 1e-9


def canon(results):
    """Canonicalize [(doc_id, score)] for comparison: quantize then order."""
    return [(d, round(s, 9)) for d, s in results]


def assert_rank_identical(got, want):
    assert len(got) == len(want), f"length {len(got)} != {len(want)}"
    for i, ((gd, gs), (wd, ws)) in enumerate(zip(got, want)):
        assert abs(gs - ws) <= TOL * max(1.0, abs(ws)), f"rank {i}: score {gs} != {ws}"
    # doc order must match after quantizing away float-sum noise
    assert [d for d, _ in canon(got)] == [d for d, _ in canon(want)]


@pytest.fixture(scope="module")
def queries():
    return reference_queries()


def test_build_stats(small_index, small_oracle):
    _, stats = small_index
    assert stats["n_docs"] == small_oracle.n_docs == 600
    assert abs(stats["avg_dl"] - small_oracle.avg_dl) < 1e-9
    assert stats["n_terms"] == len(small_oracle.postings)
    assert stats["postings_emitted"] == sum(len(p) for p in small_oracle.postings.values())
    assert stats["bytes_compressed"] > 0


def test_doc_store_invariants(spark, small_index, small_corpus):
    """content_sha256 per-row invariant vs source (BASELINE.json#input_hint)."""
    import hashlib

    idx_dir, _ = small_index
    docs = spark.read.parquet(f"{idx_dir}/docs").toPandas()
    assert docs["doc_idx"].sort_values().tolist() == list(range(len(small_corpus)))
    src = small_corpus.set_index(["repo", "path"])["content"]
    merged = docs.set_index(["repo", "path"]).join(src.to_frame())
    expect = merged["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    assert (merged["content_sha256"] == expect).all()
    # doc_idx is dense rank of doc_id
    by_idx = docs.sort_values("doc_idx")
    assert by_idx["doc_id"].is_monotonic_increasing


def test_rank_identity_tata(spark, small_index, small_oracle, queries):
    """NumPy term-at-a-time scorer == oracle on all 50 reference queries."""
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir)
    scorer = TermAtATimeScorer(reader)
    for qid, qtext, k in zip(queries["query_id"], queries["query_text"], queries["k"]):
        got = scorer.score(qtext, int(k))
        want = small_oracle.score(qtext, int(k))
        assert_rank_identical(got, want)


def test_rank_identity_wand(spark, small_index, small_oracle, queries):
    """Block-max WAND == oracle on all 50 reference queries."""
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir)
    for qid, qtext, k in zip(queries["query_id"], queries["query_text"], queries["k"]):
        got = wand_topk(reader, qtext, int(k))
        want = small_oracle.score(qtext, int(k))
        assert_rank_identical(got, want)


def test_rank_identity_spark_distributed(spark, small_index, small_oracle, queries):
    """Distributed DataFrame scorer == oracle on a subset (slower per query)."""
    idx_dir, _ = small_index
    sub = queries.iloc[[0, 5, 16, 27, 30, 42, 45, 48, 49]]
    for qid, qtext, k in zip(sub["query_id"], sub["query_text"], sub["k"]):
        got = [(r["doc_id"], r["score"]) for r in bm25_topk_spark(spark, idx_dir, qtext, int(k)).collect()]
        want = small_oracle.score(qtext, int(k))
        assert_rank_identical(got, want)


def test_empty_and_absent_queries(spark, small_index):
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir)
    assert TermAtATimeScorer(reader).score("zzzzqqq", 10) == []
    assert wand_topk(reader, "zzzzqqq", 10) == []
    assert TermAtATimeScorer(reader).score("", 10) == []
    assert bm25_topk_spark(spark, idx_dir, "zzzzqqq", 10).count() == 0


def test_salted_hot_terms_blocks_sorted(spark, small_index):
    """Hot terms (df>200 here: license boilerplate) must still decode to a
    globally docID-sorted posting list across salt ranges."""
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir)
    postings = reader.fetch_postings(["license", "the"])
    for term, (docs, tfs, g) in postings.items():
        assert (np.diff(docs) > 0).all(), f"{term} postings not strictly sorted"
        assert len(docs) == int(g["n"].sum())


def test_jvm_and_arrow_tokenizers_identical(spark, small_corpus):
    """The codegen (regexp_extract_all) and Arrow (pandas) tokenize paths
    must produce the same postings multiset — one analysis, two engines."""
    import pandas as pd

    from search_replica_spark.index.build import (
        tokenize_counts,
        tokenize_counts_jvm,
        with_doc_ids,
    )

    docs = with_doc_ids(spark.createDataFrame(small_corpus.iloc[:300]))
    a = tokenize_counts_jvm(docs).toPandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    b = tokenize_counts(docs).toPandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 1000


def test_pinned_reader_identical(spark, small_index, small_oracle, queries):
    """Driver-pinned serving mode returns the same results as Spark fetch."""
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir).pin_driver()
    scorer = TermAtATimeScorer(reader)
    sub = queries.iloc[[0, 9, 16, 30, 40, 48, 49]]
    for qtext, k in zip(sub["query_text"], sub["k"]):
        got = scorer.score(qtext, int(k))
        want = small_oracle.score(qtext, int(k))
        assert_rank_identical(got, want)
        assert wand_topk(reader, qtext, int(k)) is not None


def test_and_mode_rank_identity(spark, small_index, small_oracle):
    """ES operator:and semantics — engine == oracle, incl. absent-term case."""
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir)
    scorer = TermAtATimeScorer(reader)
    for q in ["license apache", "def return", "license zzznope", "the def license"]:
        got = scorer.score(q, 10, mode="and")
        want = small_oracle.score(q, 10, mode="and")
        assert_rank_identical(got, want)
        got_d = [(r["doc_id"], r["score"]) for r in bm25_topk_spark(spark, idx_dir, q, 10, mode="and").collect()]
        assert_rank_identical(got_d, want)
    # AND is a subset of OR with >= scores per doc
    or_res = dict(small_oracle.score("license apache", 200))
    and_res = scorer.score("license apache", 200, mode="and")
    assert all(d in or_res for d, _ in and_res)


def test_edge_corpora(spark, tmp_path):
    """Empty, single-doc, and unicode corpora build and query correctly."""
    import pandas as pd

    from search_replica_spark.config import IndexConfig
    from search_replica_spark.index.build import build_index
    from search_replica_spark.oracle import OracleIndex

    cfg = IndexConfig(shuffle_partitions=2)
    schema = "repo string, path string, commit string, lang string, content string"

    stats = build_index(spark, spark.createDataFrame([], schema), str(tmp_path / "e"), cfg)
    assert stats["n_docs"] == 0 and stats["n_terms"] == 0

    uni = pd.DataFrame(
        {
            "repo": ["r/u"], "path": ["pu"], "commit": ["c" * 40], "lang": ["md"],
            "content": ["héllo wörld 中文 naïve café getFooBar"],
        }
    )
    build_index(spark, spark.createDataFrame(uni), str(tmp_path / "u"), cfg)
    reader = IndexReader(spark, str(tmp_path / "u"))
    oi = OracleIndex.build(uni)
    for q in ["héllo", "caf", "getFooBar"]:
        got = TermAtATimeScorer(reader).score(q, 5)
        want = oi.score(q, 5)
        assert [(d, round(s, 9)) for d, s in got] == [(d, round(s, 9)) for d, s in want]


def test_wand_lazy_decode_stats(spark, small_index, small_oracle):
    """Lazy WAND decodes at most all blocks, and stays rank-identical."""
    idx_dir, _ = small_index
    reader = IndexReader(spark, idx_dir)
    for q, k in [("license apache the def return", 1), ("license", 5)]:
        st = {}
        got = wand_topk(reader, q, k, stats=st)
        want = small_oracle.score(q, k)
        assert_rank_identical(got, want)
        assert 0 < st["blocks_decoded"] <= st["blocks_total"]


def test_wand_pruning_fires_on_selective_query(spark, tmp_path):
    """VERDICT r1 #6: with a Zipfian term mix (a handful of docs carrying a
    rare marker vs the 80%-df license boilerplate), a selective query must
    let block-max WAND skip most of the hot term's blocks COMPRESSED:
    blocks_decoded / blocks_total < 0.5, with rank-identity preserved."""
    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import generate_corpus
    from search_replica_spark.index.build import build_index

    c = generate_corpus(1500)
    rare = c.index.to_numpy() % 300 == 0  # 5 docs get the marker term
    c.loc[rare, "content"] = c.loc[rare, "content"] + "\nzzmarkerzz special"
    out = str(tmp_path / "zipf")
    build_index(spark, spark.createDataFrame(c), out,
                IndexConfig(shuffle_partitions=4, block_size=64))
    rd = IndexReader(spark, out)

    q = "zzmarkerzz license apache software distributed"
    stats = {}
    got = wand_topk(rd, q, 3, stats=stats)
    want = TermAtATimeScorer(rd).score(q, 3)
    assert_rank_identical(got, want)
    assert stats["blocks_total"] > 20
    ratio = stats["blocks_decoded"] / stats["blocks_total"]
    assert ratio < 0.5, f"pruning too weak: decoded {ratio:.0%} of blocks"


def test_store_doclens_off_falls_back_to_docs_join(spark, tmp_path):
    """IndexConfig(store_doclens=False): segments carry no dls_bin and the
    distributed scorer falls back to the docs join — rank-identical."""
    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import generate_corpus
    from search_replica_spark.index.build import build_index

    c = generate_corpus(400)
    lean = str(tmp_path / "lean")
    fat = str(tmp_path / "fat")
    build_index(spark, spark.createDataFrame(c), lean,
                IndexConfig(shuffle_partitions=4, store_doclens=False))
    build_index(spark, spark.createDataFrame(c), fat,
                IndexConfig(shuffle_partitions=4))
    q = "license apache def return"
    a = [(r.doc_id, round(r.score, 9)) for r in bm25_topk_spark(spark, lean, q, 10).collect()]
    b = [(r.doc_id, round(r.score, 9)) for r in bm25_topk_spark(spark, fat, q, 10).collect()]
    assert a == b and len(a) == 10
    import duckdb

    sz = duckdb.query(
        f"SELECT sum(octet_length(dls_bin)) FROM read_parquet('{lean}/segments/*.parquet')"
    ).fetchone()[0]
    assert int(sz) == 0


def test_sharded_serving_rank_identity(spark, small_index, queries):
    """ES-style doc-sharded serving (global dfs, local top-k, merge) must be
    rank-identical to unsharded TATA for every reference query and shard
    count — only k-sized hit lists ever cross 'nodes'."""
    from search_replica_spark.query.bm25 import sharded_topk

    idx_dir, _ = small_index
    rd = IndexReader(spark, idx_dir)
    scorer = TermAtATimeScorer(rd)
    for qtext, k in zip(queries["query_text"], queries["k"]):
        want = scorer.score(qtext, int(k))
        for n in (1, 3, 7):
            got = sharded_topk(rd, qtext, int(k), n_shards=n)
            assert canon(got) == canon(want), (qtext, n)


def test_phrase_query_matches_python_reference(spark, tmp_path):
    """Positional index + phrase_topk (Lucene PhraseQuery semantics: ptf as
    tf, summed idfs) vs an independent pure-Python implementation."""
    import math

    from search_replica_spark.analysis import tokenize_text
    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import generate_corpus
    from search_replica_spark.index.build import build_index
    from search_replica_spark.oracle import doc_id_of
    from search_replica_spark.query.bm25 import phrase_topk

    c = generate_corpus(500)
    out = str(tmp_path / "pidx")
    build_index(spark, spark.createDataFrame(c), out,
                IndexConfig(shuffle_partitions=4, store_positions=True))
    rd = IndexReader(spark, out)

    toks = {doc_id_of(r.repo, r.path): tokenize_text(r.content) for r in c.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = 1.2, 0.75

    def py_phrase(phrase, k):
        q = tokenize_text(phrase)
        df = {t: sum(1 for tk in toks.values() if t in set(tk)) for t in set(q)}
        if any(df[t] == 0 for t in q):
            return []
        idf_sum = sum(math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in q)
        hits = []
        for d, tk in toks.items():
            ptf = sum(1 for i in range(len(tk) - len(q) + 1) if tk[i : i + len(q)] == q)
            if ptf:
                dl = len(tk)
                hits.append((d, idf_sum * ptf / (ptf + k1 * (1 - b + b * dl / avgdl))))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    phrases = [
        "apache license version",      # boilerplate: high df
        "license apache",              # reversed order: rare/absent
        "the apache",                  # 2-term
        "compliance with the license", # 4-term
        "zzz not there",               # absent
    ]
    matched_any = False
    for ph in phrases:
        got = canon(phrase_topk(rd, ph, 10))
        want = canon(py_phrase(ph, 10))
        assert got == want, ph
        matched_any = matched_any or bool(got)
    assert matched_any  # the fixture really exercises phrase matching


def test_sloppy_phrase_matches_python_reference(spark, tmp_path):
    """phrase_topk(slop>0): nearest-occurrence proximity spec vs an
    independent pure-Python implementation, incl. a 3-term phrase."""
    import math

    from search_replica_spark.analysis import tokenize_text
    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import generate_corpus
    from search_replica_spark.index.build import build_index
    from search_replica_spark.oracle import doc_id_of
    from search_replica_spark.query.bm25 import phrase_topk

    c = generate_corpus(400)
    out = str(tmp_path / "pidx")
    build_index(spark, spark.createDataFrame(c), out,
                IndexConfig(shuffle_partitions=4, store_positions=True))
    rd = IndexReader(spark, out)

    toks = {doc_id_of(r.repo, r.path): tokenize_text(r.content) for r in c.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = 1.2, 0.75

    def py_sloppy(phrase, k, slop):
        q = tokenize_text(phrase)
        df = {t: sum(1 for tk in toks.values() if t in set(tk)) for t in set(q)}
        if any(df[t] == 0 for t in q):
            return []
        idf_sum = sum(math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in q)
        hits = []
        for d, tk in toks.items():
            pos = {t: [i for i, x in enumerate(tk) if x == t] for t in set(q)}
            if any(not pos[t] for t in q):
                continue
            ptf = 0.0
            for p0 in pos[q[0]]:
                m = sum(min(abs(p - (p0 + i)) for p in pos[t])
                        for i, t in enumerate(q[1:], start=1))
                if m <= slop:
                    ptf += 1.0 / (m + 1)
            if ptf:
                dl = len(tk)
                hits.append((d, idf_sum * ptf / (ptf + k1 * (1 - b + b * dl / avgdl))))
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    cases = [("apache license", 1), ("license version", 1),
             ("the apache version", 1), ("under the license", 0)]
    matched_any = False
    for ph, slop in cases:
        got = canon(phrase_topk(rd, ph, 10, slop=slop))
        want = canon(py_sloppy(ph, 10, slop))
        assert got == want, (ph, slop)
        matched_any = matched_any or bool(got)
    assert matched_any
