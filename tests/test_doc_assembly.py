"""Doc-assembly consistency test — our analogue of the reference's
demo/consistency_test.go:29-103: generate the demo-schema fixture (seeded,
FIXTURES.md §3 cardinalities), assemble docs, assert field equality, inline
array set-equality keyed by inline pk, join name/parent correctness,
docType injection, and dropped-field absence."""

import numpy as np
import pandas as pd
import pytest

from search_replica_spark.operators.doc_assembly import assemble_reference_docs

N_PARENTS = 200


@pytest.fixture(scope="module")
def trio():
    rng = np.random.default_rng(42)
    ts = pd.Timestamp("2024-01-01")
    main = pd.DataFrame(
        {
            "id": [f"p{i:04d}" for i in range(N_PARENTS)],
            "date": [ts + pd.Timedelta(minutes=int(x)) for x in rng.integers(0, 10_000, N_PARENTS)],
            "deleted": rng.random(N_PARENTS) < 0.01,
            "nested": ['{"key": %d, "name": "n%d", "value": "v"}' % (i, i) for i in range(N_PARENTS)],
            "non_searchable_field": [f"ns{i}" for i in range(N_PARENTS)],
            "text": [f"text body {i}" for i in range(N_PARENTS)],
            "text_array": [[f"t{i}a", f"t{i}b"] for i in range(N_PARENTS)],
            "ignore_me": ["dont search me"] * N_PARENTS,
        }
    )
    # 0-3 inlines per parent, 5-25 children per parent (gen_csv.py:22,30)
    inl_rows, child_rows = [], []
    for i in range(N_PARENTS):
        pid = f"p{i:04d}"
        for j in range(int(rng.integers(0, 4))):
            inl_rows.append((f"i{i:04d}_{j}", pid, f"ival{i}_{j}", "dont search"))
        for j in range(int(rng.integers(5, 26))):
            child_rows.append((f"c{i:04d}_{j}", pid, f"cval{i}_{j}", "dont search me"))
    inline = pd.DataFrame(inl_rows, columns=["id", "parent_id", "value", "ignore_me"])
    child = pd.DataFrame(child_rows, columns=["id", "parent_id", "value", "ignore_me"])
    return main, inline, child


@pytest.fixture(scope="module")
def assembled(spark, trio):
    main, inline, child = trio
    docs = assemble_reference_docs(
        spark.createDataFrame(main),
        spark.createDataFrame(inline),
        spark.createDataFrame(child),
    )
    return {k: v.toPandas() for k, v in docs.items()}, trio


def test_main_doc_fields_and_meta(assembled):
    docs, (main, inline, child) = assembled
    md = docs["main_doc"].set_index("_id")
    assert len(md) == N_PARENTS
    for i in (0, 7, 199):
        pid = f"p{i:04d}"
        row = md.loc[pid]
        assert row["routing"] == pid  # index:",routing" on id
        assert row["doc_type"] == "main_doc"  # docType injection
        doc = row["doc"]
        src = main[main.id == pid].iloc[0]
        # per-field equality (consistency_test.go:84-94)
        assert doc["text"] == src["text"]
        assert doc["deleted"] == bool(src["deleted"])
        assert doc["nested"] == src["nested"]
        assert doc["non_searchable_field"] == src["non_searchable_field"]
        assert list(doc["text_array"]) == list(src["text_array"])
        # join field: parent side has name only
        assert doc["join"]["name"] == "immaparent"
        # dropped field absent
        assert "ignore_me" not in doc.asDict() if hasattr(doc, "asDict") else "ignore_me" not in doc


def test_inline_array_set_equality(assembled):
    docs, (main, inline, child) = assembled
    md = docs["main_doc"].set_index("_id")
    by_parent = inline.groupby("parent_id")
    for pid, grp in list(by_parent)[:25]:
        got = {(o["id"], o["value"]) for o in md.loc[pid]["doc"]["inlined_field"]}
        want = {(r.id, r.value) for r in grp.itertuples()}
        assert got == want, pid  # ElementsMatch (consistency_test.go:60-69)
    # parents with no inlines get an empty array, not null
    no_inline = set(main.id) - set(inline.parent_id)
    some = list(no_inline)[:5]
    for pid in some:
        assert list(md.loc[pid]["doc"]["inlined_field"]) == []


def test_child_docs_join_and_routing(assembled):
    docs, (main, inline, child) = assembled
    cd = docs["child_doc"].set_index("_id")
    assert len(cd) == len(child)
    for r in child.sample(20, random_state=0).itertuples():
        row = cd.loc[r.id]
        assert row["routing"] == r.parent_id  # routed to the parent's shard
        assert row["doc_type"] == "child_doc"
        doc = row["doc"]
        assert doc["value"] == r.value
        assert doc["join"]["name"] == "immachild"  # join:"join,immachild"
        assert doc["join"]["parent"] == r.parent_id  # join:"parent"
        assert "ignore_me" not in doc


def test_polymorphic_join_name_from_column(spark, trio):
    """P10 sub-feature: the join-field NAME can come from a row column
    instead of the config literal (reference: postgres/table_join.go:19-33)."""
    from pyspark.sql import functions as F

    from search_replica_spark.operators.doc_assembly import assemble_child_docs

    _, _, child = trio
    cdf = spark.createDataFrame(child).withColumn(
        "kind", F.when(F.col("id").endswith("_0"), "specialchild").otherwise("immachild")
    )
    out = assemble_child_docs(cdf, join_name_col="kind").select(
        "_id", F.col("doc.join.name").alias("jn"), F.col("doc.join.parent").alias("jp")
    )
    pdf = out.toPandas().set_index("_id")
    assert (pdf.loc[pdf.index.str.endswith("_0"), "jn"] == "specialchild").all()
    assert (pdf.loc[~pdf.index.str.endswith("_0"), "jn"] == "immachild").all()
    assert (pdf["jp"] == child.set_index("id")["parent_id"]).all()


def test_build_rejects_duplicate_keys(spark, tmp_path):
    """Identity guard: duplicate (repo, path) input fails fast unless
    dedup_input is on (silent posting merges are never allowed)."""
    import pytest as _pytest

    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import generate_corpus
    from search_replica_spark.index.build import build_index

    c = generate_corpus(60)
    dup = pd.concat([c, c.iloc[[0]]], ignore_index=True)
    cfg = IndexConfig(shuffle_partitions=2)
    with _pytest.raises(ValueError, match="doc_id not unique"):
        build_index(spark, spark.createDataFrame(dup), str(tmp_path / "d1"), cfg)
    cfg2 = IndexConfig(shuffle_partitions=2, dedup_input=True)
    stats = build_index(spark, spark.createDataFrame(dup), str(tmp_path / "d2"), cfg2)
    assert stats["n_docs"] == 60
