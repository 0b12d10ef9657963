"""sf1.0 (2M-doc) scale point for the pruned-BM25 cost switch.

MEASURES (does not assert a winner): unpruned vs forced-pruned p50, the
shipping entry's cost-switched routing, and the blocks-decoded ratio at
2M docs. The r5 measurement showed the pruned plan LOSING here (8.1 s vs
3.6 s, 0.89 of blocks decoded — this corpus's near-uniform block maxima
defeat disjunctive theta pruning), which recalibrated PRUNE_MIN_DOCS
1M → 20M: the switch must route 2M-doc corpora to the single-job plan,
and the one thing this script hard-asserts is RANK IDENTITY between the
two plans. Writes BENCH_SF1.json.

Usage: python scripts/bench_sf1.py  (takes ~15-25 min cold: corpus
generation + index build are cached under /tmp)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IDX = "/tmp/ssr_sf1_idx"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_SF1.json")

QUERIES = [
    "license apache software", "def return import", "public static void",
    "versub delrel", "const struct class", "include func license",
    "the software license", "import def apache",
]


def main() -> None:
    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import corpus_parquet
    from search_replica_spark.index.build import build_index
    from search_replica_spark.query.bm25 import (
        PRUNE_MIN_DOCS,
        bm25_topk_spark,
        bm25_topk_spark_pruned,
    )
    from search_replica_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("bench_sf1", cores=cores, shuffle_partitions=2 * cores)

    t0 = time.time()
    corpus_path = corpus_parquet("1.0")
    t_corpus = time.time() - t0

    build_sec = None
    if not os.path.exists(os.path.join(IDX, "stats.json")):
        t0 = time.time()
        build_index(
            spark,
            spark.read.parquet(corpus_path),
            IDX,
            IndexConfig(shuffle_partitions=4 * cores),
        )
        build_sec = round(time.time() - t0, 1)
    with open(os.path.join(IDX, "stats.json")) as f:
        stats = json.load(f)
    n_docs = int(stats["n_docs"])

    # warmup (JIT + IO cache), one of each plan
    bm25_topk_spark(spark, IDX, QUERIES[0], 10).collect()
    bm25_topk_spark_pruned(spark, IDX, QUERIES[0], 10, min_docs=0).collect()

    unpruned, pruned, shipping = [], [], []
    ratios = []
    for q in QUERIES:
        t0 = time.time()
        ref = bm25_topk_spark(spark, IDX, q, 10).collect()
        unpruned.append(time.time() - t0)
        ps: dict = {}
        t0 = time.time()
        got = bm25_topk_spark_pruned(spark, IDX, q, 10, prune_stats=ps,
                                     min_docs=0).collect()
        pruned.append(time.time() - t0)
        if ps.get("blocks_total"):
            ratios.append(ps["blocks_decoded"] / ps["blocks_total"])
        # shipping entry (default min_docs): at 2M docs the switch should
        # choose the pruned plan on its own
        t0 = time.time()
        bm25_topk_spark_pruned(spark, IDX, q, 10).collect()
        shipping.append(time.time() - t0)
        assert [(r["doc_id"], round(r["score"], 9)) for r in ref] == [
            (r["doc_id"], round(r["score"], 9)) for r in got
        ], f"pruned != unpruned on {q!r}"

    res = {
        "sf": 1.0,
        "n_docs": n_docs,
        "prune_min_docs": PRUNE_MIN_DOCS,
        "cost_switch_takes_pruned_plan": n_docs >= PRUNE_MIN_DOCS,
        "corpus_gen_sec": round(t_corpus, 1),
        "build_sec": build_sec,
        "p50_unpruned_sec": round(statistics.median(unpruned), 4),
        "p50_pruned_forced_sec": round(statistics.median(pruned), 4),
        "p50_shipping_sec": round(statistics.median(shipping), 4),
        "mean_blocks_decoded_ratio": round(
            sum(ratios) / len(ratios), 4) if ratios else None,
        "queries": len(QUERIES),
        "loadavg": os.getloadavg()[0],
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
