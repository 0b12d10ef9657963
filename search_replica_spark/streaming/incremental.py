"""Incremental / CDC-style index maintenance (SURVEY §7 M7).

The reference keeps the search index fresh by streaming WAL events into
per-document upserts/deletes (reference: postgres/replication.go:237-367 —
insert/update/delete dispatch; postgres/table.go:56-86 — upsert + key-change
delete+insert). Elasticsearch absorbs those into Lucene's segment model:
new docs land in fresh segments, old versions become tombstoned until merge.

We re-express exactly that model Spark-first:

  - each micro-batch of new/changed docs becomes a new immutable
    **generation** (gen=N/) with the standard index layout, built by the
    same staged ``build_index``;
  - a doc_id appearing in a later generation supersedes earlier versions
    (last-wins by arrival order — reference P16, table.go:56-63); readers
    resolve liveness via latest-generation-wins, i.e. implicit tombstones;
  - global BM25 statistics (N, avgdl, df) are merged across generations at
    read time. Like ES/Lucene, superseded versions still influence corpus
    statistics until **compaction** — ``compact()`` rebuilds one generation
    from the current table snapshot (the lakehouse table is the source of
    truth, mirroring the reference's snapshot reindex, replication.go:100-112).

Structured Streaming wrapper: ``index_stream`` runs a parquet-source stream
whose ``foreachBatch`` calls ``add_generation`` — checkpointLocation makes
batch delivery exactly-once, so generation numbering is stable across
restarts.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

from search_replica_spark.analysis import tokenize_text
from search_replica_spark.config import IndexConfig
from search_replica_spark.index.build import build_index

GENS_FILE = "generations.json"


def _load_gens(index_dir: str) -> list[dict]:
    p = os.path.join(index_dir, GENS_FILE)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return []


def _save_gens(index_dir: str, gens: list[dict]) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, GENS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(gens, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, GENS_FILE))


def add_generation(spark, batch_df, index_dir: str, cfg: IndexConfig | None = None) -> dict:
    """Index one micro-batch as a new generation; returns its stats."""
    cfg = cfg or IndexConfig()
    gens = _load_gens(index_dir)
    gen_id = len(gens)
    gen_dir = os.path.join(index_dir, f"gen={gen_id}")
    shutil.rmtree(gen_dir, ignore_errors=True)  # partial output from a crash
    stats = build_index(spark, batch_df, gen_dir, cfg)
    gens.append({"gen": gen_id, "dir": gen_dir, "n_docs": stats["n_docs"],
                 "total_tokens": stats["total_tokens"]})
    _save_gens(index_dir, gens)  # commit point (reference: LSN ack after flush)
    return stats


def index_stream(spark, input_dir: str, index_dir: str, schema: str,
                 cfg: IndexConfig | None = None):
    """Structured Streaming: parquet files arriving in input_dir → generations.

    Uses availableNow + checkpoint so each file is indexed exactly once
    across restarts. Returns the streaming query (caller awaits termination).
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)
    checkpoint = os.path.join(index_dir, "_checkpoint")

    def process(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        add_generation(spark, batch_df, index_dir, cfg)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact(spark, corpus_df, index_dir: str, cfg: IndexConfig | None = None) -> dict:
    """Merge all generations into one by rebuilding from the current table
    snapshot (reference analogue: full reindex from a consistent snapshot,
    postgres/reindex.go + replication.go:100-112)."""
    cfg = cfg or IndexConfig()
    for g in _load_gens(index_dir):
        shutil.rmtree(g["dir"], ignore_errors=True)
    gen_dir = os.path.join(index_dir, "gen=0")
    stats = build_index(spark, corpus_df, gen_dir, cfg)
    _save_gens(index_dir, [{"gen": 0, "dir": gen_dir, "n_docs": stats["n_docs"],
                            "total_tokens": stats["total_tokens"]}])
    return stats


class MultiGenReader:
    """Query reader over a generational index: merged stats, last-wins
    visibility, NumPy term-at-a-time scoring (rank-identical to a single-gen
    rebuild for append-only corpora)."""

    def __init__(self, spark, index_dir: str, k1: float = 1.2, b: float = 0.75):
        from search_replica_spark.query.bm25 import IndexReader

        self.spark = spark
        self.index_dir = index_dir
        self.gens = _load_gens(index_dir)
        if not self.gens:
            raise FileNotFoundError(f"no generations at {index_dir}")
        self.readers = [IndexReader(spark, g["dir"]) for g in self.gens]
        self.k1, self.b = k1, b
        self.bases = np.cumsum([0] + [g["n_docs"] for g in self.gens[:-1]]).astype(np.int64)
        self.n_docs = int(sum(g["n_docs"] for g in self.gens))
        self.avg_dl = sum(g["total_tokens"] for g in self.gens) / self.n_docs
        # global doc arrays in generation order
        self._doc_len = np.concatenate([r.doc_arrays()[0] for r in self.readers])
        self._doc_ids = np.concatenate([r.doc_arrays()[1] for r in self.readers])
        # last-wins liveness: a slot is dead if the same doc_id appears in a
        # later generation (implicit tombstone — Lucene-style)
        self._live = np.ones(self.n_docs, dtype=bool)
        seen: dict[int, int] = {}
        gen_of = np.concatenate(
            [np.full(g["n_docs"], i, dtype=np.int64) for i, g in enumerate(self.gens)]
        )
        order = np.argsort(-gen_of, kind="stable")  # latest generation first
        for slot in order:
            d = int(self._doc_ids[slot])
            if d in seen:
                self._live[slot] = False
            else:
                seen[d] = slot

    def _merged_df(self, terms: list[str]) -> dict[str, int]:
        import pandas as pd
        from pyspark.sql import functions as F

        parts = []
        for r in self.readers:
            d = (
                self.spark.read.parquet(os.path.join(r.index_dir, "dict"))
                .filter(F.col("term").isin(terms))
                .toPandas()
            )
            parts.append(d)
        alld = pd.concat(parts, ignore_index=True)
        return alld.groupby("term")["df"].sum().astype(int).to_dict()

    def score(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        import math

        terms = sorted(set(tokenize_text(query)))
        if not terms:
            return []
        dfs = self._merged_df(terms)
        full = np.zeros(self.n_docs, dtype=np.float64)
        touched = np.zeros(self.n_docs, dtype=bool)
        for term in terms:
            df_t = dfs.get(term, 0)
            if df_t == 0:
                continue
            idf = math.log(1.0 + (self.n_docs - df_t + 0.5) / (df_t + 0.5))
            for gi, r in enumerate(self.readers):
                p = r.fetch_postings([term])
                if term not in p:
                    continue
                docs, tfs, _ = p[term]
                slots = docs + self.bases[gi]
                dl = self._doc_len[slots]
                tf = tfs.astype(np.float64)
                full[slots] += idf * (tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avg_dl)))
                touched[slots] = True
        touched &= self._live
        idxs = np.nonzero(touched)[0]
        if idxs.size == 0:
            return []
        from search_replica_spark.query.bm25 import _select_topk

        return _select_topk(full[idxs], self._doc_ids[idxs], k)
