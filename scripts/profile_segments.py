"""Fine-grained job breakdown of _stage_docmap + _stage_segments.

Replicates the internals of index/build.py step-by-step with per-job
clocks over an existing docmap output (run profile_build.py first, or
pass a fresh out dir to rebuild docmap here).

Usage: python scripts/profile_segments.py [sf] [cpus]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "0.1"
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main():
    from pyspark.sql import functions as F

    from search_replica_spark.config import IndexConfig
    from search_replica_spark.corpus import corpus_parquet
    from search_replica_spark.index.build import (
        SEGMENT_SCHEMA,
        _encode_blocks_fn,
        assign_dense_doc_idx,
        tokenize_counts_jvm,
        with_doc_ids,
    )
    from search_replica_spark.session import get_spark

    spark = get_spark("profile_segments", cores=CPUS, shuffle_partitions=CPUS)
    src = corpus_parquet(SF)
    corpus = spark.read.parquet(src)
    cfg = IndexConfig(shuffle_partitions=CPUS, hot_df_threshold=50_000)
    out = f"/dev/shm/profseg_idx_{SF}_{CPUS}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    # warmup
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    corpus.limit(2048).select("content").write.format("noop").mode("overwrite").save()

    t = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        print(f"{name:>34}: {t[name]:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return r

    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())

    P = cfg.shuffle_partitions
    width = max(P, 200_000 * 250 // 2_000_000)
    spark.conf.set("spark.sql.shuffle.partitions", str(width))

    # ---- docmap internals ----
    src_df = corpus.select(*cfg.input_columns)
    docs = with_doc_ids(src_df)
    tok = tokenize_counts_jvm(docs)
    clock("docmap.tokenize+write_postings", lambda: tok.write.mode("overwrite").parquet(os.path.join(out, "postings")))
    postings = spark.read.parquet(os.path.join(out, "postings"))
    doc_len = postings.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    doc_meta = docs.select("doc_id", "repo", "path", "lang", "content_sha256")
    idc = clock("docmap.identity_guard", lambda: doc_meta.agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("d")).collect()[0])
    doc_stats = doc_meta.join(doc_len, "doc_id", "left").fillna({"doc_len": 0})
    doc_map = clock("docmap.assign_dense(idx+cache)", lambda: assign_dense_doc_idx(doc_stats, P))
    clock("docmap.write_docs(rangepart)", lambda: (
        doc_map.repartitionByRange(P, "doc_idx").sortWithinPartitions("doc_idx")
        .write.mode("overwrite").parquet(os.path.join(out, "docs"))))

    # ---- segments internals ----
    doc_map2 = spark.read.parquet(os.path.join(out, "docs"))
    n_post = clock("seg.count_postings", postings.count)
    width = max(P, n_post // 2_000_000 + 1)
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    agg = clock("seg.docstats_agg", lambda: doc_map2.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avg"),
        F.sum("doc_len").alias("tok")).collect()[0])
    n_docs, avg_dl = int(agg["n"]), float(agg["avg"])
    df_tbl = postings.groupBy("term").agg(F.count("*").alias("df"))
    clock("seg.dict_write(rangepart_dbl)", lambda: (
        df_tbl.repartitionByRange(min(P, 8), "term").sortWithinPartitions("term")
        .write.mode("overwrite").parquet(os.path.join(out, "dict"))))
    dict_df = spark.read.parquet(os.path.join(out, "dict"))
    hot = dict_df.filter(F.col("df") > cfg.hot_df_threshold).withColumnRenamed("df", "df_hot")
    doc_side = F.broadcast(doc_map2.select("doc_id", "doc_idx", "doc_len"))
    p2 = postings.join(doc_side, "doc_id").join(F.broadcast(hot), "term", "left")
    p2 = p2.withColumn(
        "salt",
        F.when(F.col("df_hot").isNotNull(),
               (F.col("doc_idx") / F.lit(cfg.salt_range_docs)).cast("int")).otherwise(F.lit(0)),
    )
    seg = p2.groupBy("term", "salt").applyInPandas(
        _encode_blocks_fn(n_docs, avg_dl, cfg), schema=SEGMENT_SCHEMA)
    # encode WITHOUT the final repartition, to isolate its cost
    clock("seg.encode_noop", lambda: seg.write.format("noop").mode("overwrite").save())
    seg2 = seg.repartition(P, "term").sortWithinPartitions("term", "block_id")
    clock("seg.encode+repart+write", lambda: seg2.write.mode("overwrite").parquet(os.path.join(out, "segments")))
    print(t)


if __name__ == "__main__":
    main()
