"""Component breakdown of the NEW segments stage (post-r6 rewrite).

Usage: python scripts/profile_segments2.py [cpus]
Requires a docmap output (postings/ + docs/) — builds one if missing.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def main():
    from pyspark.sql import functions as F

    from search_replica_spark.config import IndexConfig
    from search_replica_spark.index.build import (
        SEGMENT_SCHEMA,
        _encode_partition_arrow,
        _stage_docmap,
    )
    from search_replica_spark.corpus import corpus_parquet
    from search_replica_spark.session import get_spark

    spark = get_spark("profseg2", cores=CPUS, shuffle_partitions=CPUS)
    corpus = spark.read.parquet(corpus_parquet("0.1"))
    cfg = IndexConfig(shuffle_partitions=CPUS, hot_df_threshold=50_000)
    out = f"/dev/shm/profseg2_{CPUS}"

    t = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        print(f"{name:>30}: {t[name]:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        return r

    spark.range(1 << 20).selectExpr("sum(id)").collect()
    corpus.limit(2048).select("content").write.format("noop").mode("overwrite").save()
    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())

    if not os.path.exists(os.path.join(out, "postings")):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        clock("docmap(all)", lambda: _stage_docmap(spark, corpus, out, cfg))

    postings = spark.read.parquet(os.path.join(out, "postings"))
    doc_map = spark.read.parquet(os.path.join(out, "docs"))
    n_docs, avg_dl = 200_000, 315.95008
    width = max(CPUS, 47_070_666 // 2_000_000 + 1)
    spark.conf.set("spark.sql.shuffle.partitions", str(width))

    df_tbl = postings.groupBy("term").agg(F.count("*").alias("df"))
    clock("dict_agg+checkpoint", lambda: df_tbl.localCheckpoint())
    df_tbl_c = df_tbl.localCheckpoint()
    hot = df_tbl_c.filter(F.col("df") > cfg.hot_df_threshold).withColumnRenamed("df", "df_hot")
    doc_side = F.broadcast(doc_map.select("doc_id", "doc_idx", "doc_len"))
    p2 = postings.join(doc_side, "doc_id").join(F.broadcast(hot), "term", "left")
    p2 = p2.withColumn(
        "salt",
        F.when(F.col("df_hot").isNotNull(),
               (F.col("doc_idx") / F.lit(cfg.salt_range_docs)).cast("int")).otherwise(F.lit(0)),
    )
    narrow = p2.select("term", "salt", "doc_idx", "tf", "doc_len", "df_hot")
    # 1. JVM side only: scan + joins + exchange + sort
    clock("jvm:scan+join+shuffle+sort", lambda: (
        narrow.repartition(width, "term", "salt")
        .sortWithinPartitions("term", "salt", "doc_idx")
        .write.format("noop").mode("overwrite").save()))
    # 2. + mapInArrow encode
    seg = (
        narrow.repartition(width, "term", "salt")
        .sortWithinPartitions("term", "salt", "doc_idx")
        .mapInArrow(_encode_partition_arrow(n_docs, avg_dl, cfg), schema=SEGMENT_SCHEMA)
    )
    clock("encode_noop", lambda: seg.write.format("noop").mode("overwrite").save())
    # 3. + repartition + parquet write
    seg2 = seg.repartition(CPUS, "term").sortWithinPartitions("term", "block_id")
    clock("encode+repart+write", lambda: seg2.write.mode("overwrite").parquet(os.path.join(out, "segments")))
    print(t)


if __name__ == "__main__":
    main()
