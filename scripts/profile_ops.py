"""Per-operator noop-sink timing + formatted-plan capture (guide §1.4).

Times each named registry entry at $SPARK_GRAFT_SF_DIR with the noop sink
(so the computation is measured, not a real write) and saves
.explain("formatted") under plans/r06/<name>_<tag>.txt.

Usage: python scripts/profile_ops.py <tag> [name ...]
  tag: suffix for the plan files (e.g. "before", "after")
  names: registry entries; default = the bench.py operator set
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_OPS = [
    "ft_bm25_sql_top10", "dedup_minhash_lsh", "ann_cosine_top10",
    "ann_pq_adc_top10", "p11_inline_denorm", "p16_lastwins_dedup",
    "ft_df_stats", "dedup_embedding_lsh", "dedup_simhash_hamming",
]


def explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    try:
        return qe.explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_OPS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from search_replica_spark.operators import all_registered
    from search_replica_spark.session import get_spark

    spark = get_spark("profile_ops", cores=cpus, shuffle_partitions=cpus)
    reg = all_registered()
    plans_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    with open("/proc/loadavg") as f:
        print("loadavg:", f.read().strip())

    # warmup: python workers + JIT on a trivial job
    spark.range(1000000).selectExpr("sum(id)").collect()

    times = {}
    for name in names:
        fn, _ = reg[name]
        spark.sparkContext.setJobDescription(name)
        # plan capture (on the fresh DataFrame, pre-execution)
        df = fn(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(explain_str(df))
        # two timed runs; report both (first includes per-op setup/caches)
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        times[name] = runs
        print(f"{name:>28}: {runs}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
