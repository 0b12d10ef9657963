"""ES 8 kNN search (`"knn": {...}` in the /_search body) over a vector
store co-located with the text index.

The reference's ES 8 target serves dense_vector fields with
approximate kNN; the engine's analogue is an IVF store written next to
the index (``<index_dir>/knn/``): ``centroids`` (label → mean vector +
cluster size, tiny — a broadcast at any scale) and ``vectors``
PARTITIONED BY cluster label, so a probe reads only the probed
directories — partition pruning IS the "approximate" part, exactly the
inverted-file trade (Jégou et al.), and the same layout
``ann_ivf_persisted_top10`` verifies against its DuckDB twin.

``num_candidates`` maps to probes the way ES's candidate pool does:
clusters are taken in query-cosine order until the candidate count
reaches ``num_candidates``; inside the probed set scoring is EXACT
cosine, so recall failures can only come from probing, never scoring.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def knn_store_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "knn")


def build_knn_store(spark, emb_df, index_dir: str) -> dict:
    """Write the co-located IVF store from (vec_id, label, embedding):
    per-label mean centroid + cluster size (posexplode + groupBy — never
    collects raw vectors), vectors partitioned by label."""
    dest = knn_store_dir(index_dir)
    e = emb_df.withColumn(
        "emb", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    pos = e.select("label", F.posexplode("emb").alias("pos", "v"))
    cent = (
        pos.groupBy("label", "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s.getField("c")).alias("centroid"))
        .join(e.groupBy("label").agg(F.count("*").alias("n")), "label")
    )
    cent.coalesce(1).write.mode("overwrite").parquet(os.path.join(dest, "centroids"))
    (
        e.select("vec_id", "label", "emb")
        .write.mode("overwrite")
        .partitionBy("label")
        .parquet(os.path.join(dest, "vectors"))
    )
    n_vec = e.count()
    return {"n_vectors": int(n_vec), "dir": dest}


def probe_for_candidates(cent_pdf, qvec: np.ndarray, num_candidates: int) -> list[int]:
    """Clusters in query-cosine order (tie: label asc) until the summed
    cluster sizes reach ``num_candidates`` — ES's candidate-pool knob in
    IVF terms. Always probes at least one cluster."""
    qn = float(np.linalg.norm(qvec))
    scored = []
    for r in cent_pdf.itertuples():
        c = np.asarray(r.centroid, dtype=np.float64)
        denom = float(np.linalg.norm(c)) * qn
        scored.append((-(float(c @ qvec) / denom) if denom else 0.0, int(r.label), int(r.n)))
    scored.sort()
    out, cum = [], 0
    for _negsim, label, n in scored:
        if cum >= num_candidates and out:
            break
        out.append(label)
        cum += n
    return out


def knn_query(
    spark,
    index_dir: str,
    query_vector,
    k: int = 10,
    num_candidates: int = 100,
) -> list[tuple[int, float]]:
    """Top-k (vec_id, cosine) from the co-located store: centroid probe on
    the driver (the centroids table is O(n_clusters)), then ONE partition-
    pruned scan of the probed labels scoring exact cosine JVM-side
    (zip_with/aggregate — no Python per row), TakeOrdered top-k."""
    dest = knn_store_dir(index_dir)
    cent_pd = spark.read.parquet(os.path.join(dest, "centroids")).toPandas()
    qvec = np.asarray(query_vector, dtype=np.float64)
    probe = probe_for_candidates(cent_pd, qvec, int(num_candidates))
    vectors = spark.read.parquet(os.path.join(dest, "vectors"))
    q = F.array(*[F.lit(float(x)) for x in qvec])
    # both norms fold JVM-side (sequential aggregate), the same evaluation
    # order as the DuckDB twin's list_sum — keeps the rounded sim bit-exact
    sim = _dot(F.col("emb"), q) / (
        F.sqrt(_dot(F.col("emb"), F.col("emb"))) * F.sqrt(_dot(q, q))
    )
    rows = (
        vectors.filter(F.col("label").isin(probe))
        .select("vec_id", F.round(sim, 5).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(int(k))
        .collect()
    )
    return [(int(r["vec_id"]), float(r["sim"])) for r in rows]
