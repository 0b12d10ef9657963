"""SparkSession factory with the engine's standard local-mode settings."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "search_replica_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    master = f"local[{cores}]" if cores else "local[*]"
    sp = shuffle_partitions or cores or 32
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        # shuffle spill through RAM-backed storage: this box's /tmp is a
        # spinning virtio disk that serializes all shuffle IO (measured: the
        # term shuffle stops scaling past 8 cores); a real cluster has NVMe
        .config("spark.local.dir", "/dev/shm/spark_local")
        # keep scans splittable into enough tasks for 32 cores even on
        # single-file local inputs (row-group aligned)
        .config("spark.sql.files.maxPartitionBytes", "8m")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
