"""Build manifest: checkpoint/resume + per-partition lineage.

Reference analogue: the LSN feedback loop — the sink commits its position
only after a successful flush (search/bulk.go:345-347), the replication
loop persists it (replication.go:153-168), and a restart resumes from the
last committed LSN (main.go:164-165). Our unit of commit is a completed
build *stage* whose output parquet is fully written (Spark's atomic
rename-on-commit), recorded with an input fingerprint so a resume against
different input restarts from scratch. Within a stage, per-partition
recovery is Spark task retry (spark.task.maxFailures) — idempotent because
stage outputs are overwrite-mode parquet.

Per-partition lineage (north_star: docs_tokenized, postings_emitted,
bytes_compressed per partition) is recorded in ``out_dir/lineage/`` as a
parquet table keyed by (stage, partition_id).
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    FILE = "manifest.json"

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, self.FILE)
        self.data: dict = {"input_fingerprint": None, "stages": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def save(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=2)
        os.replace(tmp, self.path)  # atomic commit, like the LSN ack

    # --- input identity ---
    def bind_input(self, fingerprint: str) -> None:
        """If the fingerprint changed, all prior stage completions are void."""
        if self.data.get("input_fingerprint") != fingerprint:
            self.data = {"input_fingerprint": fingerprint, "stages": {}}
            self.save()

    def stage_done(self, name: str) -> bool:
        st = self.data["stages"].get(name)
        return bool(st and st.get("status") == "done")

    def start_stage(self, name: str) -> None:
        self.data["stages"][name] = {"status": "running", "started_at": time.time()}
        self.save()

    def finish_stage(self, name: str, metrics: dict | None = None) -> None:
        st = self.data["stages"].setdefault(name, {})
        st["status"] = "done"
        st["finished_at"] = time.time()
        st["metrics"] = metrics or {}
        self.save()


def input_fingerprint(df) -> str:
    """Input identity: schema + row count + an order-independent content
    digest (sum of per-row crc32 over all columns, JVM-side). The digest
    catches in-place content updates that keep the row count unchanged —
    schema+count alone would resume into a stale index. On a real lakehouse
    table this whole function is replaced by the Iceberg snapshot id."""
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.crc32(F.concat_ws("\x00", *[F.col(c).cast("string") for c in df.columns]))
        ).alias("digest"),
    ).collect()[0]
    return f"{df.schema.simpleString()}|{agg['n']}|{agg['digest']}"
