"""applyInPandasWithState sessionization: keyed state must survive
micro-batch boundaries (maxFilesPerTrigger=1 → one file per batch)."""

import os

import pandas as pd

from search_replica_spark.streaming.stateful import sessionize_stream

SCHEMA = "user_id long, event_id long, ts timestamp"


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"]).astype(
        {"user_id": "int64", "event_id": "int64"}
    )
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")  # Spark-readable
    return df


def test_sessions_close_across_batch_boundary(spark, tmp_path):
    t0 = pd.Timestamp("2026-01-01 10:00:00")
    m = pd.Timedelta(minutes=1)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # batch 0: user 1 has a 3-event session; user 2 one event
    _events(
        [(1, 1, t0), (1, 2, t0 + 5 * m), (1, 3, t0 + 9 * m), (2, 10, t0)]
    ).to_parquet(os.path.join(in_dir, "b0.parquet"), index=False)
    # batch 1: >30 min later — closes user 1's and user 2's first sessions
    t1 = t0 + 60 * m
    _events([(1, 4, t1), (2, 11, t1 + 2 * m)]).to_parquet(
        os.path.join(in_dir, "b1.parquet"), index=False
    )

    q = sessionize_stream(
        spark, in_dir, str(tmp_path / "ckpt"), SCHEMA, gap_min=30, max_files_per_trigger=1
    )
    try:
        import time

        deadline = time.time() + 240
        while time.time() < deadline:
            if q.awaitTermination(5):
                break  # availableNow drained and stopped on its own
            if spark.table("sessions").count() >= 2:
                break  # both closed sessions emitted — don't wait for timeouts
    finally:
        q.stop()
    out = spark.table("sessions").toPandas().sort_values(["user_id", "session_start"])
    closed = out.set_index("user_id")

    # user 1's first session spans batch 0 only but was CLOSED by the batch-1
    # event — 3 events, start t0, end t0+9m: state crossed the batch boundary
    u1 = closed.loc[1]
    assert int(u1["n_events"]) == 3
    assert u1["session_start"] == t0 and u1["session_end"] == t0 + 9 * m
    u2 = closed.loc[2]
    assert int(u2["n_events"]) == 1
    assert u2["session_start"] == t0 == u2["session_end"]
    # the in-flight sessions (t1 events) stay in state, not emitted
    assert len(out) == 2
