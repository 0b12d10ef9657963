"""Custom stateful streaming operator: session windows via
``applyInPandasWithState`` (task brief: "applyInPandasWithState for custom
stateful operators").

``events_sessionize`` in operators/streaming_ops.py is the closed-input
batch formulation (oracle-checked); this is the true STREAMING form: state
(current session start / last event ts / count) lives in the state store,
survives micro-batch boundaries and restarts (checkpoint), and a session is
EMITTED when a later event arrives more than ``gap`` after the previous one
(or the group times out). The reference has no analogue — its stream is
row-at-a-time replication — but a 100 TB event pipeline needs exactly this
shape: keyed state sharded across executors, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long"
STATE_SCHEMA = "start long, last long, n long"


def _sessionize_fn(gap_s: int):
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        ts = sorted(
            int(t.timestamp())
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        closed = []
        for t in ts:
            if t - last > gap_s:
                closed.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        # close idle sessions ~1 gap after the last seen event
        state.setTimeoutDuration(gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="s") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="s") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(spark, input_dir: str, checkpoint: str, schema: str,
                      gap_min: int = 30, max_files_per_trigger: int | None = None):
    """Streaming session-window query over a parquet drop directory.

    Returns a started StreamingQuery writing closed sessions to an
    in-memory sink named ``sessions`` (read back with
    ``spark.table("sessions")``). ``max_files_per_trigger=1`` forces one
    file per micro-batch, proving state survives batch boundaries.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_min * 60),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
