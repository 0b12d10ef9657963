"""Watermarked windowed aggregation over an event stream — the Structured
Streaming late-data story (task brief: "watermarks + windowed aggs for
late data").

``windowed_counts_stream`` runs readStream → ``withWatermark`` → tumbling
``window()`` groupBy → append-mode parquet sink. Semantics (Spark's
event-time contract, which this engine adopts verbatim):

  - the watermark trails the max observed event time by ``late_allow``;
  - a window's aggregate is EMITTED (append mode) only once the watermark
    passes the window end — each window lands in the sink exactly once;
  - an event arriving LATER than the watermark is DROPPED, never applied
    to an already-emitted window (no silent double-count downstream).

The watermark persists in the checkpoint, so the drop guarantee holds
across restarts (run availableNow batches repeatedly against the same
checkpoint — late files in a later run still can't reopen closed
windows). State size is bounded by (windows in flight × keys), the
property that lets this run forever at 100 TB/day: nothing accumulates
beyond the watermark horizon.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

EVENT_SCHEMA = "event_id long, user_id long, event_type string, value double, ts timestamp"


def windowed_counts_stream(
    spark,
    input_dir: str,
    out_dir: str,
    schema: str = EVENT_SCHEMA,
    window: str = "1 hour",
    late_allow: str = "10 minutes",
):
    """Start (availableNow) one drain of the event files into watermarked
    per-(window, event_type) counts appended at ``out_dir/result``.
    Returns the streaming query; caller awaits it. Re-invoke after new
    files arrive — the shared checkpoint carries the watermark forward."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", late_allow)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "result"))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
