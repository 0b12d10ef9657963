"""Multi-table CDC orchestration — one index fed by N table streams.

The reference dispatches a single WAL stream across every configured
table (postgres/replication.go:237-367) after topo-sorting them so
parents are replicated before the tables that inline into them
(postgres/config.go:56-87). Spark gives each table its own Structured
Streaming query instead of one WAL cursor, so the orchestration re-
expresses as: per-table streams against ONE index, each with its own
checkpoint dir and epoch namespace (exactly-once per stream), started —
and, in drain mode, completed — in parent-first topo order.
"""

from __future__ import annotations

from search_replica_spark.config import IndexConfig
from search_replica_spark.plans.topo import topo_order
from search_replica_spark.streaming.incremental import index_stream, inline_stream


def replicate_tables(
    spark,
    tables: dict[str, dict],
    index_dir: str,
    cfg: IndexConfig | None = None,
    trigger: dict | None = None,
    drain_timeout: int = 600,
):
    """Replicate every configured table into ``index_dir``.

    ``tables``: ``{name: spec}`` where spec carries:
      - ``input_dir``  — parquet CDC file directory for this table;
      - ``schema``     — DDL of the table's event rows;
      - ``kind``       — ``"main"`` (whole-doc CDC → ``index_stream``) or
        ``"inline"`` (child-table CDC → parent array/map edits via
        ``inline_stream``);
      - ``parent``     — for inline tables, the main table they inline
        INTO (the topo edge; config.go's inline parent reference);
      - inline options (``field``, ``child_pk``, ``field_kind``,
        ``upsert_missing``) and ``max_files_per_trigger`` pass through.

    Each table's stream checkpoints under ``_checkpoint_<name>`` and
    namespaces its epochs as ``epoch_source=<name>``, so at-least-once
    replays of any one stream stay exactly-once without the batchId
    counters colliding — N streams, one generation log.

    With the default ``availableNow`` trigger each table DRAINS fully in
    parent-first topo order before the next starts (the reference's
    snapshot + catch-up phase: a child edit must find its parent doc) and
    the call blocks until all are committed. With a ``processingTime``
    trigger the streams start in the same order but run CONCURRENTLY —
    the steady-state replication loop; the caller owns the returned
    handles. Returns ``{name: StreamingQuery}`` either way (drained
    queries are already terminated).
    """
    specs = dict(tables)
    order = topo_order(
        {n: ({s["parent"]} if s.get("parent") else set()) for n, s in specs.items()}
    )
    order = [n for n in order if n in specs]  # topo adds bare parents
    for name, s in specs.items():
        p = s.get("parent")
        if s.get("kind", "main") == "inline" and (p is None or p not in specs):
            raise ValueError(
                f"inline table {name!r} needs parent= one of {sorted(specs)}"
            )
    has_inline = any(s.get("kind", "main") == "inline" for s in specs.values())
    if cfg is None and has_inline:
        # inline maintenance reads parents' stored _source back to merge
        # element edits, so the index MUST store it; derive the doc schema
        # from the first main table (CDC meta columns are not doc fields)
        from pyspark.sql.types import StructType

        meta = {"_change_type", "_seq", "_old_repo", "_old_path"}
        main = next(
            (s for n, s in sorted(specs.items()) if s.get("kind", "main") == "main"),
            None,
        )
        if main is None:
            raise ValueError("inline tables need at least one main table spec")
        cols = tuple(
            f for f in StructType.fromDDL(main["schema"]).fieldNames()
            if f not in meta
        )
        cfg = IndexConfig(store_source=True, input_columns=cols)
    drain = trigger is None or bool(trigger.get("availableNow"))
    handles = {}
    for name in order:
        s = specs[name]
        common = dict(
            cfg=cfg,
            trigger=trigger,
            max_files_per_trigger=s.get("max_files_per_trigger"),
            source_name=name,
        )
        if s.get("kind", "main") == "inline":
            q = inline_stream(
                spark, s["input_dir"], index_dir, s["schema"],
                field=s.get("field", "inlined"),
                child_pk=s.get("child_pk", "ck"),
                upsert_missing=s.get("upsert_missing", True),
                field_kind=s.get("field_kind", "array"),
                **common,
            )
        else:
            q = index_stream(
                spark, s["input_dir"], index_dir, s["schema"],
                max_generations=s.get("max_generations"),
                **common,
            )
        if drain:
            q.awaitTermination(drain_timeout)
        handles[name] = q
    return handles
