"""Row→document transform operators — the reference's indexing dataflow
re-expressed as DataFrame plans (SURVEY.md §2A, P2-P16, B6-B8).

Each operator cites the reference behavior it reproduces and carries a
DuckDB oracle SQL twin. Expressed over the driver's TPC-H-ish tables:
customer/orders = parent/child docs, lineitem = inline rows, events = CDC
stream stand-in.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from search_replica_spark.operators import load, register


# P2: projection / column pruning — reference scans only `index:`-tagged
# columns (postgres/table.go:221-238, pruned COPY :251-259). Catalyst pushes
# the select+filter into the parquet scan.
@register(
    "p2_projection_pruning",
    """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
       WHERE l_shipdate < TIMESTAMP '1996-01-01'""",
)
def p2_projection_pruning(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )


# P3+P4: column rename (`index:"newname"`, structtag.go:158-160) and drop
# (`index:"-"`, structtag.go:174-177).
@register(
    "p3_p4_rename_drop",
    """SELECT c_custkey AS id, c_name AS customer_name, c_mktsegment AS segment
       FROM customer""",
)
def p3_p4_rename_drop(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


# P6+P7+P8: docType constant injection (table.go:163), `_id = {table}_{pk}`
# (table.go:119-128), routing assignment (table.go:129-131).
@register(
    "p6_p7_p8_doc_meta",
    """SELECT 'orders_' || o_orderkey AS doc_key, 'orders' AS doc_type,
              CAST(o_custkey AS VARCHAR) AS routing, o_orderkey
       FROM orders""",
)
def p6_p7_p8_doc_meta(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("orders_"), F.col("o_orderkey").cast("string")).alias("doc_key"),
        F.lit("orders").alias("doc_type"),
        F.col("o_custkey").cast("string").alias("routing"),
        "o_orderkey",
    )


# P9: row→JSON document encode (structs.go:87-113) — ordered-field JSON.
@register(
    "p9_json_encode",
    """SELECT n_nationkey,
              '{"name":"' || n_name || '","regionkey":' || n_regionkey || '}' AS doc_json
       FROM nation""",
)
def p9_json_encode(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.concat(
            F.lit('{"name":"'),
            F.col("n_name"),
            F.lit('","regionkey":'),
            F.col("n_regionkey").cast("string"),
            F.lit("}"),
        ).alias("doc_json"),
    )


# P9b: row→JSON with a DATE-typed field (demo/mapping.json:9 declares
# "type": "date"): ES expects strict ISO-8601 in the encoded doc, so
# timestamps format as yyyy-MM-dd'T'HH:mm:ss instead of flowing through
# as engine-native strings (structs.go:87-113 marshals time.Time the
# same way via encoding/json).
@register(
    "p9b_json_encode_date",
    """SELECT event_id,
              '{"user":' || user_id || ',"ts":"' ||
              strftime(ts, '%Y-%m-%dT%H:%M:%S') || '"}' AS doc_json
       FROM events""",
)
def p9b_json_encode_date(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.concat(
            F.lit('{"user":'),
            F.col("user_id").cast("string"),
            F.lit(',"ts":"'),
            F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
            F.lit('"}'),
        ).alias("doc_json"),
    )


# P10: parent/child join field {name, parent} + routing = parent id
# (table_join.go:19-33; demo/schema.sql:78-81).
@register(
    "p10_parent_child_join_field",
    """SELECT 'orders_' || o_orderkey AS doc_key, 'order' AS join_name,
              'customer_' || o_custkey AS join_parent,
              CAST(o_custkey AS VARCHAR) AS routing
       FROM orders""",
)
def p10_parent_child_join_field(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("orders_"), F.col("o_orderkey").cast("string")).alias("doc_key"),
        F.lit("order").alias("join_name"),
        F.concat(F.lit("customer_"), F.col("o_custkey").cast("string")).alias("join_parent"),
        F.col("o_custkey").cast("string").alias("routing"),
    )


# P11: inline 1:M denormalization — child rows embedded in parent doc
# (inline.go:111-170; batch form = FK join + collect_list, SURVEY §1.1).
# Sorted array_join makes the aggregate order-insensitive for comparison.
@register(
    "p11_inline_denorm",
    """SELECT o.o_orderkey,
              count(*) AS n_items,
              round(sum(l.l_quantity), 6) AS sum_qty,
              string_agg(l.l_partkey || '_' || l.l_linenumber,
                         ',' ORDER BY l.l_partkey || '_' || l.l_linenumber) AS items
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_orderkey""",
)
def p11_inline_denorm(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    item = F.concat(
        F.col("l_partkey").cast("string"), F.lit("_"), F.col("l_linenumber").cast("string")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.array_join(F.sort_array(F.collect_list(item)), ",").alias("items"),
        )
    )


# P12: key-change detection → delete+insert vs plain update
# (table.go:66-86, replication.go:286-321), modeled over the events stream:
# an event_type change for a user is a "key change".
@register(
    "p12_key_change_ops",
    """SELECT user_id, event_id,
              CASE WHEN prev_type IS NULL THEN 'insert'
                   WHEN prev_type <> event_type THEN 'delete+insert'
                   ELSE 'update' END AS op
       FROM (
         SELECT user_id, event_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
         FROM events
       )""",
)
def p12_key_change_ops(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.when(prev.isNull(), F.lit("insert"))
        .when(prev != F.col("event_type"), F.lit("delete+insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
    )


# P16: dedup / last-wins upsert by `_id` (table.go:56-63, replication.go:270-276)
# — latest event per user wins.
@register(
    "p16_lastwins_dedup",
    """SELECT user_id, event_id, event_type, value FROM (
         SELECT *, row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
         FROM events
       ) WHERE rn = 1""",
)
def p16_lastwins_dedup(spark, sf_dir):
    # one partial-aggregating max(struct) instead of a window sort: the
    # struct orders by (ts, event_id) exactly as the rn=1 row does (ties
    # past event_id are impossible — event ids are unique), and map-side
    # combine shrinks the shuffle to one row per (user, partition)
    e = load(spark, sf_dir, "events")
    picked = e.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("_s")
    )
    return picked.select(
        "user_id",
        F.col("_s.event_id").alias("event_id"),
        F.col("_s.event_type").alias("event_type"),
        F.col("_s.value").alias("value"),
    )


# B6: has_child semi-join (ES parent/child query, demo/README.md:18-42) —
# parents with at least one matching child, as a broadcast-able left_semi.
@register(
    "b6_has_child_semijoin",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
)
def b6_has_child_semijoin(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


# B6c: has_child with min_children — the reference's own canonical demo
# query (demo/README.md:23-33 sets "min_children": 1 on has_child). ES
# keeps a parent only when it has AT LEAST N matching children: a count
# condition, not an existence test. Spark-first shape: filter children,
# ONE partial-aggregating groupBy on the join key (map-side combine, count
# >= N as a post-agg filter), then a left-semi join — the aggregated side
# is |distinct parents| rows, so AQE broadcasts it when selective. Same
# two-shuffle plan at 100 TB, no fan-out join.
@register(
    "b6c_has_child_min_children",
    """SELECT c_custkey, c_name FROM customer c
       WHERE (SELECT count(*) FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F') >= 3""",
)
def b6c_has_child_min_children(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    qualifying = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_children"))
        .filter(F.col("n_children") >= 3)
    )
    return c.join(qualifying, c.c_custkey == qualifying.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# B6d: has_child with inner_hits — the other half of the demo query
# (demo/README.md:29-31: "inner_hits": {"_source": true}). ES returns each
# matching parent WITH its matching child documents (capped at inner_hits
# size, default 3, deterministically ordered). Spark-first: per-parent
# top-k via a window partitioned by the parent key (the sort never goes
# global), then ONE equi-join parent↔hits — both shuffles key on the
# parent id, the plan that survives a skewed 100-TB child table because
# the row_number cap bounds the join fan-out to k rows per parent.
@register(
    "b6d_has_child_inner_hits",
    """SELECT c_custkey, c_name, hit_orderkey, hit_totalprice FROM customer c
       JOIN (SELECT o_custkey, o_orderkey AS hit_orderkey,
                    o_totalprice AS hit_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderkey) AS rk
             FROM orders WHERE o_orderstatus = 'F') h
         ON h.o_custkey = c.c_custkey
       WHERE h.rk <= 3""",
)
def b6d_has_child_inner_hits(spark, sf_dir):
    from pyspark.sql.window import Window as W

    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    hits = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
    return c.join(hits, c.c_custkey == hits.o_custkey, "inner").select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").alias("hit_orderkey"),
        F.col("o_totalprice").alias("hit_totalprice"),
    )


# B6b: has_parent — the inverse of B6's has_child (ES parent-child join
# field, reference: demo/mapping.json join declaration). Children (orders)
# whose PARENT (customer) matches a predicate: a left-semi join with the
# filtered parent side, which AQE broadcasts when selective.
@register(
    "b6b_has_parent_semijoin",
    """SELECT o_orderkey, o_custkey FROM orders o
       WHERE EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey
                       AND c.c_mktsegment = 'BUILDING')""",
)
def b6b_has_parent_semijoin(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_custkey"
    )


# B7: nested query on inlined arrays (mapping.json "type":"nested") —
# build array<struct>, explode, filter. Exercises arrays-of-composites,
# which the reference explicitly cannot do (discovery.go:144, README.md:23).
@register(
    "b7_nested_array_query",
    "SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 45",
)
def b7_nested_array_query(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_partkey", "l_quantity")).alias("items")
    )
    ex = nested.select("l_orderkey", F.explode("items").alias("it"))
    return ex.filter(F.col("it.l_quantity") > 45).select("l_orderkey").distinct()


# B8: routing-aware fetch (GET /_source/{id}?routing=, consistency_test.go:189-210)
# — a point lookup that partition-prunes on the routing key.
@register(
    "b8_routing_fetch",
    """SELECT 'orders_' || o_orderkey AS doc_key, o_totalprice
       FROM orders WHERE o_custkey = 42""",
)
def b8_routing_fetch(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_custkey") == 42).select(
        F.concat(F.lit("orders_"), F.col("o_orderkey").cast("string")).alias("doc_key"),
        "o_totalprice",
    )


# P17: ES partial update — `_update {"doc": ...}` shallow field merge
# (reference: EncodeUpdateRowJSON, postgres/table.go:143-151; ES resolves it
# as get _source → merge non-null fields → reindex). Pure read-time form:
# given a base table and a sequenced stream of partial rows (null = field
# unchanged), produce the current merged view. Per-column last-non-null-wins
# by seq is ONE partial-aggregating groupBy (max over (seq, value) structs —
# no window sort), then a single equi-join + coalesce against the base:
# both shuffles key on doc_id, the scale-correct shape. The engine-side
# twin of this (merge against the stored _source inside the generational
# index) is streaming/incremental.py:_resolve_partial_updates.
def partial_update_merge(base, updates, key: str = "doc_id", seq: str = "_seq"):
    """Merged current view of ``base`` under ``updates`` (ES _update
    semantics). ``updates``: key + seq + any subset of base's columns,
    null meaning "unchanged"."""
    upd_cols = [c for c in base.columns if c != key and c in updates.columns]
    picked = updates.groupBy(key).agg(
        *[
            F.max(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(F.col(seq).alias("s"), F.col(c).alias("v")),
                )
            )["v"].alias(f"_u_{c}")
            for c in upd_cols
        ]
    )
    merged = base.join(picked, key, "left")
    out = [F.col(key)] + [
        (F.coalesce(F.col(f"_u_{c}"), F.col(c)) if c in upd_cols else F.col(c)).alias(c)
        for c in base.columns
        if c != key
    ]
    return merged.select(*out)


_P17_SQL = """
WITH upd AS (
  SELECT doc_id, 1 AS seq, CAST(NULL AS VARCHAR) AS text, 'xx' AS lang,
         CAST(NULL AS VARCHAR) AS source
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, 2, NULL, NULL, 'moved' FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id, 3, 'PATCHED', NULL, NULL FROM documents WHERE doc_id % 20 = 0
),
last AS (
  SELECT doc_id,
         max_by(text, seq) FILTER (WHERE text IS NOT NULL) AS text,
         max_by(lang, seq) FILTER (WHERE lang IS NOT NULL) AS lang,
         max_by(source, seq) FILTER (WHERE source IS NOT NULL) AS source
  FROM upd GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(l.text, d.text) AS text,
       coalesce(l.lang, d.lang) AS lang,
       coalesce(l.source, d.source) AS source,
       d.n_chars
FROM documents d LEFT JOIN last l USING (doc_id)
"""


@register("p17_partial_update_merge", _P17_SQL)
def p17_partial_update_merge(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    nulls = F.lit(None).cast("string")
    upd = (
        d.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id", F.lit(1).alias("_seq"), nulls.alias("text"),
            F.lit("xx").alias("lang"), nulls.alias("source"),
        )
        .unionByName(
            d.filter(F.col("doc_id") % 10 == 0).select(
                "doc_id", F.lit(2).alias("_seq"), nulls.alias("text"),
                nulls.alias("lang"), F.lit("moved").alias("source"),
            )
        )
        .unionByName(
            d.filter(F.col("doc_id") % 20 == 0).select(
                "doc_id", F.lit(3).alias("_seq"), F.lit("PATCHED").alias("text"),
                nulls.alias("lang"), nulls.alias("source"),
            )
        )
    )
    return partial_update_merge(d, upd)


# B8b: routing-PARTITIONED storage — the reference assigns each doc a
# routing key so ES places it on one shard and a routed GET touches only
# that shard (table.go:129-131; consistency_test.go polls with
# ?routing=). The lakehouse analogue: the doc store is written
# partitionBy(routing bucket), and a routed fetch carries the bucket
# predicate so Catalyst PARTITION-PRUNES the scan to one directory —
# at 100 TB a routed point-read touches 1/N of the files, exactly like
# a one-shard ES GET. (hash-bucketed: bucket = custkey % 16.)
ROUTED_CUSTKEY = 421  # bucket 421 % 16 = 5


@register(
    "b8b_routing_partition_pruning",
    f"""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = {ROUTED_CUSTKEY}""",
)
def b8b_routing_partition_pruning(spark, sf_dir):
    import hashlib
    import os

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out = f"/tmp/ssr_routed_orders_{tag}_v1"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        o = load(spark, sf_dir, "orders")
        (
            o.withColumn("bucket", F.col("o_custkey") % 16)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
    bucket = ROUTED_CUSTKEY % 16
    return (
        spark.read.parquet(out)
        .filter((F.col("bucket") == bucket) & (F.col("o_custkey") == ROUTED_CUSTKEY))
        .select("o_orderkey", "o_totalprice")
    )
