"""ES geo query/aggregation family over an integer grid (SURVEY §2B, the
search surfaces the reference delegates to Elasticsearch).

The synthetic tables carry no geo columns, so the grid coordinates are a
DETERMINISTIC projection of the event id space (x = event_id % 360,
y = (event_id DIV 7) % 180 — coprime strides so x and y decorrelate); the
operators treat them as opaque planar grid coordinates. The grid keeps
every operator exact-integer cross-engine: ES's own geotile_grid is
integer (Mercator tile) arithmetic, and bounding-box containment is pure
comparison. True great-circle geo_distance needs trig whose last-bit
rounding differs between JVM and DuckDB libm — squared planar distance
(monotone in true distance on the grid) is the bit-stable spec here.

Scale shape: the box filter and the tile bucketing are codegen'd row
expressions (filter pushes to the scan, one partial-aggregable shuffle on
the tile key); distance top-k is a TakeOrdered over a derived column —
no shuffle at all. All hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_replica_spark.operators import load, register

# One derivation, two engines (DuckDB // == Spark DIV on BIGINT).
_GRID_SQL = "SELECT event_id, event_type, event_id % 360 AS x, (event_id // 7) % 180 AS y FROM events"


def _grid(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        (F.col("event_id") % 360).alias("x"),
        F.expr("(event_id DIV 7) % 180").alias("y"),
    )


# ES geo_bounding_box query + terms agg: {"geo_bounding_box": {"location":
# {...}}} feeding {"terms": {"field": "event_type"}} — containment is pure
# integer comparison, pushed below the aggregation into the scan.
@register(
    "geo_bounding_box_counts",
    f"""WITH g AS ({_GRID_SQL})
        SELECT event_type AS key, count(*) AS doc_count FROM g
        WHERE x BETWEEN 100 AND 199 AND y BETWEEN 40 AND 89
        GROUP BY event_type ORDER BY doc_count DESC, key""",
)
def geo_bounding_box_counts(spark, sf_dir):
    g = _grid(spark, sf_dir)
    return (
        g.filter(F.col("x").between(100, 199) & F.col("y").between(40, 89))
        .groupBy(F.col("event_type").alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key"))
    )


# ES geo_distance sort ({"sort": [{"_geo_distance": {...}}]}): the 10
# events nearest a fixed point, by exact squared planar distance (BIGINT),
# ES tie-break (distance asc, id asc).
@register(
    "geo_distance_top10",
    f"""WITH g AS ({_GRID_SQL})
        SELECT event_id,
               CAST((x - 180) * (x - 180) + (y - 90) * (y - 90) AS BIGINT)
                 AS dist_sq
        FROM g ORDER BY dist_sq, event_id LIMIT 10""",
)
def geo_distance_top10(spark, sf_dir):
    g = _grid(spark, sf_dir)
    return (
        g.select(
            "event_id",
            F.expr(
                "CAST((x - 180) * (x - 180) + (y - 90) * (y - 90) AS BIGINT)"
            ).alias("dist_sq"),
        )
        .orderBy("dist_sq", "event_id")
        .limit(10)
    )


# ES geotile_grid aggregation ({"geotile_grid": {"field": "location",
# "precision": ...}}): bucket by 30x30 grid tile, top 10 tiles by count —
# the exact integer tile arithmetic ES itself uses, on our grid.
@register(
    "geo_tile_grid_top10",
    f"""WITH g AS ({_GRID_SQL})
        SELECT CAST(x // 30 AS BIGINT) AS tile_x, CAST(y // 30 AS BIGINT) AS tile_y,
               count(*) AS doc_count
        FROM g GROUP BY tile_x, tile_y
        ORDER BY doc_count DESC, tile_x, tile_y LIMIT 10""",
)
def geo_tile_grid_top10(spark, sf_dir):
    g = _grid(spark, sf_dir)
    return (
        g.groupBy(
            F.expr("CAST(x DIV 30 AS BIGINT)").alias("tile_x"),
            F.expr("CAST(y DIV 30 AS BIGINT)").alias("tile_y"),
        )
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), "tile_x", "tile_y")
        .limit(10)
    )


# ES geo_centroid aggregation ({"geo_centroid": {"field": "location"}})
# per event_type bucket: the centroid as exact integer micro-coordinates
# (quotient-remainder composition — no float mean enters either engine).
# One partial-aggregable shuffle: sums and counts merge associatively.
@register(
    "geo_centroid_by_type",
    f"""WITH g AS ({_GRID_SQL})
        SELECT event_type AS key, count(*) AS doc_count,
               CAST((sum(x) // count(*)) * 1000000
                    + ((sum(x) % count(*)) * 1000000) // count(*) AS BIGINT)
                 AS cx_micro,
               CAST((sum(y) // count(*)) * 1000000
                    + ((sum(y) % count(*)) * 1000000) // count(*) AS BIGINT)
                 AS cy_micro
        FROM g GROUP BY event_type""",
)
def geo_centroid_by_type(spark, sf_dir):
    g = _grid(spark, sf_dir)
    return g.groupBy(F.col("event_type").alias("key")).agg(
        F.count("*").alias("doc_count"),
        F.expr(
            "CAST((sum(x) DIV count(*)) * 1000000"
            " + ((sum(x) % count(*)) * 1000000) DIV count(*) AS BIGINT)"
        ).alias("cx_micro"),
        F.expr(
            "CAST((sum(y) DIV count(*)) * 1000000"
            " + ((sum(y) % count(*)) * 1000000) DIV count(*) AS BIGINT)"
        ).alias("cy_micro"),
    )


# ES geo_bounds aggregation ({"geo_bounds": {"field": "location"}}) per
# event_type: the tight bounding box of each bucket's points — four
# min/max aggregates, partial-aggregable, all exact integers on the grid.
@register(
    "geo_bounds_by_type",
    f"""WITH g AS ({_GRID_SQL})
        SELECT event_type AS key,
               min(x) AS left_x, max(x) AS right_x,
               min(y) AS bottom_y, max(y) AS top_y
        FROM g GROUP BY event_type""",
)
def geo_bounds_by_type(spark, sf_dir):
    g = _grid(spark, sf_dir)
    return g.groupBy(F.col("event_type").alias("key")).agg(
        F.min("x").alias("left_x"),
        F.max("x").alias("right_x"),
        F.min("y").alias("bottom_y"),
        F.max("y").alias("top_y"),
    )


# ES geo_line aggregation ({"geo_line": {"point": ..., "sort": {"field":
# "ts"}}}): per bucket, the track formed by its points in time order,
# truncated at size (ES default 10000; 5 here keeps the oracle readable).
# One window rank inside the bucket + one ordered string_agg — the
# per-bucket sort never goes global, the plan that survives skewed tracks.
@register(
    "geo_line_by_type",
    """WITH g AS (SELECT event_id, event_type, ts,
                         event_id % 360 AS x, (event_id // 7) % 180 AS y
                  FROM events),
       r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts, event_id) AS rn
             FROM g)
       SELECT event_type AS key,
              string_agg(CAST(x AS VARCHAR) || ',' || CAST(y AS VARCHAR),
                         '|' ORDER BY rn) AS line
       FROM r WHERE rn <= 5 GROUP BY event_type ORDER BY key""",
)
def geo_line_by_type(spark, sf_dir):
    from pyspark.sql import Window

    g = _grid(spark, sf_dir).join(
        load(spark, sf_dir, "events").select("event_id", "ts"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    r = g.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return (
        r.withColumn("pt", F.concat_ws(",", F.col("x"), F.col("y")))
        .groupBy(F.col("event_type").alias("key"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "pt"))),
                    lambda s: s["pt"],
                ),
                "|",
            ).alias("line")
        )
        .orderBy("key")
    )
