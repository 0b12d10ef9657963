"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build a real inverted index over the sf0.001
``documents`` corpus and answer a BM25 top-10 query with the engine.
``queries()`` / ``oracle_sql()`` — one entry per operator from SURVEY.md §2
(registry in search_replica_spark.operators), DuckDB-checked at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from search_replica_spark.operators.fulltext import ft_bm25_indexed_top10

    return ft_bm25_indexed_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from search_replica_spark.operators import all_registered

    return {name: fn for name, (fn, _sql) in all_registered().items()}


def oracle_sql() -> dict[str, str]:
    from search_replica_spark.operators import all_registered

    return {name: sql for name, (_fn, sql) in all_registered().items() if sql is not None}
