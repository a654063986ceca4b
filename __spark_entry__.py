"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (documents → point features →
projection/curve-index/minzoom stamping → per-tile rollup with S2/hex cell
ids) on sf0.001.  ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB-checkable oracles where the
semantics are SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from tippecanoe_spark.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001", z=4)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from tippecanoe_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from tippecanoe_spark.queries import ORACLES

    return dict(ORACLES)
