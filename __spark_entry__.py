"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship spatial-join + tiling query on sf0.001
queries()      -> one entry per implemented operator (SURVEY.md §2)
oracle_sql()   -> DuckDB ANSI-SQL twin per query (same column names; all
                  compared float columns rounded in-query; shared
                  arithmetic templates from tosidewalk_spark.functions)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tosidewalk_spark.plans import pipeline, registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return pipeline.flagship(spark, "/root/testdata/sf0.001", grid=6)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fns[0] for name, fns in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """Omits entries whose oracle is None (non-SQL-expressible ops get the
    driver's weaker rows-only check)."""
    return {name: fns[1]() for name, fns in registry.QUERIES.items()
            if fns[1] is not None}
