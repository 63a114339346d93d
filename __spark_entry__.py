"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` map every implemented operator from
SURVEY.md §2 (plus the north-star extensions) to a Spark callable and a
DuckDB-checkable ANSI SQL twin. Column names/aliases match pairwise so
the driver's sorted-column value hash compares cleanly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cashback_data_pipeline_spark.session import apply_session_conf
from cashback_data_pipeline_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the engine's analog of the reference's core analytic
    (monthly grouped multi-agg over the join output — SURVEY §2.6 A1 +
    §2.5 J1): orders ⟕ customer, grouped by month × market segment.
    """
    apply_session_conf(spark)
    return Q.monthly_segment_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same aliases)."""
    return dict(Q.ORACLES)
