"""Table profiling — the stats-collection seam (SURVEY §7.2.5).

One pass over the table computes per-column null counts, distinct counts,
and min/max; emitted in long format (one row per column) so profiles of
arbitrary-width tables have a stable schema. These are the numbers that
drive physical decisions at 100 TB: broadcast eligibility (size), skew
suspicion (distinct vs rows), partition-column choice (distinct count),
and null-semantics traps (null rate).

All aggregates are map-side-combinable; the whole profile is ONE
partial+final aggregate over the table (a single `.agg(...)` with
4×n_cols expressions), not n_cols separate scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_str, max_str) per column.

    min/max render as strings so heterogeneous column types coexist in
    one long-format result. Exact distinct counts — swap in
    approx_count_distinct for the 100 TB tier (same plan shape, sketch
    aggregate instead of expand)."""
    columns = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    stacked = wide.selectExpr(
        "n_rows",
        "stack({}, {}) AS (column, n_null, n_distinct, min_str, max_str)".format(
            len(columns),
            ", ".join(
                f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in columns
            ),
        ),
    )
    return stacked.select("column", "n_rows", "n_null", "n_distinct", "min_str", "max_str")
