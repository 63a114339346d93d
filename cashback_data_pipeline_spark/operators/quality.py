"""Data-quality guardrails + skew-safe aggregation utilities.

The reference's only quality mechanism is runtime guards and a fixture
fallback (SURVEY §5); a pipeline feeding a 100 TB warehouse needs
declarative expectations checked IN the engine, as one aggregate pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``name`` labels it; ``violation`` is a boolean
    Column that is true where the row VIOLATES the rule."""

    name: str
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(f"range_{col}", c.isNotNull() & ~c.between(lo, hi))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches_{col}", c.isNotNull() & ~c.rlike(pattern))


def accepted_values(col: str, values: list) -> Rule:
    c = F.col(col)
    return Rule(f"accepted_{col}", c.isNotNull() & ~c.isin(values))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules in ONE aggregate pass over the table:
    (rule, n_violations, n_rows) — long format, stable schema for any
    rule set. Conditional-count aggregates are map-side combinable, so
    the whole audit costs a single scan regardless of rule count."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for r in rules:
        aggs.append(F.sum(r.violation.cast("long")).alias(f"__v_{r.name}"))
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "n_rows",
        "stack({}, {}) AS (rule, n_violations)".format(
            len(rules), ", ".join(f"'{r.name}', __v_{r.name}" for r in rules)
        ),
    )
    return stacked.select("rule", "n_violations", "n_rows")


def unique_key_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once: (key..., n_copies). The uniqueness
    expectation needs its own shuffle (it is not row-local), so it is
    separate from the single-pass :func:`check`."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def count_distinct_salted(
    df: DataFrame, group_col: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """EXACT count-distinct per group, skew-safe.

    A plain ``groupBy(key).agg(countDistinct(v))`` funnels each hot key's
    whole value set through one reducer. Salting by ``hash(value) %
    n_salts`` partitions each key's VALUE SPACE disjointly (equal values
    share a salt), so per-(key, salt) distinct counts are disjoint and
    their sum is the exact per-key distinct count — two shuffles, both
    spread across n_salts × |keys| reducers, no hot partition."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    per_salt = (
        df.select(group_col, value_col)
        .withColumn("__salt", salt)
        .groupBy(group_col, "__salt")
        .agg(F.countDistinct(value_col).alias("__d"))
    )
    return per_salt.groupBy(group_col).agg(F.sum("__d").cast("bigint").alias("n_distinct"))
