"""Temporal join operators Spark lacks natively: keyed interval (range)
joins. (The companion as-of join ships as the running-max-over-tagged-
union window formulation — see queries.asof_last_signup.)

Spark's native answer to ``e.ts BETWEEN i.start AND i.end`` is a
broadcast-nested-loop or a key-equi-join with a post-filter. Both
collapse at scale: BNL is quadratic, and the key join explodes when a
key's event count × interval count is large (hot users) or when there is
no key at all. The bin-bucketing rewrite below turns the range predicate
itself into an equi-join key, which Catalyst shuffles/broadcasts like
any other join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Join events to every interval containing them (closed bounds),
    matching on ``key_cols`` plus the time-range predicate.

    Bin-bucketed plan: each interval posts one row per ``bin_seconds``
    bucket it covers (sequence → explode); each event lands in EXACTLY
    ONE bucket, so the equi-join on (keys…, bin) finds each qualifying
    (event, interval) pair exactly once — no dedup pass — and the range
    predicate only post-filters within-bucket false positives.

    Scale: the shuffle key is (keys…, bin), so time itself spreads hot
    join keys across partitions — a user with a year of events fans out
    over ~9k hourly bins instead of one reducer. Pick ``bin_seconds``
    near the typical interval length: interval fan-out is
    ceil(len/bin)+1 rows while post-filter selectivity is ≥ len/(len+bin)
    — both costs stay O(1) per interval at the default when intervals
    are about a bin long. Never quadratic, never a broadcast-nested-loop.
    """
    binw = bin_seconds * 1_000_000  # work in microseconds
    e = events.withColumn("__bin", F.floor(F.unix_micros(F.col(ts_col)) / binw))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / binw),
                F.floor(F.unix_micros(F.col(end_col)) / binw),
            )
        ),
    )
    joined = e.join(iv, on=key_cols + ["__bin"], how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bin")
