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


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Generic as-of join (pandas ``merge_asof`` semantics, backward
    direction): for every left row, attach the columns of the LATEST
    right row with ``right.on <= left.on`` (within ``tolerance_seconds``
    if given), optionally per ``by`` group.

    Plan: tag-union both inputs, ONE window pass per attached column
    (``last(col, ignorenulls)`` over the union ordered by (on, tag) with
    right rows tagged 0 so they sort before same-instant left rows), then
    keep the left rows. No range join, no per-key loop: one shuffle on
    ``by`` (or one global window without it — shard upstream in that
    case), linear in |left| + |right|.

    ``right_cols`` defaults to every non-key right column; attached
    columns keep their names, so they must not collide with left's.
    """
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    collision = set(right_cols) & set(left.columns)
    if collision:
        raise ValueError(f"right_cols collide with left columns: {sorted(collision)}")

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.lit(1).alias("__is_left"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in by],
        *[F.col(c) for c in (by + [on])],
        *[F.col(c) for c in right_cols],
        F.lit(0).alias("__is_left"),
    ).select(*l_tagged.columns)  # align column order

    from pyspark.sql import Window as W

    u = l_tagged.unionByName(r_tagged)
    w = (
        (W.partitionBy(*by) if by else W.partitionBy())
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c not in right_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
        F.last(F.when(F.col("__is_left") == 0, F.col(on)), ignorenulls=True)
        .over(w)
        .alias("__asof_ts"),
    )
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        # null out matches staler than the tolerance
        fresh = (
            F.unix_micros(F.col(on)) - F.unix_micros(F.col("__asof_ts"))
            <= tolerance_seconds * 1_000_000
        )
        out = out.select(
            *[c for c in out.columns if c not in right_cols and c != "__asof_ts"],
            *[F.when(fresh, F.col(c)).alias(c) for c in right_cols],
        )
    return out.drop("__is_left", "__asof_ts")
