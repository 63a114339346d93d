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


def _epoch_us(col) -> F.Column:
    """Epoch microseconds for TIMESTAMP *or* TIMESTAMP_NTZ inputs.

    ``unix_micros`` rejects NTZ; casting first interprets an NTZ value in
    the session timezone (pinned UTC — session.py), which is exactly the
    naive-UTC semantics the parquet testdata carries. A no-op for
    columns already TIMESTAMP."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.unix_micros(c.cast("timestamp"))


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    max_bins_per_interval: int = 10_000,
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
    e = events.withColumn("__bin", F.floor(_epoch_us(ts_col) / binw))
    lo = F.floor(_epoch_us(start_col) / binw)
    hi = F.floor(_epoch_us(end_col) / binw)
    # guard the fan-out: an open-ended/sentinel interval (end=9999-12-31)
    # would explode into ~70M bins per row at the default width — fail
    # loudly with the offending width instead of OOMing an executor.
    # (assert_true lives in a filter so column pruning can't drop it.)
    guard = F.assert_true(
        hi - lo < max_bins_per_interval,
        F.concat(
            F.lit(f"interval_join: interval spans more than {max_bins_per_interval} "
                  f"bins of {bin_seconds}s — raise bin_seconds or cap the interval "
                  "(interval bins: "),
            (hi - lo + 1).cast("string"),
            F.lit(")"),
        ),
    )
    iv = intervals.where(guard.isNull()).withColumn(
        "__bin", F.explode(F.sequence(lo, hi))
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
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Generic as-of join (full pandas ``merge_asof`` semantics): for
    every left row, attach the columns of the matched right row,
    optionally per ``by`` group and within ``tolerance_seconds``:

    - ``backward``: LATEST right with ``right.on <= left.on``
      (``<`` when ``allow_exact_matches=False``);
    - ``forward``: EARLIEST right with ``right.on >= left.on``
      (``>`` when strict);
    - ``nearest``: whichever of the two is closer in absolute time;
      equal distance resolves BACKWARD (pandas-verified tie-break,
      tests/test_temporal.py).

    Plan: tag-union both inputs, one window pass per direction needed
    (``last(struct, ignorenulls)`` over the union ordered by (on, tag);
    ``forward`` is the same pass on the reversed ordering, ``nearest``
    runs both and picks per row), then keep the left rows. No range
    join, no per-key loop: ONE shuffle on ``by`` (the second window of
    ``nearest`` reuses the exchange — same partition keys, extra sort
    only), linear in |left| + |right|. Exactness is encoded in the sort
    tag: right rows order before same-instant left rows only when exact
    matches may see them, so the running ``last`` can never leak an
    excluded same-instant row.

    ``right_cols`` defaults to every non-key right column; attached
    columns keep their names, so they must not collide with left's.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    collision = set(right_cols) & set(left.columns)
    if collision:
        raise ValueError(f"right_cols collide with left columns: {sorted(collision)}")

    # The matched right row travels as ONE struct (its own `on` included),
    # so a NULL in one right column can never be "filled through" from an
    # OLDER right row — per-column last(ignorenulls) would stitch together
    # columns from rows that never co-existed (and would let a stale value
    # pass the tolerance check). The struct is non-null for every right
    # row, null for left rows, so last(struct, ignorenulls) picks the
    # matched right ROW atomically.
    r_struct = F.struct(F.col(on).alias("__asof_ts"), *[F.col(c) for c in right_cols])
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        ).alias("__r"),
        F.lit(1).alias("__is_left"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on and c not in by],
        *[F.col(c) for c in (by + [on])],
        r_struct.alias("__r"),
        F.lit(0).alias("__is_left"),
    ).select(*l_tagged.columns)  # align column order

    from pyspark.sql import Window as W

    u = l_tagged.unionByName(r_tagged)

    # Sort tag: left rows are 1. Right rows take 0 when same-instant
    # rows are visible to the running last() (exact matches allowed) and
    # 2 when they must sort after the left row (strict inequality).
    r_tag = 0 if allow_exact_matches else 2
    u = u.withColumn(
        "__tag",
        F.when(F.col("__is_left") == 1, F.lit(1)).otherwise(F.lit(r_tag)),
    )

    def running_match(descending: bool) -> F.Column:
        # ties among same-instant right rows resolve to the greatest
        # struct field-wise — deterministic (pandas breaks such ties by
        # input order, which a distributed table does not have)
        on_ord = F.col(on).desc() if descending else F.col(on).asc()
        w = (
            (W.partitionBy(*by) if by else W.partitionBy())
            .orderBy(on_ord, F.col("__tag").asc(), F.col("__r").asc_nulls_first())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return F.last("__r", ignorenulls=True).over(w)

    def bounded(match: F.Column, signed_gap_us: F.Column) -> F.Column:
        """NULL out a match outside tolerance (gap is ≥0 for real ones)."""
        if tolerance_seconds is None:
            return match
        return F.when(signed_gap_us <= tolerance_seconds * 1_000_000, match)

    if direction == "backward":
        u = u.withColumn("__match", running_match(descending=False))
        match = bounded(
            F.col("__match"), _epoch_us(on) - _epoch_us(F.col("__match")["__asof_ts"])
        )
    elif direction == "forward":
        u = u.withColumn("__match", running_match(descending=True))
        match = bounded(
            F.col("__match"), _epoch_us(F.col("__match")["__asof_ts"]) - _epoch_us(on)
        )
    else:  # nearest: both passes (one exchange, two sorts), pick per row
        u = u.withColumn("__mb", running_match(descending=False)).withColumn(
            "__mf", running_match(descending=True)
        )
        db = _epoch_us(on) - _epoch_us(F.col("__mb")["__asof_ts"])
        df_ = _epoch_us(F.col("__mf")["__asof_ts"]) - _epoch_us(on)
        mb, mf = bounded(F.col("__mb"), db), bounded(F.col("__mf"), df_)
        # backward wins ties (pandas-verified); a NULL candidate loses
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(df_ < db, mf)
            .otherwise(mb)
        )

    out = u.filter(F.col("__is_left") == 1)
    return out.select(
        *[c for c in left.columns],
        *[match[c].alias(c) for c in right_cols],
    )
