"""Data-repair operators from the reference's legacy path (SURVEY §2 rows
F4/F5, J2, E10/E11).

The legacy pandas code (/root/reference/api.py:122-163) repairs rewards
rows whose transaction details are missing by (a) coalescing from a
sibling nested column and (b) copying values from a "donor" row sharing
the same ``exchange_rate_id``. The donor loop (api.py:142-150) iterates
row-by-row; here it is a single aggregate + broadcastable join — the
distributed rewrite of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_from_sibling(
    df: DataFrame,
    target: str,
    sibling: str | Column,
    scale: float | None = None,
) -> DataFrame:
    """E10/E11 — ``coalesce(target, sibling [* scale])``.

    Mirrors api.py:134-137: ``contis_….fillna(fiat_….description)`` and the
    amount fill with ``.mul(100)``.
    """
    sib = F.col(sibling) if isinstance(sibling, str) else sibling
    if scale is not None:
        sib = sib * scale
    return df.withColumn(target, F.coalesce(F.col(target), sib))


def fill_from_donor_group(
    df: DataFrame,
    group_key: str,
    fill_cols: list[str],
    not_null_col: str | None = None,
) -> DataFrame:
    """J2 — for rows with null ``fill_cols``, copy values from a row in
    the same ``group_key`` group that has them. The reference picks an
    arbitrary donor (``head(1)``, api.py:144); the engine picks the
    DETERMINISTIC one — the donor row whose (not_null_col, *fill_cols)
    tuple sorts lowest (lexicographic struct-min, which is total even
    when not_null_col ties) — so repeated runs and the oracle agree.

    Plan shape: one partial-aggregated groupBy over the donor columns (the
    map-side combine collapses each group to ≤1 row before the shuffle),
    then a left join that AQE turns into a broadcast when the donor table
    is small — at 100 TB this is one shuffle of distinct group keys, not a
    per-row lookup.
    """
    if not_null_col is None:
        not_null_col = fill_cols[0]
    donor_tuple = F.min(
        F.struct(
            F.col(not_null_col).alias("__k"),
            *[F.col(c).alias(f"__f{i}") for i, c in enumerate(fill_cols)],
        )
    ).alias("__donor")
    donors = (
        df.filter(F.col(not_null_col).isNotNull())
        .groupBy(group_key)
        .agg(donor_tuple)
        .select(
            group_key,
            *[F.col(f"__donor.__f{i}").alias(f"__donor_{c}") for i, c in enumerate(fill_cols)],
        )
    )
    out = df.join(donors, on=group_key, how="left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__donor_{c}")))
    return out.drop(*[f"__donor_{c}" for c in fill_cols])


def drop_unrepairable(
    df: DataFrame,
    null_cols: list[str],
    keep_type: str = "REBATE_BONUS",
    type_col: str = "reward_type",
) -> DataFrame:
    """F4 — drop rows where all ``null_cols`` are null AND the type is not
    the always-keep type (api.py:122-132's ``~(na_condition & not_rebate)``)."""
    all_null = F.lit(True)
    for c in null_cols:
        all_null = all_null & F.col(c).isNull()
    return df.filter(~(all_null & (F.col(type_col) != keep_type)))


def repair_candidates(df: DataFrame, amount_col: str, type_col: str = "reward_type", keep_type: str = "REBATE_BONUS") -> DataFrame:
    """F5 — rows whose amount is null and type is not the bonus type
    (api.py:140): the set the donor fill targets."""
    return df.filter(F.col(amount_col).isNull() & (F.col(type_col) != keep_type))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-buster equi-join: salt the (skewed) left side's key with
    pmod(hash(row), n_salts) and explode the right side across all salts,
    so one hot key spreads over ``n_salts`` reducers instead of one
    straggler.

    AQE's skew-join split handles moderate skew automatically; this is the
    structural fallback for pathological keys (a single key holding >10%
    of rows) or for engines/stages where AQE can't split (e.g. a skewed
    aggregation feeding the join). Semantics identical to
    ``left.join(right, key, how)`` for ``inner``/``left``/``left_semi``/
    ``left_anti`` ONLY — right/full-outer would null-pad the n_salts-1
    unmatched salt copies of each right row, so those modes are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; '{how}' would duplicate "
            "unmatched right rows across salts — salt the other side instead"
        )
    salt = F.pmod(F.xxhash64(*left.columns), F.lit(n_salts)).cast("int")
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(salted_right, on=[key, "__salt"], how=how)
    return out.drop("__salt")
