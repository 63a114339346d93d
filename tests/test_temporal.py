from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import temporal
from cashback_data_pipeline_spark.sources import read_testdata


@pytest.fixture(scope="module")
def ev(spark, sf_dir):
    return read_testdata(spark, sf_dir, "events")


def _naive(purchases, signups):
    return (
        purchases.join(signups, on="user_id")
        .filter((F.col("ts") >= F.col("signup_ts")) & (F.col("ts") <= F.col("win_end")))
        .select("event_id", "signup_ts")
    )


@pytest.mark.parametrize("bin_seconds", [600, 3600, 7200, 86400])
def test_interval_join_matches_naive_for_any_bin_width(ev, bin_seconds):
    """Bin width is a performance knob, never a semantics knob: results
    must equal the naive inequality join whether bins are much smaller,
    equal to, or much larger than the 2h interval."""
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    got = temporal.interval_join(
        purchases, signups, ["user_id"], "ts", "signup_ts", "win_end", bin_seconds
    )
    got_pairs = {(r["event_id"], r["signup_ts"]) for r in got.collect()}
    want_pairs = {(r["event_id"], r["signup_ts"]) for r in _naive(purchases, signups).collect()}
    assert got_pairs == want_pairs and len(want_pairs) > 0


def test_interval_join_exactly_once_per_pair(ev):
    """Each qualifying (event, interval) pair appears exactly once — the
    event lands in one bin, so no dedup pass exists to hide double-counts."""
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    out = temporal.interval_join(purchases, signups, ["user_id"], "ts", "signup_ts", "win_end")
    total = out.count()
    distinct = out.select("event_id", "signup_ts").distinct().count()
    assert total == distinct


def test_merge_asof_matches_pandas(spark):
    """The generic as-of operator must reproduce pandas merge_asof
    (backward, by-group, inclusive same-instant) on a mixed workload."""
    import pandas as pd

    quotes = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b"],
            "t": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:10",
                                  "2024-01-01 10:02", "2024-01-01 10:07"]),
            "px": [10.0, 10.5, 11.0, 20.0, 21.0],
        }
    )
    trades = pd.DataFrame(
        {
            "sym": ["a", "a", "a", "b", "b", "b"],
            "t": pd.to_datetime(["2024-01-01 09:59", "2024-01-01 10:05", "2024-01-01 10:07",
                                  "2024-01-01 10:02", "2024-01-01 10:06", "2024-01-01 10:30"]),
            "qty": [1, 2, 3, 4, 5, 6],
        }
    )
    want = pd.merge_asof(
        trades.sort_values("t"), quotes.sort_values("t"), on="t", by="sym"
    ).sort_values(["sym", "t"])

    got = (
        temporal.merge_asof(
            spark.createDataFrame(trades), spark.createDataFrame(quotes), on="t", by=["sym"]
        )
        .orderBy("sym", "t")
        .toPandas()
    )
    for (_, w), (_, g) in zip(want.iterrows(), got.iterrows()):
        assert (w["sym"], w["t"], w["qty"]) == (g["sym"], g["t"], g["qty"])
        assert (pd.isna(w["px"]) and pd.isna(g["px"])) or w["px"] == g["px"]


def test_merge_asof_tolerance_and_collision(spark):
    import pandas as pd

    quotes = pd.DataFrame(
        {"sym": ["a"], "t": pd.to_datetime(["2024-01-01 10:00"]), "px": [10.0]}
    )
    trades = pd.DataFrame(
        {
            "sym": ["a", "a"],
            "t": pd.to_datetime(["2024-01-01 10:04", "2024-01-01 10:30"]),
            "qty": [1, 2],
        }
    )
    out = temporal.merge_asof(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on="t", by=["sym"], tolerance_seconds=300,
    ).orderBy("t").collect()
    assert out[0]["px"] == 10.0  # 4 min old: within tolerance
    assert out[1]["px"] is None  # 30 min old: nulled

    with pytest.raises(ValueError, match="collide"):
        temporal.merge_asof(
            spark.createDataFrame(trades),
            spark.createDataFrame(trades),  # qty collides
            on="t", by=["sym"],
        )


def test_merge_asof_never_mixes_right_rows(spark):
    """A NULL inside the matched right row must stay NULL — per-column
    fill would stitch together columns from different right rows (the
    reviewed bug: px from 10:00 + sz from 10:05 as one phantom row)."""
    import pandas as pd

    quotes = pd.DataFrame(
        {
            "sym": ["a", "a"],
            "t": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:05"]),
            "px": [10.0, None],
            "sz": [None, 99.0],
        }
    )
    trades = pd.DataFrame(
        {"sym": ["a"], "t": pd.to_datetime(["2024-01-01 10:07"]), "qty": [1]}
    )
    got = temporal.merge_asof(
        spark.createDataFrame(trades), spark.createDataFrame(quotes), on="t", by=["sym"]
    ).first()
    want = pd.merge_asof(trades, quotes, on="t", by="sym").iloc[0]
    assert got["px"] is None and pd.isna(want["px"])  # NOT 10.0 from the older row
    assert got["sz"] == want["sz"] == 99.0


def test_merge_asof_tolerance_uses_matched_row_ts(spark):
    """Tolerance must be measured against the ts of the MATCHED row."""
    import pandas as pd

    quotes = pd.DataFrame(
        {
            "sym": ["a", "a"],
            "t": pd.to_datetime(["2024-01-01 09:00", "2024-01-01 10:00"]),
            "px": [1.0, None],
            "sz": [7.0, 5.0],
        }
    )
    trades = pd.DataFrame(
        {"sym": ["a"], "t": pd.to_datetime(["2024-01-01 10:02"]), "qty": [1]}
    )
    got = temporal.merge_asof(
        spark.createDataFrame(trades), spark.createDataFrame(quotes),
        on="t", by=["sym"], tolerance_seconds=300,
    ).first()
    # matched row is 10:00 (fresh): px stays null, sz=5; the 09:00 row is
    # neither filled through nor judged for freshness
    assert got["px"] is None and got["sz"] == 5.0


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
@pytest.mark.parametrize("tol", [None, 240])
def test_merge_asof_full_matrix_matches_pandas(spark, direction, allow_exact, tol):
    """VERDICT r3 item 6: the complete pandas merge_asof surface —
    direction backward/forward/nearest × allow_exact_matches ×
    tolerance — on a seeded random workload with deliberate same-instant
    collisions and per-group empty sides. Right (sym, t) keys are unique
    so pandas' input-order tie-break can't diverge from the engine's
    deterministic greatest-struct tie-break."""
    import random

    import pandas as pd

    rng = random.Random(42 + len(direction) + int(allow_exact) + (tol or 0))
    # minute grid forces exact-match collisions; group c has no quotes
    syms = ["a", "b", "c"]
    trades = pd.DataFrame(
        {
            "sym": [rng.choice(syms) for _ in range(80)],
            "t": pd.to_datetime(
                [f"2024-01-01 10:{rng.randrange(60):02d}" for _ in range(80)]
            ),
            "qty": range(80),
        }
    )
    qrows = {
        (s, m)
        for s in ["a", "b"]
        for m in rng.sample(range(60), 25)
    }
    quotes = pd.DataFrame(
        {
            "sym": [s for s, _ in sorted(qrows)],
            "t": pd.to_datetime([f"2024-01-01 10:{m:02d}" for _, m in sorted(qrows)]),
            "px": [float(i) for i in range(len(qrows))],
        }
    )
    want = pd.merge_asof(
        trades.sort_values("t", kind="stable"),
        quotes.sort_values("t", kind="stable"),
        on="t",
        by="sym",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    got = temporal.merge_asof(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="t",
        by=["sym"],
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance_seconds=tol,
    ).toPandas()
    key = lambda df: df.sort_values(["sym", "t", "qty"]).reset_index(drop=True)  # noqa: E731
    want, got = key(want), key(got)
    assert len(want) == len(got) == 80
    for i in range(len(want)):
        w, g = want.iloc[i], got.iloc[i]
        assert (w["sym"], w["t"], w["qty"]) == (g["sym"], g["t"], g["qty"])
        assert (pd.isna(w["px"]) and pd.isna(g["px"])) or w["px"] == g["px"], (
            direction, allow_exact, tol, dict(w), dict(g),
        )


def test_merge_asof_invalid_direction(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"t": pd.to_datetime(["2024-01-01"])}))
    with pytest.raises(ValueError, match="direction"):
        temporal.merge_asof(df, df.select(F.col("t"), F.lit(1).alias("v")), on="t", direction="sideways")


def test_interval_join_guards_runaway_fanout(spark):
    import pandas as pd

    events = spark.createDataFrame(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01 10:00"])})
    )
    open_ended = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "start": pd.to_datetime(["2024-01-01 00:00"]),
                "end": pd.to_datetime(["2200-01-01 00:00"]),  # sentinel
            }
        )
    )
    with pytest.raises(Exception, match="interval_join"):
        temporal.interval_join(events, open_ended, ["k"], "ts", "start", "end").collect()
