"""Regression tests for the round-4 ADVICE findings.

- classify.score_with_weight_table: sparse weight tables must not
  silently change the hash modulus (ADVICE r4, classify.py:100).
- sinks.zorder_column: bits*k must stay inside the signed-64 __z and
  all-NULL columns must not crash the bounds scaling (writers.py:449).
- sinks.scd2_upsert: late (out-of-order) batches must not corrupt the
  version chain (writers.py:391).

The streaming replay findings are covered in tests/test_streaming.py
(test_*_replay_exactly_once).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_weight_table_sparse_requires_explicit_n_buckets(spark):
    from cashback_data_pipeline_spark.operators import classify

    docs = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    # sparse layout: buckets 0..15 trained, zero-weight rows pruned
    sparse = spark.createDataFrame(
        [(3, 0.5), (7, -0.25), (12, 1.0)], "bucket long, weight double"
    )
    with pytest.raises(ValueError, match="sparse"):
        classify.score_with_weight_table(docs, sparse, bias=0.0)


def test_weight_table_sparse_with_n_buckets_matches_dense(spark):
    """Pruning zero-weight rows + passing n_buckets must score identically
    to the dense table (same modulus, missing buckets coalesce to 0)."""
    from cashback_data_pipeline_spark.operators import classify

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta") for i in range(20)], "doc_id long, text string"
    )
    n = 16
    weights = [(b, ((b * 5) % 9 - 4) / 8.0) for b in range(n)]
    dense = spark.createDataFrame(weights, "bucket long, weight double")
    sparse = spark.createDataFrame([w for w in weights if w[1] != 0.0], "bucket long, weight double")
    assert sparse.count() < n

    via_dense = {r["doc_id"]: r["score"] for r in classify.score_with_weight_table(docs, dense, 0.1).collect()}
    via_sparse = {
        r["doc_id"]: r["score"]
        for r in classify.score_with_weight_table(docs, sparse, 0.1, n_buckets=n).collect()
    }
    assert via_dense == pytest.approx(via_sparse)


def test_weight_table_empty_raises(spark):
    from cashback_data_pipeline_spark.operators import classify

    docs = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    empty = spark.createDataFrame([], "bucket long, weight double")
    with pytest.raises(ValueError, match="empty"):
        classify.score_with_weight_table(docs, empty, bias=0.0)


def test_zorder_many_columns_stays_in_63_bits(spark):
    """6+ columns at default bits=12 used to shift past 63 (Spark wraps
    shift amounts mod 64, silently corrupting __z). bits auto-reduces so
    every plane index ≤ 63 and __z stays non-negative and ordered."""
    from cashback_data_pipeline_spark.sinks.writers import zorder_column

    cols = [f"c{i}" for i in range(7)]  # 7 cols → bits = 63//7 = 9
    rows = [tuple(float(r * (i + 1)) for i in range(7)) for r in range(50)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols))
    z = zorder_column(df, cols)
    vals = [r["__z"] for r in z.collect()]
    assert all(v >= 0 for v in vals)
    # all columns are monotone in r, so z must be strictly monotone too
    ordered = [r["__z"] for r in z.orderBy("c0").collect()]
    assert ordered == sorted(vals)


def test_zorder_all_null_column_contributes_zero_plane(spark):
    from cashback_data_pipeline_spark.sinks.writers import zorder_column

    df = spark.createDataFrame(
        [(float(i), None) for i in range(10)], "a double, b double"
    )
    z = zorder_column(df, ["a", "b"])
    vals = [r["__z"] for r in z.orderBy("a").collect()]
    assert vals == sorted(vals) and vals[0] == 0  # only 'a' planes populated


def test_scd2_late_batch_is_noop(spark, tmp_path):
    """A batch whose ts is OLDER than the current version must not close
    the current row (that would set __valid_to < __valid_from and promote
    stale data)."""
    from cashback_data_pipeline_spark.sinks import scd2_upsert

    target = str(tmp_path / "scd2")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    b_now = spark.createDataFrame([(1, "v2", t1)], "k long, v string, ts timestamp")
    scd2_upsert(spark, b_now, target, key="k", ts_col="ts")

    b_late = spark.createDataFrame([(1, "v1-stale", t0)], "k long, v string, ts timestamp")
    closed, inserted = scd2_upsert(spark, b_late, target, key="k", ts_col="ts", compare_cols=["v"])
    assert (closed, inserted) == (0, 0)

    cur = spark.read.parquet(target).filter(F.col("__is_current")).collect()
    assert len(cur) == 1 and cur[0]["v"] == "v2" and cur[0]["__valid_from"] == t1
    # version chain invariant holds everywhere
    bad = (
        spark.read.parquet(target)
        .filter(F.col("__valid_to").isNotNull() & (F.col("__valid_to") < F.col("__valid_from")))
        .count()
    )
    assert bad == 0


def test_scd2_equal_ts_update_is_noop_not_corruption(spark, tmp_path):
    """ts equal to the current __valid_from is treated as late (no
    zero-length versions)."""
    from cashback_data_pipeline_spark.sinks import scd2_upsert

    target = str(tmp_path / "scd2eq")
    t1 = dt.datetime(2024, 2, 1)
    scd2_upsert(
        spark,
        spark.createDataFrame([(1, "a", t1)], "k long, v string, ts timestamp"),
        target,
        key="k",
        ts_col="ts",
    )
    closed, inserted = scd2_upsert(
        spark,
        spark.createDataFrame([(1, "b", t1)], "k long, v string, ts timestamp"),
        target,
        key="k",
        ts_col="ts",
        compare_cols=["v"],
    )
    assert (closed, inserted) == (0, 0)
    cur = spark.read.parquet(target).filter(F.col("__is_current")).collect()
    assert len(cur) == 1 and cur[0]["v"] == "a"
