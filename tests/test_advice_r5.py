"""Regression tests for the round-5 ADVICE findings.

- operators.similarity.bucket_pairs_gemm: a skewed invocation must not
  pin localCheckpoint blocks for the session lifetime (similarity.py:776).
- operators.text.bpe_train_merges: per-round checkpoint release must
  track only the RDD backing the training corpus, never a concurrent
  job's blocks (text.py:648) — and must leave zero blocks behind.
- session.checkpointed_rdd_id: the precise unpersist handle both fixes
  rely on.
- sinks.scd2_upsert(same_ts_corrections=True): an equal-timestamp row
  with changed values REPLACES the current version in place
  (writers.py:399); the default contract still treats it as late.

The src_epoch index-migration finding is covered in
tests/test_streaming.py (the manifest-index migration tests).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cashback_data_pipeline_spark.session import (
    checkpointed_rdd_id,
    persistent_rdd_ids,
)


def test_checkpointed_rdd_id_is_the_persisted_block(spark):
    before = persistent_rdd_ids(spark)
    cp = spark.range(100).selectExpr("id", "id * 2 AS y").localCheckpoint()
    try:
        rid = checkpointed_rdd_id(cp)
        assert rid is not None
        assert rid in persistent_rdd_ids(spark) - before
    finally:
        from cashback_data_pipeline_spark.session import unpersist_rdd_ids

        unpersist_rdd_ids(spark, persistent_rdd_ids(spark) - before)
    # a non-checkpointed plan has no block handle — callers must get None,
    # not a guess
    assert checkpointed_rdd_id(spark.range(5)) is None


def test_bucket_pairs_gemm_skewed_leaves_no_persistent_rdds(spark):
    """The oversized-bucket list used to be localCheckpoint-ed with no
    unpersist handle; every skewed call pinned blocks forever. It is now
    collected (it is broadcast-sized by construction)."""
    from cashback_data_pipeline_spark.operators.similarity import bucket_pairs_gemm

    # one degenerate bucket, forced through the max_bucket_size split path
    rows = [(i, 0, [1.0, float(i % 3)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, bucket int, embedding array<double>")
    before = persistent_rdd_ids(spark)
    out = bucket_pairs_gemm(df, threshold=0.99, max_bucket_size=8)
    n = out.count()
    assert n > 0  # the skew path actually ran and found exact pairs
    assert persistent_rdd_ids(spark) - before == set()


def test_bpe_train_releases_only_its_own_blocks(spark):
    """Training must (a) release every checkpoint it created and (b) not
    touch blocks persisted by a concurrent job on the shared session —
    the old global persistent-RDD-id diff could unpersist a bystander's
    truncated-lineage checkpoint."""
    from cashback_data_pipeline_spark.operators.text import bpe_train_merges

    bystander = spark.range(50).selectExpr("id", "id * 3 AS y").localCheckpoint()
    bystander_id = checkpointed_rdd_id(bystander)
    assert bystander_id is not None
    before = persistent_rdd_ids(spark)

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)], "doc_id long, text string"
    )
    merges = bpe_train_merges(docs, 3)
    assert merges.count() == 3

    after = persistent_rdd_ids(spark)
    assert after - before == set()  # zero leaked training checkpoints
    assert bystander_id in after  # the bystander's blocks survived
    assert bystander.count() == 50  # and are still readable
    from cashback_data_pipeline_spark.session import unpersist_rdd_ids

    unpersist_rdd_ids(spark, {bystander_id})


def test_scd2_same_ts_correction_replaces_current(spark, tmp_path):
    from cashback_data_pipeline_spark.sinks import scd2_upsert

    target = str(tmp_path / "scd2")
    t1 = dt.datetime(2024, 2, 1)
    b1 = spark.createDataFrame([(1, "wrong", t1), (2, "ok", t1)], "k long, v string, ts timestamp")
    scd2_upsert(spark, b1, target, key="k", ts_col="ts")

    fix = spark.createDataFrame([(1, "right", t1)], "k long, v string, ts timestamp")
    # default contract: equal-ts is late → no-op (regression guard)
    closed, inserted = scd2_upsert(spark, fix, target, key="k", ts_col="ts", compare_cols=["v"])
    assert (closed, inserted) == (0, 0)

    closed, inserted = scd2_upsert(
        spark, fix, target, key="k", ts_col="ts", compare_cols=["v"], same_ts_corrections=True
    )
    assert (closed, inserted) == (0, 1)  # replaced, nothing closed
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 2  # no history row minted for the replacement
    by_k = {r["k"]: r for r in rows}
    assert by_k[1]["v"] == "right" and by_k[1]["__is_current"]
    assert by_k[1]["__valid_from"] == t1 and by_k[1]["__valid_to"] is None
    assert by_k[2]["v"] == "ok"

    # replaying the same correction is a no-op (idempotence contract)
    closed, inserted = scd2_upsert(
        spark, fix, target, key="k", ts_col="ts", compare_cols=["v"], same_ts_corrections=True
    )
    assert (closed, inserted) == (0, 0)


def test_scd2_same_ts_correction_still_closes_newer_updates(spark, tmp_path):
    """Corrections and ordinary newer updates in one batch: the newer
    update closes its key, the correction replaces its key."""
    from cashback_data_pipeline_spark.sinks import scd2_upsert

    target = str(tmp_path / "scd2")
    t1 = dt.datetime(2024, 2, 1)
    t2 = dt.datetime(2024, 3, 1)
    b1 = spark.createDataFrame([(1, "a1", t1), (2, "b-wrong", t1)], "k long, v string, ts timestamp")
    scd2_upsert(spark, b1, target, key="k", ts_col="ts")

    b2 = spark.createDataFrame([(1, "a2", t2), (2, "b-right", t1)], "k long, v string, ts timestamp")
    closed, inserted = scd2_upsert(
        spark, b2, target, key="k", ts_col="ts", compare_cols=["v"], same_ts_corrections=True
    )
    assert (closed, inserted) == (1, 2)
    rows = spark.read.parquet(target).collect()
    cur = {r["k"]: r for r in rows if r["__is_current"]}
    assert cur[1]["v"] == "a2" and cur[1]["__valid_from"] == t2
    assert cur[2]["v"] == "b-right" and cur[2]["__valid_from"] == t1
    hist = [r for r in rows if not r["__is_current"]]
    assert len(hist) == 1 and hist[0]["k"] == 1 and hist[0]["v"] == "a1"
    assert hist[0]["__valid_to"] == t2
