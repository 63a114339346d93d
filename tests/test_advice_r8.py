"""Regression tests for the round-8 ADVICE findings.

1. (medium) streaming/jobs.py epoch gates were check-then-act: a
   concurrent/zombie driver of the same query could commit the same
   epoch between the gate check and the CAS, and the loser's retry
   double-applied the batch (route_batch_to_manifest) or double-added
   partials over a stale merge base (maintain_aggregate_batch). The
   gate now lives inside the commit retry loop.
2. (low) publish_staged: two CONCURRENT publishers of the same WAP
   token both read the stage marker before either deleted it, and both
   CAS loops eventually appended the staged files — duplicate rows. The
   loop now re-checks the committed wap_token walk after every CAS loss.
3. (low) ManifestStreamWriter.commit published the stream's schema
   unconditionally, silently NARROWING a wider/evolved table schema.
   It now fails loudly on a narrowing mismatch.
4. (low) upsert_table / delete_keys / append_table_if_absent matched
   keys with a plain equi-join, so NULL-keyed rows never matched:
   repeated upserts/appends accumulated NULL-key duplicates and a NULL
   delete key removed nothing. Key matching is now null-safe.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.streaming import jobs


def _race_once(monkeypatch, side_effect):
    """Monkeypatch M._try_commit so the FIRST attempt is preempted by
    ``side_effect()`` (the concurrent/zombie writer committing first),
    then every call delegates to the real CAS — the loser's commit
    attempt loses exactly as it would under a real race."""
    real = M._try_commit
    state = {"raced": False}

    def race(*args, **kwargs):
        if not state["raced"]:
            state["raced"] = True
            side_effect()
        return real(*args, **kwargs)

    monkeypatch.setattr(M, "_try_commit", race)
    return state


def test_route_batch_epoch_gate_survives_concurrent_same_epoch(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "routed")
    batch = spark.createDataFrame([(1, "keep"), (2, "drop")], "id long, route string")

    def zombie():
        # the same query's zombie driver commits epoch 7 between the
        # loser's gate check and its CAS
        jobs.route_batch_to_manifest(batch, 7, table)

    state = _race_once(monkeypatch, zombie)
    committed = jobs.route_batch_to_manifest(batch, 7, table)
    assert state["raced"]
    assert committed is False  # loser re-gated after the CAS loss and skipped
    assert M.read_table(spark, table).count() == 2  # exactly one application


def test_maintain_aggregate_gate_and_base_reresolve_on_cas_loss(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "agg_view")
    b0 = spark.createDataFrame([("a", 10.0)], "k string, v double")
    b1 = spark.createDataFrame([("a", 5.0), ("b", 1.0)], "k string, v double")
    assert jobs.maintain_aggregate_batch(b0, 0, table, ["k"], "v") is True

    def zombie():
        jobs.maintain_aggregate_batch(b1, 1, table, ["k"], "v")

    state = _race_once(monkeypatch, zombie)
    committed = jobs.maintain_aggregate_batch(b1, 1, table, ["k"], "v")
    assert state["raced"]
    assert committed is False
    rows = {r["k"]: (r["n"], r["sum_value"]) for r in
            jobs.read_aggregate_view(spark, table).collect()}
    # epoch 1's partials applied exactly once on top of epoch 0
    assert rows == {"a": (2, 15.0), "b": (1, 1.0)}


def test_publish_staged_concurrent_publishers_append_once(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "wap")
    M.write_table(spark.createDataFrame([(1,)], "k long"), table)
    tok = M.stage_commit(spark.createDataFrame([(2,), (3,)], "k long"), table)

    def concurrent_publisher():
        M.publish_staged(table, tok)

    state = _race_once(monkeypatch, concurrent_publisher)
    with pytest.raises(FileNotFoundError):
        M.publish_staged(table, tok)
    assert state["raced"]
    assert M.read_table(spark, table).count() == 3  # staged rows exactly once


def test_stream_sink_refuses_schema_narrowing(spark, tmp_path):
    from cashback_data_pipeline_spark.streaming.manifest_sink import ManifestStreamWriter

    table = str(tmp_path / "narrow")
    M.write_table(
        spark.createDataFrame([(1, "x", 2.0)], "k long, name string, score double"), table
    )
    narrow = T.StructType([T.StructField("k", T.LongType())])
    writer = ManifestStreamWriter(narrow, {"path": table})
    with pytest.raises(ValueError, match="narrow"):
        writer.commit([], 0)
    retyped = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.IntegerType()),  # string → int
            T.StructField("score", T.DoubleType()),
        ]
    )
    with pytest.raises(ValueError, match="retyped"):
        ManifestStreamWriter(retyped, {"path": table}).commit([], 0)
    # additive widening still passes the check (commit of zero files)
    wider = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    ManifestStreamWriter(wider, {"path": table}).commit([], 0)


def test_null_keys_merge_delete_append_null_safely(spark, tmp_path):
    table = str(tmp_path / "nullkeys")
    schema = "k string, v long"
    M.upsert_table(spark, spark.createDataFrame([(None, 1), ("a", 1)], schema), table, key="k")
    # replaying the same NULL-keyed record must REPLACE, not accumulate
    M.upsert_table(spark, spark.createDataFrame([(None, 2)], schema), table, key="k")
    rows = {r["k"]: r["v"] for r in M.read_table(spark, table).collect()}
    assert rows == {None: 2, "a": 1}
    assert M.read_table(spark, table).count() == 2

    # idempotent NOT-EXISTS load: an existing NULL key blocks re-insertion
    n = M.append_table_if_absent(
        spark, spark.createDataFrame([(None, 9), ("b", 3)], schema), table, key="k"
    )
    assert n == 1  # only ("b", 3) is new
    assert M.read_table(spark, table).filter(F.col("k").isNull()).count() == 1

    # a NULL delete key removes the NULL-keyed row
    M.delete_keys(spark, spark.createDataFrame([(None, 0)], schema), table, key="k")
    assert M.read_table(spark, table).filter(F.col("k").isNull()).count() == 0
    assert {r["k"] for r in M.read_table(spark, table).collect()} == {"a", "b"}
