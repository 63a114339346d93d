"""CHECK constraints (round 10 — the Delta constraint shape): a table
property every batch write path enforces on the rows it commits, with
SQL CHECK null semantics (violated only when the expression evaluates
FALSE). ADD CONSTRAINT verifies the existing rows first; the raw
streaming sink refuses constrained tables loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml
from cashback_data_pipeline_spark.streaming import jobs
from cashback_data_pipeline_spark.streaming.manifest_sink import ManifestStreamWriter


def _seed(spark, path):
    t = str(path)
    M.write_table(
        spark.range(10).selectExpr("id AS k", "CAST(id % 7 AS DOUBLE) AS price"), t
    )
    M.add_constraint(spark, t, "price_ok", "price >= 0.0")
    return t


def test_constraint_enforced_on_every_batch_write_path(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    good = spark.range(10, 12).selectExpr("id AS k", "CAST(1.0 AS DOUBLE) AS price")
    M.write_table(good, t, mode="append")
    v_ok = M.current_version(t)
    bad = spark.range(12, 14).selectExpr("id AS k", "CAST(-1.0 AS DOUBLE) AS price")
    with pytest.raises(ValueError, match="price_ok"):
        M.write_table(bad, t, mode="append")
    with pytest.raises(ValueError, match="price_ok"):
        M.upsert_table(spark, bad, t, "k")
    with pytest.raises(ValueError, match="price_ok"):
        M.append_table_if_absent(spark, bad, t, "k")
    with pytest.raises(ValueError, match="price_ok"):
        M.merge_table(
            spark, good, t, "k",
            when_matched=[("update", None, {"price": "t.price - 100.0"})],
        )
    with pytest.raises(ValueError, match="price_ok"):
        M.update_where(spark, t, {"price": "price - 100.0"}, ("k", "<", 5))
    with pytest.raises(ValueError, match="price_ok"):
        M.stage_commit(bad, t)
    with pytest.raises(ValueError, match="price_ok"):
        jobs.route_batch_to_manifest(bad, 0, t)
    # nothing committed by any refused write
    assert M.current_version(t) == v_ok
    assert M.read_table(spark, t).count() == 12
    # DELETE cannot violate and stays allowed
    M.delete_where(spark, t, ("k", "==", 11))
    assert M.read_table(spark, t).count() == 11


def test_constraint_null_semantics_and_add_validation(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    # NULL result passes (SQL CHECK semantics)
    M.write_table(
        spark.sql("SELECT CAST(99 AS LONG) AS k, CAST(NULL AS DOUBLE) AS price"),
        t, mode="append",
    )
    assert M.read_table(spark, t).filter(F.col("price").isNull()).count() == 1
    # adding a constraint the EXISTING rows violate is refused
    with pytest.raises(ValueError, match="small_k"):
        M.add_constraint(spark, t, "small_k", "k < 50")
    with pytest.raises(ValueError, match="already exists"):
        M.add_constraint(spark, t, "price_ok", "price >= 0.0")
    with pytest.raises(ValueError, match="identifier"):
        M.add_constraint(spark, t, "bad name!", "k > 0")


def test_constraint_guards_column_changes_and_raw_sink(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="references it"):
        M.rename_column(t, "price", "amount")
    with pytest.raises(ValueError, match="references it"):
        M.drop_column(t, "price")
    M.rename_column(t, "k", "kk")  # unreferenced column still renames
    schema = M.read_table(spark, t).schema
    with pytest.raises(ValueError, match="foreachBatch"):
        ManifestStreamWriter(schema, {"path": t})
    # drop the constraint: everything unblocks
    M.drop_constraint(t, "price_ok")
    M.rename_column(t, "price", "amount")
    ManifestStreamWriter(M.read_table(spark, t).schema, {"path": t})


def test_constraint_sql_front_door_and_history(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price"), t
    )
    cat = {"t": t}
    v = sql_dml.execute(
        spark, "ALTER TABLE t ADD CONSTRAINT price_ok CHECK (price >= 0.0)", cat
    )
    assert M.read_manifest(t, v)["files"] == M.read_manifest(t, 1)["files"]
    with pytest.raises(ValueError, match="price_ok"):
        sql_dml.execute(
            spark, "UPDATE t SET price = price - CAST(9.0 AS DOUBLE) WHERE k < 3", cat
        )
    sql_dml.execute(spark, "ALTER TABLE t DROP CONSTRAINT price_ok", cat)
    with pytest.raises(ValueError, match="no constraint"):
        sql_dml.execute(spark, "ALTER TABLE t DROP CONSTRAINT price_ok", cat)
    ops = [r["operation"] for r in M.table_history(spark, t).orderBy("version").collect()]
    assert ops == ["overwrite", "add_constraint", "drop_constraint"]
    # constraints are per-version state: time travel sees them
    assert M._constraints(M.read_manifest(t, v)) == {"price_ok": "price >= 0.0"}
    assert M._constraints(M.read_manifest(t, M.current_version(t))) == {}


def test_constraints_survive_checkpoint_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price"), t
    )
    M.add_constraint(spark, t, "pos", "price >= 0.0")
    for i in range(M.CHECKPOINT_INTERVAL + 2):  # cross a checkpoint boundary
        M.write_table(
            spark.range(10 + i, 11 + i).selectExpr(
                "id AS k", "CAST(1.0 AS DOUBLE) AS price"
            ),
            t, mode="append",
        )
    cur = M.current_version(t)
    store = M.get_log_store(t)
    assert store.exists(
        store.join(t, M._MANIFEST_DIR, M._ckpt_name(M.CHECKPOINT_INTERVAL))
    )
    M._SNAPSHOT_CACHE.clear()
    assert M._constraints(M.read_manifest(t, cur)) == {"pos": "price >= 0.0"}
    with pytest.raises(ValueError, match="pos"):
        M.write_table(
            spark.sql("SELECT CAST(1 AS LONG) AS k, CAST(-1.0 AS DOUBLE) AS price"),
            t, mode="append",
        )
