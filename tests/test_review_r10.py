"""Round-10 self-review regression tests (the adversarial-review pass
over the round's own additions): append schema reconciliation, the
constraint/layout property guards, restore property carry, truncated
progressive JPEG, and the MERGE CASE-WHEN parse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import multimodal as mm
from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml


def test_old_shape_append_cannot_revert_schema_evolution(spark, tmp_path):
    """An append whose frame lacks an evolved column (or still carries
    the narrow type) commits the RECONCILED schema — previously it
    reverted ADD COLUMN/widening silently, and a reverted widening even
    broke reads of the wider files under the pinned-schema scan."""
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(5).selectExpr("CAST(id AS INT) AS k", "CAST(id AS STRING) AS v"), t
    )
    M.add_column(t, "bonus", "double")
    M.widen_column(t, "k", "bigint")
    # wide data lands
    M.write_table(
        spark.range(10, 12).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v", "CAST(id AS DOUBLE) AS bonus"
        ),
        t, mode="append",
    )
    # an OLD-SHAPE producer appends (no bonus, narrow int k)
    M.write_table(
        spark.range(20, 22).selectExpr("CAST(id AS INT) AS k", "CAST(id AS STRING) AS v"),
        t, mode="append",
    )
    out = M.read_table(spark, t)
    assert out.columns == ["k", "v", "bonus"]  # evolution survived
    assert out.schema["k"].dataType.simpleString() == "bigint"
    assert out.agg(F.sum("bonus")).first()[0] == 21.0  # wide files still read
    assert out.count() == 9
    # an incompatible retype is refused loudly
    with pytest.raises(ValueError, match="retypes column"):
        M.write_table(
            spark.range(2).selectExpr(
                "CAST(id AS STRING) AS k", "CAST(id AS STRING) AS v"
            ),
            t, mode="append",
        )


def test_backticked_constraint_still_guards_column_changes(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price"), t
    )
    M.add_constraint(spark, t, "p", "`price` > -1.0")
    with pytest.raises(ValueError, match="references it"):
        M.rename_column(t, "price", "amount")
    with pytest.raises(ValueError, match="references it"):
        M.drop_column(t, "price")


def test_layout_follows_rename_and_drop(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(2000).selectExpr("id AS a", "id % 7 AS b"), t,
        cluster_by=["a"], cluster_files=2,
    )
    M.rename_column(t, "a", "a2")
    m = M.read_manifest(t, M.current_version(t))
    assert m["layout"] == {"cluster_by": ["a2"]}
    # bare maintenance works against the renamed layout
    M.optimize_table(spark, t, target_rows=10)  # no-op (nothing small) but validates
    M.compact_table(spark, t, n_files=2)
    assert M.read_manifest(t, M.current_version(t))["layout"] == {"cluster_by": ["a2"]}
    # dropping the layout column clears the layout instead of bricking
    M.drop_column(t, "a2")
    m2 = M.read_manifest(t, M.current_version(t))
    assert m2.get("layout") is None
    M.compact_table(spark, t, n_files=1)  # plain coalesce, no error


def test_restore_restores_constraints_and_layout(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(spark.range(5).selectExpr("id AS k"), t)  # v1: plain
    M.add_column(t, "bonus", "double")  # v2
    M.add_constraint(spark, t, "b_ok", "bonus IS NULL OR bonus >= 0.0")  # v3
    M.restore_table(t, version=1)
    m = M.read_manifest(t, M.current_version(t))
    assert not M._constraints(m) and m.get("layout") is None
    # writes against the restored (pre-evolution) schema work again
    M.write_table(spark.range(5, 7).selectExpr("id AS k"), t, mode="append")
    assert M.read_table(spark, t).columns == ["k"]


def test_constraint_added_during_cas_race_is_enforced(spark, tmp_path):
    """A constraint committed between a writer's pre-write check and its
    CAS attempt must still reject the writer's violating rows."""
    t = str(tmp_path / "t")
    M.write_table(spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price"), t)
    bad = spark.range(5, 7).selectExpr("id AS k", "CAST(-1.0 AS DOUBLE) AS price")

    orig = M._write_data_files
    state = {"raced": False}

    def race_then_write(df, table, **kw):
        files = orig(df, table, **kw)
        if not state["raced"]:
            state["raced"] = True
            M.add_constraint(spark, t, "pos", "price >= 0.0")  # lands mid-write
        return files

    M._write_data_files = race_then_write
    try:
        with pytest.raises(ValueError, match="pos"):
            M.write_table(bad, t, mode="append")
    finally:
        M._write_data_files = orig
    assert M.read_table(spark, t).count() == 5  # nothing landed


def test_truncated_progressive_jpeg_raises():
    px = bytes([(x * 3 + y * 5) % 256 for y in range(16) for x in range(16)])
    prog = mm.encode_jpeg(px, 16, 16, 1, progressive=True)
    # cut cleanly between scans: find the SECOND SOS and truncate there
    first = prog.find(b"\xff\xda")
    second = prog.find(b"\xff\xda", first + 2)
    assert second > 0
    with pytest.raises(ValueError, match="truncated progressive"):
        mm.decode_jpeg(prog[:second])
    # a complete payload still decodes
    assert mm.decode_jpeg(prog)["width"] == 16


def test_merge_set_accepts_case_when(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price"), t
    )
    src = spark.createDataFrame([(1, 100.0), (2, 1.0)], "k long, price double")
    src.createOrReplaceTempView("case_src")
    try:
        sql_dml.execute(
            spark,
            "MERGE INTO t AS t USING case_src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET price = "
            "CASE WHEN s.price > t.price THEN s.price ELSE t.price END "
            "WHEN NOT MATCHED THEN INSERT *",
            {"t": t},
        )
    finally:
        spark.catalog.dropTempView("case_src")
    rows = {r["k"]: r["price"] for r in M.read_table(spark, t).collect()}
    assert rows[1] == 100.0 and rows[2] == 2.0  # CASE picked the max


def test_describe_detail(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price"),
        t, cluster_by=["k"], cluster_files=2,
    )
    M.add_constraint(spark, t, "pos", "price >= 0.0")
    M.delete_where(spark, t, ("k", "==", 5), mode="merge_on_read")
    row = sql_dml.execute(spark, "DESCRIBE DETAIL t", {"t": t}).first()
    assert row["version"] == 3 and row["operation"] == "delete"
    assert row["num_files"] == 2 and row["num_dv_files"] == 1
    assert row["size_bytes"] and row["size_bytes"] > 0
    import json as _json

    assert _json.loads(row["constraints"]) == {"pos": "price >= 0.0"}
    assert _json.loads(row["layout"]) == {"cluster_by": ["k"]}
    assert "price" in row["schema_json"]


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(4):
        M.write_table(
            spark.range(i * 5, (i + 1) * 5).selectExpr("id AS k").coalesce(1),
            t, mode="append" if i else "overwrite",
        )
    M.compact_table(spark, t, n_files=1)  # supersedes every append dir
    # SQL form parses (age guard keeps young dirs — empty on a fresh table)
    assert sql_dml.execute(spark, "VACUUM t RETAIN 1 VERSIONS DRY RUN", {"t": t}) == []
    would = M.vacuum(t, keep_last=1, min_age_s=0.0, dry_run=True)
    assert len(would) >= 4
    store = M.get_log_store(t)
    for d in would:
        assert store.exists(d), f"dry run deleted {d}"
    # time travel still works (nothing reclaimed)
    assert M.read_table(spark, t, version=4).count() == 20
    removed = M.vacuum(t, keep_last=1, min_age_s=0.0)
    assert sorted(removed) == sorted(would)
