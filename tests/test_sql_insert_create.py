"""SQL CREATE TABLE + INSERT INTO .. SELECT through the sql_dml front
door (VERDICT r10 item 1 — the reference's only hand-written SQL, ref:
load_to_redshift_lambda.py:78-98). The end-to-end oracle check is the
registered ``manifest_sql_insert_select`` query; these tests pin the
grammar, the NOT-EXISTS shape detection, the idempotent dispatch, and
the loud rejections."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml


# ---------------------------------------------------------------------------
# NOT-EXISTS shape detection (pure parsing, no Spark)
# ---------------------------------------------------------------------------

def test_not_exists_shape_detected():
    sel = (
        "SELECT * FROM staging s WHERE NOT EXISTS "
        "(SELECT 1 FROM serving r WHERE r.reward_id = s.reward_id)"
    )
    got = sql_dml._split_not_exists_load(sel, "serving", {"serving": "/tmp/x"})
    assert got == ("SELECT * FROM staging s", "reward_id")


def test_not_exists_shape_detected_by_path_equality():
    # subquery names the target through a DIFFERENT catalog alias
    sel = (
        "SELECT * FROM staging s WHERE NOT EXISTS "
        "(SELECT 1 FROM serving2 r WHERE s.k = r.k)"
    )
    cat = {"serving": "/tmp/x", "serving2": "/tmp/x", "staging": "/tmp/y"}
    got = sql_dml._split_not_exists_load(sel, "serving", cat)
    assert got == ("SELECT * FROM staging s", "k")


@pytest.mark.parametrize(
    "sel",
    [
        # subquery scans a non-target table: a real semijoin, not the load
        "SELECT * FROM staging s WHERE NOT EXISTS "
        "(SELECT 1 FROM other r WHERE r.k = s.k)",
        # correlation equates DIFFERENT columns
        "SELECT * FROM staging s WHERE NOT EXISTS "
        "(SELECT 1 FROM serving r WHERE r.k = s.j)",
        # extra top-level predicate beside the NOT EXISTS
        "SELECT * FROM staging s WHERE s.k > 0 AND NOT EXISTS "
        "(SELECT 1 FROM serving r WHERE r.k = s.k)",
        # no WHERE at all
        "SELECT * FROM staging s",
    ],
)
def test_not_exists_shape_rejected(sel):
    assert sql_dml._split_not_exists_load(sel, "serving", {"serving": "/t"}) is None


def test_not_exists_inside_string_literal_is_ignored():
    sel = "SELECT 'WHERE NOT EXISTS (SELECT 1 FROM serving r WHERE r.k = s.k)' AS x FROM staging s"
    assert sql_dml._split_not_exists_load(sel, "serving", {"serving": "/t"}) is None


# ---------------------------------------------------------------------------
# CREATE TABLE
# ---------------------------------------------------------------------------

def test_create_table_and_if_not_exists(spark, tmp_path):
    t = str(tmp_path / "t")
    cat = {"serving": t}
    v = sql_dml.execute(spark, "CREATE TABLE serving (k BIGINT, v STRING)", cat)
    assert v == 1
    m = M.read_manifest(t, 1)
    assert m["files"] == []
    assert M.read_table(spark, t).columns == ["k", "v"]
    assert M.read_table(spark, t).count() == 0
    # idempotent form no-ops at the CURRENT version
    assert sql_dml.execute(
        spark, "CREATE TABLE IF NOT EXISTS serving (k BIGINT, v STRING)", cat
    ) == 1
    with pytest.raises(ValueError, match="already exists"):
        sql_dml.execute(spark, "CREATE TABLE serving (k BIGINT, v STRING)", cat)
    hist = M.table_history(spark, t)
    assert [r["operation"] for r in hist.collect()] == ["create"]


def test_create_then_append_reconciles_declared_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    M.create_table(t, "k BIGINT, v STRING")
    df = spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    M.write_table(df, t, mode="append")
    assert M.read_table(spark, t).count() == 5
    # a retyping append must refuse against the declared schema
    bad = spark.range(3).selectExpr("CAST(id AS STRING) AS k", "CAST(id AS STRING) AS v")
    with pytest.raises(ValueError, match="retypes"):
        M.write_table(bad, t, mode="append")


# ---------------------------------------------------------------------------
# INSERT INTO .. SELECT
# ---------------------------------------------------------------------------

def test_plain_insert_select_appends(spark, tmp_path):
    t = str(tmp_path / "t")
    cat = {"serving": t}
    sql_dml.execute(spark, "CREATE TABLE serving (k BIGINT, v STRING)", cat)
    spark.range(4).selectExpr("id AS k", "CAST(id AS STRING) AS v").createOrReplaceTempView(
        "ins_src"
    )
    try:
        v = sql_dml.execute(spark, "INSERT INTO serving SELECT * FROM ins_src", cat)
        assert v == 2  # plain INSERT returns the committed version
        assert M.read_table(spark, t).count() == 4
        # re-run APPENDS again (no NOT EXISTS: not idempotent, by design)
        sql_dml.execute(spark, "INSERT INTO serving SELECT * FROM ins_src", cat)
        assert M.read_table(spark, t).count() == 8
    finally:
        spark.catalog.dropTempView("ins_src")


def test_not_exists_insert_is_idempotent_and_counts_rows(spark, tmp_path):
    serving = str(tmp_path / "serving")
    staging = str(tmp_path / "staging")
    cat = {"serving": serving, "staging": staging}
    df = spark.range(10).selectExpr("id AS k", "CAST(id % 3 AS DOUBLE) AS p")
    M.write_table(df, staging, cluster_by=["k"], cluster_files=2)
    M.write_table(df.filter(F.col("k") < 4), serving)
    stmt = (
        "INSERT INTO serving SELECT * FROM staging s "
        "WHERE NOT EXISTS (SELECT 1 FROM serving r WHERE r.k = s.k)"
    )
    try:
        assert sql_dml.execute(spark, stmt, cat) == 6  # rows inserted
        assert M.read_table(spark, serving).count() == 10
        assert sql_dml.execute(spark, stmt, cat) == 0  # verbatim re-run
        assert M.read_table(spark, serving).count() == 10
        ops = [r["operation"] for r in M.table_history(spark, serving).collect()]
        assert "append_if_absent" in ops
    finally:
        spark.catalog.dropTempView("staging")
        spark.catalog.dropTempView("serving")


def test_insert_select_reads_manifest_views(spark, tmp_path):
    """The generic (non-idempotent) path still resolves catalog names as
    manifest views — including the target inside a subquery."""
    serving = str(tmp_path / "serving")
    staging = str(tmp_path / "staging")
    cat = {"serving": serving, "staging": staging}
    df = spark.range(6).selectExpr("id AS k", "CAST(id AS DOUBLE) AS p")
    M.write_table(df, staging)
    M.write_table(df.filter(F.col("k") < 2), serving)
    # an anti-join written as NOT IN: not the reference shape, so it
    # evaluates as written via spark.sql over the registered views
    stmt = (
        "INSERT INTO serving SELECT * FROM staging "
        "WHERE k NOT IN (SELECT k FROM serving)"
    )
    try:
        v = sql_dml.execute(spark, stmt, cat)
        assert isinstance(v, int)
        assert M.read_table(spark, serving).count() == 6
    finally:
        spark.catalog.dropTempView("staging")
        spark.catalog.dropTempView("serving")


def test_malformed_insert_and_create_refuse(spark):
    with pytest.raises(ValueError, match="malformed INSERT"):
        sql_dml.execute(spark, "INSERT INTO t VALUES (1, 2)", {"t": "/tmp/x"})
    with pytest.raises(ValueError, match="malformed CREATE"):
        sql_dml.execute(spark, "CREATE TABLE t", {"t": "/tmp/x"})


def test_insert_overwrite_whole_table(spark, tmp_path):
    t = str(tmp_path / "t")
    cat = {"serving": t}
    sql_dml.execute(spark, "CREATE TABLE serving (k BIGINT, v STRING)", cat)
    spark.range(6).selectExpr("id AS k", "CAST(id AS STRING) AS v").createOrReplaceTempView(
        "ow_src"
    )
    try:
        sql_dml.execute(spark, "INSERT INTO serving SELECT * FROM ow_src", cat)
        sql_dml.execute(
            spark, "INSERT OVERWRITE serving SELECT * FROM ow_src WHERE k < 2", cat
        )
        assert M.read_table(spark, t).count() == 2
    finally:
        spark.catalog.dropTempView("ow_src")


def test_insert_overwrite_partitioned_is_dynamic(spark, tmp_path):
    t = str(tmp_path / "t")
    cat = {"pt": t}
    sql_dml.execute(
        spark, "CREATE TABLE pt (k BIGINT, grp INT) PARTITIONED BY (grp)", cat
    )
    df = spark.range(12).selectExpr("id AS k", "CAST(id % 3 AS INT) AS grp")
    df.createOrReplaceTempView("ow_psrc")
    try:
        sql_dml.execute(spark, "INSERT INTO pt SELECT * FROM ow_psrc", cat)
        # overwrite only grp=1 with a single row; grp 0/2 untouched
        sql_dml.execute(
            spark,
            "INSERT OVERWRITE pt SELECT CAST(999 AS BIGINT) AS k, "
            "CAST(1 AS INT) AS grp",
            cat,
        )
        back = M.read_table(spark, t)
        assert back.count() == 9  # 4+4 untouched + 1 replacement
        assert back.filter(F.col("grp") == 1).count() == 1
        ops = [
            r["operation"]
            for r in M.table_history(spark, t).orderBy("version").collect()
        ]
        assert ops[-1] == "overwrite_partitions"
    finally:
        spark.catalog.dropTempView("ow_psrc")


def test_caller_view_staged_after_engine_registration_wins(spark, tmp_path):
    """ADVICE r11: engine auto-registration must not clobber a view the
    caller stages under the same name LATER — ownership is re-proven
    from the live catalog on every statement, not from a one-shot map."""
    serving = str(tmp_path / "serving")
    staging = str(tmp_path / "staging")
    cat = {"serving": serving, "staging": staging}
    df = spark.range(4).selectExpr("id AS k", "CAST(id AS DOUBLE) AS p")
    M.write_table(df, staging)
    M.write_table(df.limit(0), serving)
    try:
        # first statement auto-registers "staging" as an engine view
        sql_dml.execute(spark, "INSERT INTO serving SELECT * FROM staging", cat)
        assert M.read_table(spark, serving).count() == 4
        # caller now stages their OWN view under the same name
        spark.range(1).selectExpr("CAST(99 AS BIGINT) AS k", "CAST(0.5 AS DOUBLE) AS p").createOrReplaceTempView("staging")
        sql_dml.execute(spark, "INSERT INTO serving SELECT * FROM staging", cat)
        got = {r["k"] for r in M.read_table(spark, serving).collect()}
        assert 99 in got and got == {0, 1, 2, 3, 99}
    finally:
        spark.catalog.dropTempView("staging")
        spark.catalog.dropTempView("serving")


def test_engine_view_refreshes_snapshot_between_statements(spark, tmp_path):
    """An engine-owned view pins its file list at registration; a later
    statement must see commits made in between (re-registration), while
    still resolving through the engine's native snapshot read."""
    serving = str(tmp_path / "serving")
    staging = str(tmp_path / "staging")
    cat = {"serving": serving, "staging": staging}
    df = spark.range(3).selectExpr("id AS k", "CAST(id AS DOUBLE) AS p")
    M.write_table(df, staging)
    M.write_table(df.limit(0), serving)
    try:
        sql_dml.execute(spark, "INSERT INTO serving SELECT * FROM staging", cat)
        # advance the staging table AFTER the engine registered its view
        M.write_table(
            spark.range(3, 5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS p"),
            staging,
            mode="append",
        )
        sql_dml.execute(
            spark, "INSERT INTO serving SELECT * FROM staging WHERE k >= 3", cat
        )
        assert M.read_table(spark, serving).count() == 5
    finally:
        spark.catalog.dropTempView("staging")
        spark.catalog.dropTempView("serving")
