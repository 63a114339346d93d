"""SQL DML entry points (VERDICT r8 item 2): Delta-SQL-shaped statements
dispatched onto the manifest DML APIs, WHERE clauses compiled to the
file-skipping predicate tree. The end-to-end oracle check is the
registered ``manifest_sql_dml`` query; these tests pin the dispatcher's
grammar, its equivalence with the Python API, and its loud rejections."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml


def _seed(spark, path, n=100):
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS price", "CAST(id AS STRING) AS v"
    )
    M.write_table(df, str(path), cluster_by=["k"], cluster_files=4)
    return str(path)


def test_where_grammar_compiles_to_skip_tree():
    p = sql_dml._Parser(
        "(k >= 10 AND k < 20) OR status IN ('a', 'b') OR note IS NULL OR seen IS NOT NULL"
    )
    tree = p.where_tree()
    assert p.done()
    assert tree == (
        "or",
        [
            ("and", [("k", ">=", 10), ("k", "<", 20)]),
            ("status", "in", ["a", "b"]),
            ("note", "is_null"),
            ("seen", "is_not_null"),
        ],
    )


@pytest.mark.parametrize(
    "frag, expected",
    [
        ("k != 3", ("k", "!=", 3)),
        ("k <> 3", ("k", "!=", 3)),
        ("NOT k = 3", ("not", ("k", "==", 3))),
        ("k NOT IN (1, 2)", ("k", "not_in", [1, 2])),
        (
            "NOT (k < 5 OR status = 'x')",
            ("not", ("or", [("k", "<", 5), ("status", "==", "x")])),
        ),
    ],
)
def test_negated_predicates_parse(frag, expected):
    """r9 item 1: negation is accepted end to end — row matching takes
    the full predicate, file pruning the sound approximation."""
    p = sql_dml._Parser(frag)
    assert p.where_tree() == expected
    assert p.done()


def test_negated_predicates_normalize_and_prune_soundly():
    from cashback_data_pipeline_spark.sinks import filestats

    # NOT pushes to the leaves under 3VL-preserving flips
    node = filestats._normalize_node(
        ("not", ("or", [("k", "<", 5), ("status", "in", ["x"])]))
    )
    assert node == (
        "and",
        [("leaf", "k", ">=", 5), ("leaf", "status", "not_in", ["x"])],
    )
    # != prunes ONLY a constant file whose single value is the literal
    const_x = {"rows": 10, "cols": {"s": {"min": "x", "max": "x", "nulls": 0}}}
    mixed = {"rows": 10, "cols": {"s": {"min": "a", "max": "x", "nulls": 0}}}
    assert not filestats.file_may_match(const_x, ("s", "!=", "x"))
    assert filestats.file_may_match(mixed, ("s", "!=", "x"))
    assert not filestats.file_may_match(const_x, ("s", "not_in", ["w", "x"]))
    assert filestats.file_may_match(const_x, ("s", "not_in", ["w", "y"]))


def test_delete_and_update_match_python_api(spark, tmp_path):
    t_sql = _seed(spark, tmp_path / "t_sql")
    t_py = _seed(spark, tmp_path / "t_py")
    cat = {"t": t_sql}

    sql_dml.execute(spark, "DELETE FROM t WHERE k >= 40 AND k < 60", cat)
    M.delete_where(spark, t_py, [("k", ">=", 40), ("k", "<", 60)])
    sql_dml.execute(
        spark, "UPDATE t SET price = price * CAST(2.0 AS DOUBLE) WHERE k < 10", cat
    )
    M.update_where(spark, t_py, {"price": "price * CAST(2.0 AS DOUBLE)"}, ("k", "<", 10))

    a = {(r["k"], r["price"], r["v"]) for r in M.read_table(spark, t_sql).collect()}
    b = {(r["k"], r["price"], r["v"]) for r in M.read_table(spark, t_py).collect()}
    assert a == b and len(a) == 80


def test_negated_dml_matches_python_api_and_null_semantics(spark, tmp_path):
    """SQL and Python negation paths agree, and a row whose predicate
    evaluates NULL survives a DELETE (SQL DML semantics)."""
    t_sql = str(tmp_path / "t_sql")
    t_py = str(tmp_path / "t_py")
    df = spark.range(100).selectExpr(
        "id AS k",
        "CAST(id % 7 AS DOUBLE) AS price",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE CAST(id % 3 AS STRING) END AS v",
    )
    for t in (t_sql, t_py):
        M.write_table(df, t, cluster_by=["k"], cluster_files=4)
    cat = {"t": t_sql}

    sql_dml.execute(spark, "DELETE FROM t WHERE v != '1' AND k < 50", cat)
    M.delete_where(spark, t_py, [("v", "!=", "1"), ("k", "<", 50)])
    sql_dml.execute(
        spark,
        "UPDATE t SET price = price + CAST(100.0 AS DOUBLE) WHERE v NOT IN ('0', '2')",
        cat,
    )
    M.update_where(
        spark, t_py, {"price": "price + CAST(100.0 AS DOUBLE)"},
        ("v", "not_in", ["0", "2"]),
    )
    sql_dml.execute(spark, "DELETE FROM t WHERE NOT (k < 80 OR v = '1')", cat)
    M.delete_where(spark, t_py, ("not", ("or", [("k", "<", 80), ("v", "==", "1")])))

    a = {(r["k"], r["price"], r["v"]) for r in M.read_table(spark, t_sql).collect()}
    b = {(r["k"], r["price"], r["v"]) for r in M.read_table(spark, t_py).collect()}
    assert a == b
    # NULL-v rows under k<50: v != '1' is UNKNOWN — they must SURVIVE
    # the first delete; the NOT IN update must not have touched them
    null_rows = {k for k, p, v in a if v is None}
    assert {0, 10, 20, 30, 40}.issubset(null_rows)
    assert all(p < 100.0 for k, p, v in a if v is None)
    # v='1' rows were never deleted, and got the +100 only when NOT IN hit
    assert all((p >= 100.0) == (v == "1") for k, p, v in a if v is not None)


def test_merge_restore_history_vacuum_roundtrip(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    cat = {"t": t}
    src = spark.createDataFrame(
        [(5, 99.0, "new5"), (200, 1.0, "new200")], "k long, price double, v string"
    )
    src.createOrReplaceTempView("src_v")
    v = sql_dml.execute(
        spark, "MERGE INTO t AS a USING src_v AS b ON a.k = b.k", cat
    )
    rows = {r["k"]: r["v"] for r in M.read_table(spark, t).collect()}
    assert rows[5] == "new5" and rows[200] == "new200" and len(rows) == 101

    v2 = sql_dml.execute(spark, "RESTORE TABLE t TO VERSION AS OF 1", cat)
    assert v2 == v + 1
    assert M.read_table(spark, t).count() == 100  # pre-merge state, forward commit

    hist = sql_dml.execute(spark, "DESCRIBE HISTORY t", cat)
    ops = [r["operation"] for r in hist.orderBy("version").collect()]
    assert ops == ["overwrite", "merge", "restore"]

    removed = sql_dml.execute(spark, "VACUUM t RETAIN 3 VERSIONS", cat)
    assert removed == []  # all three versions retained → nothing reclaimable


def test_optimize_and_alter_statements(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    n_before = len(M.read_manifest(t, 1)["files"])
    assert n_before >= 4
    v = sql_dml.execute(spark, "OPTIMIZE t", {"t": t})
    assert len(M.read_manifest(t, v)["files"]) <= 4  # default n_files
    assert M.read_table(spark, t).count() == 100

    v2 = sql_dml.execute(spark, "OPTIMIZE t ZORDER BY (k, price)", {"t": t})
    m = M.read_manifest(t, v2)
    assert m["meta"]["operation"] == "compact"
    assert M.read_table(spark, t).count() == 100

    files_before = M.read_manifest(t, v2)["files"]
    v3 = sql_dml.execute(spark, "ALTER TABLE t RENAME COLUMN price TO amount", {"t": t})
    assert M.read_manifest(t, v3)["files"] == files_before  # metadata-only
    assert M.read_table(spark, t).columns == ["k", "amount", "v"]
    v4 = sql_dml.execute(spark, "ALTER TABLE t DROP COLUMN v", {"t": t})
    assert M.read_manifest(t, v4)["files"] == files_before
    assert M.read_table(spark, t).columns == ["k", "amount"]
    # ADD COLUMN is SUPPORTED since r10 (metadata-only, null-fill)
    v5 = sql_dml.execute(spark, "ALTER TABLE t ADD COLUMN x INT", {"t": t})
    assert M.read_manifest(t, v5)["files"] == files_before
    assert M.read_table(spark, t).columns == ["k", "amount", "x"]
    with pytest.raises(ValueError, match="malformed ALTER"):
        sql_dml.execute(spark, "ALTER TABLE t SET TBLPROPERTIES (x=1)", {"t": t})


def test_update_without_where_and_unknown_table_rejected(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="WHERE"):
        sql_dml.execute(spark, "UPDATE t SET price = 0.0", {"t": t})
    with pytest.raises(ValueError, match="unknown table"):
        sql_dml.execute(spark, "DELETE FROM nope WHERE k = 1", {"t": t})
    with pytest.raises(ValueError, match="unsupported MERGE WHEN clause"):
        sql_dml.execute(
            spark,
            "MERGE INTO t AS a USING v AS b ON a.k = b.k "
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (1)",
            {"t": t},
        )
    with pytest.raises(ValueError, match="SAME key column"):
        sql_dml.execute(spark, "MERGE INTO t AS a USING v AS b ON a.k = b.j", {"t": t})
    with pytest.raises(ValueError, match="unsupported statement"):
        sql_dml.execute(spark, "TRUNCATE TABLE t", {"t": t})


def test_general_merge_clauses_first_match_wins(spark, tmp_path):
    """r9 item 3: conditional UPDATE/DELETE + conditional INSERT, applied
    in statement order, through the SQL front door and the Python API."""
    t = _seed(spark, tmp_path / "t")  # k∈[0,100), price=k%7, v=str(k)
    src = spark.createDataFrame(
        [(1, 0.0, "D"), (2, 50.0, "U"), (3, -1.0, "U"), (200, 7.0, "I"), (201, 7.0, "X")],
        "k long, price double, v string",
    )
    src.createOrReplaceTempView("cdc_src")
    try:
        sql_dml.execute(
            spark,
            "MERGE INTO t AS t USING cdc_src AS s ON t.k = s.k "
            "WHEN MATCHED AND s.v = 'D' THEN DELETE "
            "WHEN MATCHED AND s.price > t.price THEN "
            "UPDATE SET price = s.price, v = 'upd' "
            "WHEN NOT MATCHED AND s.v = 'I' THEN INSERT *",
            {"t": t},
        )
    finally:
        spark.catalog.dropTempView("cdc_src")
    rows = {(r["k"], r["price"], r["v"]) for r in M.read_table(spark, t).collect()}
    assert (1, 1.0, "1") not in {r for r in rows if r[0] == 1} and not any(
        r[0] == 1 for r in rows
    )  # deleted
    assert (2, 50.0, "upd") in rows  # conditional update fired
    assert (3, 3.0, "3") in rows  # condition false → untouched
    assert (200, 7.0, "I") in rows  # conditional insert fired
    assert not any(r[0] == 201 for r in rows)  # insert condition blocked
    # history shows ONE merge commit
    ops = [r["operation"] for r in M.table_history(spark, t).orderBy("version").collect()]
    assert ops == ["overwrite", "merge"]

    # Python API twin: delete-all-matched CDC apply
    src2 = spark.createDataFrame([(5, 0.0, "x"), (300, 1.0, "n")], "k long, price double, v string")
    M.merge_table(
        spark, src2, t, "k",
        when_matched=[("delete", None)],
        when_not_matched=[("insert", None, "*")],
    )
    ks = {r["k"] for r in M.read_table(spark, t).collect()}
    assert 5 not in ks and 300 in ks


def test_set_list_splits_on_top_level_commas_only(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    sql_dml.execute(
        spark,
        "UPDATE t SET v = concat(v, '-x', ','), price = least(price, CAST(3.0 AS DOUBLE)) "
        "WHERE k IN (1, 2)",
        {"t": t},
    )
    rows = {r["k"]: (r["v"], r["price"]) for r in M.read_table(spark, t).collect()}
    assert rows[1] == ("1-x,", 1.0) and rows[2] == ("2-x,", 2.0)
    assert rows[3] == ("3", 3.0)  # untouched

    # string literals with escaped quotes survive the WHERE tokenizer
    sql_dml.execute(spark, "DELETE FROM t WHERE v = '1-x,'", {"t": t})
    assert 1 not in {r["k"] for r in M.read_table(spark, t).collect()}
