"""Generated columns (VERDICT r10 item 6 — the Delta GENERATED ALWAYS
AS shape): declared while empty, materialized/validated on every batch
write path, recomputed by UPDATE, auto-tracked in stats for pruning.
The end-to-end oracle check is the registered
``manifest_generated_columns`` query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml
from cashback_data_pipeline_spark.sinks.filestats import prune_files


def _declare(spark, path):
    t = str(path)
    M.create_table(t, "k BIGINT, cents BIGINT")
    M.add_generated_column(t, "dollars", "double", "CAST(cents AS DOUBLE) / 100.0")
    return t


def _rows(spark, n=40):
    return spark.range(n).selectExpr("id AS k", "id * 137 AS cents")


def test_writer_materializes_missing_generated(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")
    M.write_table(_rows(spark), t, mode="append")
    back = M.read_table(spark, t)
    assert back.columns == ["k", "cents", "dollars"]
    assert back.filter(F.col("dollars") != F.col("cents") / 100.0).count() == 0


def test_supplied_consistent_ok_inconsistent_refused(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")
    good = _rows(spark).withColumn("dollars", F.col("cents") / 100.0)
    M.write_table(good, t, mode="append")
    v = M.current_version(t)
    bad = _rows(spark).withColumn("dollars", F.col("cents") / 100.0 + 1.0).withColumn(
        "k", F.col("k") + 1000
    )
    with pytest.raises(ValueError, match="inconsistent"):
        M.write_table(bad, t, mode="append")
    assert M.current_version(t) == v  # nothing committed


def test_declaration_refused_on_non_empty_table(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_rows(spark), t)
    with pytest.raises(ValueError, match="non-empty"):
        M.add_generated_column(t, "dollars", "double", "cents / 100.0")


def test_update_recomputes_generated(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")
    M.write_table(_rows(spark), t, mode="append")
    M.update_where(spark, t, {"cents": "cents + 100"}, ("k", "<", 5))
    back = M.read_table(spark, t)
    assert back.filter(F.col("dollars") != F.col("cents") / 100.0).count() == 0
    assert back.filter(F.col("k") == 0).first()["dollars"] == 1.0
    # an explicit INCONSISTENT assignment refuses
    with pytest.raises(ValueError, match="inconsistent"):
        M.update_where(spark, t, {"dollars": "dollars + 5.0"}, ("k", "<", 5))


def test_upsert_and_not_exists_load_materialize(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")
    M.write_table(_rows(spark), t, mode="append")
    inc = spark.range(5).selectExpr("id AS k", "id * 9900 AS cents")
    M.upsert_table(spark, inc, t, key="k")
    back = M.read_table(spark, t)
    assert back.filter(F.col("k") == 1).first()["dollars"] == 99.0
    more = spark.range(50).selectExpr("id AS k", "id * 137 AS cents")
    n = M.append_table_if_absent(spark, more, t, key="k")
    assert n == 10
    assert M.read_table(spark, t).filter(
        F.col("dollars") != F.col("cents") / 100.0
    ).count() == 0


def test_rename_drop_refusals(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")
    M.write_table(_rows(spark), t, mode="append")
    with pytest.raises(ValueError, match="generated column"):
        M.rename_column(t, "dollars", "usd")
    with pytest.raises(ValueError, match="derives from"):
        M.drop_column(t, "cents")
    with pytest.raises(ValueError, match="generated column"):
        M.drop_column(t, "dollars")


def test_generated_predicate_prunes_files(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")
    # clustered on the dependency → the derived column is range-correlated
    M.write_table(
        _rows(spark, 4000), t, mode="append", cluster_by=["cents"], cluster_files=8
    )
    m = M.read_manifest(t, M.current_version(t))
    kept, skipped = prune_files(m["files"], m["stats"], ("dollars", ">", 5000.0))
    assert skipped > 0  # generated column auto-tracked in stats
    out = M.read_table(spark, t, skip=("dollars", ">", 5000.0))
    assert out.count() == sum(1 for i in range(4000) if i * 137 / 100.0 > 5000.0)


def test_sql_generated_grammar_and_describe(spark, tmp_path):
    t = str(tmp_path / "t")
    cat = {"gt": t}
    sql_dml.execute(spark, "CREATE TABLE gt (k BIGINT, cents BIGINT)", cat)
    v = sql_dml.execute(
        spark,
        "ALTER TABLE gt ADD COLUMN dollars double "
        "GENERATED ALWAYS AS (CAST(cents AS DOUBLE) / 100.0)",
        cat,
    )
    assert v == 2
    _rows(spark, 6).createOrReplaceTempView("gen_src")
    try:
        sql_dml.execute(spark, "INSERT INTO gt SELECT * FROM gen_src", cat)
        back = M.read_table(spark, t)
        assert back.filter(F.col("dollars") != F.col("cents") / 100.0).count() == 0
        detail = M.describe_detail(spark, t).first()
        assert "dollars" in (detail["generated"] or "")
    finally:
        spark.catalog.dropTempView("gen_src")


def test_overwrite_missing_dependency_refuses(spark, tmp_path):
    """The generated property auto-carries across an overwrite, so an
    overwrite whose batch cannot derive the column fails loudly instead
    of silently dropping the declaration."""
    t = _declare(spark, tmp_path / "t")
    M.write_table(_rows(spark), t, mode="append")
    with pytest.raises(Exception, match="cents"):
        M.write_table(_rows(spark).drop("cents"), t)


def test_restore_restores_generated_property(spark, tmp_path):
    t = _declare(spark, tmp_path / "t")  # v1 create, v2 declare
    M.write_table(_rows(spark), t, mode="append")  # v3
    # restoring PAST the declaration clears the property (the restored
    # version's OWN metadata governs) ...
    M.restore_table(t, version=1)  # v4: empty, no generated
    assert not M.read_manifest(t, 4).get("generated")
    free = _rows(spark).withColumn("dollars", F.lit(0.0))
    M.write_table(free, t, mode="append")  # inconsistent values accepted now
    # ... and restoring forward to a declared version re-arms enforcement
    M.restore_table(t, version=3)
    m = M.read_manifest(t, M.current_version(t))
    assert "dollars" in (m.get("generated") or {})
    bad = _rows(spark).withColumn("dollars", F.lit(0.0)).withColumn(
        "k", F.col("k") + 500
    )
    with pytest.raises(ValueError, match="inconsistent"):
        M.write_table(bad, t, mode="append")


def test_parse_monotone_expr_forms():
    import datetime as dt

    from cashback_data_pipeline_spark.sinks import manifest as M

    col, F_ = M._parse_monotone_expr("date_format(ts, 'yyyy-MM')")
    assert col == "ts" and F_(dt.date(2024, 3, 9)) == "2024-03"
    col, F_ = M._parse_monotone_expr("year(o_orderdate)")
    assert col == "o_orderdate" and F_(dt.datetime(1997, 5, 1)) == 1997
    col, F_ = M._parse_monotone_expr("CAST(ts AS DATE)")
    assert col == "ts" and F_(dt.datetime(2024, 3, 9, 13)) == dt.date(2024, 3, 9)
    col, F_ = M._parse_monotone_expr("date_trunc('month', ts)")
    assert F_(dt.datetime(2024, 3, 9, 13)) == dt.datetime(2024, 3, 1)
    # cyclic / arbitrary expressions derive nothing
    assert M._parse_monotone_expr("month(ts)") is None
    assert M._parse_monotone_expr("cents / 100.0") is None
    # unusable literal type -> None (caller derives nothing)
    col, F_ = M._parse_monotone_expr("year(ts)")
    assert F_("not-a-date") is None


def test_augment_generated_predicates_tree():
    import datetime as dt

    from cashback_data_pipeline_spark.sinks import manifest as M

    m = {"generated": {"ym": {"expr": "date_format(ts, 'yyyy-MM')", "type": "string"}}}
    lo = dt.datetime(2024, 3, 9)
    aug = M._augment_generated_predicates(("ts", ">=", lo), m)
    assert aug == ("and", [("ts", ">=", lo), ("ym", ">=", "2024-03")])
    # strict < maps to <= on the derived column (monotone, not injective)
    aug = M._augment_generated_predicates(("ts", "<", lo), m)
    assert aug == ("and", [("ts", "<", lo), ("ym", "<=", "2024-03")])
    # composites recurse; negations never derive; other leaves untouched
    spec = ("or", [("ts", "==", lo), ("not", ("ts", ">", lo)), ("k", "<", 5)])
    aug = M._augment_generated_predicates(spec, m)
    assert aug == (
        "or",
        [
            ("and", [("ts", "==", lo), ("ym", "==", "2024-03")]),
            ("not", ("ts", ">", lo)),
            ("k", "<", 5),
        ],
    )
    # IN maps per element
    aug = M._augment_generated_predicates(("ts", "in", [lo]), m)
    assert aug == ("and", [("ts", "in", [lo]), ("ym", "in", ["2024-03"])])
    # no generated property -> spec unchanged
    assert M._augment_generated_predicates(("ts", ">=", lo), {}) == ("ts", ">=", lo)


def test_derived_predicate_prunes_end_to_end(spark, tmp_path):
    """A ts-range DELETE on a table with NO ts stats prunes files through
    the derived generated-month conjunct — and deletes exactly the
    matching rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cashback_data_pipeline_spark.sinks import manifest as M
    from cashback_data_pipeline_spark.sinks.filestats import prune_files

    t = str(tmp_path / "t")
    M.create_table(t, "k BIGINT, d DATE")
    M.add_generated_column(t, "ym", "string", "date_format(d, 'yyyy-MM')")
    df = spark.range(300).selectExpr(
        "id AS k", "date_add(DATE'2024-01-01', CAST(id / 3 AS INT)) AS d"
    )
    M.write_table(
        df, t, mode="append", cluster_by=["d"], cluster_files=6, stats_cols=["k"]
    )
    m = M.read_manifest(t, M.current_version(t))
    spec = ("d", ">=", dt.date(2024, 4, 1))
    assert prune_files(m["files"], m["stats"], spec)[1] == 0  # no d stats
    v = M.delete_where(spark, t, spec)
    meta = M.read_manifest(t, v)["meta"]["delete"]
    assert meta["carried"] > 0  # derived-month pruning carried files
    back = M.read_table(spark, t)
    assert back.count() == df.filter(F.col("d") < dt.date(2024, 4, 1)).count()
    assert back.filter(F.col("d") >= dt.date(2024, 4, 1)).count() == 0
