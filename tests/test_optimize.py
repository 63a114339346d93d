"""Incremental small-file OPTIMIZE (round 10 — manifest.optimize_table,
the Delta bin-packing shape): only small files rewrite, right-sized
files carry with zero I/O, WHERE scopes the pass, DVs on rewritten
files materialize, stats/bloom survive, SQL front door dispatches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import filestats
from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml


def _seed(spark, path, n_small=6):
    """One big clustered file (50k rows) + n_small one-file appends."""
    t = str(path)
    big = spark.range(50_000).selectExpr("id AS k", "CAST(id % 9 AS DOUBLE) AS v")
    M.write_table(big.coalesce(1), t, stats_cols=["k"])
    for i in range(n_small):
        M.write_table(
            spark.range(50_000 + i * 100, 50_000 + (i + 1) * 100)
            .selectExpr("id AS k", "CAST(id % 9 AS DOUBLE) AS v")
            .coalesce(1),
            t,
            mode="append",
        )
    return t


def test_optimize_packs_only_small_files(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    before = M.read_manifest(t, M.current_version(t))["files"]
    v = M.optimize_table(spark, t, target_rows=10_000)
    m = M.read_manifest(t, v)
    meta = m["meta"]["optimize"]
    assert meta == {"rewritten": 6, "carried": 1, "n_out": 1, "target_rows": 10_000}
    # the big file carried VERBATIM (same path — zero I/O)
    assert set(before) & set(m["files"])
    assert len(m["files"]) == 2
    assert M.read_table(spark, t).count() == 50_600
    # stats survive: key pruning still fires on the optimized layout
    _, skipped = filestats.prune_files(m["files"], m["stats"], [("k", "<", 10)])
    assert skipped >= 1
    # idempotent: nothing small remains below a tighter target
    assert M.optimize_table(spark, t, target_rows=500) == v


def test_optimize_where_scopes_the_pass(spark, tmp_path):
    t = _seed(spark, tmp_path / "t", n_small=4)
    # two more small files OUTSIDE the scope predicate
    for i in range(2):
        M.write_table(
            spark.range(-100 * (i + 1), -100 * i)
            .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v")
            .coalesce(1),
            t,
            mode="append",
        )
    v = M.optimize_table(spark, t, target_rows=10_000, predicates=[("k", ">=", 0)])
    meta = M.read_manifest(t, v)["meta"]["optimize"]
    # the 4 in-scope appends packed; the big file carried (too big),
    # the 2 negative-key files carried (out of scope)
    assert meta["rewritten"] == 4 and meta["carried"] == 3
    assert M.read_table(spark, t).count() == 50_600


def test_optimize_materializes_dvs_on_rewritten_files(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    M.delete_where(spark, t, ("k", ">=", 50_550), mode="merge_on_read")
    assert M._dv_set(M.read_manifest(t, M.current_version(t)))
    v = M.optimize_table(spark, t, target_rows=10_000)
    out = M.read_table(spark, t)
    assert out.count() == 50_550
    assert out.filter(F.col("k") >= 50_550).count() == 0
    # a second optimize over the materialized layout is a no-op
    assert M.optimize_table(spark, t, target_rows=10_000) == v


def test_optimize_no_churn_below_min_files(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(
        spark.range(100).selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v").coalesce(1),
        t,
    )
    assert M.optimize_table(spark, t, target_rows=10_000) == 1  # 1 file < min_files
    with pytest.raises(ValueError):
        M.optimize_table(spark, t, predicates=[("k", "bogus_op", 1)])


def test_optimize_sql_front_door(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    cat = {"t": t}
    v = sql_dml.execute(spark, "OPTIMIZE t TARGET 10000 ROWS WHERE k >= 50000", cat)
    meta = M.read_manifest(t, v)["meta"]["optimize"]
    assert meta["rewritten"] == 6 and meta["carried"] == 1
    ops = [r["operation"] for r in M.table_history(spark, t).orderBy("version").collect()]
    assert ops[-1] == "optimize"
    # bare OPTIMIZE keeps the full-compaction semantics
    v2 = sql_dml.execute(spark, "OPTIMIZE t", cat)
    assert len(M.read_manifest(t, v2)["files"]) <= 4


def test_declared_layout_survives_maintenance(spark, tmp_path):
    """write_table(cluster_by=) records a LAYOUT table property;
    optimize_table re-lays what it packs by it and a bare compact_table
    keeps it — a clustered table stays skip-prunable under maintenance
    without re-passing columns."""
    t = str(tmp_path / "t")
    big = spark.range(50_000).selectExpr("id AS k", "CAST(id % 9 AS DOUBLE) AS v")
    M.write_table(big, t, cluster_by=["k"], cluster_files=4)
    assert M.read_manifest(t, 1)["layout"] == {"cluster_by": ["k"]}
    # small scattered appends (each spans the whole key range)
    for i in range(4):
        M.write_table(
            spark.range(50_000).filter((F.col("id") % 40) == i)
            .selectExpr("id AS k", "CAST(0.0 AS DOUBLE) AS v").coalesce(1),
            t, mode="append",
        )
    v = M.optimize_table(spark, t, target_rows=10_000)
    m = M.read_manifest(t, v)
    assert m["layout"] == {"cluster_by": ["k"]}
    meta = m["meta"]["optimize"]
    assert meta["rewritten"] == 4 and meta["carried"] == 4
    # the PACKED files are range-clustered: a keyed point probe prunes
    # all but one of them (scattered appends were unprunable before)
    packed = [f for f in m["files"] if f not in set(M.read_manifest(t, 1)["files"])]
    kept, _ = filestats.prune_files(packed, m["stats"], [("k", "<", 100)])
    assert len(kept) == 1, (len(kept), len(packed))
    # bare compact keeps the declared layout and stays prunable
    v2 = M.compact_table(spark, t, n_files=6)
    m2 = M.read_manifest(t, v2)
    assert m2["layout"] == {"cluster_by": ["k"]}
    _, skipped = filestats.prune_files(m2["files"], m2["stats"], [("k", "<", 100)])
    assert skipped >= 4


def test_optimize_rewrites_heavily_tombstoned_files(spark, tmp_path):
    """A right-sized file whose deleted fraction reaches max_dv_ratio
    rewrites (the Delta DV-reclaim policy), and tombstone relations
    whose every referenced file was rewritten DROP from the commit —
    reads stop paying the anti-join."""
    t = _seed(spark, tmp_path / "t")  # 1 big (50k) + 6 small files
    M.delete_where(spark, t, [("k", ">=", 0), ("k", "<", 20_000)], mode="merge_on_read")
    m0 = M.read_manifest(t, M.current_version(t))
    assert M._dv_set(m0)
    v = M.optimize_table(spark, t, target_rows=10_000, max_dv_ratio=0.2)
    m = M.read_manifest(t, v)
    # the big file (40% tombstoned) rewrote alongside the 6 small ones
    assert m["meta"]["optimize"]["rewritten"] == 7
    assert not M._dv_set(m), "dead tombstone relations must drop"
    out = M.read_table(spark, t)
    assert out.count() == 30_600
    assert out.filter(F.col("k") < 20_000).count() == 0
    # below the ratio, a big tombstoned file carries with its DVs
    t2 = _seed(spark, tmp_path / "t2")
    M.delete_where(spark, t2, [("k", ">=", 0), ("k", "<", 100)], mode="merge_on_read")
    v2 = M.optimize_table(spark, t2, target_rows=10_000, max_dv_ratio=0.2)
    m2 = M.read_manifest(t2, v2)
    assert m2["meta"]["optimize"]["carried"] == 1 and M._dv_set(m2)
    assert M.read_table(spark, t2).count() == 50_500
