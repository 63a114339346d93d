"""Shallow CLONE (VERDICT r10 item 4 — the Delta zero-copy fork): an
O(metadata) commit referencing the source's files, independent write
paths, and the documented vacuum ownership rule. The end-to-end oracle
check is the registered ``manifest_shallow_clone`` query."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml


def _seed(spark, path, n=60):
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id % 5 AS DOUBLE) AS price", "CAST(id AS STRING) AS v"
    )
    M.write_table(
        df.filter(F.col("k") < n // 2), str(path),
        cluster_by=["k"], cluster_files=3,
    )
    M.write_table(df.filter(F.col("k") >= n // 2), str(path), mode="append")
    return str(path), df


def test_clone_is_metadata_only_and_reads_equal(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    assert M.clone_table(src, dst) == 1
    m = M.read_manifest(dst, 1)
    # zero local data files: every entry references the source root
    assert all(os.path.isabs(f) and f.startswith(src) for f in m["files"])
    assert not os.path.exists(os.path.join(dst, "data"))
    assert m["meta"]["clone"] == {"source": src, "of_version": 2}
    got = {r["k"]: r["price"] for r in M.read_table(spark, dst).collect()}
    assert got == {r["k"]: r["price"] for r in df.collect()}
    # stats carried (rekeyed): a keyed read on the clone still prunes
    out = M.read_table(spark, dst, skip=("k", "==", 3))
    assert out.count() == 1


def test_clone_pins_a_version(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst, version=1)
    assert M.read_table(spark, dst).count() == 30


def test_writes_to_clone_never_touch_source(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    src_files = M.read_manifest(src, 2)["files"]
    src_cur = M.current_version(src)
    M.update_where(spark, dst, {"price": "price + 100.0"}, ("k", "<", 10))
    M.delete_where(spark, dst, ("k", ">=", 55))
    # source manifest and physical files untouched
    assert M.current_version(src) == src_cur
    assert M.read_manifest(src, 2)["files"] == src_files
    store = M.get_log_store(src)
    assert all(os.path.exists(store.join(src, f)) for f in src_files)
    assert M.read_table(spark, src).count() == 60
    back = M.read_table(spark, dst)
    assert back.count() == 55
    assert back.filter(F.col("k") < 10).agg(F.min("price")).first()[0] >= 100.0


def test_source_evolution_does_not_leak_into_clone(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    M.delete_where(spark, src, ("k", "<", 20))
    M.write_table(df.limit(5).withColumn("k", F.col("k") + 1000), src, mode="append")
    assert M.read_table(spark, dst).count() == 60  # still the cloned snapshot


def test_clone_carries_deletion_vectors(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    M.delete_where(spark, src, ("k", "<", 7), mode="merge_on_read")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    m = M.read_manifest(dst, 1)
    assert m.get("dv_files")
    assert M.read_table(spark, dst).count() == 53


def test_clone_of_partitioned_table(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(30).selectExpr(
        "id AS k", "date_add(DATE'2024-01-01', CAST(id % 3 AS INT)) AS day"
    )
    M.write_table(df, src, partition_by=["day"])
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    assert M.read_manifest(dst, 1)["partitioning"] == ["day"]
    back = M.read_table(spark, dst)
    assert back.filter(F.col("day") == dt.date(2024, 1, 2)).count() == 10
    # partition lifecycle ops work on the clone without touching the src
    M.drop_partition(dst, {"day": dt.date(2024, 1, 1)})
    assert M.read_table(spark, dst).count() == 20
    assert M.read_table(spark, src).count() == 30


def test_vacuum_on_clone_spares_foreign_files(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    # localize part of the data, then vacuum the clone aggressively
    M.update_where(spark, dst, {"price": "price + 1.0"}, ("k", "<", 10))
    removed = M.vacuum(dst, keep_last=1, min_age_s=0.0)
    # only the clone's own superseded dirs may go; the source's never do
    assert all(r.startswith(dst) for r in removed)
    assert M.read_table(spark, dst).count() == 60
    assert M.read_table(spark, src).count() == 60


def test_compact_localizes_the_clone(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    M.compact_table(spark, dst, n_files=2)
    m = M.read_manifest(dst, 2)
    # after the rewrite every entry is the clone's own (survives a
    # source vacuum — the documented escape from the ownership rule)
    assert all(f.startswith("data/") for f in m["files"])
    assert M.read_table(spark, dst).count() == 60


def test_sql_shallow_clone(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    cat = {"t1": src, "t2": dst}
    assert sql_dml.execute(spark, "CREATE TABLE t2 SHALLOW CLONE t1", cat) == 1
    assert M.read_table(spark, dst).count() == 60
    dst3 = str(tmp_path / "dst3")
    cat["t3"] = dst3
    sql_dml.execute(spark, "CREATE TABLE t3 SHALLOW CLONE t1 VERSION AS OF 1", cat)
    assert M.read_table(spark, dst3).count() == 30


def test_clone_target_must_not_exist(spark, tmp_path):
    src, df = _seed(spark, tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.clone_table(src, dst)
    with pytest.raises(ValueError, match="already exists"):
        M.clone_table(src, dst)


def test_clone_of_a_clone(spark, tmp_path):
    """Chained shallow clones: absolute entries carry through unchanged,
    so a fork of a fork still reads the original files zero-copy."""
    src, df = _seed(spark, tmp_path / "src")
    c1 = str(tmp_path / "c1")
    c2 = str(tmp_path / "c2")
    M.clone_table(src, c1)
    M.update_where(spark, c1, {"price": "price + 1.0"}, ("k", "<", 5))
    M.clone_table(c1, c2)
    m = M.read_manifest(c2, 1)
    assert all(os.path.isabs(f) for f in m["files"])
    # c2 references BOTH roots: src's untouched files and c1's rewrite
    assert any(f.startswith(src) for f in m["files"])
    assert any(f.startswith(c1) for f in m["files"])
    assert M.read_table(spark, c2).count() == 60
    assert M.read_table(spark, c2).filter(F.col("k") < 5).agg(
        F.min("price")
    ).first()[0] >= 1.0
