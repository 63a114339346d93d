"""CONVERT TO MANIFEST (the Delta CONVERT TO DELTA shape): a plain or
hive-partitioned parquet directory becomes a manifest table in place —
zero copy, partition columns intact, lifecycle ops live afterward. The
end-to-end oracle check is the registered ``manifest_convert_parquet``
query."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks import sql_dml
from cashback_data_pipeline_spark.sinks.filestats import prune_files
from cashback_data_pipeline_spark.sinks.writers import write_warehouse


def _warehouse(spark, path, n=60):
    df = spark.range(n).selectExpr(
        "id AS k",
        "CAST(id % 3 AS INT) AS bucket",
        "CAST(id AS DOUBLE) AS price",
    )
    write_warehouse(df, str(path), partition_by="bucket")
    return str(path), df


def test_convert_is_zero_copy_and_reads_equal(spark, tmp_path):
    t, df = _warehouse(spark, tmp_path / "wh")
    listing_before = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(t) for f in fs if f.endswith(".parquet")
    )
    assert sql_dml.execute(spark, "CONVERT TO MANIFEST wh", {"wh": t}) == 1
    listing_after = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(t) for f in fs if f.endswith(".parquet")
    )
    assert listing_before == listing_after  # zero copy, zero rewrite
    m = M.read_manifest(t, 1)
    assert m["partitioning"] == ["bucket"]
    assert len(m["files"]) == len(listing_before)
    back = M.read_table(spark, t)
    assert back.count() == 60
    assert {r["bucket"] for r in back.select("bucket").distinct().collect()} == {0, 1, 2}
    # partition pruning live immediately (path-derived exact stats)
    kept, skipped = prune_files(m["files"], m["stats"], ("bucket", "==", 1))
    assert skipped > 0 and all("bucket=1" in f for f in kept)


def test_convert_unpartitioned_and_stats_cols(spark, tmp_path):
    t = str(tmp_path / "flat")
    spark.range(40).selectExpr("id AS k", "CAST(id AS DOUBLE) AS price").coalesce(
        4
    ).write.parquet(t)
    M.convert_to_table(spark, t, stats_cols=["k"])
    m = M.read_manifest(t, 1)
    assert "partitioning" not in m
    assert all("k" in e["cols"] for e in m["stats"].values())
    assert M.read_table(spark, t, skip=("k", "<", 5)).count() == 5


def test_lifecycle_after_convert(spark, tmp_path):
    t, df = _warehouse(spark, tmp_path / "wh")
    M.convert_to_table(spark, t)
    # append lands in the native tree, hive-partitioned like the import
    M.write_table(
        df.limit(6).withColumn("k", F.col("k") + 1000), t, mode="append"
    )
    m2 = M.read_manifest(t, 2)
    new = [f for f in m2["files"] if f.replace(os.sep, "/").startswith("data/")]
    assert new and all("bucket=" in f for f in new)
    assert M.read_table(spark, t).count() == 66
    # partition-scoped DELETE carries the other partitions untouched
    v = M.delete_where(spark, t, ("bucket", "==", 2))
    meta = M.read_manifest(t, v)["meta"]["delete"]
    assert meta["carried"] > 0
    assert M.read_table(spark, t).filter(F.col("bucket") == 2).count() == 0
    # drop a partition metadata-only; time travel still reaches v1
    M.drop_partition(t, {"bucket": 1})
    assert M.read_table(spark, t, version=1).count() == 60


def test_merge_on_read_refuses_imported_files(spark, tmp_path):
    t, df = _warehouse(spark, tmp_path / "wh")
    M.convert_to_table(spark, t)
    with pytest.raises(ValueError, match="imported"):
        M.delete_where(spark, t, ("k", "<", 10), mode="merge_on_read")
    # compaction migrates imports into the native tree; MoR unblocks
    M.compact_table(spark, t, n_files=2)
    v = M.delete_where(spark, t, ("k", "<", 10), mode="merge_on_read")
    assert M.read_manifest(t, v).get("dv_files")
    assert M.read_table(spark, t).count() == 50


def test_convert_refusals(spark, tmp_path):
    t, _ = _warehouse(spark, tmp_path / "wh")
    M.convert_to_table(spark, t)
    with pytest.raises(ValueError, match="already a manifest table"):
        M.convert_to_table(spark, t)
    with pytest.raises(FileNotFoundError):
        M.convert_to_table(spark, str(tmp_path / "empty_dir"))
