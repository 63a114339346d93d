"""Column-mapping schema evolution (VERDICT r8 item 3 — the
Delta/Iceberg column-mapping idea, name mode): RENAME and DROP are
metadata-only commits; physical names are frozen at column birth, data
files never rewrite, reads resolve through the mapping, and time travel
reads each version under its own names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M


def _seed(spark, path, n=100):
    df = spark.range(n).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS amount", "CAST(id AS STRING) AS note"
    )
    M.write_table(df, str(path), cluster_by=["k"], cluster_files=4)
    return str(path)


def test_rename_is_metadata_only_and_reads_resolve(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    files_before = M.read_manifest(t, 1)["files"]
    v = M.rename_column(t, "amount", "value")
    m = M.read_manifest(t, v)
    assert m["files"] == files_before  # zero data movement
    assert m["meta"]["operation"] == "rename_column"
    out = M.read_table(spark, t)
    assert out.columns == ["k", "value", "note"]
    assert out.agg(F.sum("value")).first()[0] == sum(range(100))
    # time travel to the pre-rename version reads under ITS names
    old = M.read_table(spark, t, version=1)
    assert old.columns == ["k", "amount", "note"]


def test_append_after_rename_and_skip_pruning_on_new_name(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    M.rename_column(t, "amount", "value")
    extra = spark.range(100, 150).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS value", "CAST(id AS STRING) AS note"
    )
    M.write_table(extra, t, mode="append", stats_cols=["k"])
    out = M.read_table(spark, t)
    assert out.count() == 150 and "value" in out.columns
    # skip= with the CURRENT logical name prunes via physical stats:
    # pre-rename files carry stats under the same frozen physical name
    got = M.read_table(spark, t, skip=[("k", ">=", 120)])
    assert sorted(r["k"] for r in got.collect()) == list(range(120, 150))
    # predicates on the RENAMED column translate for pruning too
    got2 = M.read_table(spark, t, skip=[("value", "<", 5.0)])
    assert got2.count() == 5


def test_dml_on_renamed_column(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    M.rename_column(t, "amount", "value")
    M.update_where(spark, t, {"value": "value * CAST(2.0 AS DOUBLE)"}, ("k", "<", 3))
    M.delete_where(spark, t, ("value", ">=", 90.0))
    rows = {r["k"]: r["value"] for r in M.read_table(spark, t).collect()}
    assert rows[0] == 0.0 and rows[1] == 2.0 and rows[2] == 4.0 and rows[3] == 3.0
    assert max(rows) == 89
    # keyed upsert with the surviving logical names
    inc = spark.createDataFrame([(1, 123.0, "x")], "k long, value double, note string")
    M.upsert_table(spark, inc, t, key="k")
    assert {r["value"] for r in M.read_table(spark, t).filter("k = 1").collect()} == {123.0}
    # merge-on-read delete translates its predicate to physical names
    M.delete_where(spark, t, ("value", "==", 4.0), mode="merge_on_read")
    assert M.read_table(spark, t).filter("k = 2").count() == 0


def test_drop_column_zero_rewrite_and_narrower_appends(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    files_before = M.read_manifest(t, 1)["files"]
    v = M.drop_column(t, "note")
    m = M.read_manifest(t, v)
    assert m["files"] == files_before
    out = M.read_table(spark, t)
    assert out.columns == ["k", "amount"]
    extra = spark.range(100, 110).selectExpr("id AS k", "CAST(id AS DOUBLE) AS amount")
    M.write_table(extra, t, mode="append")
    assert M.read_table(spark, t).count() == 110
    # compaction rewrites WITHOUT the dropped physical
    M.compact_table(spark, t, n_files=1)
    assert M.read_table(spark, t).columns == ["k", "amount"]
    assert M.read_table(spark, t).count() == 110


def test_restore_to_pre_rename_version_restores_names(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    M.rename_column(t, "amount", "value")
    v = M.restore_table(t, version=1)
    out = M.read_table(spark, t, version=v)
    assert out.columns == ["k", "amount", "note"]
    assert M.read_manifest(t, v).get("column_mapping") is None


def test_new_column_colliding_with_renamed_physical_refused(spark, tmp_path):
    t = _seed(spark, tmp_path / "t")
    M.rename_column(t, "amount", "value")
    wider = spark.range(5).selectExpr(
        "id AS k",
        "CAST(id AS DOUBLE) AS value",
        "CAST(id AS STRING) AS note",
        "CAST(0.0 AS DOUBLE) AS amount",  # physical 'amount' is claimed by 'value'
    )
    with pytest.raises(ValueError, match="physical name is already"):
        M.write_table(wider, t, mode="append")
    # a non-colliding new column extends the mapping (physical = logical)
    wider_ok = spark.range(5).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS value", "CAST(id AS STRING) AS note",
        "CAST(1 AS INT) AS flag",
    )
    M.write_table(wider_ok, t, mode="append")
    m = M.read_manifest(t, M.current_version(t))
    assert m["column_mapping"]["flag"] == "flag"
    assert m["column_mapping"]["value"] == "amount"


def test_rename_refused_on_bloom_indexed_column(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(50).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    M.write_table(df, t, bloom_cols=["k"])
    with pytest.raises(ValueError, match="bloom"):
        M.rename_column(t, "k", "key")
    with pytest.raises(ValueError, match="bloom"):
        M.drop_column(t, "k")
    M.rename_column(t, "v", "text")  # non-bloom columns still rename
    assert M.read_table(spark, t).columns == ["k", "text"]


def test_mapping_survives_checkpoint_roundtrip(spark, tmp_path):
    t = _seed(spark, tmp_path / "t", n=20)
    M.rename_column(t, "amount", "value")
    for i in range(M.CHECKPOINT_INTERVAL + 1):
        extra = spark.range(100 + i, 101 + i).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS value", "CAST(id AS STRING) AS note"
        )
        M.write_table(extra.coalesce(1), t, mode="append")
    m = M.read_manifest(t, M.current_version(t))
    assert m["column_mapping"]["value"] == "amount"
    out = M.read_table(spark, t)
    assert out.columns == ["k", "value", "note"]
    assert out.count() == 20 + M.CHECKPOINT_INTERVAL + 1


def test_streaming_sink_into_mapped_table(spark, tmp_path):
    """The streaming sink pins the column mapping at stream start:
    executors write PHYSICAL names, so a streamed append into a renamed
    table keeps the frozen physical layout and batch readers resolve
    logical names across stream- and batch-written files alike."""
    from cashback_data_pipeline_spark.streaming.manifest_sink import write_manifest_stream

    t = str(tmp_path / "t")
    M.write_table(
        spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS amount"), t
    )
    M.rename_column(t, "amount", "value")
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .selectExpr("value AS k", "CAST(value AS DOUBLE) AS value")
    )
    q = (
        write_manifest_stream(src, t, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = M.read_table(spark, t)
    assert out.columns == ["k", "value"]
    assert out.count() >= 5  # seed rows + whatever the rate source emitted
    m = M.read_manifest(t, M.current_version(t))
    assert m["column_mapping"]["value"] == "amount"
    # stream-written files carry the PHYSICAL name on disk
    store = M.get_log_store(t)
    newest = [f for f in m["files"] if f not in M.read_manifest(t, 2)["files"]]
    if newest:
        import pyarrow.parquet as pq

        cols = pq.ParquetFile(store.join(t, newest[0])).schema_arrow.names
        assert "amount" in cols and "value" not in cols


def test_cdf_stream_across_rename(spark, tmp_path):
    """A change-feed stream started BEFORE a rename keeps flowing after
    it (pinned names), and a stream started AFTER reads pre-rename files
    under the new names."""
    from cashback_data_pipeline_spark.streaming import cdf_source

    t = str(tmp_path / "t")
    M.write_table(
        spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS amount"), t
    )
    M.rename_column(t, "amount", "value")
    M.write_table(
        spark.range(10, 15).selectExpr("id AS k", "CAST(id AS DOUBLE) AS value"),
        t,
        mode="append",
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = cdf_source.read_manifest_stream(spark, t, startingVersion=0)
    assert stream.schema.fieldNames() == ["k", "value"]
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.columns == ["k", "value"]
    assert sorted(r["k"] for r in got.collect()) == list(range(15))
