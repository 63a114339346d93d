"""ADVICE r9 regression tests.

1. route_batch_to_manifest commits the EXTENDED column mapping its data
   files were written under (not the inherited parent mapping), so a
   later rename/drop on a batch-introduced column cannot KeyError.
2. _merge_aggregate_delta carries the bloom table property (and the
   extended mapping) across a maintenance commit instead of silently
   dropping them.
3. vacuum(prune_manifests=True) advances the `_last_checkpoint` pointer
   to the horizon even when the horizon record is a self-anchoring
   legacy full-snapshot (no checkpoint write needed), so a reader's
   stale hint can never probe into the pruned gap.
4. stats_cols are validated against the LOGICAL schema on column-mapped
   tables too (misspelled columns fail loudly, same as unmapped).
5. JPEG decode accepts T.81 quirks valid in external files: 0xFF fill
   bytes before markers (header, restart, EOI) and standalone
   length-less markers (TEM) in the pre-SOS walk.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import multimodal as mm
from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks.logstore import get_log_store
from cashback_data_pipeline_spark.streaming import jobs


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_route_batch_commits_extended_mapping(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, 0, 5).coalesce(1), t)
    M.rename_column(t, "v", "val")  # table becomes column-mapped
    batch = spark.range(5, 8).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("val"),
        F.lit("x").alias("extra"),  # NEW column introduced by the batch
    )
    assert jobs.route_batch_to_manifest(batch.coalesce(1), 0, t)
    m = M.read_manifest(t, M.current_version(t))
    assert M._mapping(m) and "extra" in M._mapping(m)
    # pre-fix: KeyError 'extra' while rebuilding the mapping
    M.rename_column(t, "extra", "extra2")
    out = M.read_table(spark, t)
    assert "extra2" in out.columns
    assert out.filter(F.col("extra2") == "x").count() == 3
    M.drop_column(t, "extra2")
    assert "extra2" not in M.read_table(spark, t).columns


def test_aggregate_maintenance_keeps_bloom_conf(spark, tmp_path):
    t = str(tmp_path / "view")
    seed = spark.createDataFrame([("a",)], "k string").select(
        "k",
        F.lit(1).cast("long").alias("n"),
        F.lit(1_500_000).cast("decimal(28,0)").alias("sum_micro"),
        F.lit(1.5).alias("min_value"),
        F.lit(1.5).alias("max_value"),
    )
    M.write_table(seed.coalesce(1), t, bloom_cols=["k"], stats_cols=["k"])
    assert M._bloom_table_conf(M.read_manifest(t, 1))
    batch = spark.createDataFrame([("a", 2.5), ("b", 0.5)], "k string, v double")
    assert jobs.maintain_aggregate_batch(batch, 0, t, ["k"], "v")
    m = M.read_manifest(t, M.current_version(t))
    # pre-fix: the first maintenance commit silently dropped the property
    assert M._bloom_table_conf(m), "bloom table property lost by maintenance commit"
    rows = {r["k"]: r["n"] for r in M.read_table(spark, t).collect()}
    assert rows == {"a": 2, "b": 1}


def test_vacuum_advances_pointer_over_legacy_horizon(spark, tmp_path):
    t = str(tmp_path / "t")
    store = get_log_store(t)
    mdir = store.join(t, M._MANIFEST_DIR)
    for v in range(1, 6):  # 5 legacy full-snapshot records
        df = _df(spark, (v - 1) * 10, v * 10).coalesce(1)
        files = M._write_data_files(df, t)
        legacy = {
            "version": v,
            "parent": v - 1 if v > 1 else None,
            "files": sorted(files),
            "schema": df.schema.json(),
            "meta": {"operation": "overwrite"},
        }
        assert store.publish_atomic(mdir, M._version_name(v), json.dumps(legacy))
    # a stale advisory pointer far below the prune horizon
    store.write_overwrite(mdir, M._LAST_CKPT, json.dumps({"version": 1}).encode())
    M.vacuum(t, keep_last=2, min_age_s=0.0, prune_manifests=True)
    # pre-fix: the legacy horizon took the needs_anchor=False branch and
    # the pointer stayed at 1 while v1..v3 were deleted underneath it
    ptr = M._read_pointer(store, t)
    assert ptr is not None and ptr >= 4, f"pointer not advanced (got {ptr})"
    assert M.current_version(t) == 5
    assert not store.exists(store.join(mdir, M._version_name(1)))


def test_stats_cols_validated_on_mapped_table(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, 0, 5).coalesce(1), t)
    M.rename_column(t, "v", "val")
    nxt = spark.range(5, 9).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    with pytest.raises(ValueError, match="nope"):
        M.write_table(nxt.coalesce(1), t, mode="append", stats_cols=["nope"])
    with pytest.raises(ValueError, match="nope"):
        M.stage_commit(nxt.coalesce(1), t, stats_cols=["nope"])
    # the valid logical name still works (translated to physical)
    M.write_table(nxt.coalesce(1), t, mode="append", stats_cols=["val"])
    assert M.read_table(spark, t).count() == 9


def _tiles(width, height, values):
    cols = width // 8
    return bytes(
        values[(y // 8) * cols + (x // 8)] for y in range(height) for x in range(width)
    )


def test_jpeg_accepts_fill_bytes_and_standalone_markers():
    vals = [((7 + 17 * k) % 128) * 2 for k in range(9)]
    px = _tiles(24, 24, vals)
    base = mm.encode_jpeg(px, 24, 24, 1, restart_interval=1)
    # header: a standalone TEM marker (no length segment) + a 0xFF fill
    # byte before the next real marker, right after SOI
    q = base[:2] + b"\xff\x01" + b"\xff" + base[2:]
    # entropy data: 0xFF fill bytes before the first restart marker (a
    # raw FF Dn in the entropy segment is always a marker — data FFs are
    # stuffed as FF 00 — so this replace cannot corrupt coefficients)
    i = q.find(b"\xff\xda")
    ln = int.from_bytes(q[i + 2 : i + 4], "big")
    head, body = q[: i + 2 + ln], q[i + 2 + ln :]
    assert b"\xff\xd0" in body
    body = body.replace(b"\xff\xd0", b"\xff\xff\xd0", 1)
    # and a run of fill bytes before EOI
    assert body.endswith(b"\xff\xd9")
    body = body[:-2] + b"\xff\xff\xff\xd9"
    img = mm.decode_jpeg(head + body)
    assert (img["width"], img["height"], img["channels"]) == (24, 24, 1)
    assert img["pixels"] == px  # constant-even-tile class stays bit-exact
