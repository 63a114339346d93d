"""The manifest LOG format (VERDICT r8 item 1): per-commit ACTION
records + interval parquet checkpoints + a `_last_checkpoint` pointer —
the Delta log design — replacing the full-snapshot-per-commit JSON whose
write cost grew with table size.

Pinned here:
- a commit record is O(its own change): an append's record carries only
  the added files (never the table's file list);
- every CHECKPOINT_INTERVAL-th commit writes a parquet checkpoint and
  advances the pointer; snapshots reconstruct identically from either
  side of a checkpoint boundary;
- version discovery works from the pointer (and falls back to a listing
  when the pointer is absent or stale);
- legacy full-snapshot records still read, and new action records
  stack on top of them;
- vacuum(prune_manifests=True) anchors the horizon with a checkpoint
  BEFORE pruning, so retained versions never strand;
- the in-process snapshot cache never serves a stale snapshot after a
  table is deleted and recreated at the same path.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M
from cashback_data_pipeline_spark.sinks.logstore import get_log_store


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("v")
    )


def test_append_record_is_action_sized(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, 0, 100).repartition(8), t)  # v1: 8 files
    M.write_table(_df(spark, 100, 110).coalesce(1), t, mode="append")  # v2: +1
    doc = M._read_commit_doc(t, 2)
    assert doc.get("format") == 2
    assert "files" not in doc  # never the full list
    assert len(doc["add"]) == 1 and doc["remove"] == []
    snap = M.read_manifest(t, 2)
    assert len(snap["files"]) == 9
    # an overwrite's record removes the parent's files, adds its own
    M.write_table(_df(spark, 0, 5).coalesce(1), t)  # v3
    doc3 = M._read_commit_doc(t, 3)
    assert len(doc3["remove"]) == 9 and len(doc3["add"]) == 1
    assert M.read_table(spark, t).count() == 5


def test_checkpoint_written_at_interval_and_pointer_advances(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(M.CHECKPOINT_INTERVAL + 2):
        M.write_table(
            _df(spark, i * 10, (i + 1) * 10).coalesce(1), t,
            mode="append" if i else "overwrite", meta={"epoch": i},
        )
    store = get_log_store(t)
    mdir = store.join(t, M._MANIFEST_DIR)
    assert store.exists(store.join(mdir, M._ckpt_name(M.CHECKPOINT_INTERVAL)))
    assert M._read_pointer(store, t) == M.CHECKPOINT_INTERVAL
    # snapshots agree on both sides of the checkpoint boundary
    at_ckpt = M.read_manifest(t, M.CHECKPOINT_INTERVAL)
    assert len(at_ckpt["files"]) == M.CHECKPOINT_INTERVAL
    assert at_ckpt["meta"]["epoch"] == M.CHECKPOINT_INTERVAL - 1
    past = M.read_manifest(t, M.CHECKPOINT_INTERVAL + 2)
    assert len(past["files"]) == M.CHECKPOINT_INTERVAL + 2
    assert M.read_table(spark, t).count() == (M.CHECKPOINT_INTERVAL + 2) * 10
    # time travel below the checkpoint still replays the action chain
    assert M.read_table(spark, t, version=3).count() == 30


def test_current_version_fast_path_and_fallbacks(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(M.CHECKPOINT_INTERVAL + 3):
        M.write_table(_df(spark, 0, 3).coalesce(1), t, mode="append" if i else "overwrite")
    cur = M.CHECKPOINT_INTERVAL + 3
    assert M.current_version(t) == cur
    store = get_log_store(t)
    mdir = store.join(t, M._MANIFEST_DIR)
    # corrupt pointer: hint ignored, listing fallback still right
    store.write_overwrite(mdir, M._LAST_CKPT, b"not json")
    assert M.current_version(t) == cur
    # stale-but-valid pointer: probe walks forward to the true maximum
    store.write_overwrite(mdir, M._LAST_CKPT, json.dumps({"version": 2}).encode())
    assert M.current_version(t) == cur
    # absent pointer: pure listing
    store.delete_file(store.join(mdir, M._LAST_CKPT))
    assert M.current_version(t) == cur


def test_legacy_full_snapshot_records_interoperate(spark, tmp_path):
    """A table whose history begins with pre-r9 full-snapshot records
    keeps reading, and new action records stack on top of the legacy
    anchor."""
    t = str(tmp_path / "t")
    df = _df(spark, 0, 20)
    files = M._write_data_files(df, t)
    store = get_log_store(t)
    legacy = {
        "version": 1,
        "parent": None,
        "files": sorted(files),
        "schema": df.schema.json(),
        "meta": {"operation": "overwrite"},
    }
    assert store.publish_atomic(
        store.join(t, M._MANIFEST_DIR), M._version_name(1), json.dumps(legacy)
    )
    assert M.read_table(spark, t).count() == 20
    v2 = M.write_table(_df(spark, 20, 25).coalesce(1), t, mode="append")
    assert v2 == 2
    assert "add" in M._read_commit_doc(t, 2)  # new record is an action
    assert M.read_table(spark, t).count() == 25
    assert M.read_manifest(t, 1)["files"] == sorted(files)
    hist = {r["version"]: r["n_files"] for r in M.table_history(spark, t).collect()}
    assert hist == {1: len(files), 2: len(files) + 1}


def test_prune_manifests_anchors_horizon_with_checkpoint(spark, tmp_path):
    t = str(tmp_path / "t")
    n = M.CHECKPOINT_INTERVAL + 5  # horizon's chain crosses the interval ckpt
    for i in range(n):
        M.write_table(
            _df(spark, i * 10, (i + 1) * 10).coalesce(1), t,
            mode="append" if i else "overwrite", meta={"epoch": i},
        )
    M.vacuum(t, keep_last=2, min_age_s=0.0, prune_manifests=True)
    horizon = n - 1
    store = get_log_store(t)
    mdir = store.join(t, M._MANIFEST_DIR)
    # the pruner wrote its anchor and moved the pointer before deleting
    assert store.exists(store.join(mdir, M._ckpt_name(horizon)))
    assert M._read_pointer(store, t) == horizon
    # the interval checkpoint BELOW the horizon was pruned with the log
    assert not store.exists(store.join(mdir, M._ckpt_name(M.CHECKPOINT_INTERVAL)))
    for v in (1, 2, M.CHECKPOINT_INTERVAL):
        with pytest.raises(FileNotFoundError):
            M.read_manifest(t, v)
    assert M.current_version(t) == n
    assert len(M.read_manifest(t, horizon)["files"]) == horizon
    assert M.read_table(spark, t).count() == n * 10
    # history and commits keep working over the pruned log
    assert M.committed_meta_values(t, "epoch") == {n - 2, n - 1}
    assert M.write_table(_df(spark, 0, 1).coalesce(1), t, mode="append") == n + 1


def test_meta_latest_survives_log_pruning(spark, tmp_path):
    """The Delta SetTransaction-in-checkpoint idea: checkpoints fold the
    latest value per meta key, so the streaming epoch gate survives
    vacuum(prune_manifests=True) even when every commit that stamped
    ``max_epoch`` is pruned and only non-epoch commits (compactions)
    remain in the retained log — previously the gate would read -1 and
    a replayed epoch would double-commit."""
    from cashback_data_pipeline_spark.streaming import jobs

    t = str(tmp_path / "t")
    batch = spark.createDataFrame([(1, "keep")], "id long, route string")
    for epoch in range(6):  # v1..v6 carry epoch meta (max_epoch ends at 5)
        assert jobs.route_batch_to_manifest(batch, epoch, t) is True
    for _ in range(3):  # v7..v9: compactions carry NO epoch meta
        M.compact_table(spark, t, n_files=1)
    M.vacuum(t, keep_last=2, min_age_s=0.0, prune_manifests=True)
    with pytest.raises(FileNotFoundError):
        M._read_commit_doc(t, 6)  # the last epoch-stamped record is gone
    assert M.latest_meta_value(t, "max_epoch") == 5  # folded in the anchor ckpt
    # the replay gate therefore still holds: epoch 5 is a no-op
    assert jobs.route_batch_to_manifest(batch, 5, t) is False
    assert M.read_table(spark, t).count() == 6
    # and a genuinely new epoch still commits
    assert jobs.route_batch_to_manifest(batch, 6, t) is True
    assert M.latest_meta_value(t, "max_epoch") == 6


def test_snapshot_cache_never_serves_a_recreated_table_stale(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, 0, 10, tag="old"), t)
    assert M.read_manifest(t, 1)["version"] == 1  # populates the cache
    assert M.read_table(spark, t).count() == 10
    shutil.rmtree(t)
    M.write_table(_df(spark, 0, 3, tag="new"), t)  # same path, new table
    snap = M.read_manifest(t, 1)
    assert len(snap["files"]) >= 1
    assert M.read_table(spark, t).count() == 3
    assert all(r["v"].startswith("new") for r in M.read_table(spark, t).collect())


def test_stats_carry_and_skip_pruning_across_checkpoint(spark, tmp_path):
    """Carried-file stats survive the action encoding AND the checkpoint
    round-trip: skip= pruning still proves misses after interval+2
    commits."""
    from cashback_data_pipeline_spark.sinks import filestats

    t = str(tmp_path / "t")
    for i in range(M.CHECKPOINT_INTERVAL + 2):
        chunk = spark.range(i * 100, (i + 1) * 100).selectExpr(
            "id AS k", "CAST(id AS STRING) AS v"
        )
        M.write_table(
            chunk.coalesce(1), t, mode="append" if i else "overwrite", stats_cols=["k"]
        )
    m = M.read_manifest(t, M.current_version(t))
    assert set(m["stats"]) == set(m["files"])  # every file still has stats
    kept, skipped = filestats.prune_files(m["files"], m["stats"], [("k", "<", 100)])
    assert len(kept) == 1 and skipped == M.CHECKPOINT_INTERVAL + 1
    out = M.read_table(spark, t, skip=[("k", "<", 100)])
    assert out.count() == 100
