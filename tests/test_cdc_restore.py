"""RESTORE (rollback-as-forward-commit), relation-driven keyed DELETE,
and APPLY CHANGES INTO (sinks/manifest.py round 8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_restore_is_a_forward_metadata_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t, stats_cols=["k"])
    M.upsert_table(spark, _df(spark, [(2, "B"), (4, "d")]), t, key="k")
    M.delete_where(spark, t, ("k", "==", 1))
    v = M.restore_table(t, version=1)
    assert v == 4  # forward commit, history intact
    got = {r.k: r.v for r in M.read_table(spark, t).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    m = M.read_manifest(t, v)
    assert m["meta"]["restore"] == {"of_version": 1}
    assert m["files"] == M.read_manifest(t, 1)["files"]  # zero data movement
    # the bad history stays time-travelable
    assert {r.k for r in M.read_table(spark, t, version=3).collect()} == {2, 3, 4}
    # stats restored with the files: skipping still works
    assert M.read_table(spark, t, skip=("k", "==", 2)).count() == 1
    with pytest.raises(ValueError, match="future version"):
        M.restore_table(t, version=99)
    with pytest.raises(ValueError, match="exactly one"):
        M.restore_table(t)


def test_restore_carries_deletion_vectors(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, [(i, f"v{i}") for i in range(20)]), t)
    M.delete_where(spark, t, ("k", "<", 5), mode="merge_on_read")  # v2: DV
    M.write_table(_df(spark, [(100, "x")]), t, mode="append")  # v3
    M.restore_table(t, version=2)
    got = sorted(r.k for r in M.read_table(spark, t).collect())
    assert got == list(range(5, 20))  # DV in effect, v3's append gone


def test_delete_keys_prunes_and_removes_exactly(spark, tmp_path):
    t = str(tmp_path / "t")
    rows = [(i, f"v{i}") for i in range(1000)]
    M.write_table(_df(spark, rows), t, cluster_by=["k"], cluster_files=8)
    keys = spark.createDataFrame([(3,), (3,), (700,)], "k long")  # dup keys fine
    v = M.delete_keys(spark, keys, t, key="k")
    m = M.read_manifest(t, v)
    assert m["meta"]["delete"]["carried"] >= 6  # only straddling files rewrote
    got = sorted(r.k for r in M.read_table(spark, t).collect())
    assert got == [i for i in range(1000) if i not in (3, 700)]
    # absent keys: no version churn
    v2 = M.delete_keys(spark, spark.createDataFrame([(99999,)], "k long"), t, key="k")
    assert v2 == v


def test_apply_changes_folds_a_cdc_window_into_the_target(spark, tmp_path):
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    v1_rows = [(i, f"v{i}") for i in range(100)]
    M.write_table(_df(spark, v1_rows), src, stats_cols=["k"])
    # seed the follower from the v1 snapshot
    M.write_table(M.read_table(spark, src, 1), tgt, stats_cols=["k"])
    # source moves on: updates+inserts, then an overwrite dropping a slice
    M.upsert_table(spark, _df(spark, [(7, "V7"), (200, "new")]), src, key="k")
    snap = M.read_table(spark, src)
    M.write_table(snap.filter(F.col("k") % 10 != 3), src, mode="overwrite")
    counts = M.apply_changes(spark, src, tgt, key="k", from_version=1)
    assert counts["deletes"] == 10  # ks ≡ 3 (mod 10) in [0,100)
    want = sorted(tuple(r) for r in M.read_table(spark, src).collect())
    got = sorted(tuple(r) for r in M.read_table(spark, tgt).collect())
    assert got == want
    # re-applying the same window is idempotent
    M.apply_changes(spark, src, tgt, key="k", from_version=1)
    got2 = sorted(tuple(r) for r in M.read_table(spark, tgt).collect())
    assert got2 == want


def test_table_history_records_every_operation(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, [(i, f"v{i}") for i in range(100)]), t, stats_cols=["k"])
    M.write_table(_df(spark, [(100, "x")]), t, mode="append")
    M.upsert_table(spark, _df(spark, [(5, "V5")]), t, key="k")
    M.delete_where(spark, t, ("k", "==", 7))
    M.delete_where(spark, t, ("k", "==", 8), mode="merge_on_read")
    M.update_where(spark, t, {"v": "'u'"}, [("k", "==", 9)])
    M.compact_table(spark, t, n_files=2)
    M.restore_table(t, version=2)
    M.append_table_if_absent(spark, _df(spark, [(200, "y")]), t, key="k")
    hist = M.table_history(spark, t).orderBy("version").collect()
    assert [r.operation for r in hist] == [
        "overwrite", "append", "merge", "delete", "delete", "update",
        "compact", "restore", "append_if_absent",
    ]
    assert hist[4].n_dv_files >= 1  # the MoR delete's tombstones
    assert all(r.committed_at > 0 for r in hist)
    # gap-tolerant over a pruned log
    M.vacuum(t, keep_last=2, min_age_s=0.0, prune_manifests=True)
    hist2 = M.table_history(spark, t).collect()
    assert 0 < len(hist2) < len(hist)


def test_wap_stage_audit_publish_and_discard(spark, tmp_path):
    t = str(tmp_path / "t")
    M.write_table(_df(spark, [(i, f"v{i}") for i in range(50)]), t, stats_cols=["k"])
    v_before = M.current_version(t)
    # bad batch: staged, audited, rejected — never visible
    bad = _df(spark, [(1000, None)])
    tok_bad = M.stage_commit(bad, t)
    assert M.read_table(spark, t).count() == 50  # invisible while staged
    audited = M.read_staged(spark, t, tok_bad)
    assert audited.filter(F.col("v").isNull()).count() == 1  # audit catches it
    M.discard_staged(t, tok_bad)
    with pytest.raises(FileNotFoundError):
        M.read_staged(spark, t, tok_bad)
    # good batch: staged, audited, published atomically
    good = _df(spark, [(1000, "ok"), (1001, "ok")])
    tok = M.stage_commit(good, t, stats_cols=["k"])
    # a live stage pins its files against vacuum
    removed = M.vacuum(t, keep_last=1, min_age_s=0.0)
    assert M.read_staged(spark, t, tok).count() == 2
    v = M.publish_staged(t, tok)
    assert v == v_before + 1  # discard/vacuum never burned a version
    got = M.read_table(spark, t)
    assert got.count() == 52
    hist = {r.version: r.operation for r in M.table_history(spark, t).collect()}
    assert hist[v] == "wap_publish"
    # the token is consumed: replayed publisher cannot double-append
    with pytest.raises(FileNotFoundError):
        M.publish_staged(t, tok)
    # published stage's stats merged in: skipping works on the new files
    assert M.read_table(spark, t, skip=("k", "==", 1001)).count() == 1
