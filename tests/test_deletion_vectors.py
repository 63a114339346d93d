"""Merge-on-read DELETE via deletion vectors (sinks/manifest.py).

Contract: ``delete_where(mode="merge_on_read")`` commits a
(file, row_index) tombstone relation instead of rewriting files; every
reader path (snapshot, skip-pruned, MERGE, NOT-EXISTS append, DML
rewrite) applies it; compaction materializes the deletes and drops the
vectors; the change feed and CDF stream treat a DV change as a rewrite,
never a silent miss; vacuum keeps DV dirs alive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M


def _orders(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )


def _table(spark, tmp_path, n=1000, files=4):
    t = str(tmp_path / "t")
    M.write_table(_orders(spark, n).repartition(files, "k"), t, stats_cols=["k"])
    return t


def test_mor_delete_is_exact_and_rewrites_nothing(spark, tmp_path):
    t = _table(spark, tmp_path)
    before = M.read_manifest(t, M.current_version(t))
    v = M.delete_where(spark, t, ("g", "==", 3), mode="merge_on_read")
    m = M.read_manifest(t, v)
    assert m["files"] == before["files"]  # zero data files rewritten
    assert m.get("dv_files"), "no deletion vector committed"
    assert m["meta"]["delete"]["rows_deleted"] == 143  # ids ≡ 3 (mod 7) in [0,1000)
    got = sorted(r.k for r in M.read_table(spark, t).collect())
    assert got == [i for i in range(1000) if i % 7 != 3]
    # NULL predicate semantics: never deletes (rows survive) — same as COW
    v2 = M.delete_where(
        spark, t, ("v", "<", -1.0), mode="merge_on_read"
    )  # matches nothing
    assert M.read_table(spark, t).count() == 857
    # skip-pruned read composes with the DV anti-join
    narrow = M.read_table(spark, t, skip=[("k", ">=", 10), ("k", "<", 24)])
    assert sorted(r.k for r in narrow.collect()) == [
        i for i in range(10, 24) if i % 7 != 3
    ]


def test_mor_redelete_is_idempotent_no_version_churn(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = M.delete_where(spark, t, ("g", "==", 0), mode="merge_on_read")
    v2 = M.delete_where(spark, t, ("g", "==", 0), mode="merge_on_read")
    assert v2 == v1  # every matching row already tombstoned — no commit
    assert M.read_table(spark, t).count() == 1000 - 143


def test_merge_and_notexists_append_respect_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path)
    M.delete_where(spark, t, ("k", "in", [5, 6, 7]), mode="merge_on_read")
    # MERGE on a deleted key: inserts exactly one fresh row, no resurrection
    up = spark.createDataFrame([(5, 99, 0.0)], "k long, g long, v double")
    M.upsert_table(spark, up, t, key="k")
    rows = {r.k: r.g for r in M.read_table(spark, t).filter(F.col("k") < 10).collect()}
    assert rows[5] == 99 and 6 not in rows and 7 not in rows
    # NOT-EXISTS append re-admits a deleted key (it IS absent)
    back = spark.createDataFrame([(6, 6 % 7, 9.0), (1, 1, 1.0)], "k long, g long, v double")
    n = M.append_table_if_absent(spark, back, t, key="k")
    assert n == 1  # k=6 re-admitted; k=1 still present, screened out
    rows = {r.k: r.v for r in M.read_table(spark, t).filter(F.col("k") < 10).collect()}
    assert rows[6] == 9.0 and 7 not in rows


def test_cow_rewrite_on_dv_table_does_not_resurrect(spark, tmp_path):
    t = _table(spark, tmp_path)
    M.delete_where(spark, t, ("g", "==", 2), mode="merge_on_read")
    # a copy-on-write UPDATE touching the same files must keep the
    # tombstoned rows gone (candidates are read DV-applied)
    M.update_where(spark, t, {"v": "v + 1000"}, [("k", "<", 100)])
    got = sorted(r.k for r in M.read_table(spark, t).collect())
    assert got == [i for i in range(1000) if i % 7 != 2]
    assert M.read_table(spark, t).filter((F.col("k") == 1)).first().v == 1001.5


def test_compaction_materializes_and_drops_vectors(spark, tmp_path):
    t = _table(spark, tmp_path)
    M.delete_where(spark, t, ("g", "==", 1), mode="merge_on_read")
    want = sorted(r.k for r in M.read_table(spark, t).collect())
    v = M.compact_table(spark, t, n_files=2)
    m = M.read_manifest(t, v)
    assert not m.get("dv_files"), "compaction must drop materialized vectors"
    assert sorted(r.k for r in M.read_table(spark, t).collect()) == want


def test_change_feed_treats_dv_change_as_rewrite(spark, tmp_path):
    t = _table(spark, tmp_path)
    v1 = M.current_version(t)
    M.delete_where(spark, t, ("g", "==", 4), mode="merge_on_read")
    with pytest.raises(ValueError, match="deletion vectors"):
        M.read_changes(spark, t, from_version=v1)
    # the keyed row-level diff emits exactly the deletes, DV-applied
    delta = M.read_changes_rows(spark, t, from_version=v1, key="k")
    by_type = {r.k: r._change_type for r in delta.collect()}
    assert set(by_type.values()) == {"delete"}
    assert sorted(by_type) == [i for i in range(1000) if i % 7 == 4]


def test_cdf_stream_raises_or_skips_dv_commits(spark, tmp_path):
    import uuid

    from cashback_data_pipeline_spark.streaming import cdf_source

    t = str(tmp_path / "t")
    M.write_table(_orders(spark, 100), t, mode="append")
    M.delete_where(spark, t, ("g", "==", 5), mode="merge_on_read")
    M.write_table(
        _orders(spark, 50).withColumn("k", F.col("k") + 1000), t, mode="append"
    )

    def drain(**opts):
        stream = cdf_source.read_manifest_stream(spark, t, **opts)
        name = f"dv_{uuid.uuid4().hex[:8]}"
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)

    with pytest.raises(Exception, match="deletion vectors"):
        drain()
    got = drain(skipChangeCommits="true")
    # v1's 100 raw rows + v3's 50; the DV commit skipped entirely
    assert got.count() == 150


def test_vacuum_keeps_dv_dirs_alive(spark, tmp_path):
    t = _table(spark, tmp_path)
    M.delete_where(spark, t, ("g", "==", 6), mode="merge_on_read")
    M.write_table(_orders(spark, 10).withColumn("k", F.col("k") + 5000), t, mode="append")
    removed = M.vacuum(t, keep_last=1, min_age_s=0.0)
    got = sorted(r.k for r in M.read_table(spark, t).collect())
    assert got == [i for i in range(1000) if i % 7 != 6] + list(range(5000, 5010))
    # sanity: vacuum did consider the tree (no dirs eligible is fine) and
    # the DV dir was never among the removed
    m = M.read_manifest(t, M.current_version(t))
    dv_dirs = {f.split("/")[1] for f in m["dv_files"]}
    assert all(d.rsplit("/", 1)[-1] not in dv_dirs for d in removed)


def test_changes_rows_snapshot_bootstrap_needs_no_key_on_dv_table(spark, tmp_path):
    """Review finding: from_version=0 used to demand key= once the table
    carried deletion vectors, though the bootstrap path never uses it."""
    t = _table(spark, tmp_path, n=100, files=2)
    M.delete_where(spark, t, ("g", "==", 0), mode="merge_on_read")
    snap = M.read_changes_rows(spark, t, from_version=0)  # no key
    assert snap.filter(F.col("_change_type") != "insert").count() == 0
    assert snap.count() == 100 - 15  # DV applied in the bootstrap
