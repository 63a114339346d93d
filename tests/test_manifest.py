"""Manifest commit protocol (VERDICT r4 item 7): multi-writer safety +
reader pinning over immutable data files and an atomic version CAS.

Every test runs twice — once on a plain local path (LocalLogStore,
O_EXCL-link CAS) and once on a ``file://`` URI (HadoopFsLogStore,
FileContext no-overwrite rename through the Spark JVM) — proving the
protocol above the LogStore seam is storage-agnostic (VERDICT r6 #1).
Store-primitive contract tests live in tests/test_logstore.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M


@pytest.fixture(params=["local", "hadoop-fs"])
def mk_table(request, tmp_path):
    """Factory for a table root on the parameterized store."""

    def _mk(name: str = "t") -> str:
        p = str(tmp_path / name)
        return p if request.param == "local" else "file://" + p

    return _mk


def _local(table: str) -> str:
    """The on-disk directory behind either store's table root."""
    return table.removeprefix("file://")


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.concat(F.lit(tag), F.col("id")).alias("v")
    )


def test_write_append_read_roundtrip(spark, mk_table):
    t = mk_table()
    v1 = M.write_table(_df(spark, 0, 10), t)
    v2 = M.write_table(_df(spark, 10, 15), t, mode="append")
    assert (v1, v2) == (1, 2)
    assert M.read_table(spark, t).count() == 15
    # time travel: version 1 still reads exactly its own files
    assert M.read_table(spark, t, version=1).count() == 10


def test_reader_pinned_across_commits_and_compaction(spark, mk_table):
    """A reader that resolved its snapshot must be unaffected by any
    number of later commits, compactions, and even vacuum within the
    retention horizon — no torn reads, byte-identical result."""
    t = mk_table()
    M.write_table(_df(spark, 0, 100), t)
    pinned = M.read_table(spark, t)  # resolves v1's file list NOW
    M.write_table(_df(spark, 100, 200), t, mode="append")   # v2
    M.compact_table(spark, t, n_files=2)                    # v3
    M.write_table(_df(spark, 0, 5, tag="z"), t)             # v4 overwrite
    M.vacuum(t, keep_last=4, min_age_s=0)                   # keeps v1 files
    assert pinned.count() == 100
    assert sorted(r["k"] for r in pinned.collect()) == list(range(100))


def test_two_interleaved_compactions_serialize(spark, mk_table):
    """The verdict's 'done' case: compaction A snapshots, compaction B
    runs fully and commits first; A's CAS must FAIL, its half-done
    rewrite must stay invisible, and its retry must succeed against B's
    output. No reader at any point can observe a torn state."""
    t = mk_table()
    M.write_table(_df(spark, 0, 50), t)
    M.write_table(_df(spark, 50, 80), t, mode="append")  # v2, two data dirs

    # --- compaction A: snapshot + rewrite, but DON'T commit yet
    cur_a = M.current_version(t)
    snap_a = M.read_table(spark, t, cur_a)
    files_a = M._write_data_files(snap_a.coalesce(1), t)

    # --- compaction B: runs start-to-finish, wins version 3
    assert M.compact_table(spark, t, n_files=2) == 3

    # --- A tries to publish version cur_a+1 = 3: must lose the CAS
    assert not M._try_commit(t, cur_a + 1, files_a, cur_a, snap_a.schema.json())
    # A's orphan files are invisible: current read = B's compaction
    assert M.read_table(spark, t).count() == 80
    b_files = set(M.read_manifest(t, 3)["files"])
    assert not (set(files_a) & b_files)

    # --- A retries via the public path: commits v4 on TOP of B
    assert M.compact_table(spark, t, n_files=1) == 4
    assert M.read_table(spark, t).count() == 80
    assert sorted(r["k"] for r in M.read_table(spark, t).collect()) == list(range(80))

    # vacuum drops A's orphaned rewrite dir but nothing referenced
    removed = M.vacuum(t, keep_last=2, min_age_s=0)
    assert M.read_table(spark, t).count() == 80
    assert M.read_table(spark, t, version=3).count() == 80  # within horizon
    orphan_dirs = {f.replace(os.sep, "/").split("/")[1] for f in files_a}
    assert orphan_dirs <= {os.path.basename(d) for d in removed}


def test_concurrent_upserts_serialize_not_last_writer_wins(spark, mk_table):
    """Two upserts racing from the same base version must SERIALIZE:
    the loser recomputes against the winner, so both batches' keys land."""
    t = mk_table()
    M.write_table(_df(spark, 0, 10), t)

    # upsert A prepares against v1 but B commits first
    a_incoming = _df(spark, 5, 12, tag="A")
    b_incoming = _df(spark, 8, 15, tag="B")
    assert M.upsert_table(spark, b_incoming, t, key="k") == 2
    assert M.upsert_table(spark, a_incoming, t, key="k") == 3

    rows = {r["k"]: r["v"] for r in M.read_table(spark, t).collect()}
    assert set(rows) == set(range(15))
    # A committed last, so its versions of 5..11 win; B keeps 12..14
    assert all(rows[k].startswith("A") for k in range(5, 12))
    assert all(rows[k].startswith("B") for k in range(12, 15))
    assert all(rows[k].startswith("a") for k in range(0, 5))


def test_empty_table_commit_and_read(spark, mk_table):
    t = mk_table()
    empty = _df(spark, 0, 0)
    M.write_table(empty, t)
    out = M.read_table(spark, t)
    assert out.count() == 0 and out.columns == ["k", "v"]


def test_write_table_rejects_unknown_mode(spark, mk_table):
    with pytest.raises(ValueError, match="mode"):
        M.write_table(_df(spark, 0, 1), mk_table(), mode="merge")


def test_vacuum_spares_young_inflight_data(spark, mk_table):
    """An unreferenced data dir younger than the retention window may be
    a commit IN PROGRESS (data lands before its manifest) — vacuum must
    not delete it, and the pending commit must still succeed."""
    t = mk_table()
    M.write_table(_df(spark, 0, 10), t)
    files = M._write_data_files(_df(spark, 10, 20), t)  # pre-commit state
    assert M.vacuum(t, keep_last=1) == []  # young: protected
    cur = M.current_version(t)
    base = M.read_manifest(t, cur)["files"]
    assert M._try_commit(t, cur + 1, base + files, cur, _df(spark, 0, 1).schema.json())
    assert M.read_table(spark, t).count() == 20


def test_vacuum_prune_manifests_reclaims_old_log(spark, mk_table):
    """Opt-in manifest retention (round 8, the Delta log-cleanup idea):
    aged manifests beyond the keep_last horizon are removed, the horizon
    itself survives, young manifests survive regardless, and history
    walkers tolerate the gaps."""
    t = mk_table()
    for i in range(6):
        M.write_table(
            _df(spark, i * 10, (i + 1) * 10), t,
            mode="append" if i else "overwrite", meta={"epoch": i},
        )
    assert M.current_version(t) == 6
    # default: nothing pruned even when aged
    M.vacuum(t, keep_last=2, min_age_s=0.0)
    assert M.read_manifest(t, 1)["version"] == 1
    # young manifests survive even with prune_manifests
    M.vacuum(t, keep_last=2, min_age_s=3600.0, prune_manifests=True)
    assert M.read_manifest(t, 1)["version"] == 1
    # aged + opted-in: v1-v4 go, horizon v5-v6 stays readable
    M.vacuum(t, keep_last=2, min_age_s=0.0, prune_manifests=True)
    for v in (1, 2, 3, 4):
        with pytest.raises(FileNotFoundError):
            M.read_manifest(t, v)
    assert M.read_table(spark, t, version=5).count() == 50
    assert M.read_table(spark, t).count() == 60
    assert M.current_version(t) == 6
    # history walkers skip the pruned gap instead of failing
    assert M.committed_meta_values(t, "epoch") == {4, 5}
    # appends keep committing on the pruned log
    assert M.write_table(_df(spark, 60, 70), t, mode="append") == 7


def test_upsert_and_append_prune_files_with_key_stats(spark, mk_table):
    """File-pruned MERGE (round 8, the Delta MERGE optimization): on a
    key-clustered table, an upsert touching a narrow key range rewrites
    ONLY the straddling files — the others carry forward verbatim — and
    the idempotent append's key scan reads only candidate files. Stats
    survive both ops (appends previously dropped them)."""
    t = mk_table()
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    v1 = M.write_table(df, t, cluster_by=["k"], cluster_files=8)
    m1 = M.read_manifest(t, v1)
    n_files = len(m1["files"])
    assert n_files >= 8

    incoming = spark.createDataFrame(
        [(k, f"new{k}") for k in (10, 11, 12, 100, 101)], "k long, v string"
    )
    v2 = M.upsert_table(spark, incoming, t, key="k")
    m2 = M.read_manifest(t, v2)
    carried = set(m2["files"]) & set(m1["files"])
    assert len(carried) >= n_files - 2  # only the 10-12-straddling file(s) rewrote
    back = {r["k"]: r["v"] for r in M.read_table(spark, t).collect()}
    assert len(back) == 102
    assert back[10] == "new10" and back[100] == "new100" and back[50] == "50"
    assert set(m2["stats"]) == set(m2["files"])  # stats refreshed, not eroded

    # append-if-absent: dup keys dropped via a candidate-file-only key
    # scan; new keys land; stats carried forward + fresh entries
    batch = spark.createDataFrame(
        [(k, f"x{k}") for k in (10, 50, 200, 201, 202)], "k long, v string"
    )
    n = M.append_table_if_absent(spark, batch, t, key="k")
    assert n == 3
    m3 = M.read_manifest(t, M.current_version(t))
    assert set(m3["stats"]) == set(m3["files"])
    back = {r["k"]: r["v"] for r in M.read_table(spark, t).collect()}
    assert back[10] == "new10" and back[50] == "50" and back[200] == "x200"
    # replay: exact no-op
    assert M.append_table_if_absent(spark, batch, t, key="k") == 0
    # the pruning stayed SOUND: the merged table equals the naive result
    assert sorted(back) == sorted(set(range(100)) | {100, 101, 200, 201, 202})


def test_timestamp_time_travel(spark, mk_table):
    """read_table(as_of_ts=): the highest version published at or before
    the instant — before-creation and version+ts-both are loud; the
    publication clock is the store's manifest mtime."""
    import time

    t = mk_table()
    M.write_table(_df(spark, 0, 10), t)
    t1 = time.time()
    time.sleep(1.1)  # store mtimes may be second-granular
    M.write_table(_df(spark, 10, 30), t, mode="append")
    assert M.version_at(t, t1) == 1
    assert M.version_at(t, time.time()) == 2
    assert M.read_table(spark, t, as_of_ts=t1).count() == 10
    assert M.read_table(spark, t, as_of_ts=time.time()).count() == 30
    with pytest.raises(ValueError, match="no version at or before"):
        M.version_at(t, t1 - 3600)
    with pytest.raises(ValueError, match="not both"):
        M.read_table(spark, t, version=1, as_of_ts=t1)


def test_manifest_readers_never_see_partial_commit(spark, mk_table):
    """The version file appears atomically with full content (temp +
    create-if-absent), so no .tmp_ residue becomes a version and every
    published manifest parses."""
    t = mk_table()
    for i in range(5):
        M.write_table(_df(spark, i * 10, i * 10 + 10), t, mode="append")
    import glob as g

    assert not g.glob(os.path.join(_local(t), "_manifests", ".tmp_*"))
    for v in range(1, 6):
        assert M.read_manifest(t, v)["version"] == v
