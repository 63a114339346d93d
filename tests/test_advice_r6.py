"""Regression tests for the round-6 ADVICE findings.

- streaming.jobs.compact_near_dup_index: a mixed-generation index
  (pre-src_run manifest commits next to newer ones) must keep its
  provenance columns through compaction (jobs.py:645) — single-file
  schema sampling could silently drop src_epoch/src_run from the
  compacted snapshot and break the replay guard.
- streaming.jobs.near_dup_ingest_batch: on CAS loss to a RACING ingest
  writer (not just a compaction), the id anti-join must re-run against
  the winner's sigs before retrying the commit (jobs.py:860) — else two
  writers sharing one index can both commit bands/sigs for the same doc.
- sinks.manifest append/upsert in-batch dedup: an unorderable column
  type (MapType) must not fail the whole load (manifest.py:324).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cashback_data_pipeline_spark.sinks import manifest as M


def test_compaction_keeps_provenance_on_mixed_generation_index(spark, tmp_path):
    """Build an index whose FIRST commit predates src_run (and src_epoch)
    and whose second carries both; compaction must emit a snapshot where
    every row has concrete provenance (backfilled -1/"" for the old
    generation), never a snapshot missing the columns outright."""
    from cashback_data_pipeline_spark.streaming.jobs import compact_near_dup_index

    table = str(tmp_path / "index")
    # generation 1: no provenance columns at all (pre-upgrade layout)
    old_bands = spark.createDataFrame([(1, 0, 11), (2, 1, 22)], "id long, band int, bh int")
    old_sigs = spark.createDataFrame([(1, [1, 2]), (2, [3, 4])], "id long, sig array<int>")
    cid = M.new_commit_id()
    files = M.write_store_files(old_bands, table, cid, "bands")
    files += M.write_store_files(old_sigs, table, cid, "sigs")
    assert M._try_commit(table, 1, files, None, old_bands.schema.json())
    # generation 2: full provenance
    new_bands = spark.createDataFrame(
        [(3, 0, 33, 7, "runA")], "id long, band int, bh int, src_epoch int, src_run string"
    )
    new_sigs = spark.createDataFrame(
        [(3, [5, 6], 7, "runA")], "id long, sig array<int>, src_epoch int, src_run string"
    )
    cid = M.new_commit_id()
    files2 = M.write_store_files(new_bands, table, cid, "bands")
    files2 += M.write_store_files(new_sigs, table, cid, "sigs")
    assert M._try_commit(table, 2, files + files2, 1, new_bands.schema.json())

    v = compact_near_dup_index(spark, table, n_files=1)
    assert v == 3
    for store in ("bands", "sigs"):
        snap = M.read_store(spark, table, store, version=v)
        assert "src_epoch" in snap.columns and "src_run" in snap.columns
        rows = {r["id"]: (r["src_epoch"], r["src_run"]) for r in snap.collect()}
        assert rows[1] == (-1, "") and rows[2] == (-1, "")  # backfilled sentinels
        assert rows[3] == (7, "runA")  # real provenance untouched
        assert not any(e is None or run is None for e, run in rows.values())


def test_racing_ingest_writers_never_double_index_a_doc(spark, tmp_path, monkeypatch):
    """Two ingest writers sharing one index, both screening the same
    version, both seeing doc 5 as fresh: the CAS loser must re-run its
    id anti-join against the winner's sigs and drop the doc instead of
    committing a second bands/sigs entry for it."""
    from cashback_data_pipeline_spark.streaming import jobs as J

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    fresh_text = "one two three four five six seven eight nine ten " * 3
    kw = dict(index_path=str(tmp_path / "index"), out_path=str(tmp_path / "out"), threshold=0.7)
    J.near_dup_ingest_batch(
        spark.createDataFrame([(1, base)], "doc_id long, text string"), 0, **kw
    )
    assert M.current_version(kw["index_path"]) == 1

    racer_batch = spark.createDataFrame([(5, fresh_text)], "doc_id long, text string")
    loser_batch = spark.createDataFrame([(5, fresh_text)], "doc_id long, text string")

    real_write = M.write_store_files
    fired = {"done": False}

    def race_first(*a, **k):
        # the loser has screened at v1 and is about to write its delta
        # files; the racer runs to completion first, committing doc 5
        if not fired["done"]:
            fired["done"] = True
            J.near_dup_ingest_batch(racer_batch, 99, **kw)
        return real_write(*a, **k)

    monkeypatch.setattr(M, "write_store_files", race_first)
    J.near_dup_ingest_batch(loser_batch, 1, **kw)
    monkeypatch.undo()

    sigs = M.read_store(spark, kw["index_path"], "sigs")
    counts = {r["id"]: r["n"] for r in sigs.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 1, 5: 1}  # exactly one index entry per doc
    bands = M.read_store(spark, kw["index_path"], "bands")
    assert bands.select("id").distinct().count() == 2
    # the loser found nothing left to commit: version is the racer's
    assert M.current_version(kw["index_path"]) == 2


def test_append_and_upsert_accept_map_columns(spark, tmp_path):
    """A MapType column (unorderable in Catalyst) used to fail the
    in-batch dedup window with AnalysisException; it now participates
    via its JSON rendering."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, {"a": 1}), (1, {"a": 1}), (2, {"b": 2})],
        "k long, attrs map<string,int>",
    )
    assert M.append_table_if_absent(spark, df, t, "k") == 2
    assert M.append_table_if_absent(spark, df, t, "k") == 0  # idempotent replay
    got = {r["k"]: r["attrs"] for r in M.read_table(spark, t).collect()}
    assert got == {1: {"a": 1}, 2: {"b": 2}}

    t2 = str(tmp_path / "t2")
    M.upsert_table(spark, df, t2, "k")
    upd = spark.createDataFrame([(2, {"b": 9})], "k long, attrs map<string,int>")
    M.upsert_table(spark, upd, t2, "k")
    got2 = {r["k"]: r["attrs"] for r in M.read_table(spark, t2).collect()}
    assert got2 == {1: {"a": 1}, 2: {"b": 9}}
