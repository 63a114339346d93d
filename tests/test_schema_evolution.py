"""Schema-evolution contract for manifest stores (VERDICT r6 item 7):
pin the general rules the run_id evolution used ad hoc, over the two
stores that actually evolve in production — the near-dup index's
bands/sigs and the inverted index's postings.

Contract:
- an ADDED column enforced via ``apply_schema=True`` reads as NULL for
  every row of every pre-evolution file, deterministically — never
  present-or-absent depending on which file Spark sampled;
- ``merge_schema=True`` unions the per-file schemas across ≥3 file
  generations, so no generation's columns silently vanish;
- a column whose TYPE changed between generations is rejected loudly at
  read time (both modes), never silently coerced;
- the two modes agree on the data they both see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cashback_data_pipeline_spark.sinks import manifest as M


def _commit_generation(spark, table, store, df, version, parent, base_files):
    cid = M.new_commit_id()
    files = M.write_store_files(df, table, cid, store)
    assert M._try_commit(table, version, base_files + files, parent, df.schema.json())
    return base_files + files


@pytest.fixture()
def bands_table(spark, tmp_path):
    """A near-dup bands store spanning THREE schema generations:
    g1 (id, band, bh), g2 (+src_epoch), g3 (+src_run)."""
    t = str(tmp_path / "bands_idx")
    g1 = spark.createDataFrame([(1, 0, 11)], "id long, band int, bh int")
    g2 = spark.createDataFrame([(2, 1, 22, 5)], "id long, band int, bh int, src_epoch int")
    g3 = spark.createDataFrame(
        [(3, 2, 33, 6, "runA")], "id long, band int, bh int, src_epoch int, src_run string"
    )
    files = _commit_generation(spark, t, "bands", g1, 1, None, [])
    files = _commit_generation(spark, t, "bands", g2, 2, 1, files)
    _commit_generation(spark, t, "bands", g3, 3, 2, files)
    return t


FULL_BANDS = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bh", T.IntegerType()),
        T.StructField("src_epoch", T.IntegerType()),
        T.StructField("src_run", T.StringType()),
    ]
)


def test_added_columns_read_null_on_old_files(spark, bands_table):
    out = M.read_store(
        spark, bands_table, "bands", schema=FULL_BANDS, apply_schema=True
    )
    rows = {r["id"]: (r["src_epoch"], r["src_run"]) for r in out.collect()}
    assert rows == {1: (None, None), 2: (5, None), 3: (6, "runA")}
    # deterministic: a second read gives the identical result, column set
    # never depends on file sampling order
    rows2 = {
        r["id"]: (r["src_epoch"], r["src_run"])
        for r in M.read_store(
            spark, bands_table, "bands", schema=FULL_BANDS, apply_schema=True
        ).collect()
    }
    assert rows2 == rows


def test_merge_schema_unions_three_generations(spark, bands_table):
    out = M.read_store(spark, bands_table, "bands", merge_schema=True)
    assert set(out.columns) == {"id", "band", "bh", "src_epoch", "src_run"}
    rows = {r["id"]: (r["src_epoch"], r["src_run"]) for r in out.collect()}
    assert rows == {1: (None, None), 2: (5, None), 3: (6, "runA")}


def test_modes_agree_on_shared_data(spark, bands_table):
    enforced = M.read_store(
        spark, bands_table, "bands", schema=FULL_BANDS, apply_schema=True
    )
    merged = M.read_store(spark, bands_table, "bands", merge_schema=True).select(
        *[f.name for f in FULL_BANDS.fields]
    )
    a = {tuple(r) for r in enforced.collect()}
    b = {tuple(r) for r in merged.collect()}
    assert a == b


def test_type_change_rejected_loudly(spark, tmp_path):
    """A postings store whose ``tf`` column changed int→string between
    generations: both read modes must FAIL, never silently coerce one
    generation's values."""
    t = str(tmp_path / "postings_idx")
    g1 = spark.createDataFrame([(1, "alpha", 3)], "doc_id long, term string, tf int")
    g2 = spark.createDataFrame([(2, "beta", "many")], "doc_id long, term string, tf string")
    files = _commit_generation(spark, t, "postings", g1, 1, None, [])
    _commit_generation(spark, t, "postings", g2, 2, 1, files)

    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        M.read_store(spark, t, "postings", merge_schema=True).collect()
    enforced = M.read_store(
        spark,
        t,
        "postings",
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("term", T.StringType()),
                T.StructField("tf", T.IntegerType()),
            ]
        ),
        apply_schema=True,
    )
    with pytest.raises(Exception, match="(?i)parquet|convert|type|INT32"):
        enforced.collect()


def test_vacuum_run_partitions_retires_old_runs(spark, tmp_path):
    """VERDICT r6 item 8: ``__run=`` namespaces accrete one tree per
    stream restart; the retention sweep reclaims retired runs without
    breaking read_epoch_table over the survivors."""
    from cashback_data_pipeline_spark.streaming.jobs import (
        _write_epoch_partition,
        read_epoch_table,
        vacuum_run_partitions,
    )

    out = str(tmp_path / "routed")
    for i, run in enumerate(["runA", "runB", "runC"]):
        df = spark.createDataFrame([(i, f"doc-{i}")], "doc_id long, text string")
        _write_epoch_partition(df, f"{out}/__run={run}", epoch_id=0)

    # keep_last: the two newest trees survive
    removed = vacuum_run_partitions(out, keep_last=2)
    assert [p.rsplit("/", 1)[-1] for p in removed] == ["__run=runA"]
    assert {r["doc_id"] for r in read_epoch_table(spark, out).collect()} == {1, 2}

    # explicit keep list
    removed = vacuum_run_partitions(out, keep_runs=["runC"])
    assert [p.rsplit("/", 1)[-1] for p in removed] == ["__run=runB"]
    assert {r["doc_id"] for r in read_epoch_table(spark, out).collect()} == {2}

    # guard rails: mode selection and flat sinks
    with pytest.raises(ValueError, match="exactly one"):
        vacuum_run_partitions(out)
    flat = str(tmp_path / "flat")
    _write_epoch_partition(
        spark.createDataFrame([(9, "x")], "doc_id long, text string"), flat, 0
    )
    with pytest.raises(ValueError, match="flat __epoch"):
        vacuum_run_partitions(flat, keep_last=1)
    # missing sink is a no-op, not an error
    assert vacuum_run_partitions(str(tmp_path / "nope"), keep_last=1) == []

# ---------------------------------------------------------------------------
# Explicit metadata-only evolution: ADD COLUMN + type widening (r9 item 6)
# ---------------------------------------------------------------------------


def test_add_column_is_metadata_only_and_null_fills(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).selectExpr("CAST(id AS INT) AS k", "CAST(id AS STRING) AS v")
    M.write_table(df, t)
    files_v1 = M.read_manifest(t, 1)["files"]
    v = M.add_column(t, "score", "double")
    assert M.read_manifest(t, v)["files"] == files_v1
    out = M.read_table(spark, t)
    assert out.columns == ["k", "v", "score"]
    assert out.filter(F.col("score").isNull()).count() == 10
    assert M.read_table(spark, t, version=1).columns == ["k", "v"]
    with pytest.raises(ValueError, match="already exists"):
        M.add_column(t, "v", "double")


def test_widen_column_reads_narrow_files_and_rejects_narrowing(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id AS FLOAT) AS x", "CAST(id AS STRING) AS v"
    )
    M.write_table(df, t)
    files_v1 = M.read_manifest(t, 1)["files"]
    M.widen_column(t, "k", "bigint")
    v = M.widen_column(t, "x", "double")
    assert M.read_manifest(t, v)["files"] == files_v1  # zero rewrite
    out = M.read_table(spark, t)
    assert out.schema["k"].dataType.simpleString() == "bigint"
    assert out.schema["x"].dataType.simpleString() == "double"
    assert out.agg(F.sum("k")).first()[0] == 45  # INT32 files resolve wider
    # appends under the wide type coexist with narrow old files
    M.write_table(
        spark.range(10, 12).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS x", "CAST(id AS STRING) AS v"
        ),
        t, mode="append",
    )
    assert M.read_table(spark, t).agg(F.sum("k")).first()[0] == 66
    for bad in ("int", "string", "float"):
        with pytest.raises(ValueError, match="widening"):
            M.widen_column(t, "k", bad)
    with pytest.raises(ValueError, match="no column"):
        M.widen_column(t, "nope", "bigint")


def test_readd_after_drop_never_resurrects_old_data(spark, tmp_path):
    """A re-added column on a mapped table gets a FRESH physical name,
    so the dropped column's bytes in old files can never read back."""
    t = str(tmp_path / "t")
    df = spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    M.write_table(df, t)
    M.drop_column(t, "v")  # table becomes column-mapped
    M.add_column(t, "v", "bigint")
    out = M.read_table(spark, t)
    assert out.schema["v"].dataType.simpleString() == "bigint"
    assert out.filter(F.col("v").isNotNull()).count() == 0
    # and new writes under the re-added name round-trip
    M.write_table(
        spark.range(5, 7).selectExpr("id AS k", "id AS v"), t, mode="append"
    )
    assert M.read_table(spark, t).filter(F.col("v").isNotNull()).count() == 2
    # time travel keeps each version's own shape
    assert M.read_table(spark, t, version=1).columns == ["k", "v"]
    assert M.read_table(spark, t, version=2).columns == ["k"]


def test_add_and_widen_sql_front_door(spark, tmp_path):
    from cashback_data_pipeline_spark.sinks import sql_dml

    t = str(tmp_path / "t")
    M.write_table(
        spark.range(4).selectExpr("CAST(id AS INT) AS k", "CAST(id AS STRING) AS v"), t
    )
    cat = {"t": t}
    sql_dml.execute(spark, "ALTER TABLE t ADD COLUMN score double", cat)
    sql_dml.execute(spark, "ALTER TABLE t ALTER COLUMN k TYPE bigint", cat)
    out = M.read_table(spark, t)
    assert out.columns == ["k", "v", "score"]
    assert out.schema["k"].dataType.simpleString() == "bigint"
    with pytest.raises(ValueError, match="widening"):
        sql_dml.execute(spark, "ALTER TABLE t ALTER COLUMN k TYPE int", cat)
