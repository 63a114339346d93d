"""Coverage for repair operators (SURVEY §2 F4/F5, J2, E10-E12) and the
source-reader layer (S1-S6)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cashback_data_pipeline_spark.operators import repair
from cashback_data_pipeline_spark.schemas import TRANSACTIONS_RAW
from cashback_data_pipeline_spark.sources import (
    read_csv,
    read_json_records,
    read_jsonl,
    read_table_with_fallback,
)


@pytest.fixture()
def repairable(spark):
    rows = [
        # (id, exchange_rate_id, amount, descr, reward_type)
        (1, "x1", 10.0, "SHOP A", "DAILY_REBATE_DISTRIBUTION"),
        (2, "x1", None, None, "DAILY_REBATE_DISTRIBUTION"),   # donor-fillable from x1
        (3, "x2", None, None, "DAILY_REBATE_DISTRIBUTION"),   # no donor -> stays null
        (4, "x2", None, None, "REBATE_BONUS"),                # bonus: never a candidate
    ]
    return spark.createDataFrame(
        rows, "id int, exchange_rate_id string, amount double, descr string, reward_type string"
    )


def test_repair_candidates_f5(spark, repairable):
    cands = repair.repair_candidates(repairable, "amount")
    assert sorted(r["id"] for r in cands.collect()) == [2, 3]


def test_fill_from_donor_group_j2(spark, repairable):
    filled = repair.fill_from_donor_group(repairable, "exchange_rate_id", ["amount", "descr"])
    rows = {r["id"]: r for r in filled.collect()}
    assert rows[2]["amount"] == 10.0 and rows[2]["descr"] == "SHOP A"
    assert rows[3]["amount"] is None  # group x2 has no donor
    assert rows[1]["amount"] == 10.0  # donors untouched


def test_fill_from_sibling_with_scale_e10_e11(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 300.0, 7.0)], "id int, amount double, fiat double"
    )
    out = {r["id"]: r["amount"] for r in repair.fill_from_sibling(df, "amount", "fiat", scale=100).collect()}
    assert out[1] == 500.0  # filled from sibling * 100 (api.py:137)
    assert out[2] == 300.0  # existing value wins


def test_drop_unrepairable_f4(spark, repairable):
    kept = repair.drop_unrepairable(repairable, ["amount", "descr"])
    assert sorted(r["id"] for r in kept.collect()) == [1, 4]  # 4 kept: REBATE_BONUS


def test_format_number_e12(spark):
    # E12 — minor-units int -> "xx.yy" display string (api.py:177)
    df = spark.createDataFrame([(12345,), (99,)], "pence long")
    got = [r["s"] for r in df.select(F.format_number(F.col("pence") / 100, 2).alias("s")).collect()]
    assert got == ["123.45", "0.99"]


def test_read_csv_allstring_vs_typed(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as fh:
        fh.write("id,amount\na,12\nb,oops\n")
    untyped = read_csv(spark, p)
    assert dict(untyped.dtypes) == {"id": "string", "amount": "string"}
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("amount", T.LongType())]
    )
    typed = read_csv(spark, p, schema=schema)
    rows = {r["id"]: r["amount"] for r in typed.collect()}
    assert rows == {"a": 12, "b": None}  # lenient: bad value -> null


def test_read_jsonl_and_records(spark, tmp_path):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as fh:
        fh.write('{"id": "x", "amount": 5}\n{"id": "y", "amount": 6}\n')
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("amount", T.LongType())]
    )
    assert read_jsonl(spark, p, schema).count() == 2
    recs = read_json_records(spark, [{"id": "z", "amount": 7}], schema)
    assert recs.first()["amount"] == 7


def test_fallback_seam_s3(spark, tmp_path):
    fallback = str(tmp_path / "fixture.csv")
    with open(fallback, "w") as fh:
        fh.write("id\n1\n")
    df = read_table_with_fallback(spark, str(tmp_path / "missing.csv"), fallback)
    assert df.count() == 1
    with pytest.raises(Exception):
        read_table_with_fallback(spark, str(tmp_path / "m1.csv"), str(tmp_path / "m2.csv"))


def test_salted_join_equals_plain_join(spark, sf_dir):
    from cashback_data_pipeline_spark.operators.repair import salted_join
    from cashback_data_pipeline_spark.sources import read_testdata

    orders = read_testdata(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    customer = read_testdata(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = {(r["o_orderkey"], r["c_name"]) for r in orders.join(customer, "k").collect()}
    salted = {(r["o_orderkey"], r["c_name"]) for r in salted_join(orders, customer, "k").collect()}
    assert plain == salted


def test_schema_ddl_and_catalog_table(spark, tmp_path):
    from cashback_data_pipeline_spark.functions.catalog import register_warehouse_table, schema_ddl
    from cashback_data_pipeline_spark.schemas import CASHBACK

    ddl = schema_ddl(CASHBACK, "public.cashback", partition_cols=["transaction_date"])
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS public.cashback")
    assert "reward_id VARCHAR(256)" in ddl
    assert "plu_amount DOUBLE PRECISION" in ddl
    assert "rebate_rate INTEGER" in ddl
    assert ddl.rstrip().endswith("PARTITIONED BY (transaction_date)")
    # partition col ordered last, like the reference's columns += partition_keys
    assert ddl.index("transaction_amount DOUBLE") < ddl.index("transaction_date VARCHAR")

    # S7: mount a parquet dir as a catalog table and query it by name
    p = str(tmp_path / "wh")
    spark.range(10).selectExpr("id", "id % 3 AS g").write.partitionBy("g").parquet(p)
    spark.sql("DROP TABLE IF EXISTS wh_test")
    register_warehouse_table(spark, p, "wh_test")
    assert spark.table("wh_test").count() == 10
    parts = {r["g"] for r in spark.table("wh_test").select("g").distinct().collect()}
    assert parts == {0, 1, 2}  # partition discovery without any crawler
    spark.sql("DROP TABLE wh_test")


def test_plan_shape_pushdown_and_broadcast(spark, sf_dir):
    """Guardrails on physical plans: predicate pushdown reaches the scan
    and the dim side of the flagship join broadcasts."""
    from cashback_data_pipeline_spark.queries import monthly_segment_summary, range_filter_events

    plan = range_filter_events(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the range reaches the parquet scan -> row-group skipping. Two layouts:
    # TIMESTAMP(NANOS) testdata lands as a long (ns bounds pushed); native
    # micros testdata pushes the timestamp bound directly.
    assert (
        "GreaterThanOrEqual(ts,1704844800000000000)" in plan
        or "GreaterThanOrEqual(ts,2024-01-10T00:00" in plan
    ), plan[plan.find("PushedFilters") : plan.find("PushedFilters") + 200]

    jplan = monthly_segment_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in jplan


def test_approx_sketch_accuracy(spark, sf_dir):
    """approx_sketches now bound-checks ITSELF in-plan (the r3 verdict's
    oracle fix): it emits per-group booleans asserting |HLL−exact|/exact
    ≤ 5% and the t-digest p50 within rank tolerance, so this test (and
    the DuckDB twin) assert the booleans are TRUE for every group."""
    from cashback_data_pipeline_spark.queries import approx_sketches, distinct_agg

    approx = {r["event_type"]: r for r in approx_sketches(spark, sf_dir).collect()}
    exact_d = {r["event_type"]: r["n_users"] for r in distinct_agg(spark, sf_dir).collect()}
    assert approx.keys() == exact_d.keys()
    for et, row in approx.items():
        assert row["users_within_bounds"] is True, (et, row)
        assert row["p50_within_rank"] is True, (et, row)
        assert row["n"] > 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Bucketing co-locates join keys at write time: a join of two tables
    bucketed on the same key runs WITHOUT any Exchange (the 100 TB answer
    to repeated fact-to-fact joins)."""
    from cashback_data_pipeline_spark.sources import read_testdata

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    read_testdata(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("orders_b")
    read_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "lineitem_b"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_warehouse_layout_options(spark, tmp_path, sf_dir):
    from cashback_data_pipeline_spark.sinks import write_warehouse
    from cashback_data_pipeline_spark.sources import read_testdata

    orders = read_testdata(spark, sf_dir, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    p = str(tmp_path / "wh")
    write_warehouse(
        orders, p, partition_by="month", sort_by=["o_orderkey"], bloom_filter_cols=["o_orderkey"]
    )
    back = spark.read.parquet(p)
    assert back.count() == orders.count()
    # point lookup on the sorted+bloomed key returns correctly
    key = orders.select(F.min("o_orderkey")).first()[0]
    assert back.filter(F.col("o_orderkey") == key).count() >= 1


def test_analyze_table_collects_stats(spark, tmp_path):
    from cashback_data_pipeline_spark.functions.catalog import analyze_table, register_warehouse_table

    p = str(tmp_path / "t")
    spark.range(1000).selectExpr("id", "id % 7 AS g").write.parquet(p)
    spark.sql("DROP TABLE IF EXISTS stats_t")
    register_warehouse_table(spark, p, "stats_t")
    analyze_table(spark, "stats_t")
    analyze_table(spark, "stats_t", columns=["g"])
    detail = spark.sql("DESCRIBE TABLE EXTENDED stats_t").collect()
    stats_row = [r for r in detail if r["col_name"] == "Statistics"]
    assert stats_row and "rows" in stats_row[0]["data_type"]
    coldesc = spark.sql("DESCRIBE EXTENDED stats_t g").collect()
    ndv = {r["info_name"]: r["info_value"] for r in coldesc}
    assert ndv.get("distinct_count") == "7"
    spark.sql("DROP TABLE stats_t")


def test_quality_rules_and_unique_key(spark):
    from cashback_data_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -3.0), (3, "zz", 50.0), (3, "a", 2.0)],
        "k int, s string, v double",
    )
    res = {r["rule"]: r["n_violations"] for r in dq.check(
        df, [dq.not_null("s"), dq.in_range("v", 0, 10), dq.accepted_values("s", ["a", "b"])]
    ).collect()}
    assert res == {"not_null_s": 1, "range_v": 2, "accepted_s": 1}  # -3.0 and 50.0 both out of range
    dups = dq.unique_key_violations(df, ["k"]).collect()
    assert len(dups) == 1 and dups[0]["k"] == 3 and dups[0]["n_copies"] == 2


def test_count_distinct_salted_exact(spark, sf_dir):
    from cashback_data_pipeline_spark.operators.quality import count_distinct_salted
    from cashback_data_pipeline_spark.sources import read_testdata

    events = read_testdata(spark, sf_dir, "events")
    exact = {r["event_type"]: r["d"] for r in events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("d")).collect()}
    salted = {r["event_type"]: r["n_distinct"] for r in
              count_distinct_salted(events, "event_type", "user_id", n_salts=8).collect()}
    assert salted == exact


def test_map_type_surface(spark):
    """Map columns: build from arrays, access, explode — the §1.3 'maps
    absent in reference' surface the engine still ships."""
    df = spark.createDataFrame([(1,)], "id int").select(
        "id",
        F.create_map(F.lit("a"), F.lit(10), F.lit("b"), F.lit(20)).alias("m"),
    )
    row = df.select(
        F.map_keys("m").alias("ks"),
        F.col("m")["b"].alias("b_val"),
        F.map_concat("m", F.create_map(F.lit("c"), F.lit(30))).alias("m2"),
    ).first()
    assert sorted(row["ks"]) == ["a", "b"] and row["b_val"] == 20 and row["m2"]["c"] == 30
    exploded = df.select("id", F.explode("m").alias("k", "v")).collect()
    assert {(r["k"], r["v"]) for r in exploded} == {("a", 10), ("b", 20)}


def test_salted_join_rejects_right_outer(spark):
    from cashback_data_pipeline_spark.operators.repair import salted_join

    a = spark.createDataFrame([(1, "l")], "k int, lv string")
    b = spark.createDataFrame([(1, "r")], "k int, rv string")
    with pytest.raises(ValueError):
        salted_join(a, b, "k", how="full")
    # left join parity incl. unmatched left rows
    a2 = spark.createDataFrame([(1, "l"), (9, "m")], "k int, lv string")
    got = {(r["k"], r["rv"]) for r in salted_join(a2, b, "k", how="left").collect()}
    assert got == {(1, "r"), (9, None)}


def test_donor_fill_deterministic_winner(spark):
    from cashback_data_pipeline_spark.operators import repair

    df = spark.createDataFrame(
        [(1, "g", 5.0, "B"), (2, "g", 5.0, "A"), (3, "g", None, None)],
        "id int, grp string, amount double, descr string",
    )
    for _ in range(3):
        filled = repair.fill_from_donor_group(df, "grp", ["amount", "descr"])
        row = {r["id"]: (r["amount"], r["descr"]) for r in filled.collect()}[3]
        assert row == (5.0, "A")  # lexicographic struct-min on ties


def test_zero_shuffle_signature_plans(spark, sf_dir):
    """Regression guard on the zero-shuffle rewrites: on an input already
    at target parallelism, MinHash signatures, SimHash signatures,
    language-ID, and document chunking must plan WITHOUT any Exchange —
    they are pure map stages (SCALE.md claims this; this pins it)."""
    from cashback_data_pipeline_spark.operators import dedup, text
    from cashback_data_pipeline_spark.sources import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    wide = docs.localCheckpoint()  # a leaf already at target width

    for name, df in {
        "minhash": dedup.minhash_signatures(wide, num_hashes=64, n=3),
        "simhash": text.simhash_signatures(wide),
        "lang_id": text.lang_id_relational(wide),
        "chunks": text.chunk_documents(wide),
    }.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} plan gained a shuffle:\n{plan[:2000]}"


def test_read_testdata_normalizes_both_events_ts_layouts(spark, tmp_path):
    """The driver's events table has shipped as TIMESTAMP(NANOS) (read as
    long under nanosAsLong) and as native micros TIMESTAMP_NTZ (rejects
    unix_micros until cast). read_testdata must normalize BOTH to
    session-UTC TIMESTAMP with identical values."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cashback_data_pipeline_spark.sources import read_testdata

    ts = [dt.datetime(2024, 1, 10, 12, 0, 0, 123456), dt.datetime(2024, 1, 20, 0, 0, 0)]
    base = {"event_id": [1, 2], "user_id": [7, 8], "event_type": ["a", "b"],
            "value": [1.5, 2.5], "props": ["{}", "{}"]}
    for unit, sub in (("ns", "nanos"), ("us", "micros")):
        d = tmp_path / sub
        d.mkdir()
        tbl = pa.table({**base, "ts": pa.array(ts, type=pa.timestamp(unit))})
        pq.write_table(tbl, str(d / "events.parquet"))
    got = {}
    for sub in ("nanos", "micros"):
        df = read_testdata(spark, str(tmp_path / sub), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (sub, df.dtypes)
        got[sub] = sorted((r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect())
    assert got["nanos"] == got["micros"]
    assert got["micros"][0][1] == ts[0]
