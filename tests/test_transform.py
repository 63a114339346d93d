"""Reference-parity tests for the cashback transform (SURVEY §2 active path)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cashback_data_pipeline_spark.functions import neq_null_safe
from cashback_data_pipeline_spark.operators.transform import run_reference_pipeline
from cashback_data_pipeline_spark.schemas import CASHBACK

from tests.fixtures import make_rewards, make_transactions


def _run(spark):
    return run_reference_pipeline(make_rewards(spark), make_transactions(spark))


def test_output_schema_matches_golden(spark):
    out = _run(spark)
    got = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in CASHBACK.fields}
    assert got == want


def test_left_join_drives_row_count_and_null_extends(spark):
    out = _run(spark)
    assert out.count() == 5  # rewards-side driven (J1)
    unmatched = out.filter(F.col("reward_id") == "r5").first()
    assert unmatched["transaction_id"] is None
    assert unmatched["transaction_amount"] is None


def test_e1_minor_units_conversion(spark):
    row = _run(spark).filter(F.col("reward_id") == "r1").first()
    assert row["transaction_amount"] == 17.99  # abs(-1799)/100


def test_e2_plu_price_both_branches(spark):
    out = {r["reward_id"]: r for r in _run(spark).collect()}
    # rebate_rate == 0 branch: fiat_amount_rewarded / plu_amount
    assert math.isclose(out["r2"]["plu_price"], 3143.0 / 1.5)
    # otherwise branch: (abs(transaction_amount)/100 * rate) / plu_amount
    # — transaction_amount already /100, divided by 100 AGAIN per
    # glue_script.py:47 (preserved quirk, SURVEY §7.4.2)
    assert math.isclose(out["r1"]["plu_price"], (17.99 / 100 * 3) / 0.09038461)
    assert math.isclose(out["r4"]["plu_price"], (227.77 / 100 * 5) / 2.0)


def test_e3_fiat_amount_string_after_arith(spark):
    row = _run(spark).filter(F.col("reward_id") == "r1").first()
    assert row["fiat_amount_rewarded"] == "7.98"  # abs(798)/100, cast string


def test_partition_date_is_formatted_string(spark):
    row = _run(spark).filter(F.col("reward_id") == "r1").first()
    assert row["transaction_date"] == "2024-03-23"
    assert row["transaction_timestamp"] is not None


def test_f1_null_safe_neq_keeps_null_reason(spark):
    out = _run(spark)
    kept = out.filter(neq_null_safe("reason", "Rejected by admin"))
    ids = {r["reward_id"] for r in kept.collect()}
    assert ids == {"r1", "r2", "r4", "r5"}  # r2 (null reason) kept, r3 dropped
    # plain != would wrongly drop the null-reason row — pin the trap
    naive = out.filter(F.col("reason") != "Rejected by admin")
    assert {r["reward_id"] for r in naive.collect()} == {"r1", "r4", "r5"}


def test_transform_from_allstring_csv_shaped_input(spark):
    """The reference reads staging CSVs all-string; the cast stage must
    normalize string-typed inputs identically (glue_script.py:19-20)."""
    rewards = make_rewards(spark)
    transactions = make_transactions(spark)
    rewards_s = rewards.select([F.col(c).cast("string") for c in rewards.columns])
    transactions_s = transactions.select([F.col(c).cast("string") for c in transactions.columns])
    out = run_reference_pipeline(rewards_s, transactions_s)
    row = out.filter(F.col("reward_id") == "r1").first()
    assert row["transaction_amount"] == 17.99
    assert row["rebate_rate"] == 3
    assert row["available"] is True
