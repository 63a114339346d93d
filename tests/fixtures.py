"""Synthetic reference-shaped fixture rows (FIXTURES.md schemas).

Generated here, not copied from the reference repo — these encode the
documented value domains and null traps (null reason for F1, rebate_rate=0
for E2's when-branch, unmatched reference_id for J1 null-extension,
duplicate reward_id across loads for J3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from cashback_data_pipeline_spark.schemas import REWARDS_RAW, TRANSACTIONS_RAW

UTC = dt.timezone.utc


def make_transactions(spark: SparkSession) -> DataFrame:
    rows = [
        # (id, model, user_id, currency, amount, date, type, is_debit, description, __typename)
        ("t1", "ContisTransaction", "u1", "GBP", -1799, dt.datetime(2024, 3, 23, 23, 38, 39, tzinfo=UTC),
         "CARD_SETTLEMENT", True, "CRV*PIZZA HUT", "transactions_view"),
        ("t2", "FiatTransaction", "u1", "GBP", -5000, dt.datetime(2024, 3, 24, 10, 0, 0, tzinfo=UTC),
         "31", None, "CURVE SUBSCRIPTION", "transactions_view"),
        ("t3", "ContisTransaction", "u1", "GBP", 131400, dt.datetime(2024, 4, 1, 8, 30, 0, tzinfo=UTC),
         "DEPOSIT_FUNDS_RECEIVED", False, None, "transactions_view"),
        ("t4", "FiatTransaction", "u1", "GBP", -22777, dt.datetime(2024, 4, 2, 12, 0, 0, tzinfo=UTC),
         "29", None, "AMAZON UK", "transactions_view"),
    ]
    return spark.createDataFrame(rows, TRANSACTIONS_RAW)


def make_rewards(spark: SparkSession) -> DataFrame:
    blob = (
        "{'card_transactions': {'description': 'CRV*PIZZA HUT', "
        "'transaction_amount': 17.99, 'transaction_currency': 'GBP', "
        "'api_response': {'MerchantDetails': {'MerchantName': 'PIZZA HUT', "
        "'MerchantCategoryCode': '5812'}}}}"
    )
    rows = [
        # (id, user_id, amount, rebate_rate, type, reference_type, reference_id,
        #  available, reason, base_rate, staking_rate, subscription_plan,
        #  exchange_rate_id, fiat_amount_rewarded, approved_by, createdAt,
        #  updatedAt, contis_transaction, fiat_transaction)
        ("r1", "u1", 0.09038461, 3, "DAILY_REBATE_DISTRIBUTION", "contis_transactions", "t1",
         True, "Automated approval. Trx below 500", 3, 0, "premium",
         "x1", 798.0, None, dt.datetime(2024, 3, 25, 6, 43, 56, tzinfo=UTC),
         dt.datetime(2024, 3, 25, 6, 43, 56, tzinfo=UTC), None, blob),
        ("r2", "u1", 1.5, 0, "REBATE_BONUS", "perk_abc_reward", None,
         True, None, 0, 0, None,
         "x1", 3143.0, None, dt.datetime(2024, 3, 26, 7, 0, 0, tzinfo=UTC),
         dt.datetime(2024, 3, 26, 7, 0, 0, tzinfo=UTC), None, None),
        ("r3", "u1", 0.5, 4, "DAILY_REBATE_DISTRIBUTION", "fiat_transactions", "t2",
         False, "Rejected by admin", 3, 2, "premium",
         "x2", None, None, dt.datetime(2024, 4, 2, 9, 0, 0, tzinfo=UTC),
         dt.datetime(2024, 4, 2, 9, 0, 0, tzinfo=UTC), None, None),
        ("r4", "u1", 2.0, 5, "DAILY_REBATE_DISTRIBUTION", "fiat_transactions", "t4",
         True, "Automated approval after 45 days", 3, 2, "premium",
         "x2", 1139.0, None, dt.datetime(2024, 4, 3, 11, 30, 0, tzinfo=UTC),
         dt.datetime(2024, 4, 3, 11, 30, 0, tzinfo=UTC), None, None),
        # unmatched reference_id → left-join null extension
        ("r5", "u1", 0.25, 3, "DAILY_REBATE_DISTRIBUTION", "contis_transactions", "missing",
         True, "Accepted by admin", 3, 0, None,
         None, 500.0, None, dt.datetime(2024, 4, 5, 14, 0, 0, tzinfo=UTC),
         dt.datetime(2024, 4, 5, 14, 0, 0, tzinfo=UTC), None, None),
    ]
    return spark.createDataFrame(rows, REWARDS_RAW)
