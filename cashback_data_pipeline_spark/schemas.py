"""Declared schemas for every table the engine touches.

The reference reads staging CSVs schema-on-read all-strings and then casts
column-by-column (/root/reference/glue_script.py:19-20, 56-74). The engine
keeps that lenient-cast discipline available (see operators.transform) but
also declares proper StructTypes so sources can read typed when asked —
at 100 TB, schema-on-read string scans double I/O and defeat predicate
pushdown.

Raw (API-shaped) vs staged (post pull-stage rename/drop) schemas both
exist because the reference renames during the pull
(pull_data_glue_job_lambda.py:56-61) before the transform sees the data.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference data model (FIXTURES.md; headers rewards.csv:1/transactions.csv:1)
# ---------------------------------------------------------------------------

#: transactions as pulled from the GraphQL source (api.py:185-200)
TRANSACTIONS_RAW = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("currency", T.StringType(), False),
        # integer minor units (pence), signed; negative = spend
        T.StructField("amount", T.LongType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("is_debit", T.BooleanType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("__typename", T.StringType(), True),
    ]
)

#: transactions as staged (drop is_debit/__typename, id→transaction_id —
#: pull_data_glue_job_lambda.py:56-57)
TRANSACTIONS_STAGED = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("currency", T.StringType(), False),
        T.StructField("amount", T.LongType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
    ]
)

#: rewards as pulled from the REST source (api.py:89-105)
REWARDS_RAW = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("amount", T.DoubleType(), False),  # PLU token amount, 8 dp
        T.StructField("rebate_rate", T.IntegerType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("reference_type", T.StringType(), False),
        T.StructField("reference_id", T.StringType(), True),
        T.StructField("available", T.BooleanType(), False),
        T.StructField("reason", T.StringType(), True),
        T.StructField("base_rate", T.IntegerType(), False),
        T.StructField("staking_rate", T.IntegerType(), False),
        T.StructField("subscription_plan", T.StringType(), True),
        T.StructField("exchange_rate_id", T.StringType(), True),
        T.StructField("fiat_amount_rewarded", T.DoubleType(), True),  # pence as float
        T.StructField("approved_by", T.StringType(), True),
        T.StructField("createdAt", T.TimestampType(), False),
        T.StructField("updatedAt", T.TimestampType(), False),
        # Python-dict-literal nested blobs; parsed via functions.nested
        T.StructField("contis_transaction", T.StringType(), True),
        T.StructField("fiat_transaction", T.StringType(), True),
    ]
)

#: rewards as staged (amount→plu_amount, type→reward_type, id→reward_id —
#: pull_data_glue_job_lambda.py:60-61)
_REWARDS_RENAMES = {"id": "reward_id", "amount": "plu_amount", "type": "reward_type"}
REWARDS_STAGED = T.StructType(
    [T.StructField(_REWARDS_RENAMES.get(f.name, f.name), f.dataType, f.nullable) for f in REWARDS_RAW]
)

#: warehouse output — 17 cols as produced by glue_script.py:29-78.
#: transaction_date is a *string* partition key ('yyyy-MM-dd') and
#: fiat_amount_rewarded a string cast after arithmetic — both odd, both
#: preserved for parity (SURVEY §7.4.6-7).
CASHBACK = T.StructType(
    [
        T.StructField("reward_id", T.StringType(), True),
        T.StructField("transaction_id", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("plu_amount", T.DoubleType(), True),
        T.StructField("available", T.BooleanType(), True),
        T.StructField("reason", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
        T.StructField("rebate_rate", T.IntegerType(), True),
        T.StructField("fiat_amount_rewarded", T.StringType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("reference_type", T.StringType(), True),
        T.StructField("reward_type", T.StringType(), True),
        T.StructField("transaction_amount", T.DoubleType(), True),
        T.StructField("transaction_timestamp", T.TimestampType(), True),
        T.StructField("plu_price", T.DoubleType(), True),
        T.StructField("transaction_date", T.StringType(), True),  # partition key
    ]
)

#: 3-level nested struct inside the rewards `fiat_transaction` blob
#: (rewards.csv:2; legacy dotted-path access api.py:110-163)
FIAT_TRANSACTION = T.StructType(
    [
        T.StructField(
            "card_transactions",
            T.StructType(
                [
                    T.StructField("description", T.StringType(), True),
                    T.StructField("transaction_amount", T.DoubleType(), True),
                    T.StructField("transaction_currency", T.StringType(), True),
                    T.StructField(
                        "api_response",
                        T.StructType(
                            [
                                T.StructField(
                                    "MerchantDetails",
                                    T.StructType(
                                        [
                                            T.StructField("MerchantName", T.StringType(), True),
                                            T.StructField("MerchantCategoryCode", T.StringType(), True),
                                        ]
                                    ),
                                    True,
                                )
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)

#: 2-level nested struct inside the rewards `contis_transaction` blob
CONTIS_TRANSACTION = T.StructType(
    [
        T.StructField("transaction_amount", T.DoubleType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("transaction_currency", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — declared so scans never infer
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def testdata_path(sf_dir: str, table: str) -> str:
    """Path to one driver-generated parquet table under ``sf_dir``."""
    return f"{sf_dir.rstrip('/')}/{table}.parquet"
