"""The reference-parity cashback transform.

Reproduces the full active-path semantics of the reference's Glue job
(/root/reference/glue_script.py:19-78) plus the pull-stage renames/drops
(/root/reference/pull_data_glue_job_lambda.py:56-61), as one lazy
DataFrame plan:

    stage_transactions ─┐
                        ├─ J1 left join ─ E1 derive ─ P1 select ─ P2 rename
    stage_rewards ──────┘      ─ E4/E5 dates ─ E2 plu_price ─ E3 ─ E9 casts

Everything is stock DataFrame API — Catalyst handles projection pruning,
predicate pushdown, and join-strategy selection (broadcast for a small
transactions side, sort-merge + AQE skew handling at 100 TB). No custom
planning is needed for parity (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.functions import minor_units_to_major, plu_price

#: P1 — the 15-column select (glue_script.py:29-32)
SELECTED_FIELDS = [
    "reward_id",
    "transaction_id",
    "description",
    "plu_amount",
    "date",
    "available",
    "reason",
    "createdAt",
    "updatedAt",
    "rebate_rate",
    "fiat_amount_rewarded",
    "currency",
    "reference_type",
    "reward_type",
    "transaction_amount",
]

#: E9 — the cast discipline (glue_script.py:56-74). Order preserved; note
#: fiat_amount_rewarded is cast to STRING after abs/100 arithmetic — an odd
#: reference choice kept for parity (SURVEY §7.4.7).
OUTPUT_CASTS = {
    "reward_id": "string",
    "transaction_id": "string",
    "rebate_rate": "integer",
    "reward_type": "string",
    "reference_type": "string",
    "available": "boolean",
    "reason": "string",
    "fiat_amount_rewarded": "string",
    "created_at": "timestamp",
    "updated_at": "timestamp",
    "currency": "string",
    "description": "string",
    "plu_amount": "double",
    "transaction_amount": "double",
}


def stage_transactions(raw: DataFrame) -> DataFrame:
    """Pull-stage shaping of transactions: drop ``is_debit``/``__typename``,
    rename ``id``→``transaction_id`` (pull_data_glue_job_lambda.py:56-57)."""
    return raw.drop("is_debit", "__typename").withColumnRenamed("id", "transaction_id")


def stage_rewards(raw: DataFrame, drop_nested: bool = False) -> DataFrame:
    """Pull-stage shaping of rewards: rename ``amount``→``plu_amount``,
    ``type``→``reward_type``, ``id``→``reward_id``
    (pull_data_glue_job_lambda.py:60-61). The nested-blob drop is
    commented out in the reference (…:59) so the default keeps them."""
    df = (
        raw.withColumnRenamed("amount", "plu_amount")
        .withColumnRenamed("type", "reward_type")
        .withColumnRenamed("id", "reward_id")
    )
    if drop_nested:
        df = df.drop("contis_transaction", "fiat_transaction")
    return df


def transform_cashback(rewards: DataFrame, transactions: DataFrame) -> DataFrame:
    """STAGED rewards ⟕ STAGED transactions → 17-col cashback table.

    Faithful to glue_script.py:23-74 including its quirks (see
    functions.plu_price for the double-divide note). Column types on input
    may be all-string (reference CSV parity) or properly typed — the cast
    stage normalizes either way because non-ANSI casts null-on-failure.
    """
    # J1 — left equi-join; each reward enriched with merchant description
    # and amount (glue_script.py:23). rewards side drives the row count.
    joined = rewards.join(
        transactions,
        rewards["reference_id"] == transactions["transaction_id"],
        "left",
    )

    # E1 — pence→pounds on the transaction amount (glue_script.py:26).
    joined = joined.withColumn("transaction_amount", minor_units_to_major("amount"))

    # P1/P2 — select + rename (glue_script.py:29-37).
    out = joined.select(*SELECTED_FIELDS)
    out = (
        out.withColumnRenamed("createdAt", "created_at")
        .withColumnRenamed("updatedAt", "updated_at")
        .withColumnRenamed("date", "transaction_date")
    )

    # E4/E5 — transaction_timestamp + string-formatted partition date
    # (glue_script.py:39-40). Partition key stays a STRING for parity.
    out = out.withColumn("transaction_timestamp", F.col("transaction_date").cast("timestamp"))
    out = out.withColumn("transaction_date", F.date_format(F.col("transaction_date"), "yyyy-MM-dd"))

    # E2 — plu_price (glue_script.py:43-50).
    out = out.withColumn("plu_price", plu_price())

    # E3 — abs/100 on the rewarded fiat amount (glue_script.py:53).
    out = out.withColumn("fiat_amount_rewarded", minor_units_to_major("fiat_amount_rewarded"))

    # E9 — bulk cast discipline (glue_script.py:56-74).
    for name, dtype in OUTPUT_CASTS.items():
        out = out.withColumn(name, F.col(name).cast(dtype))
    return out


def run_reference_pipeline(rewards_raw: DataFrame, transactions_raw: DataFrame) -> DataFrame:
    """Raw API-shaped inputs → cashback output (pull shaping + transform)."""
    return transform_cashback(stage_rewards(rewards_raw), stage_transactions(transactions_raw))
