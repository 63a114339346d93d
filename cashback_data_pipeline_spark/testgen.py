"""Deterministic synthetic reference-shaped data, generated relationally.

Both frames derive every value from the row id by modular arithmetic, so
the SAME data can be reproduced in any engine with a ``range`` source —
the correctness gate uses this to oracle-check the full parity pipeline
(queries.reference_pipeline_parity) and bench.py scales it up for the
throughput run. No RNG, no driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = 1_710_000_000  # 2024-03-09T16:00:00Z — base timestamp
SPAN = 7_776_000  # 90 days of seconds


def gen_transactions(spark: SparkSession, n: int) -> DataFrame:
    """Raw API-shaped transactions (TRANSACTIONS_RAW layout)."""
    return spark.range(n).select(
        F.concat(F.lit("t"), F.col("id")).alias("id"),
        F.when(F.col("id") % 2 == 0, "ContisTransaction").otherwise("FiatTransaction").alias("model"),
        F.lit("u1").alias("user_id"),
        F.lit("GBP").alias("currency"),
        ((F.col("id") * 7919) % 400000 - 200000).alias("amount"),
        F.timestamp_seconds(F.lit(EPOCH) + F.col("id") % SPAN).alias("date"),
        F.lit("CARD_SETTLEMENT").alias("type"),
        F.lit(None).cast("boolean").alias("is_debit"),
        F.concat(F.lit("MERCHANT "), F.col("id") % 1000).alias("description"),
        F.lit("transactions_view").alias("__typename"),
    )


def gen_rewards(spark: SparkSession, n: int, n_txn: int) -> DataFrame:
    """Raw API-shaped rewards (REWARDS_RAW layout); ~95% of reference_ids
    join to a transaction, 5% are null (manual rewards) — matching the
    distribution notes in FIXTURES.md."""
    return spark.range(n).select(
        F.concat(F.lit("r"), F.col("id")).alias("id"),
        F.lit("u1").alias("user_id"),
        ((F.col("id") % 1000) / 100.0 + 0.01).alias("amount"),
        (F.col("id") % 6).cast("int").alias("rebate_rate"),
        F.when(F.col("id") % 50 == 0, "REBATE_BONUS").otherwise("DAILY_REBATE_DISTRIBUTION").alias("type"),
        F.lit("contis_transactions").alias("reference_type"),
        F.when(F.col("id") % 20 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("t"), F.col("id") % n_txn)
        ).alias("reference_id"),
        (F.col("id") % 10 != 0).alias("available"),
        F.when(F.col("id") % 12 == 0, "Rejected by admin")
        .when(F.col("id") % 30 == 0, F.lit(None))
        .otherwise("Automated approval. Trx below 500")
        .alias("reason"),
        F.lit(3).alias("base_rate"),
        F.lit(0).alias("staking_rate"),
        F.lit("premium").alias("subscription_plan"),
        F.concat(F.lit("x"), F.col("id") % 500).alias("exchange_rate_id"),
        ((F.col("id") * 13) % 500000 / 1.0).alias("fiat_amount_rewarded"),
        F.lit(None).cast("string").alias("approved_by"),
        F.timestamp_seconds(F.lit(EPOCH) + F.col("id") % SPAN).alias("createdAt"),
        F.timestamp_seconds(F.lit(EPOCH) + F.col("id") % SPAN).alias("updatedAt"),
        F.lit(None).cast("string").alias("contis_transaction"),
        F.lit(None).cast("string").alias("fiat_transaction"),
    )
