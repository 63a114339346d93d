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


# ---------------------------------------------------------------------------
# Corpus-shaped generators (documents / embeddings), used by the empirical
# scale validation (tools/scale_check.py): same statistical character as the
# driver's testdata tables — 31-word vocabulary, 10–100-word docs, ~41% en,
# 20 sources, a deterministic near-dup/exact-dup tail — so operator timings
# measured on generated corpora extrapolate to the graded sf tables.
# ---------------------------------------------------------------------------

# The driver corpus vocabulary (TESTDATA sf0.1 documents.parquet, extracted
# by word-frequency scan): 31 words. Near-dup candidate volume depends on
# this vocabulary size (see SCALE.md), so the generator reuses it verbatim.
DOC_VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "dup",
]


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic documents table: same layout/distributions as the
    driver's. Every value derives from the row id; no RNG. Near-dup
    structure: id%40==0 docs repeat id-1's word stream with the final
    word replaced (a true near dup); id%100==0 docs are exact copies of
    id-2 (an exact-dup group member)."""
    vocab = F.array(*[F.lit(w) for w in DOC_VOCAB])
    base = (
        F.when((F.col("id") % 100 == 0) & (F.col("id") >= 2), F.col("id") - 2)
        .when((F.col("id") % 40 == 0) & (F.col("id") >= 1), F.col("id") - 1)
        .otherwise(F.col("id"))
    )
    # xxhash64(base, j) rather than modular arithmetic: any affine formula
    # in (base, j) collapses mod 31 to at most lcm-of-moduli distinct word
    # streams (measured: 2,056 accidental exact-dup groups at n=5,000),
    # while the hash gives full diversity with the same determinism.
    length = F.lit(10) + F.pmod(F.xxhash64(base), F.lit(91))
    words = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: F.element_at(vocab, F.pmod(F.xxhash64(base, j), F.lit(31)).cast("int") + 1),
    )
    # the near-dup perturbation: swap the last word (exact copies keep it)
    perturbed = F.when(
        (F.col("id") % 40 == 0) & (F.col("id") % 100 != 0) & (F.col("id") >= 1),
        F.concat(
            F.slice(words, 1, F.size(words) - 1),
            F.array(F.element_at(vocab, F.pmod(F.col("id"), F.lit(31)).cast("int") + 1)),
        ),
    ).otherwise(words)
    text = F.array_join(perturbed, " ")
    lang_bucket = F.pmod(F.col("id") * 13, F.lit(100))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.when(lang_bucket < 41, "en")
        .when(lang_bucket < 56, "zh")
        .when(lang_bucket < 71, "es")
        .when(lang_bucket < 86, "fr")
        .otherwise("de")
        .alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.col("id") * 3, F.lit(20))).alias("source"),
        F.length(text).alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int, dim: int = 64, n_labels: int = 10) -> DataFrame:
    """Deterministic embeddings table matching the DRIVER distribution,
    which is near-orthogonal: the sf0.1 table measures same-label mean
    cos ≈ 0.002 (q90 0.163, max 0.51) — labels are NOT cosine clusters.
    A first-cut generator with tight label clusters made the TRUE
    near-dup answer quadratic at 10× (every within-cluster pair ≥ 0.4),
    i.e. measured the data, not the engine. Components are xxhash64
    pseudo-uniforms in [−1, 1) (E[cos]=0, sd≈1/√dim ⇒ the same tail as
    the real table) plus a WEAK label pull (0.1·center) and an id%200
    exact-copy tail so dedup paths still have a sparse signal to find."""
    base = F.when((F.col("id") % 200 == 0) & (F.col("id") >= 1), F.col("id") - 1).otherwise(F.col("id"))
    label = F.pmod(base * 7, F.lit(n_labels)).cast("int")
    j = F.sequence(F.lit(0), F.lit(dim - 1))
    rand = F.transform(
        j, lambda k: F.pmod(F.xxhash64(base, k), F.lit(1_000_000)) / F.lit(500_000.0) - 1.0
    )
    center = F.transform(j, lambda k: F.cos((label * dim + k) * F.lit(2.3999632)) * F.lit(0.1))
    vec = F.zip_with(rand, center, lambda r, c: (r + c).cast("float"))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        label.alias("label"),
    )
