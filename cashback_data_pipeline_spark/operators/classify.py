"""Model-based document scoring — hashed linear classifier (fastText-style).

Production corpus curation gates documents on a learned quality score: a
linear model over hashed bag-of-words features, mean-pooled, sigmoid'd
(the fastText architecture, Joulin et al. 2016 — public). The reference
repo has no model scoring; this is part of the engine's LLM-data suite.

Two physical strategies, chosen by model size:

- :func:`score_with_weights_array` — weights as an in-plan literal array,
  token → bucket via ``xxhash64``. Zero shuffle, whole-stage-codegen'd;
  right for models up to ~100k buckets (the literal ships once per task
  binary, like a broadcast).
- :func:`score_with_weight_table` — weights as a DataFrame keyed by
  bucket; explode tokens → hash → aggregate per (doc, bucket) → join the
  weight table → re-aggregate per doc. The weight side is dim-sized
  (2M buckets ≈ 16 MB) so the join broadcasts; the fact side shuffles
  only (doc_id, bucket, count) longs, never text. This is the 100 TB
  path: model size is unbounded by plan size, and the per-doc token
  fan-out is the same explode the dedup index paths already pay.

Both pool by mean (sum of bucket weights / token count) and apply
``sigmoid(bias + pooled)``. The default bucket hash is ``xxhash64``;
pass ``hash_fn=portable_token_hash`` when the score must replay
bit-for-bit in another SQL engine (the correctness oracle does).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from cashback_data_pipeline_spark.operators.text import tokens


def portable_token_hash(t: Column) -> Column:
    """Engine-portable token hash: ``31·len(t) + 7·ascii(first) +
    ascii(last)`` — any SQL engine computes it identically, so oracle
    replays are exact. Production uses the default xxhash64 (better
    dispersion); this trades dispersion for portability."""
    return F.length(t) * 31 + F.ascii(F.substring(t, 1, 1)) * 7 + F.ascii(t.substr(F.length(t), F.lit(1)))


def token_buckets(
    col: Column | str, n_buckets: int, hash_fn: Callable[[Column], Column] | None = None
) -> Column:
    """Token array → hashed feature-bucket array (hash mod D). NULL text
    coalesces to '' (a NULL array would propagate through the fold and
    null the literal-array strategy's score while the weight-table
    strategy's left join scored it at bias — strategy divergence); empty
    tokens are dropped (splitting '' yields [''] — zero real tokens)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    toks = F.filter(tokens(c), lambda t: F.length(t) > 0)
    h = hash_fn or F.xxhash64
    return F.transform(toks, lambda t: F.pmod(h(t), F.lit(n_buckets)))


def _sigmoid(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def score_with_weights_array(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    text_col: str = "text",
    out_col: str = "score",
    hash_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Literal-array strategy: score = sigmoid(bias + mean(W[h(t)]))."""
    warr = F.array(*[F.lit(float(w)) for w in weights])
    buckets = token_buckets(text_col, len(weights), hash_fn)
    pooled = F.aggregate(
        buckets, F.lit(0.0), lambda acc, b: acc + F.element_at(warr, b.cast("int") + 1)
    ) / F.greatest(F.size(buckets), F.lit(1))
    return docs.withColumn(out_col, _sigmoid(F.lit(float(bias)) + pooled))


def score_with_weight_table(
    docs: DataFrame,
    weight_table: DataFrame,
    bias: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "score",
    hash_fn: Callable[[Column], Column] | None = None,
    logit_col: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Weight-table strategy for models too large to inline.

    ``weight_table``: (bucket: long, weight: double). The hash modulus
    ``n_buckets`` (the trained model's dimension) must be passed
    explicitly for SPARSE tables (zero-weight buckets omitted — a common
    trained-model layout); when omitted it defaults to the row count,
    which is only correct for dense tables, so the dense assumption is
    VALIDATED (max(bucket) == count-1 and min(bucket) == 0) and a sparse
    table without ``n_buckets`` raises instead of silently hashing every
    token into a different bucket than training.

    Missing buckets weigh 0 (left join + coalesce); a doc with no tokens
    pools to 0 (score = sigmoid(bias)). The token fan-out is aggregated
    to (doc, bucket, n) BEFORE the join, so each distinct bucket of a
    document crosses the join exactly once regardless of repetition.
    ``logit_col`` additionally exposes ``bias + pooled`` — exact
    arithmetic (no transcendental), which cross-engine oracles compare
    in preference to the sigmoid (libm vs Math.exp differ by ulps)."""
    if n_buckets is None:
        stats = weight_table.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("bucket").alias("nd"),
            F.min("bucket").alias("mn"),
            F.max("bucket").alias("mx"),
        ).first()
        if stats["n"] == 0:
            raise ValueError("empty weight_table; pass n_buckets explicitly")
        if stats["nd"] != stats["n"]:
            # a duplicated bucket row would ALSO double-count its weight
            # in the pooled join, so it is an error regardless of density
            raise ValueError(
                f"weight_table has duplicate bucket rows ({stats['n']} rows, "
                f"{stats['nd']} distinct buckets)"
            )
        if stats["mn"] != 0 or stats["mx"] != stats["n"] - 1:
            raise ValueError(
                f"weight_table looks sparse (buckets [{stats['mn']}, {stats['mx']}] for "
                f"{stats['n']} rows); pass n_buckets (the trained model dimension) explicitly"
            )
        n_buckets = stats["n"]
    exploded = (
        docs.select(id_col, F.explode(token_buckets(text_col, n_buckets, hash_fn)).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )
    pooled = (
        exploded.join(F.broadcast(weight_table), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (F.sum(F.col("n") * F.coalesce(F.col("weight"), F.lit(0.0))) / F.sum("n")).alias("_pooled")
        )
    )
    logit = F.lit(float(bias)) + F.coalesce(F.col("_pooled"), F.lit(0.0))
    out = docs.join(pooled, id_col, "left").withColumn(out_col, _sigmoid(logit))
    if logit_col is not None:
        out = out.withColumn(logit_col, logit)
    return out.drop("_pooled")
