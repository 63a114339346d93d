"""Structured Streaming jobs.

The reference is batch-only (SURVEY §2.10): recurrence = re-run the whole
pipeline, idempotence = the NOT-EXISTS load. These jobs are the streaming
generalization of exactly those seams:

- :func:`windowed_counts_stream` — the streaming twin of the batch
  ``windowed_event_counts`` query: tumbling event-time windows + watermark
  for late data. State is bounded by the watermark horizon regardless of
  stream length — the 100 TB/day version runs with the same code.
- :func:`incremental_upsert_stream` — ``foreachBatch`` + the batch
  anti-join append (sinks.append_if_absent): per-micro-batch exactly the
  reference's idempotent load (load_to_redshift_lambda.py:88-100), which
  also makes replays safe (at-least-once source → exactly-once-by-key sink).
- :func:`sessionized_counts_stream` — ``session_window`` gap sessions,
  the streaming twin of the batch ``sessionization`` query.

All take a DataFrame from ``readStream`` so sources are pluggable
(parquet dir for tests, Kafka/Kinesis in production — same plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over an events directory (parquet/json files
    dropped into ``path``). ``maxFilesPerTrigger`` bounds micro-batch size
    so backlog catch-up doesn't OOM executors."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums with a watermark: late rows within
    ``watermark`` still update their window; older state is evicted.
    Same output shape as the batch ``windowed_event_counts`` query."""
    # Exact micro-unit accumulation (quantize 6 dp → integer
    # DECIMAL(18,0) sum, overflow-safe to 1e28): micro-batch arrival
    # order must not change the emitted sum, and the result hashes
    # identically to the batch twin / DuckDB oracle (same formula as
    # queries.dsum2 — exact int sum → double → /1e4 → +0.5 → floor →
    # /100; DECIMAL output would hash-fail the driver gate's
    # canonicalization, and a double sum would depend on order).
    micro = F.floor(F.col("value") * 1_000_000 + 0.5).cast("decimal(18,0)")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum(micro).cast("double") / 10_000 + 0.5) / 100).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


def sessionized_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (streaming twin of the batch
    ``sessionization`` query): events within ``gap`` of each other merge
    into one session; watermark bounds open-session state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def incremental_upsert_stream(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    key: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Stream → idempotent serving table: every micro-batch runs the batch
    anti-join append (K6/J3 semantics). Checkpointing + key-dedup together
    give exactly-once-by-key even across restarts — the streaming
    upgrade of the reference's re-runnable load. Returns the started
    StreamingQuery (caller awaits/stops)."""
    from cashback_data_pipeline_spark.sinks import append_if_absent

    def load_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # dedup within the batch first (a micro-batch can carry key dups),
        # then against the target
        deduped = batch_df.dropDuplicates([key])
        append_if_absent(spark, deduped, target_path, key=key)

    writer = source.writeStream.foreachBatch(load_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    event count + value sum maintained across micro-batches, emitting the
    updated totals for every user seen in each batch.

    This is the seam the built-in windowed aggs can't express: arbitrary
    user-defined state transitions (counters, ML feature state, CDC
    folds). State is one row of two longs/doubles per user — partitioned
    by the group key, so it shards across executors; at 100 TB/day the
    state store (RocksDB in prod config) holds |users| rows, not |events|.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState

    output_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("n_events", T.LongType(), False),
            T.StructField("sum_value", T.DoubleType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_events", T.LongType(), False),
            T.StructField("sum_value", T.DoubleType(), False),
        ]
    )

    def update(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, output_schema, state_schema, "update", "NoTimeout"
    )


def purchases_after_signup_stream(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases matched to the same user's
    signups that happened in the preceding ``within`` interval.

    Both sides are watermarked so the join state is bounded: a buffered
    signup can be evicted once event time passes signup_ts + within +
    watermark. The equi-key (user_id) shards state; the time bound is the
    interval condition Spark's stream-stream join requires for cleanup."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_event_id"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("p_user_id") == F.col("s_user_id"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {within}"))
    )
    return purchases.join(signups, cond, "inner").select(
        F.col("p_user_id").alias("user_id"),
        "purchase_event_id",
        "signup_event_id",
        "purchase_ts",
        "signup_ts",
        # floor-half-up, not round(): Spark/DuckDB round() diverge at .005
        (F.floor(F.col("purchase_value") * 100 + 0.5) / 100).alias("purchase_value"),
    )


def deduped_stream(events: DataFrame, key: str = "event_id", watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop duplicate keys across micro-batches
    within the watermark horizon. State holds one entry per key seen in
    the horizon — the streaming complement to the sink-side anti-join
    (which guards the TABLE; this guards the STREAM, e.g. against
    at-least-once sources double-delivering)."""
    return events.withWatermark("ts", watermark).dropDuplicates([key])


def quality_routed_stream(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    threshold: float = 0.5,
) -> DataFrame:
    """Streaming corpus quality gate: the hashed-linear-classifier score
    (operators.classify, literal-array strategy) is a STATELESS projection
    — no aggregation, no watermark, no state store — so it composes with
    any streaming source at input rate. Adds ``score`` and a ``route``
    column ('keep'/'drop') for downstream routing."""
    from cashback_data_pipeline_spark.operators import classify

    scored = classify.score_with_weights_array(docs, weights, bias)
    return scored.withColumn(
        "route", F.when(F.col("score") >= threshold, "keep").otherwise("drop")
    )


def route_stream_to_sinks(scored: DataFrame, keep_path: str, drop_path: str, checkpoint: str):
    """foreachBatch fan-out of a routed stream to two parquet sinks.
    One source pass per micro-batch feeds both sinks (persist the batch;
    two filtered writes); checkpointing makes replays append-idempotent
    at the micro-batch level. Returns the DataStreamWriter (caller calls
    .start()/.trigger())."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            batch.filter(F.col("route") == "keep").drop("route").write.mode("append").parquet(keep_path)
            batch.filter(F.col("route") == "drop").drop("route").write.mode("append").parquet(drop_path)
        finally:
            batch.unpersist()

    return scored.writeStream.foreachBatch(write_batch).option("checkpointLocation", checkpoint)
