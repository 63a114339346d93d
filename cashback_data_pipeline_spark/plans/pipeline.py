"""End-to-end pipeline orchestration (SURVEY §2.13).

The reference's Step Function — pull → transform → catalog → load
(infra/lambda.tf:148-241) — collapses to one driver function over lazy
DataFrames. What survives of the orchestration layer:

- C2: retry with exponential backoff, for SOURCE connectors only (Spark
  tasks already retry; re-running deterministic transforms is free);
- C3: the crawler poll loop disappears — partition discovery is
  synchronous on read;
- C4: transactional load — idempotence from the anti-join (re-runs are
  safe) plus write-then-read verification replaces commit/rollback.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cashback_data_pipeline_spark.operators.transform import run_reference_pipeline
from cashback_data_pipeline_spark.sinks import append_if_absent, write_warehouse


def with_retry(fn: Callable, attempts: int = 3, base_delay: float = 1.0, backoff: float = 2.0):
    """C2 — the Step Function retry policy (3 attempts, 2× backoff, 1 s
    base; infra/lambda.tf:161-173) as a plain wrapper for connectors."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — connector seam, rethrown below
            last = exc
            if i < attempts - 1:
                time.sleep(base_delay * (backoff**i))
    raise last  # type: ignore[misc]


@dataclass
class PipelineResult:
    warehouse_path: str
    serving_path: str
    rows_transformed: int
    rows_loaded: int


def run_pipeline(
    spark: SparkSession,
    rewards_raw: DataFrame,
    transactions_raw: DataFrame,
    warehouse_path: str,
    serving_path: str,
    key: str = "reward_id",
    use_manifest: bool = False,
) -> PipelineResult:
    """The reference's full lifecycle, one call:

    transform (stage+join+derive+cast, glue_script.py semantics)
      → K2 partitioned warehouse write
      → S7 warehouse read-back (partition discovery ≙ crawler)
      → K6/J3 idempotent anti-join append into the serving table.

    Returns row counts (A3 — the reference reports affected rows).

    ``use_manifest=True`` routes BOTH sinks through the manifest
    protocol (sinks/manifest.py): the warehouse becomes a versioned
    overwrite commit and the serving load a manifest-committed
    NOT-EXISTS append — multi-writer safe (racing pipeline runs
    serialize instead of last-writer-wins), readers pinned (a serving
    read can never observe a half-finished load), time travel on both
    tables. The direct-parquet default keeps the reference's
    single-writer layout readable by any external consumer."""
    cashback = run_reference_pipeline(rewards_raw, transactions_raw)
    if use_manifest:
        from cashback_data_pipeline_spark.sinks import manifest as M

        M.write_table(cashback, warehouse_path, mode="overwrite")
        warehouse = M.read_table(spark, warehouse_path)
        loaded = M.append_table_if_absent(spark, warehouse, serving_path, key=key)
    else:
        # REBALANCE by the partition column before the K2 write
        # (OPTIMIZATION r12, guide §6): without it every post-join task
        # writes a sliver of every partition dir (measured 97 files for
        # 7 partitions at bench scale — file-count × open-cost paid
        # again by the read-back and the serving anti-join). AQE sizes
        # the rebalance by bytes and SPLITS a skewed date, so one hot
        # partition never serializes into one writer at scale.
        write_warehouse(
            cashback.hint("rebalance", "transaction_date"),
            warehouse_path,
            partition_by="transaction_date",
        )
        warehouse = spark.read.parquet(warehouse_path)
        loaded = append_if_absent(spark, warehouse, serving_path, key=key)
    return PipelineResult(
        warehouse_path=warehouse_path,
        serving_path=serving_path,
        rows_transformed=warehouse.count(),
        rows_loaded=loaded,
    )
