"""Sinks: partitioned parquet warehouse + incremental serving loads."""

from cashback_data_pipeline_spark.sinks.writers import (
    append_if_absent,
    compact_warehouse,
    merge_upsert,
    scd2_upsert,
    write_training_shards,
    write_zordered,
    zorder_column,
    write_csv,
    write_bucketed,
    write_orc,
    write_warehouse,
)

__all__ = ["append_if_absent", "compact_warehouse", "merge_upsert", "scd2_upsert", "write_training_shards", "write_zordered", "zorder_column", "write_bucketed", "write_csv", "write_orc", "write_warehouse"]
