"""cashback_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference pipeline (addenergyx/cashback-data-pipeline), re-expressed
Spark-first: DataFrame/SQL logical plans, Catalyst optimization, partitioned
Parquet storage, anti-join incremental serving loads — plus the
large-scale-training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) the reference never had.

Layout
------
- ``session``    SparkSession factory tuned for the engine's semantics
- ``schemas``    declared StructTypes for every table the engine touches
- ``sources``    readers (CSV/JSON/Parquet) with explicit-schema discipline
- ``sinks``      partitioned parquet warehouse, incremental anti-join append
- ``operators``  transform (reference parity), repair, dedup, similarity,
                 text analysis, multimodal plumbing
- ``functions``  column-expression helpers (null-safe predicates, money,
                 vector math)
- ``plans``      pipeline orchestration (stage sequencing, retry)
- ``streaming``  Structured Streaming equivalents (windowed aggs,
                 incremental upsert via foreachBatch)
"""

__version__ = "0.1.0"
