"""Source readers with explicit-schema discipline.

Covers the reference's scan surface (SURVEY §2.1 S1-S7):
CSV (header, string-typed or declared schema), JSON records, landed JSONL,
Parquet warehouse scans. All take plain paths — local and ``s3a://`` URIs
both resolve through Hadoop FS, so there is no cloud coupling in the API.
"""

from cashback_data_pipeline_spark.sources.readers import (
    read_csv,
    read_events_range,
    read_json_records,
    read_jsonl,
    read_orc,
    read_parquet,
    read_table_with_fallback,
    read_testdata,
)

__all__ = [
    "read_csv",
    "read_events_range",
    "read_json_records",
    "read_jsonl",
    "read_orc",
    "read_parquet",
    "read_table_with_fallback",
    "read_testdata",
]
