"""Column-expression helpers shared across operators."""

from cashback_data_pipeline_spark.functions.expressions import (
    minor_units_to_major,
    neq_null_safe,
    parse_pydict_blob,
    plu_price,
)

__all__ = [
    "minor_units_to_major",
    "neq_null_safe",
    "parse_pydict_blob",
    "plu_price",
]
