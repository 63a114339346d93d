"""Catalog / schema utilities (SURVEY §1.4.3, §2.2 K7).

The reference translates Glue-crawled schemas into Redshift DDL with a
VARCHAR(256) fallback (load_to_redshift_lambda.py:24-50). One engine means
no translation is needed, but the DDL renderer stays useful for parity
tests and for exporting the warehouse contract to external serving stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Spark type → ANSI DDL type. Mirrors the reference's DATA_TYPE_MAPPING
#: (load_to_redshift_lambda.py:24-31) with the same VARCHAR fallback idea.
_DDL_TYPES = {
    "int": "INTEGER",
    "integer": "INTEGER",
    "bigint": "BIGINT",
    "long": "BIGINT",
    "string": "VARCHAR(256)",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
}


def schema_ddl(
    df_or_schema: DataFrame | T.StructType,
    table: str,
    partition_cols: list[str] | None = None,
    if_not_exists: bool = True,
) -> str:
    """Render ``CREATE TABLE`` DDL from a DataFrame/StructType — the
    engine's version of the reference's catalog→DDL step
    (load_to_redshift_lambda.py:34-50). Partition keys are appended after
    data columns, exactly as the reference appends crawler partition keys
    (…:41). Unknown types fall back to VARCHAR(256) (…:43-50)."""
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    partition_cols = partition_cols or []
    data_fields = [f for f in schema.fields if f.name not in partition_cols]
    part_fields = [f for f in schema.fields if f.name in partition_cols]
    cols = ",\n  ".join(
        f"{f.name} {_DDL_TYPES.get(f.dataType.simpleString(), 'VARCHAR(256)')}"
        for f in data_fields + part_fields
    )
    ine = "IF NOT EXISTS " if if_not_exists else ""
    ddl = f"CREATE TABLE {ine}{table} (\n  {cols}\n)"
    if part_fields:
        ddl += f"\nPARTITIONED BY ({', '.join(f.name for f in part_fields)})"
    return ddl


def register_warehouse_table(spark, path: str, table: str) -> None:
    """S7 — expose a parquet warehouse directory as a catalog table
    (replaces the reference's crawler+Spectrum mount,
    load_to_redshift_lambda.py:54-62). ``MSCK REPAIR`` registers existing
    hive-partition directories — a one-time synchronous call, not the
    reference's crawler poll loop; subsequent engine writes through the
    catalog keep partitions registered automatically."""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {table} USING PARQUET LOCATION '{path}'")
    try:
        spark.sql(f"MSCK REPAIR TABLE {table}")
    except Exception:
        pass  # unpartitioned table — nothing to recover


def analyze_table(spark, table: str, columns: list[str] | None = None) -> None:
    """Collect table + column statistics into the catalog (row counts,
    sizes, per-column ndv/null/min/max). Feeds Spark's cost-based
    optimizer: join reordering and broadcast decisions use these numbers
    when AQE's runtime stats aren't available (e.g. first stage of a
    query). The engine's replacement for the reference's crawler-derived
    metadata, but with actual statistics."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
