"""Named engine queries + DuckDB oracle twins.

Every operator family from SURVEY.md §2 (and, as they land, the
north-star extensions) gets a named query over the driver's testdata
tables and — where ANSI-SQL can express it — an oracle string with
IDENTICAL column aliases, so the driver's sorted-column value-hash
comparison is meaningful.

Conventions for oracle-hash stability:
- every computed/aggregate column is aliased the same on both sides;
- double-typed aggregates are ``round(…, 2)`` on both sides (kills
  last-ulp accumulation-order noise);
- timestamps returned raw only when µs-precision (driver testdata is);
- DuckDB ``sum(INTEGER)`` widens to HUGEINT, so integer sums are cast
  to BIGINT in the SQL to match Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.functions import neq_null_safe
from cashback_data_pipeline_spark.sources import read_testdata

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def r2(col) -> F.Column:
    """Round-half-up to 2 dp via ``floor(x*100 + 0.5)/100``.

    Spark's ``round`` (BigDecimal HALF_UP on the double's exact binary
    value) and DuckDB's ``round`` disagree at .005 boundaries; this
    formula is the same IEEE op sequence on both engines, so row-level
    derived columns hash identically. SQL twin: ``floor(x*100+0.5)/100``.
    """
    return F.floor(col * 100 + 0.5) / 100


def query(name: str, sql: str | None = None):
    """Register an engine query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship — A1 grouped multi-agg over the J1 join output
# (reference: monthly_count api.py:9-24 over the glue_script join)
# ---------------------------------------------------------------------------

@query(
    "monthly_segment_summary",
    sql="""
    SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
           c.c_mktsegment AS c_mktsegment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS sum_price,
           round(avg(o.o_totalprice), 2) AS avg_price,
           round(max(o.o_totalprice), 2) AS max_price,
           round(min(o.o_totalprice), 2) AS min_price
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    """,
)
def monthly_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left join + A1 monthly grouped multi-agg + E6/E7 (month trunc,
    rounding). The engine's flagship analytic — the exact shape of the
    reference's dashboard metric, on the driver's star schema.

    Scale: customer is the dim side → broadcast; the agg is partial+final
    (map-side combine) on (month, segment) — low cardinality, no skew.
    """
    orders = read_testdata(spark, sf_dir, "orders")
    customer = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
    return (
        joined.groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month"),
            F.col("c_mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.5)
# ---------------------------------------------------------------------------

@query(
    "left_join_enrich",
    sql="""
    SELECT o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice,
           c.c_name AS c_name, c.c_mktsegment AS c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def left_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — left equi-join enrichment (glue_script.py:23 shape)."""
    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "anti_join_absent_keys",
    sql="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_absent_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/K6/F6 — the reference's idempotent-load NOT EXISTS
    (load_to_redshift_lambda.py:90-96) as a left-anti join."""
    customer = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_name")
    order_keys = read_testdata(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return customer.join(order_keys, on="c_custkey", how="left_anti")


@query(
    "semi_join_present_keys",
    sql="""
    SELECT c.c_custkey AS c_custkey, c.c_acctbal AS c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_present_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS ≙ left-semi — the dual of J3, same join machinery."""
    customer = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    order_keys = read_testdata(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return customer.join(order_keys, on="c_custkey", how="left_semi")


@query(
    "donor_group_fill",
    sql="""
    WITH base AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id,
           round(coalesce(v, min(v) OVER (PARTITION BY user_id)), 2) AS filled_value
    FROM base
    """,
)
def donor_group_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/E10 — donor-group fill: null measurements take a deterministic
    donor value (group min) from the same group. The reference's row-loop
    repair (api.py:142-150) as a window — one shuffle on the group key,
    no per-row lookups."""
    events = read_testdata(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    base = events.withColumn("v", v)
    return base.select(
        "event_id",
        "user_id",
        F.round(F.coalesce(F.col("v"), F.min("v").over(W.partitionBy("user_id"))), 2).alias("filled_value"),
    )


# ---------------------------------------------------------------------------
# Filters / predicates (SURVEY §2.4)
# ---------------------------------------------------------------------------

@query(
    "filter_neq_null_safe",
    sql="""
    SELECT event_id, event_type, round(value, 2) AS value
    FROM events
    WHERE event_type IS NULL OR event_type <> 'error'
    """,
)
def filter_neq_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — inequality filter with the reference's pandas null semantics
    (null rows KEPT; SURVEY §7.4.1)."""
    events = read_testdata(spark, sf_dir, "events")
    return events.filter(neq_null_safe("event_type", "error")).select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )


@query(
    "range_filter_events",
    sql="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def range_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — timestamp range predicate (the GraphQL pushdown api.py:195,
    in-engine). Pushed to the parquet scan by Catalyst (min/max row-group
    skipping at scale)."""
    events = read_testdata(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    return events.filter(F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00"))


@query(
    "compound_null_predicate",
    sql="""
    SELECT event_id, user_id, event_type, props
    FROM events
    WHERE NOT ((props IS NULL) AND (event_type <> 'signup'))
    """,
)
def compound_null_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — compound null-predicate filter (legacy api.py:122-132 shape).

    NOTE Spark and SQL agree here on three-valued logic: when props is
    non-null the conjunct is false, NOT false = true → row kept even if
    event_type is null. Parity verified by the oracle."""
    events = read_testdata(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "props")
    return events.filter(~(F.col("props").isNull() & (F.col("event_type") != "signup")))


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.6)
# ---------------------------------------------------------------------------

@query(
    "count_filtered",
    sql="""
    SELECT count(*) AS n
    FROM events
    WHERE event_type = 'purchase'
      AND ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts <= TIMESTAMP '2024-01-25 00:00:00'
    """,
)
def count_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — ungrouped count over F2∧F3 (the GraphQL totalCount aggregate)."""
    events = read_testdata(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").between("2024-01-05 00:00:00", "2024-01-25 00:00:00")
        ).agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "distinct_agg",
    sql="""
    SELECT event_type AS event_type,
           count(DISTINCT user_id) AS n_users,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation — absent in the reference, free in Spark
    (expand + two-phase agg). Exact, not approximate."""
    events = read_testdata(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_id").alias("n_events"),
    )


@query(
    "rollup_summary",
    sql="""
    SELECT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (SURVEY §2.6 'comes free' note) — subtotals +
    grand total in one pass."""
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"
    )
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Derived columns / scalar expressions (SURVEY §2.7)
# ---------------------------------------------------------------------------

@query(
    "derived_conditional_price",
    sql="""
    SELECT l_orderkey, l_linenumber,
           floor(abs(l_extendedprice) / 100 * 100 + 0.5) / 100 AS major_units,
           floor(CASE WHEN l_discount = 0
                      THEN l_extendedprice / l_quantity
                      ELSE (l_extendedprice * (1 - l_discount)) / l_quantity
                 END * 100 + 0.5) / 100 AS unit_price,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS charge
    FROM lineitem
    """,
)
def derived_conditional_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2/E7 — abs-scale conversion + branching derived metric +
    rounding: the plu_price expression family on the star schema. Pure
    whole-stage-codegen arithmetic, no UDFs."""
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    unit_price = F.when(
        F.col("l_discount") == 0, F.col("l_extendedprice") / F.col("l_quantity")
    ).otherwise((F.col("l_extendedprice") * (1 - F.col("l_discount"))) / F.col("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(F.abs(F.col("l_extendedprice")) / 100).alias("major_units"),
        r2(unit_price).alias("unit_price"),
        r2(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "date_parts_projection",
    sql="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(year(o_orderdate) AS INT) AS order_year
    FROM orders
    """,
)
def date_parts_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/E5/E6 — timestamp parse/format/truncate family
    (glue_script.py:39-40, api.py:13-14)."""
    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
    )


@query(
    "json_field_extract",
    sql="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/§1.3 — JSON field extraction from a string column (the engine's
    path for the reference's nested-record blobs)."""
    events = read_testdata(spark, sf_dir, "events").select("event_id", "props")
    return events.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


# ---------------------------------------------------------------------------
# Sorts / limits (SURVEY §2.8)
# ---------------------------------------------------------------------------

@query(
    "sort_limit_offset",
    sql="""
    SELECT event_id, ts, round(value, 2) AS value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100 OFFSET 10
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — desc sort + limit + offset (the GraphQL pushdown api.py:189-195
    in-engine). Tie-broken on the unique key so the selected window is
    deterministic. Spark executes this as a TakeOrderedAndProject —
    no global sort materialization."""
    events = read_testdata(spark, sf_dir, "events").select("event_id", "ts", F.round("value", 2).alias("value"))
    return events.orderBy(F.col("ts").desc(), F.col("event_id").desc()).offset(10).limit(100)


@query(
    "window_topk_per_group",
    sql="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 — top-k per group via row_number (the faithful form of the
    reference's donor-pick, and the standard dedup primitive). Spark
    pushes a per-partition top-k (WindowGroupLimit) before the shuffle."""
    orders = read_testdata(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return orders.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.9)
# ---------------------------------------------------------------------------

@query(
    "union_except_keys",
    sql="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 — union-distinct + except (absent in the reference; exposed
    as the multi-source staging idiom)."""
    orders = read_testdata(spark, sf_dir, "orders")
    customer = read_testdata(spark, sf_dir, "customer")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    rich_keys = customer.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    closed_keys = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return open_keys.union(rich_keys).distinct().exceptAll(closed_keys.distinct())
