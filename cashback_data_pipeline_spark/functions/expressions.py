"""Scalar expression helpers (SURVEY §2.7).

All JVM-side Column expressions — no Python UDFs in the hot path. The one
exception, :func:`parse_pydict_blob`, repairs Python-dict-literal strings
before ``from_json`` and is built from chained built-in string functions so
it still runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def minor_units_to_major(amount: Column | str) -> Column:
    """``abs(x)/100`` — integer minor units (pence) → major units.

    Reference E1: glue_script.py:26 (Spark) and elt.py:46 (a pandas lambda
    ``apply`` the engine replaces with the codegen'd built-in). Float
    division matches reference semantics; for exactness at scale use
    ``minor_units_to_major(c).cast("decimal(18,2)")``.
    """
    col = F.col(amount) if isinstance(amount, str) else amount
    return F.abs(col) / 100


def plu_price(
    rebate_rate: Column | str = "rebate_rate",
    fiat_amount_rewarded: Column | str = "fiat_amount_rewarded",
    plu_amount: Column | str = "plu_amount",
    transaction_amount: Column | str = "transaction_amount",
) -> Column:
    """The reference's flagship derived metric (E2, glue_script.py:43-50):

    ``if rebate_rate == 0 then fiat_amount_rewarded / plu_amount
      else (abs(transaction_amount)/100 * rebate_rate) / plu_amount``

    NOTE the deliberate quirk preserved for parity: ``transaction_amount``
    here is *already* divided by 100 (E1) and glue_script.py:47 divides by
    100 again. The legacy pandas path (elt.py:43) divides only once —
    glue_script is the deployed artifact (infra/glue.tf:21-24), so it is
    the spec; tests pin both readings (SURVEY §7.4.2).
    """
    rr = F.col(rebate_rate) if isinstance(rebate_rate, str) else rebate_rate
    fiat = F.col(fiat_amount_rewarded) if isinstance(fiat_amount_rewarded, str) else fiat_amount_rewarded
    plu = F.col(plu_amount) if isinstance(plu_amount, str) else plu_amount
    txn = F.col(transaction_amount) if isinstance(transaction_amount, str) else transaction_amount
    return F.when(rr == 0.0, fiat / plu).otherwise((F.abs(txn) / 100 * rr) / plu)


def neq_null_safe(col: Column | str, value) -> Column:
    """``col != value`` that KEEPS null rows.

    Reference F1 (api.py:12) filters pandas-side where ``NaN != "…"`` is
    True, so null reasons survive; Spark's ``!=`` yields null and drops
    them. ~3.3% of fixture rows hit this (SURVEY §7.4.1).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (c != F.lit(value))


def parse_pydict_blob(col: Column | str, schema: T.StructType) -> Column:
    """Parse a Python-dict-literal string (single quotes, ``None``/``True``/
    ``False``) into a typed struct (SURVEY §1.3 nested-record columns,
    rewards.csv:2).

    Repair is regexp-based and stays JVM-side: quote keys/values by
    swapping single→double quotes, then map Python literals to JSON ones.
    Good for the reference's blob shapes (no embedded apostrophes in the
    fixture sample); a `mapInPandas` + ``ast.literal_eval`` fallback exists
    in operators.nested for hostile inputs.
    """
    c = F.col(col) if isinstance(col, str) else col
    repaired = F.regexp_replace(c, r"'", '"')
    repaired = F.regexp_replace(repaired, r"\bNone\b", "null")
    repaired = F.regexp_replace(repaired, r"\bTrue\b", "true")
    repaired = F.regexp_replace(repaired, r"\bFalse\b", "false")
    return F.from_json(repaired, schema)
