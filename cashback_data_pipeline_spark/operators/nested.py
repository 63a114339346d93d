"""Nested-record parsing — the reference's dict-literal blob columns.

rewards rows carry ``contis_transaction``/``fiat_transaction`` as
Python-dict-literal strings (single quotes, ``None``; 3 levels deep —
rewards.csv:2, SURVEY §1.3). The active reference path drops them; the
legacy path (api.py:108-163) json-normalizes and reads dotted paths like
``fiat_transaction.card_transactions.description``. Here both become
typed struct columns:

- fast path: :func:`functions.parse_pydict_blob` — regexp repair +
  ``from_json`` (pure codegen, fine for the fixture shapes);
- hostile path: :func:`parse_pydict_blobs_pandas` — ``ast.literal_eval``
  in an Arrow-batched ``mapInPandas`` (handles embedded quotes the
  regexp repair cannot).

Dotted-path access then maps 1:1: ``F.col("fiat.card_transactions.
api_response.MerchantDetails.MerchantName")``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cashback_data_pipeline_spark.functions import parse_pydict_blob
from cashback_data_pipeline_spark.schemas import CONTIS_TRANSACTION, FIAT_TRANSACTION


def parse_reward_blobs(rewards: DataFrame) -> DataFrame:
    """Typed struct columns from both blob columns (fast regexp path)."""
    return rewards.withColumn(
        "contis", parse_pydict_blob("contis_transaction", CONTIS_TRANSACTION)
    ).withColumn("fiat", parse_pydict_blob("fiat_transaction", FIAT_TRANSACTION))


def parse_pydict_blobs_pandas(
    df: DataFrame, blob_col: str, schema: T.StructType, out_col: str
) -> DataFrame:
    """Python-literal parse via ``ast.literal_eval`` per Arrow batch —
    the escape hatch for blobs the regexp repair mangles (embedded
    apostrophes). Emits a JSON string then ``from_json`` types it, so the
    pandas stage stays schema-agnostic."""
    import ast

    import pandas as pd

    fields = [f for f in df.schema.fields]
    out_schema = T.StructType(fields + [T.StructField(f"__{out_col}_json", T.StringType(), True)])

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def one(v):
            if v is None or (isinstance(v, float) and v != v):
                return None
            try:
                return json.dumps(ast.literal_eval(v))
            except (ValueError, SyntaxError):
                return None

        for pdf in batches:
            pdf[f"__{out_col}_json"] = pdf[blob_col].map(one)
            yield pdf

    with_json = df.mapInPandas(parse, schema=out_schema)
    return with_json.withColumn(out_col, F.from_json(f"__{out_col}_json", schema)).drop(
        f"__{out_col}_json"
    )


def legacy_repair_pipeline(rewards: DataFrame) -> DataFrame:
    """The reference's legacy nested-column repair flow (api.py:108-163)
    in engine idiom — parse blobs, coalesce descriptions/amounts across
    the two nested sources (E10/E11), flag unrepairable rows (F4):

    - description := coalesce(contis.description, fiat.card_transactions.description)
    - amount      := coalesce(contis.transaction_amount,
                              fiat.card_transactions.transaction_amount * 100)  (api.py:137)
    - drop rows where both descriptions are null and reward_type is not
      REBATE_BONUS (api.py:122-132)
    """
    parsed = parse_reward_blobs(rewards)
    desc_contis = F.col("contis.description")
    desc_fiat = F.col("fiat.card_transactions.description")
    amt_contis = F.col("contis.transaction_amount")
    amt_fiat = F.col("fiat.card_transactions.transaction_amount")
    out = (
        parsed.withColumn("merchant_description", F.coalesce(desc_contis, desc_fiat))
        .withColumn("source_amount", F.coalesce(amt_contis, amt_fiat * 100))
        .withColumn("merchant_name", F.col("fiat.card_transactions.api_response.MerchantDetails.MerchantName"))
    )
    keep = ~(
        desc_contis.isNull() & desc_fiat.isNull() & (F.col("reward_type") != "REBATE_BONUS")
    )
    return out.filter(keep)
