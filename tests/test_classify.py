"""Hashed linear classifier (operators/classify.py) — strategy parity
and a numpy reference implementation.

The two physical strategies (literal weights array vs broadcast weight
table) must produce identical scores for the same model; both must match
an independent numpy computation of sigmoid(bias + mean(W[h(t) % D])).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import classify

D = 16
WEIGHTS = [((b * 5) % 11 - 5) / 8.0 for b in range(D)]
BIAS = 0.25

DOCS = [
    (0, "spark join join filter"),
    (1, "a"),
    (2, ""),  # no tokens → score = sigmoid(bias)
    (3, "window window window window window"),
    (4, "the quick brown fox jumps over the lazy dog"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def spark_xxhash64(spark, token: str) -> int:
    # ground-truth bucket via the engine's own hash, fetched once
    return spark.range(1).select(F.pmod(F.xxhash64(F.lit(token)), F.lit(D))).first()[0]


def numpy_scores(spark) -> dict[int, float]:
    out = {}
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        if toks:
            pooled = sum(WEIGHTS[spark_xxhash64(spark, t)] for t in toks) / len(toks)
        else:
            pooled = 0.0
        out[doc_id] = 1.0 / (1.0 + math.exp(-(BIAS + pooled)))
    return out


def test_weights_array_matches_reference(spark, docs_df):
    got = {
        r["doc_id"]: r["score"]
        for r in classify.score_with_weights_array(docs_df, WEIGHTS, BIAS).collect()
    }
    want = numpy_scores(spark)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k


def test_weight_table_matches_weights_array(spark, docs_df):
    weight_table = spark.createDataFrame(
        [(b, w) for b, w in enumerate(WEIGHTS)], ["bucket", "weight"]
    )
    via_table = {
        r["doc_id"]: r["score"]
        for r in classify.score_with_weight_table(docs_df, weight_table, BIAS).collect()
    }
    via_array = {
        r["doc_id"]: r["score"]
        for r in classify.score_with_weights_array(docs_df, WEIGHTS, BIAS).collect()
    }
    assert via_table.keys() == via_array.keys()
    for k in via_array:
        assert via_table[k] == pytest.approx(via_array[k], abs=1e-12), k


def test_tokenless_doc_scores_at_bias(spark, docs_df):
    weight_table = spark.createDataFrame(
        [(b, w) for b, w in enumerate(WEIGHTS)], ["bucket", "weight"]
    )
    scored = classify.score_with_weight_table(
        docs_df, weight_table, BIAS, logit_col="logit"
    )
    row = scored.where("doc_id = 2").first()
    assert row["logit"] == pytest.approx(BIAS)
    assert row["score"] == pytest.approx(1.0 / (1.0 + math.exp(-BIAS)))


def test_portable_hash_is_plain_arithmetic(spark, docs_df):
    # the portable hash must reproduce via plain Python over the same text
    def py_hash(t: str) -> int:
        return (31 * len(t) + 7 * ord(t[0]) + ord(t[-1])) % D

    got = {
        r["doc_id"]: r["b"]
        for r in docs_df.select(
            "doc_id", classify.token_buckets("text", D, classify.portable_token_hash).alias("b")
        ).collect()
    }
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        assert got[doc_id] == [py_hash(t) for t in toks], doc_id


def test_weight_table_join_broadcasts(spark, docs_df):
    weight_table = spark.createDataFrame(
        [(b, w) for b, w in enumerate(WEIGHTS)], ["bucket", "weight"]
    )
    plan = classify.score_with_weight_table(docs_df, weight_table, BIAS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_null_text_scores_at_bias_in_both_strategies(spark):
    """NULL text must behave like zero tokens (score = sigmoid(bias)) in
    BOTH physical strategies — regression for the literal-array fold
    nulling out on a NULL token array."""
    df = spark.createDataFrame([(1, None), (2, "a b")], "doc_id long, text string")
    want = 1.0 / (1.0 + math.exp(-BIAS))
    via_array = {r["doc_id"]: r["score"] for r in classify.score_with_weights_array(df, WEIGHTS, BIAS).collect()}
    wt = spark.createDataFrame([(b, w) for b, w in enumerate(WEIGHTS)], "bucket long, weight double")
    via_table = {r["doc_id"]: r["score"] for r in classify.score_with_weight_table(df, wt, BIAS).collect()}
    assert via_array[1] == pytest.approx(want)
    assert via_table[1] == pytest.approx(want)
    assert via_array[2] == pytest.approx(via_table[2])
