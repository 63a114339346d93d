"""Regression tests for the round-3 ADVICE findings.

Each test pins one of the judge-advisor's latent-divergence findings:
containment-cap score bias, NULL-text row drops in the boilerplate
family, and the degenerate single-month cohort corpus.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import curation, dedup
from cashback_data_pipeline_spark import queries as Q


def test_containment_cap_keeps_score_unbiased(spark):
    """ADVICE r3 dedup.py:421 — with max_token_df set, sizes must come
    from the retained bag so a subset pair still scores 1.0 after the
    hot token drops out (pre-fix it deflated to 3/4)."""
    rows = [(1, "hot a b c"), (2, "hot a b c d")]
    # make 'hot' exceed the df cap: 8 more docs containing only it
    rows += [(10 + i, "hot") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_containment_pairs(
        df, n=1, threshold=0.9, max_token_df=5
    ).collect()
    assert len(pairs) == 1
    r = pairs[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # retained bags: {a,b,c} and {a,b,c,d} -> containment 3/min(3,4) = 1.0
    assert r.containment == pytest.approx(1.0)


def test_containment_without_cap_unchanged(spark):
    """The no-cap path still scores over full bags (same pair: 4/5)."""
    df = spark.createDataFrame(
        [(1, "hot a b c"), (2, "hot a b c d")], "doc_id long, text string"
    )
    pairs = dedup.ngram_containment_pairs(df, n=1, threshold=0.5).collect()
    assert len(pairs) == 1
    assert pairs[0].containment == pytest.approx(1.0)  # 4/min(4,5)


def test_scrub_keeps_null_text_document(spark):
    """ADVICE r3 curation.py:430 — a NULL-text document must keep its
    row (one empty token, nothing scrubbed), matching the oracle's
    LEFT JOIN semantics instead of being dropped by posexplode."""
    df = spark.createDataFrame(
        [
            (1, "the same boilerplate line"),
            (2, "the same boilerplate line"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.scrub_frequent_ngrams(df, n=3, min_df=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3].n_tokens == 1
    assert out[3].kept_tokens == 1
    assert out[3].scrubbed_text == ""
    # the shared trigram is scrubbed from docs 1 and 2 (4 tokens, all
    # covered by the two frequent trigrams)
    assert out[1].kept_tokens == 0 and out[1].scrubbed_text == ""

    spans = curation.duplicate_passages(df, n=3, min_df=2).collect()
    assert {r.doc_id for r in spans} == {1, 2}  # NULL doc: no spans, no crash


def test_retention_cohorts_multi_month_matches_oracle(spark, tmp_path):
    """ADVICE r3 queries.py:4032 — retention_cohorts is degenerate on the
    driver corpus (single cohort, months_since=0). Exercise the
    months_between-vs-date_diff('month') pairing on a synthetic corpus
    spanning 4 months with staggered signups, cross-engine."""
    from datetime import datetime

    rows = []
    eid = 0

    def ev(user, iso_ts, etype):
        nonlocal eid
        eid += 1
        rows.append((eid, datetime.fromisoformat(iso_ts), user, etype, 1.0, "{}"))

    # cohort 2024-01: u1 active every month, u2 churns after signup
    ev(1, "2024-01-05T10:00:00", "signup")
    ev(2, "2024-01-20T09:30:00", "signup")
    for m in ("02", "03", "04"):
        ev(1, f"2024-{m}-10T12:00:00", "click")
    # cohort 2024-02: u3 signs up end-of-month, active in 04 (months_since
    # crosses a 31-day/28-day boundary — the arithmetic ADVICE flagged)
    ev(3, "2024-02-28T23:00:00", "signup")
    ev(3, "2024-04-01T00:30:00", "purchase")
    # u4 has activity BEFORE signup (filtered by act_month >= cohort_month)
    ev(4, "2024-01-02T08:00:00", "click")
    ev(4, "2024-03-15T08:00:00", "signup")

    sf_dir = str(tmp_path)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, f"{sf_dir}/events.parquet")

    sdf = Q.QUERIES["retention_cohorts"](spark, sf_dir)
    got = {(str(r.cohort_month), r.months_since): r.n_users for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    ores = con.execute(Q.ORACLES["retention_cohorts"]).fetchall()
    want = {(str(c), m): n for c, m, n in ores}

    assert got == want
    # the corpus genuinely exercises months_since > 0
    assert max(m for _, m in got) >= 2
    assert got[("2024-02-01", 2)] == 1  # u3: Feb 28 signup -> Apr activity
