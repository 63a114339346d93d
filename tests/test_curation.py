from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import curation
from cashback_data_pipeline_spark.sources import read_testdata


def _bucket(key, salt: str) -> str:
    return hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:4]


def test_assign_split_matches_python_md5_and_fractions(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    out = {r["doc_id"]: r["split"] for r in curation.assign_split(docs, "doc_id").collect()}
    for doc_id, split in out.items():
        b = _bucket(doc_id, "v1")
        expect = "train" if b < "cccc" else ("val" if b < "e666" else "test")
        assert split == expect
    # distribution roughly honors 80/10/10 (hash-uniform; loose bounds)
    n = len(out)
    frac_train = sum(1 for s in out.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9


def test_assign_split_stable_under_append(spark):
    base = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    more = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in curation.assign_split(base, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in curation.assign_split(more, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())  # old rows never reassigned


def test_split_boundaries_validation():
    with pytest.raises(ValueError):
        curation.split_boundaries({"train": 0.8, "val": 0.1})
    assert curation.split_boundaries({"all": 1.0}) == [("all", "g")]


def test_weighted_sample_full_fraction_keeps_everything(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.lit("src0").alias("source")
    )
    kept = curation.weighted_sample(df, "source", {"src0": 1.0}, key_col="doc_id")
    assert kept.count() == 500  # the 'g' boundary regression guard
    none = curation.weighted_sample(df, "source", {"src0": 0.0}, key_col="doc_id")
    assert none.count() == 0


def test_weighted_sample_fraction_approx(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("source")
    )
    kept = curation.weighted_sample(df, "source", {"a": 0.25}, key_col="doc_id").count()
    assert 400 < kept < 600


def test_stratified_sample_exact_k_and_determinism(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    s1 = curation.stratified_sample_exact(docs, "lang", 10)
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values())
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in curation.stratified_sample_exact(docs, "lang", 10).collect())
    assert ids1 == ids2  # deterministic across runs


def test_repetition_metrics_known_values(spark):
    # "a b a b a b" → bigrams: [a b, b a, a b, b a, a b]; top = a b (3/5), dup = 5/5
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "u v w x y z")], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in curation.repetition_metrics(df).collect()}
    assert rows[1]["top_bigram_frac"] == pytest.approx(3 / 5)
    assert rows[1]["dup_bigram_frac"] == pytest.approx(1.0)
    assert rows[2]["top_bigram_frac"] == pytest.approx(1 / 5)
    assert rows[2]["dup_bigram_frac"] == 0.0


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user+tag@sub.example.org now or call 555-123-4567 ok"),
         (2, "nothing sensitive here")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in curation.redact_pii(df).collect()}
    assert rows[1]["n_pii"] == 2
    assert rows[1]["text"] == "mail [PII] now or call [PII] ok"
    assert rows[2]["n_pii"] == 0
    assert rows[2]["text"] == "nothing sensitive here"


def test_unigram_surprisal_ranks_rare_tokens_higher(spark):
    # doc 2 is made of tokens that appear nowhere else → higher surprisal
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "rare words only here"), (3, "a a a b")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in curation.unigram_surprisal(df).collect()}
    assert rows[2]["surprisal"] > rows[1]["surprisal"]
    assert rows[3]["surprisal"] > rows[1]["surprisal"]  # one 'b' adds surprise
    assert rows[1]["n_tokens"] == 4


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_and_short_docs(spark):
    df = _docs_df(
        spark,
        [(1, "a b c d"), (2, "a b"), (3, None), (4, "x x x x")],
    ).select("doc_id", curation.word_ngrams("text", 3).alias("g"))
    out = {r["doc_id"]: r["g"] for r in df.collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n -> empty, never a descending sequence
    assert out[3] == []
    assert out[4] == ["x x x"]  # distinct collapses repeats


def test_decontaminate_counts_and_ratio(spark):
    train = _docs_df(spark, [(1, "the cat sat on the mat"), (2, "totally novel words here now")])
    ev = _docs_df(spark, [(10, "cat sat on mats")])
    out = {r["doc_id"]: r.asDict() for r in curation.decontaminate(train, ev, n=3).collect()}
    # train doc 1 grams: "the cat sat","cat sat on","sat on the","on the mat";
    # eval grams: "cat sat on","sat on mats" -> 1 hit of 4
    assert out[1]["n_grams"] == 4 and out[1]["contaminated"] == 1
    assert out[1]["contamination_q6"] == 0.25
    assert out[2]["contaminated"] == 0 and out[2]["contamination_q6"] == 0.0


def test_cross_doc_ngram_dup_flags_shared_boilerplate(spark):
    df = _docs_df(
        spark,
        [
            (1, "click here to subscribe now friends"),
            (2, "click here to subscribe now today"),
            (3, "completely different text about cats"),
            (4, "ab"),  # too short for any trigram
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in curation.cross_doc_ngram_dup(df, n=3).collect()}
    # docs 1/2 share grams "click here to","here to subscribe","to subscribe now"
    assert out[1]["n_grams"] == 4 and out[1]["dup_grams"] == 3
    assert out[1]["dup_fraction_q6"] == 0.75
    assert out[3]["dup_grams"] == 0
    assert out[4]["n_grams"] == 0 and out[4]["dup_fraction_q6"] == 0.0


def test_scrub_frequent_ngrams_removes_shared_trigrams(spark):
    df = _docs_df(
        spark,
        [
            (1, "click here to subscribe now friends"),
            (2, "click here to subscribe now today"),
            (3, "completely different text about cats"),
            (4, "ab"),  # too short for any trigram — untouched
            (5, "click here to subscribe now"),  # nothing survives
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in curation.scrub_frequent_ngrams(df, n=3, min_df=2).collect()
    }
    # docs 1/2/5 share "click here to"/"here to subscribe"/"to subscribe now":
    # positions 0..4 covered; only the final unique token survives in 1/2
    assert out[1]["scrubbed_text"] == "friends" and out[1]["kept_tokens"] == 1
    assert out[2]["scrubbed_text"] == "today" and out[2]["kept_tokens"] == 1
    assert out[1]["n_tokens"] == 6
    # doc 3 shares no grams — intact, order preserved
    assert out[3]["scrubbed_text"] == "completely different text about cats"
    assert out[3]["kept_tokens"] == 5
    # doc 4 too short for grams — intact
    assert out[4]["scrubbed_text"] == "ab" and out[4]["kept_tokens"] == 1
    # doc 5 fully covered — empty but still present
    assert out[5]["scrubbed_text"] == "" and out[5]["kept_tokens"] == 0


def test_quality_percentile_gate_keeps_top_quartile(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "doc_id long, s double"
    )
    kept = {
        r["doc_id"]: r["score_e6"]
        for r in curation.quality_percentile_gate(
            df, F.col("s") / 10.0, percentile=0.75, id_col="doc_id"
        ).collect()
    }
    # scores .1..{.8} scaled e6; p75 of [1e5..8e5] = 1e5 + 0.75*7e5 = 625000
    assert set(kept) == {7, 8}
    assert kept[8] == 800000


def test_token_budget_sample_respects_budget_and_order(spark):
    df = _docs_df(
        spark,
        [(i, " ".join(["w"] * 10)) for i in range(1, 21)],  # 20 docs x 10 tokens
    ).withColumn("source", F.lit("s0"))
    out = curation.token_budget_sample(df, 35, group_col="source").collect()
    # 10-token docs against a 35-token budget -> exactly 3 kept
    assert len(out) == 3
    assert max(r["cum_tokens"] for r in out) == 30
    # deterministic: same call, same rows
    again = curation.token_budget_sample(df, 35, group_col="source").collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)
    # bigger budget keeps a superset
    more = curation.token_budget_sample(df, 65, group_col="source").collect()
    assert set(r["doc_id"] for r in out) <= set(r["doc_id"] for r in more)


def test_duplicate_passages_merges_spans(spark):
    df = _docs_df(
        spark,
        [
            (1, "a b c d e unique1 x y z w v"),   # two 5-gram runs, separated
            (2, "a b c d e unique2 x y z w v"),
            (3, "totally different words here now"),
        ],
    )
    out = {}
    for r in curation.duplicate_passages(df, n=5, min_df=2).collect():
        out.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"], r["span_tokens"]))
    # docs 1/2 share "a b c d e" (pos 0-4) and "x y z w v" (pos 6-10);
    # the unique token at pos 5 splits them into two maximal islands
    assert sorted(out[1]) == [(0, 4, 5), (6, 10, 5)]
    assert sorted(out[2]) == [(0, 4, 5), (6, 10, 5)]
    assert 3 not in out
