from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import dedup
from cashback_data_pipeline_spark.sources import read_testdata


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.replace("kappa", "lambda", 1)  # one token differs
    far = "one two three four five six seven eight nine ten " * 3
    rows = [
        (1, base, "en"),
        (2, base, "en"),          # exact dup of 1
        (3, near, "en"),          # near dup of 1
        (4, far, "en"),
        (5, base.upper(), "en"),  # case-variant dup of 1 (fingerprint-equal)
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_dedup_exact_by_fingerprint(spark, docs_with_dups):
    kept = dedup.dedup_exact_by_fingerprint(docs_with_dups)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4]  # 2 and 5 collapse into 1


def test_duplicate_groups_counts(spark, docs_with_dups):
    groups = {r["keep_id"]: r["n_copies"] for r in dedup.duplicate_groups(docs_with_dups).collect()}
    assert groups[1] == 3 and groups[3] == 1 and groups[4] == 1


def test_ngram_jaccard_finds_near_dup(spark, docs_with_dups):
    pairs = dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.8, block_cols=["lang"])
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got      # exact dup -> jaccard 1.0
    assert (1, 3) in got      # 1-token-of-30 change -> high bag jaccard
    assert not any(4 in p for p in got)  # disjoint vocab never pairs


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH+verify must agree with the exact inverted-index result wherever
    both use set-jaccard at the same threshold (verification makes
    precision exact; banding should keep recall ~1 at j>=0.9)."""
    docs = read_testdata(spark, sf_dir, "documents").limit(200)
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9, bag=False)
    lsh = dedup.minhash_near_dups(docs, threshold=0.9, num_hashes=64, bands=16)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert lsh_pairs <= exact_pairs  # verified candidates: exact precision
    if exact_pairs:
        recall = len(lsh_pairs) / len(exact_pairs)
        assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_simhash_near_dups_detects_exact_and_near(spark, docs_with_dups):
    pairs = dedup.simhash_near_dups(docs_with_dups, max_hamming=8)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((1, 2)) == 0  # identical text -> identical signature
    assert (1, 3) in got         # near dup within hamming ball


def test_embedding_near_dups_symmetric_pairs_once(spark, sf_dir):
    emb = read_testdata(spark, sf_dir, "embeddings").limit(100)
    pairs = dedup.embedding_near_dups(emb, threshold=0.3).collect()
    seen = {(r["id_a"], r["id_b"]) for r in pairs}
    assert all(a < b for a, b in seen)
    assert len(seen) == len(pairs)  # no dupes


def test_hot_token_cap_is_lower_bound(spark, sf_dir):
    from cashback_data_pipeline_spark.sources import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").limit(150)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    capped_pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_token_df=100)
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped_pairs.collect()}
    assert set(capped) <= set(exact)  # lower bound: no false positives
    for p, j in capped.items():
        assert j <= exact[p] + 1e-9


def test_connected_components_clusters(spark):
    # two chains and a singleton edge: {1,2,3,4}, {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    labels = {r["id"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_end_to_end_near_dups(spark, docs_with_dups):
    pairs = dedup.ngram_jaccard_pairs(docs_with_dups, threshold=0.8, block_cols=["lang"])
    labels = {r["id"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()}
    # docs 1,2,3 form one near-dup cluster (exact dup + 1-token change)
    assert labels[1] == labels[2] == labels[3] == 1
    assert 4 not in labels  # disjoint doc never entered the pair graph


def test_connected_components_raises_on_non_convergence(spark):
    chain = spark.createDataFrame([(i, i + 1) for i in range(1, 30)], "id_a long, id_b long")
    import pytest as _pt

    with _pt.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=3)
    labels = {r["id"]: r["cluster_id"] for r in dedup.connected_components(chain, max_iter=40).collect()}
    assert set(labels.values()) == {1}


def test_column_api_minhash_matches_relational(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four five")],
        "doc_id int, text string",
    )
    col_sigs = {
        r["doc_id"]: r["sig"]
        for r in df.select("doc_id", dedup.minhash_signature("text", 16, 1).alias("sig")).collect()
    }
    rel_sigs = {r["id"]: r["sig"] for r in dedup.minhash_signatures(df, num_hashes=16).collect()}
    assert col_sigs == rel_sigs


def test_length_block_is_lossless(spark, sf_dir):
    """Length-bucket blocking must return EXACTLY the unblocked pairs —
    the bucket bound (size ratio ≥ threshold ⇒ Δbucket ≤ 1) is a proof,
    not a heuristic; adjacent-bucket probing covers the boundary."""
    from cashback_data_pipeline_spark.sources import read_testdata

    docs = read_testdata(spark, sf_dir, "documents").limit(300)
    plain = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    blocked = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5, length_block=True)
    p = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in plain.collect()}
    b = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in blocked.collect()}
    assert p == b and len(p) > 0


def test_minhash_drops_null_text(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, None)], "doc_id int, text string"
    )
    sigs = dedup.minhash_signatures(df, num_hashes=16).collect()
    assert [r["id"] for r in sigs] == [1]  # no all-null signatures
    pairs = dedup.minhash_near_dups(df, threshold=0.5, num_hashes=16, bands=4).collect()
    assert pairs == []  # null docs never become candidates of each other


def test_length_block_validates_threshold(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="length_block"):
        dedup.ngram_jaccard_pairs(df, threshold=1.0, length_block=True).collect()


def test_md5_lanes_match_duckdb(spark):
    """Spark's conv(substr(md5(w)),16,10) lanes must equal DuckDB's
    CAST('0x'||substr(md5(w),off,8) AS BIGINT), and the
    Kirsch–Mitzenmacher expansion (h1 + i*h2) & 0xFFFFFFFF must agree —
    the LIVE cross-engine seam every md5-family LSH oracle rests on
    (dedup.md5_lane_sql / minhash_signatures_md5 /
    text.simhash_signatures_md5)."""
    import duckdb

    words = ["hello", "", "a b", "ünïcödé", "0", "x" * 100]
    seeds = (0, 1, 7, 63)
    df = spark.createDataFrame([(w,) for w in words], "w string")
    h1, h2 = dedup.md5_lane_sql(0), dedup.md5_lane_sql(1)
    exprs = [F.expr(h1).alias("h1"), F.expr(h2).alias("h2")] + [
        F.expr(f"(({h1}) + {i} * ({h2})) & 4294967295").alias(f"g{i}") for i in seeds
    ]
    got = {r["w"]: r for r in df.select("w", *exprs).collect()}
    con = duckdb.connect()
    for w in words:
        e1, e2 = con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 8)) AS BIGINT),"
            "       CAST(('0x' || substr(md5(?), 9, 8)) AS BIGINT)",
            [w, w],
        ).fetchone()
        assert (got[w]["h1"], got[w]["h2"]) == (e1, e2), f"lane mismatch for {w!r}"
        for i in seeds:
            ekm = con.execute(f"SELECT ({e1} + {i} * {e2}) & 4294967295").fetchone()[0]
            assert got[w][f"g{i}"] == ekm, f"KM mismatch for {w!r} seed {i}"


def test_md5_family_near_dups_finds_dups(spark, docs_with_dups):
    pairs = dedup.minhash_near_dups(
        docs_with_dups, threshold=0.8, num_hashes=64, bands=16, hash_family="md5"
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got and not any(4 in p for p in got)


def test_dedup_incremental_batch_and_history(spark):
    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen"), (3, None)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "seen before"),   # dropped: in history
            (11, "brand new"),     # kept
            (12, "brand new"),     # dropped: within-batch dup, 11 wins
            (13, ""),              # dropped: empty = junk, not content
            (14, None),            # dropped: null
        ],
        "doc_id long, text string",
    )
    out = dedup.dedup_incremental(batch, corpus)
    rows = {r["doc_id"]: r["fingerprint"] for r in out.collect()}
    assert set(rows) == {11}
    import hashlib
    assert rows[11] == hashlib.md5(b"brand new").hexdigest()


def test_containment_catches_subset_jaccard_misses(spark):
    from cashback_data_pipeline_spark.operators import dedup as D

    rows = [
        (1, "alpha beta gamma"),                                      # fully inside doc 2
        (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (3, "totally other words entirely present here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in D.ngram_containment_pairs(df, threshold=0.9).collect()}
    assert cont[(1, 2)] == 1.0  # subset pair found
    assert (1, 3) not in cont and (2, 3) not in cont
    # same pair under Jaccard: 3/9 — far below any useful threshold
    jac = D.ngram_jaccard_pairs(df, threshold=0.9)
    assert (1, 2) not in {(r["id_a"], r["id_b"]) for r in jac.collect()}


def test_connected_components_deep_chain_log_rounds(spark):
    """VERDICT r3 item 5: pointer jumping must collapse a 1000-node path
    graph within ~log2(1000) rounds — one-hop propagation alone would
    need ~1000 (d_k = 2^(k+1)-2, so 9 rounds reach depth 1022; 12 is
    the criterion with slack)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "id_a long, id_b long"
    )
    labels = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(chain, max_iter=12).collect()
    }
    assert len(labels) == 1001
    assert set(labels.values()) == {0}


def test_lsh_hot_bucket_cap_stars_oversized_buckets(spark):
    """max_bucket_size: a bucket of k identical docs must yield k-1 star
    edges (hub = min id) instead of k(k-1)/2 pairs, while distinct docs
    in small buckets keep exhaustive pairs; connectivity is preserved
    (one component per bucket either way)."""
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    rows = [(i, same) for i in range(10)] + [(100, other), (101, other)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    capped = dedup.minhash_lsh_candidates(df, max_bucket_size=5)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # hot bucket (k=10 > 5): only hub edges 0->1..9
    hot = {p for p in pairs if p[0] < 100}
    assert hot == {(0, i) for i in range(1, 10)}
    # small bucket (k=2 <= 5): exhaustive pair survives
    assert (100, 101) in pairs

    # connectivity equivalence with the uncapped candidates
    full = dedup.minhash_lsh_candidates(df)
    full_pairs = {(r["id_a"], r["id_b"]) for r in full.collect()}
    assert {(0, i) for i in range(1, 10)} <= full_pairs  # k^2/2 pairs include hub's

    comp_capped = {
        r["id"]: r["cluster_id"] for r in dedup.connected_components(capped).collect()
    }
    comp_full = {
        r["id"]: r["cluster_id"] for r in dedup.connected_components(full).collect()
    }
    assert comp_capped == comp_full


def test_lsh_cap_none_is_exhaustive(spark):
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame([(i, same) for i in range(4)], "doc_id int, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(df).collect()}
    assert pairs == {(a, b) for a in range(4) for b in range(4) if a < b}
