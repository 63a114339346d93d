"""Measured recall of the approximate near-dup paths vs their exact twins.

Approximate operators trade recall for sub-quadratic work; this tool
measures that trade on the driver's sf0.01 corpus so SCALE.md carries
numbers instead of adjectives:

- token near-dup: exact = inverted-index set-Jaccard (ngram_jaccard_pairs,
  bag=False) at the threshold; approx = MinHash-LSH (trigram), SimHash.
- embedding near-dup: exact = blocked-GEMM all pairs; approx = fixed-plane
  sign-LSH and the self-scaling auto variant.

Precision is 1.0 by construction wherever a verification stage re-checks
candidates exactly (minhash verify, bucket GEMM >= threshold); recall is
|approx ∩ exact| / |exact|. SimHash verifies by Hamming distance, not
Jaccard, so both its precision and recall against the Jaccard truth are
reported.

Usage: python tools/recall_check.py [sf_dir]   (writes RECALL.json)
"""

from __future__ import annotations

import json
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cashback_data_pipeline_spark.session import get_spark  # noqa: E402


def pairs(df) -> set[tuple]:
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def pr(approx: set, exact: set) -> dict:
    tp = len(approx & exact)
    return {
        "exact_pairs": len(exact),
        "approx_pairs": len(approx),
        "recall": round(tp / len(exact), 4) if exact else None,
        "precision": round(tp / len(approx), 4) if approx else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("recall_check")

    from cashback_data_pipeline_spark.operators import dedup as D
    from cashback_data_pipeline_spark.operators import similarity as S
    from cashback_data_pipeline_spark.sources import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    emb = read_testdata(spark, sf_dir, "embeddings")
    out: dict[str, dict] = {}

    # token family at trigram set-jaccard >= 0.8
    exact_tok = pairs(D.ngram_jaccard_pairs(docs, threshold=0.8, n=3, bag=False))
    out["minhash_trigram_lsh@j0.8"] = pr(
        pairs(D.minhash_near_dups(docs, threshold=0.8, n=3)), exact_tok
    )
    out["simhash@j0.8"] = pr(pairs(D.simhash_near_dups(docs, max_hamming=8)), exact_tok)

    # embedding family at cosine >= 0.4
    exact_emb = pairs(S.embedding_pairs_fast(emb, threshold=0.4))
    bucketed = S.hyperplane_lsh_buckets(emb, n_planes=4, seed=42)
    out["sign_lsh_4planes@c0.4"] = pr(
        pairs(S.bucket_pairs_gemm(bucketed, threshold=0.4)), exact_emb
    )
    out["sign_lsh_auto@c0.4"] = pr(
        pairs(S.embedding_near_dups_lsh_fast(emb, threshold=0.4, target_bucket_size=1024)),
        exact_emb,
    )
    out["sign_lsh_auto_8tables@c0.4"] = pr(
        pairs(
            S.embedding_near_dups_lsh_fast(
                emb, threshold=0.4, target_bucket_size=256, n_tables=8
            )
        ),
        exact_emb,
    )
    # semantic_dedup emits DROP DECISIONS, not pairs: compare its dropped
    # set against the exactly-droppable set (every vector that has a
    # smaller-id neighbor at cos >= threshold anywhere in the corpus)
    sd_drops = {
        r["vec_id"]
        for r in S.semantic_dedup(emb, n_clusters=16, threshold=0.4).filter("NOT keep").collect()
    }
    exact_droppable = {b for (_, b) in exact_emb}
    out["semantic_dedup_k16@c0.4"] = {
        "note": "drop-decision operator (cluster-bounded, recall<1 by design)",
        "drops": len(sd_drops),
        "exact_droppable": len(exact_droppable),
        "recall": round(len(sd_drops & exact_droppable) / len(exact_droppable), 4)
        if exact_droppable
        else None,
        "precision": round(len(sd_drops & exact_droppable) / len(sd_drops), 4)
        if sd_drops
        else None,
    }

    def sd_row(note: str, **kw) -> dict:
        drops = {
            r["vec_id"]
            for r in S.semantic_dedup(emb, n_clusters=16, threshold=0.4, **kw)
            .filter("NOT keep")
            .collect()
        }
        return {
            "note": note,
            "drops": len(drops),
            "recall": round(len(drops & exact_droppable) / len(exact_droppable), 4)
            if exact_droppable
            else None,
            "precision": round(len(drops & exact_droppable) / len(drops), 4) if drops else None,
        }

    out["semantic_dedup_k16_refined@c0.4"] = sd_row(
        "2 Lloyd rounds on the coarse quantizer", refine_iters=2
    )
    # shadow membership (VERDICT r4 item 8): boundary vectors join their
    # 2nd/3rd-nearest cluster's pair pool — recall lifts without LSH at
    # k x membership rows, total work still linear
    out["semantic_dedup_k16_top2@c0.4"] = sd_row("top-2 shadow membership", memberships=2)
    out["semantic_dedup_k16_top3@c0.4"] = sd_row(
        "top-3 shadow membership (the round-5 oracled config)", memberships=3
    )
    out["semantic_dedup_k16_top2_refined@c0.4"] = sd_row(
        "top-2 shadow + 2 Lloyd rounds", memberships=2, refine_iters=2
    )
    # VERDICT r5 item 7: push recall toward 0.9 — measure the top-k /
    # Lloyd-round grid and pick the knee for the oracled configuration
    out["semantic_dedup_k16_top4@c0.4"] = sd_row("top-4 shadow membership", memberships=4)
    out["semantic_dedup_k16_top3_refined@c0.4"] = sd_row(
        "top-3 shadow + 2 Lloyd rounds", memberships=3, refine_iters=2
    )
    out["semantic_dedup_k16_top4_refined3@c0.4"] = sd_row(
        "top-4 shadow + 3 Lloyd rounds (the oracled semantic_dedup config "
        "since round 6 — the recall-grid knee)", memberships=4, refine_iters=3
    )
    out["semantic_dedup_k16_top5@c0.4"] = sd_row("top-5 shadow membership", memberships=5)

    # ANN probe recall vs brute-force truth (k=5, 10 query vectors):
    # plain IVF vs int8-quantized lists (VERDICT r5 item 6 gate:
    # quantized-probe recall >= plain-IVF recall − ε) vs quantized +
    # exact-rescore.
    queries_df = emb.filter("vec_id < 10")
    def ann_pairs(df) -> set[tuple]:
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    truth = ann_pairs(S.brute_force_topk(queries_df, emb, k=5))

    def ann_row(df, note: str) -> dict:
        got = ann_pairs(df)
        return {
            "note": note,
            "recall_at_5": round(len(got & truth) / len(truth), 4) if truth else None,
        }

    out["ann_ivf_16c_4probe@k5"] = ann_row(
        S.ivf_topk(queries_df, emb, n_centroids=16, n_probe=4, k=5), "exact-vector lists"
    )
    out["ann_ivf_quantized@k5"] = ann_row(
        S.ivf_topk_quantized(queries_df, emb, n_centroids=16, n_probe=4, k=5),
        "int8 lists, dequantized scoring (the oracled ann_ivf_quantized_topk config)",
    )
    out["ann_ivf_quantized_rescored@k5"] = ann_row(
        S.ivf_topk_quantized(queries_df, emb, n_centroids=16, n_probe=4, k=5, rescore=True),
        "int8 lists + exact rescore of top 4k candidates",
    )

    # IVF drift governance (VERDICT r6 item 4): a delta drawn from a
    # SHIFTED distribution (reversed embeddings under fresh ids — a
    # second mode the frozen base quantizer never saw) degrades probe
    # recall; compact_ivf_index(retrain=True) re-clusters the current
    # vectors and reassigns lists. Both rows use the same brute-force
    # truth over base ∪ drifted.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    drift_base = emb.select("vec_id", "embedding")
    drifted = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.reverse(F.col("embedding")).alias("embedding"),
    )
    drift_corpus = drift_base.unionByName(drifted)
    q_drift = drifted.filter(F.col("vec_id") < 1000010)
    truth_drift = ann_pairs(S.brute_force_topk(q_drift, drift_corpus, k=5))
    tdir = tempfile.mkdtemp(prefix="ivf_drift_recall_")
    drift_table = os.path.join(tdir, "ivf")
    S.ivf_build_index_manifest(drift_base, drift_table, n_centroids=16)
    S.upsert_ivf_index(drifted, drift_table, delta_id="drift-1")

    def drift_row(note: str) -> dict:
        got = ann_pairs(
            S.ivf_query_index_manifest(spark, drift_table, q_drift, n_probe=4, k=5)
        )
        return {
            "note": note,
            "recall_at_5": round(len(got & truth_drift) / len(truth_drift), 4)
            if truth_drift
            else None,
        }

    out["ann_ivf_drifted_frozen@k5"] = drift_row(
        "frozen quantizer after a distribution-shifted delta"
    )
    # Retrain ladder (round 8): spread seeding replaces lowest-id (which
    # samples ZERO new-mode centroids when ids correlate with ingest
    # time), and boundary SPILLING (spill=r: each vector in its r nearest
    # lists) is the index-side recall lever — a from-scratch refined
    # build on this bimodal corpus also sits at ~0.56 with spill 1, so
    # the ceiling was the layout, not the retrain. Costs are explicit:
    # spill× list storage, ~n_probe*spill/n_centroids candidate fraction.
    S.compact_ivf_index(spark, drift_table, retrain=True, refine_iters=3)
    out["ann_ivf_drifted_retrained_spill1@k5"] = drift_row(
        "retrain(refine_iters=3), spread seed, spill 1 (classic lists)"
    )
    S.compact_ivf_index(spark, drift_table, retrain=True, refine_iters=3, spill=3)
    out["ann_ivf_drifted_retrained_spill3@k5"] = drift_row(
        "retrain(refine_iters=3, spill=3) — the pre-r9 oracled config (0.84, "
        "below the ≥0.90 bar); 3x list storage, ~75% candidate fraction at "
        "16 lists / 4 probes (the fraction shrinks as n_centroids grows at scale)"
    )
    S.compact_ivf_index(spark, drift_table, retrain=True, refine_iters=3, spill=4)
    out["ann_ivf_drifted_retrained@k5"] = drift_row(
        "retrain(refine_iters=3, spill=4) — the oracled ann_ivf_retrain_topk "
        "config (adopted r9, VERDICT r8 item 4): fresh-build-quality recall on "
        "the drifted corpus at the stated cost of 4x list storage; "
        "near-exhaustive candidates at this tiny 16-list config (at scale: "
        "thousands of lists, same spill)"
    )
    shutil.rmtree(tdir, ignore_errors=True)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "RECALL.json")
    with open(path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "results": out}, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
