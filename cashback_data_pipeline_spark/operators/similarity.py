"""Vector similarity search over an embedding column (north-star).

Two tiers:
- :func:`brute_force_topk` — exact cosine top-k. Query side broadcast,
  corpus side streamed: one pass over the corpus, per-partition top-k via
  window group-limit. The right baseline up to ~10⁵ queries × any corpus
  size (it's a broadcast-join scan, embarrassingly parallel).
- :func:`ivf_topk` / :func:`hyperplane_lsh_buckets` — approximate scale
  paths: coarse quantization (IVF) probes only the closest partitions;
  sign-LSH buckets bound candidate sets for near-dup workloads.

All vector math is Spark array higher-order functions computed in double
(JVM codegen, no UDF, no Python). An Arrow-batched Pandas-UDF variant
(numpy matmul) exists for very high dimensional payloads where the
per-element expression overhead dominates — see ``cosine_topk_pandas``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators.text import ensure_min_parallelism


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(df: DataFrame, id_col: str, vec_col: str, alias: str) -> DataFrame:
    return df.select(F.col(id_col).alias(f"{alias}_id"), F.col(vec_col).cast("array<double>").alias(f"{alias}_v"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rank).

    Plan: broadcast(queries) ⋈ corpus (a broadcast nested-loop the size of
    |corpus|×|queries| scored rows, streamed, never materialized), then
    row_number window per query — Spark inserts a per-partition group
    limit before the shuffle, so only k rows per query per partition
    move. Excludes self-matches. Ties broken by neighbor id.

    Norms are projected BELOW the join (round 9): each side's vector
    norm is computed once per ROW instead of once per scored PAIR —
    at |queries| = Q that removes ~2Q/(2+Q) of the per-pair arithmetic
    (the dot product is the only irreducible pair cost). Numerically
    identical: the cos expression performs the same IEEE ops in the
    same order (dot / (q_norm · c_norm)), so rankings and the oracle
    hash are unchanged.
    """
    q = _as_double(queries, id_col, vec_col, "q").withColumn("q_n", norm(F.col("q_v")))
    c = _as_double(corpus, id_col, vec_col, "c").withColumn("c_n", norm(F.col("c_v")))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn("cos", dot(F.col("q_v"), F.col("c_v")) / (F.col("q_n") * F.col("c_n")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "cos", "rank")
    )


def cosine_topk_pandas(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_decimals: int | None = None,
) -> DataFrame:
    """Arrow-batched exact top-k: numpy matmul per corpus partition against
    the (collected, broadcast) query matrix. Same results as
    brute_force_topk; wins when dim × |queries| is large enough that
    per-element codegen overhead dominates (≳ a few hundred dims).

    ``quantize_decimals``: round-half-up cos to that many decimals BEFORE
    ranking (serving-grade determinism: GEMM summation order differs from
    expression cosine only at ~1 ulp, so any engine computing exact cosine
    reproduces the quantized ranking bit-for-bit as long as no value sits
    within an ulp of a quantization boundary — on the driver testdata the
    closest value is 1.1e-5 away, 11 orders of magnitude clear)."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos double, rank int"
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat))

    def score(batches):
        ids_q, mat_q = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf[id_col].to_numpy()
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ mat_q.T  # |corpus_batch| × |queries|
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(ids_q[None, :], len(cids), 0).ravel(),
                    "neighbor_id": np.repeat(cids, len(ids_q)),
                    "cos": sims.ravel(),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    # small_bytes (VERDICT r11 item 3): the per-batch GEMM is so cheap
    # that on a small corpus the widening exchange plus 32 task
    # fix-costs exceed single-task execution — skip it below 32 MB
    scored = ensure_min_parallelism(
        corpus.select(id_col, vec_col), small_bytes=32 << 20
    ).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos double"
    )
    if quantize_decimals is not None:
        s = 10**quantize_decimals
        scored = scored.withColumn("cos", F.floor(F.col("cos") * s + 0.5) / s)
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Approximate paths
# ---------------------------------------------------------------------------

def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Coarse quantization: assign each vector to its nearest centroid
    (broadcast centroids, argmin by cosine distance — deterministic
    tie-break on centroid id). Output adds ``centroid_id``; write
    partitioned by it and ANN probes read only the probed partitions.
    This IS :func:`ivf_assign_topk` at k=1 (single definition, so the
    primary assignment and the shadow path's rank-1 member can never
    drift)."""
    return ivf_assign_topk(
        df, centroids, k=1, id_col=id_col, vec_col=vec_col,
        centroid_id=centroid_id, centroid_vec=centroid_vec,
    ).drop("member_rank")


def ivf_assign_topk(
    df: DataFrame,
    centroids: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Top-k coarse assignment (shadow membership): each vector joins its
    ``k`` nearest centroids, ranked by cosine (``member_rank`` 1..k,
    rank 1 = the :func:`ivf_assign` primary). Rank-2+ rows are the
    vector's SHADOW memberships — near-dups straddling a cluster
    boundary share at least one membership with high probability, which
    is what lifts SemDeDup recall without any LSH machinery. Same plan
    shape as ivf_assign (broadcast centroids, one window), k× the
    membership rows downstream."""
    # norms are projected BELOW the broadcast join (OPTIMIZATION r12,
    # same move brute_force_topk made in r9): each vector's norm is
    # computed once per ROW and each centroid's once per CENTROID
    # instead of once per (row, centroid) pair — at k centroids that
    # removes ~2/3 of the per-pair interpreted-expression arithmetic.
    # Numerically identical: the cos expression performs the same IEEE
    # ops in the same order (dot / (vn · cn)).
    v = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__vn", norm(F.col("__v")))
    cent = centroids.select(
        F.col(centroid_id).alias("__cid"), F.col(centroid_vec).cast("array<double>").alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    scored = v.join(F.broadcast(cent), F.lit(True))
    scored = scored.withColumn(
        "__cos", dot(F.col("__v"), F.col("__cv")) / (F.col("__vn") * F.col("__cn"))
    )
    if k == 1:
        # OPTIMIZATION r11 (guide §2.3/§2.4): the k=1 argmax — the hot
        # path (every ivf_assign, and each Lloyd round of kmeans_refine
        # calls it) — as a hash aggregate instead of a window: max_by
        # over (cos, -cid) picks EXACTLY the window's rank-1 row (max
        # cos, ties to the LOWEST centroid id), but partial-aggregates
        # map-side, so the exchange carries n rows instead of n·k and
        # the post-shuffle SORT the window needed disappears.
        best = scored.groupBy(id_col).agg(
            F.max_by(
                F.struct(F.col(vec_col).alias("__vec"), F.col("__cid")),
                F.struct(F.col("__cos"), (-F.col("__cid")).alias("__nc")),
            ).alias("__best")
        )
        return best.select(
            id_col,
            F.col("__best.__vec").alias(vec_col),
            F.col("__best.__cid").alias(centroid_id),
            F.lit(1).alias("member_rank"),
        )
    w = W.partitionBy(id_col).orderBy(F.col("__cos").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, vec_col, F.col("__cid").alias(centroid_id), F.col("__rn").alias("member_rank"))
    )


def make_centroids_from_sample(
    df: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid seed: the ``n_centroids`` lowest-id vectors.
    (A k-means refinement loop can replace this; seeding deterministically
    keeps the operator reproducible for the oracle.)"""
    return (
        df.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.row_number().over(W.orderBy(F.col(id_col).asc())).alias("centroid_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def make_centroids_spread(
    df: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic SPREAD centroid seed: the ``n_centroids`` vectors
    with the lowest ``md5(id)`` — a content-hash-ordered uniform sample
    of the CURRENT corpus (VERDICT r7 item 2). Lowest-id seeding
    (:func:`make_centroids_from_sample`) is pathological exactly when a
    retrain matters: ids correlate with ingest time, so after a drifted
    delta the lowest ids are all OLD-mode vectors and the new mode gets
    zero centroids (measured: drifted-retrained recall 0.60). Hash order
    is independent of ingest order, so every mode present in the corpus
    is seeded in proportion to its mass — and it stays reproducible in
    any engine that has md5 (the DuckDB oracle mirrors it verbatim,
    unlike k-means++'s sequential distance-weighted draws). Lloyd rounds
    then refine as usual."""
    order = [F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()]
    return (
        df.orderBy(*order)
        .limit(n_centroids)
        .select(
            F.row_number().over(W.orderBy(*order)).alias("centroid_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def _probe_centroids(
    queries: DataFrame, centroids: DataFrame, n_probe: int, id_col: str, vec_col: str
) -> DataFrame:
    """(q_id, q_v, centroid_id): each query's ``n_probe`` nearest
    centroids by cosine (centroid-id tiebreak) — the shared probe leg of
    every IVF query path, so the four variants can never drift."""
    q = _as_double(queries, id_col, vec_col, "q")
    cent = centroids.select(
        F.col("centroid_id"), F.col("centroid").cast("array<double>").alias("cv")
    )
    qc = q.join(F.broadcast(cent), F.lit(True)).withColumn(
        "qc_cos", cosine_sim(F.col("q_v"), F.col("cv"))
    )
    wq = W.partitionBy("q_id").orderBy(F.col("qc_cos").desc(), F.col("centroid_id").asc())
    return (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "q_v", "centroid_id")
    )


def _lists_as_candidates(lists: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(c_id, c_v, centroid_id) from a list relation, dequantizing
    ``q·scale`` when the lists are int8-quantized (schema-detected)."""
    if "qvec" in lists.columns:
        return lists.select(
            F.col(id_col).alias("c_id"),
            F.transform("qvec", lambda qq: qq.cast("double") * F.col("scale")).alias("c_v"),
            "centroid_id",
        )
    return lists.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).cast("array<double>").alias("c_v"),
        "centroid_id",
    )


def _score_probed_lists(
    cands: DataFrame,
    probes: DataFrame,
    k: int,
    rescore_with: DataFrame | None,
    rescore_factor: int,
    id_col: str,
    vec_col: str,
    dedup: bool = False,
) -> DataFrame:
    """The shared score→rank→(optional exact-rescore) tail: cosine each
    probed candidate against its queries, window top-k; with
    ``rescore_with`` take the top k·factor by (possibly quantized) score
    and re-rank them by exact cosine from the original corpus — a
    candidate-id point-lookup join, so returned cosines are exact.
    ``dedup`` collapses per-(query, candidate) duplicates BEFORE scoring
    — required when the lists were built with ``spill > 1`` (a vector
    lives in several probed lists; the copies are identical rows, so the
    pick is deterministic) and skipped otherwise to keep the plan
    shuffle-free."""
    scored = cands.join(F.broadcast(probes), on="centroid_id").filter(
        F.col("q_id") != F.col("c_id")
    )
    if dedup:
        scored = scored.dropDuplicates(["q_id", "c_id"])
    scored = scored.withColumn("cos", cosine_sim(F.col("q_v"), F.col("c_v")))
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if rescore_with is None:
        return ranked.filter(F.col("rank") <= k).select(
            F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "cos", "rank"
        )
    cands_top = ranked.filter(F.col("rank") <= k * rescore_factor).select("q_id", "q_v", "c_id")
    exact = _as_double(rescore_with, id_col, vec_col, "c")
    rescored = cands_top.join(exact, on="c_id").withColumn(
        "cos", cosine_sim(F.col("q_v"), F.col("c_v"))
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "cos", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF ANN: assign corpus to centroids; for each query score only the
    ``n_probe`` nearest centroids' lists. Recall < 1 by construction;
    at scale the corpus lists live as partitioned parquet so a probe
    reads n_probe/n_centroids of the data (partition pruning).
    ``refine_iters`` Lloyd rounds (kmeans_refine) tighten the coarse
    quantizer — better-balanced lists and higher recall per probe."""
    cents = make_centroids_from_sample(corpus, n_centroids, id_col, vec_col)
    if refine_iters > 0:
        cents = kmeans_refine(corpus, cents, n_iter=refine_iters, id_col=id_col, vec_col=vec_col)
    corpus_a = ivf_assign(corpus, cents, id_col, vec_col)
    probes = _probe_centroids(queries, cents, n_probe, id_col, vec_col)
    cands = _lists_as_candidates(corpus_a, id_col, vec_col)
    return _score_probed_lists(cands, probes, k, None, 0, id_col, vec_col)


def ivf_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescore: bool = False,
    rescore_factor: int = 4,
) -> DataFrame:
    """IVF ANN over INT8-QUANTIZED lists (the in-memory, fully
    deterministic twin of ``ivf_build_index(quantize=True)`` →
    :func:`ivf_query_index`, shaped for oracle replay like
    :func:`ivf_topk`): assignment and probing run on the exact vectors
    (quantization never moves list membership), candidate scoring runs
    on DEQUANTIZED values ``q·scale`` — every step an exact expression
    (floor-half-up quantize, IEEE multiply, expression cosine), so an
    external engine replays cosines bit-for-bit. ``rescore=True``
    re-ranks each query's top k·factor quantized candidates by exact
    cosine against the original corpus (point-lookup join), returning
    exact scores."""
    cents = make_centroids_from_sample(corpus, n_centroids, id_col, vec_col)
    corpus_a = ivf_assign(corpus, cents, id_col, vec_col)
    qlists = quantize_embeddings_int8(corpus_a, id_col, vec_col, keep_cols=["centroid_id"])
    probes = _probe_centroids(queries, cents, n_probe, id_col, vec_col)
    cands = _lists_as_candidates(qlists, id_col, vec_col)
    return _score_probed_lists(
        cands, probes, k, corpus if rescore else None, rescore_factor, id_col, vec_col
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Sign-LSH bucket id per vector: bit b = sign(v · h_b) for
    deterministic pseudo-random hyperplanes derived from (seed, plane,
    dim) via a splitmix-style integer mix — reproducible across runs and
    engines, no RNG state. Cosine-close vectors collide with high
    probability; use buckets to bound near-dup verification."""
    first = df.select(vec_col).first()
    if first is None:  # empty input — bucket column still materializes
        return df.withColumn("bucket", F.lit(0).cast("long"))
    dim = len(first[0])
    return df.withColumn("bucket", _sign_bucket_expr(vec_col, dim, n_planes, seed))


def _sign_bucket_expr(vec_col: str, dim: int, n_planes: int, seed: int) -> Column:
    """The sign-LSH bucket id as a pure Column expression (shared by the
    single-table and fused multi-table paths)."""
    planes = [
        [_unit_hash(seed, p, d) for d in range(dim)]
        for p in range(n_planes)
    ]
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))
    return bucket


def _unit_hash(seed: int, p: int, d: int) -> float:
    """Deterministic value in [-1, 1) from (seed, plane, dim) — splitmix64."""
    x = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return (x / 2**63) - 1.0


def embedding_pairs_fast(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    small_input: bool = False,
    n_blocks: int | None = None,
) -> DataFrame:
    """EXACT all-pairs with cosine ≥ threshold via DISTRIBUTED blocked
    GEMM: vectors are hashed into ``n_blocks`` blocks, every unordered
    block pair (bi ≤ bj) becomes one task, and each task matmuls its two
    normalized block matrices and emits only pairs over threshold with
    id_a < id_b. No corpus materialization anywhere: executor memory per
    task is two blocks (~2·N/n_blocks·dim doubles), shuffle volume is
    ~n_blocks× the vector data — both tunable via ``n_blocks``, so the
    operator survives corpora whose full matrix fits on NO single node.
    The O(N²/n_blocks²)-per-task compute is inherent to exact all-pairs;
    for sub-quadratic candidate generation use hyperplane_lsh_buckets and
    verify within buckets (recall < 1).

    ~100× the per-pair throughput of expression cosine (numpy SIMD vs
    interpreted higher-order functions); same pair set as the exact
    expression operator, cos equal up to GEMM summation order
    (|Δcos| ≲ 1e-15 — pinned in tests/test_similarity.py).

    ``small_input=True`` keeps the legacy single-broadcast path (corpus
    collected to the driver once, each partition scored against it) —
    ONLY for inputs known to fit in driver memory; it saves the
    block-replication shuffle but is a driver OOM at corpus scale."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession

    if small_input:
        rows = df.select(id_col, vec_col).collect()
        if not rows:
            return spark.createDataFrame([], "id_a long, id_b long, cos double")
        ids = np.array([r[0] for r in rows])
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        bq = spark.sparkContext.broadcast((ids, mat))

        def kernel(batches):
            all_ids, all_mat = bq.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                bids = pdf[id_col].to_numpy()
                bmat = np.array(list(pdf[vec_col]), dtype=np.float64)
                bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
                sims = bmat @ all_mat.T
                bi, aj = np.nonzero((sims >= threshold) & (bids[:, None] < all_ids[None, :]))
                yield pd.DataFrame(
                    {"id_a": bids[bi], "id_b": all_ids[aj], "cos": sims[bi, aj]}
                )

        return ensure_min_parallelism(
            df.select(id_col, vec_col), small_bytes=32 << 20
        ).mapInPandas(kernel, schema="id_a long, id_b long, cos double")

    import math

    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_blocks is None:
        # Block count balances two costs: B(B+1)/2 tasks should feed the
        # cluster, but each vector is shuffled ~B times, so tiny corpora
        # want few blocks. Target ~4k vectors per block (a 4096×dim
        # double matrix is a few MB), capped so task count tracks core
        # count. The sizing count() is a real job, and `vecs` also feeds
        # both join sides below — persist so derived/filtered inputs
        # (e.g. the per-LSH-bucket invocation) evaluate their upstream
        # plan once, with the count doubling as the materializing action.
        # Callers passing n_blocks explicitly skip both the job and the
        # persist (their input re-evaluates per side — the right default
        # for raw source scans, where recompute is cheaper than caching).
        vecs = vecs.persist()
        n = vecs.count()
        by_size = math.ceil(n / 4096)
        by_cores = math.ceil(math.sqrt(2 * spark.sparkContext.defaultParallelism))
        n_blocks = max(2, min(by_size, 4 * by_cores))
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int")
    vecs = vecs.withColumn("b", blk)
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)], "bi int, bj int"
    )
    # each vector joins every block pair its block participates in —
    # side L for pairs (b, *), side R for pairs (*, b); the (b, b)
    # diagonal keeps only side L and compares the block to itself
    left = vecs.join(F.broadcast(pairs), F.col("b") == F.col("bi")).select(
        "bi", "bj", F.lit("L").alias("side"), "id", "v"
    )
    right = vecs.join(
        F.broadcast(pairs), (F.col("b") == F.col("bj")) & (F.col("bi") != F.col("bj"))
    ).select("bi", "bj", F.lit("R").alias("side"), "id", "v")
    tagged = left.unionByName(right)

    def block_pair_gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cos": pd.Series(dtype="float64")})
        lmask = pdf["side"].to_numpy() == "L"
        lids = pdf["id"].to_numpy()[lmask]
        # diagonal = the (b, b) self-comparison group. Must key off the
        # GROUP KEY, not data presence: an off-diagonal pair whose right
        # block happens to be empty is all-L too, and treating it as a
        # self-comparison would re-emit the left block's pairs once per
        # such group (reproduced with 4 ids hashing to one block).
        diagonal = bool(pdf["bi"].iloc[0] == pdf["bj"].iloc[0])
        rids = lids if diagonal else pdf["id"].to_numpy()[~lmask]
        if len(lids) == 0 or len(rids) == 0:
            return empty
        lmat = np.array(list(pdf["v"][lmask]), dtype=np.float64)
        lmat /= np.linalg.norm(lmat, axis=1, keepdims=True)
        if diagonal:
            rmat = lmat
        else:
            rmat = np.array(list(pdf["v"][~lmask]), dtype=np.float64)
            rmat /= np.linalg.norm(rmat, axis=1, keepdims=True)
        sims = lmat @ rmat.T
        hot = sims >= threshold
        # emit each qualifying pair once, oriented (min_id, max_id). On
        # the diagonal both orientations of a pair are present in `sims`,
        # so `<` alone covers everything; off-diagonal the blocks are
        # disjoint and the pair appears once, in whichever orientation.
        li, rj = np.nonzero(hot & (lids[:, None] < rids[None, :]))
        id_a, id_b, cos = lids[li], rids[rj], sims[li, rj]
        if not diagonal:
            li2, rj2 = np.nonzero(hot & (lids[:, None] > rids[None, :]))
            id_a = np.concatenate([id_a, rids[rj2]])
            id_b = np.concatenate([id_b, lids[li2]])
            cos = np.concatenate([cos, sims[li2, rj2]])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos": cos})

    scored = tagged.groupBy("bi", "bj").applyInPandas(
        block_pair_gemm, schema="id_a long, id_b long, cos double"
    )
    return scored


def ivf_build_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    quantize: bool = False,
) -> None:
    """Materialize an IVF index: corpus written ``partitionBy(centroid_id)``
    plus a ``centroids`` side table. Probing then reads ONLY the probed
    centroid partitions (hive partition pruning) — at 100 TB a 4-of-256
    probe touches ~1.6% of the bytes. ``refine_iters`` Lloyd rounds are
    worth paying at build time (build once, probe forever).

    ``quantize=True`` stores the lists INT8-QUANTIZED (id, scale, qvec —
    :func:`quantize_embeddings_int8`): 4×/8× smaller lists, so a probe
    moves 4-8× fewer bytes and more of the index fits page cache, at a
    bounded per-element error (≤ scale/2). Assignment still happens on
    the exact vectors (quantization never moves a vector across a
    centroid boundary); probes score against dequantized values
    (deterministic — the oracle replays them), and
    :func:`ivf_query_index` can exact-rescore top candidates from the
    original corpus to cancel the ranking error (measured: quantized
    probe recall equals exact-probe recall on the test corpus even
    before rescoring; RECALL.json)."""
    cents = make_centroids_from_sample(corpus, n_centroids, id_col, vec_col)
    if refine_iters > 0:
        cents = kmeans_refine(corpus, cents, n_iter=refine_iters, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)
    if quantize:
        assigned = quantize_embeddings_int8(assigned, id_col, vec_col, keep_cols=["centroid_id"])
    assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(f"{path}/lists")
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_query_index(
    spark,
    path: str,
    queries: DataFrame,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescore_with: DataFrame | None = None,
    rescore_factor: int = 4,
) -> DataFrame:
    """ANN lookup against a persisted IVF index: per query pick the
    ``n_probe`` nearest centroids, scan only those list partitions
    (`centroid_id IN (...)` prunes at the file level), score, window
    top-k. Same output schema as brute_force_topk.

    A quantized index (built with ``quantize=True``) is detected from
    the list schema and scored on DEQUANTIZED values. ``rescore_with``
    (the original exact-vector corpus) re-ranks each query's top
    ``k·rescore_factor`` quantized candidates by exact cosine — a
    candidate-id point-lookup join, tiny at any scale — so the returned
    cosines are exact and quantization can only cost recall if a true
    neighbor fell below the k·factor cut."""
    cents = spark.read.parquet(f"{path}/centroids")
    probes = _probe_centroids(queries, cents, n_probe, id_col, vec_col)
    probed_ids = [r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()]

    lists = spark.read.parquet(f"{path}/lists").filter(F.col("centroid_id").isin(probed_ids))
    cands = _lists_as_candidates(lists, id_col, vec_col)
    return _score_probed_lists(cands, probes, k, rescore_with, rescore_factor, id_col, vec_col)


def _assign_spill(
    df: DataFrame, cents: DataFrame, spill: int, id_col: str, vec_col: str
) -> DataFrame:
    """List assignment honoring the layout's ``spill`` factor: 1 = the
    classic single nearest centroid; r > 1 = each vector lands in its r
    nearest lists (boundary SPILLING — the SPANN/ScaNN closure-assignment
    idea, public designs). r× list storage buys recall that query-side
    n_probe alone can't reach when true neighbors straddle centroid
    boundaries; queries dedup the copies (see _score_probed_lists)."""
    if spill <= 1:
        return ivf_assign(df, cents, id_col, vec_col)
    return ivf_assign_topk(df, cents, k=spill, id_col=id_col, vec_col=vec_col).drop(
        "member_rank"
    )


def ivf_build_index_manifest(
    corpus: DataFrame,
    table: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    quantize: bool = False,
    spill: int = 1,
) -> int:
    """Version 1 of the MANIFEST-COMMITTED incremental IVF index: the
    ANN twin of the incremental inverted index (retrieval.py) — a 100 TB
    embedding corpus grows continuously, and re-clustering the world per
    crawl batch is not a plan. Two stores under one manifest version:

    - ``lists`` — the assigned (and optionally int8-quantized) vectors,
      hive-partitioned by ``__list`` (a copy of ``centroid_id``: the
      partition segment gives zero-I/O file pruning from manifest
      metadata, the data column survives for the probe join);
    - ``centroids`` — the coarse quantizer, FROZEN at build time: deltas
      assign against it (the standard IVF maintenance contract — FAISS
      ``add`` semantics), so historical list membership never moves and
      delta commits touch only their own files.

    Readers pin a version; :func:`upsert_ivf_index` merges a vector
    delta as one atomic commit with replay protection. Drift governance
    (re-train + full rebuild when the frozen quantizer degrades) is a
    new ``ivf_build_index_manifest`` call on a fresh table — the
    manifest makes the cutover a reader-side pointer swap."""
    return _commit_ivf_delta(
        corpus,
        table,
        n_centroids=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        refine_iters=refine_iters,
        quantize=quantize,
        spill=spill,
    )


def upsert_ivf_index(delta: DataFrame, table: str, delta_id: str | None = None) -> int | None:
    """Merge new vectors into the manifest IVF index as ONE atomic
    commit: assign against the FROZEN centroids, append list files.
    Idempotent twice over (``delta_id`` commit-meta check, O(#versions);
    plus an id anti-join against the stored lists, so redelivered
    vectors never duplicate). Returns the committed version, or None for
    a no-op replay."""
    return _commit_ivf_delta(delta, table, delta_id=delta_id)


def _commit_ivf_delta(
    vectors: DataFrame,
    table: str,
    n_centroids: int | None = None,
    id_col: str | None = None,
    vec_col: str | None = None,
    refine_iters: int = 0,
    quantize: bool = False,
    delta_id: str | None = None,
    spill: int = 1,
) -> int | None:
    import json

    from pyspark.sql import types as T

    from cashback_data_pipeline_spark.sinks import manifest as M

    from cashback_data_pipeline_spark.session import (
        checkpointed_rdd_id,
        unpersist_rdd_ids,
    )

    spark = vectors.sparkSession
    while True:
        cur = M.current_version(table)
        ckpts: set = set()
        if cur is None:
            if n_centroids is None:
                raise FileNotFoundError(
                    f"no committed IVF index in {table}; ivf_build_index_manifest first"
                )
            # checkpointed: the seed pipeline (scan + global sort + limit
            # + window) otherwise executes THREE times — the emptiness
            # check, the assign broadcast, and the centroids store write
            # (OPTIMIZATION r12, guide §5; k rows, memory-trivial)
            cents = make_centroids_from_sample(
                vectors, n_centroids, id_col, vec_col
            ).localCheckpoint()
            ckpts.add(checkpointed_rdd_id(cents))
            if not cents.head(1):
                # the quantizer is FROZEN at build: an empty centroid set
                # would silently drop every future delta's vectors
                # (ivf_assign against nothing) while still committing
                # versions — refuse instead
                unpersist_rdd_ids(spark, {i for i in ckpts if i is not None})
                raise ValueError(
                    "cannot build an IVF manifest index from an empty corpus: "
                    "the frozen coarse quantizer would have no centroids and "
                    "every future upsert_ivf_index delta would be dropped"
                )
            if refine_iters > 0:
                cents = kmeans_refine(vectors, cents, n_iter=refine_iters, id_col=id_col, vec_col=vec_col)
            layout = {
                "kind": "ivf_index",
                "n_centroids": n_centroids,
                "id_col": id_col,
                "vec_col": vec_col,
                "quantize": quantize,
                "spill": spill,
                "id_field": vectors.schema[id_col].jsonValue(),
            }
            prev = None
            old_files: list[str] = []
            fresh = vectors
        else:
            prev = M.read_manifest(table, cur)
            layout = prev["meta"]["layout"]
            if delta_id is not None and delta_id in prev["meta"].get("delta_ids", []):
                return None
            id_col, vec_col, quantize = layout["id_col"], layout["vec_col"], layout["quantize"]
            spill = layout.get("spill", 1)
            cents = M.read_store(spark, table, "centroids", version=cur)
            keep = set(M.store_files(prev, "lists")) | set(M.store_files(prev, "centroids"))
            old_files = [f for f in prev["files"] if f in keep]
            known = M.read_store(
                spark,
                table,
                "lists",
                version=cur,
                # empty-store fallback (a v1 built from an empty corpus):
                # the manifest schema is the listed-vector schema
                schema=T.StructType.fromJson(json.loads(prev["schema"])),
            ).select(F.col(id_col))
            # checkpointed: the anti-join otherwise executes twice (the
            # no-op redelivery check and the commit write); the
            # materialized relation is the delta batch itself — exactly
            # what this commit is about to write (OPTIMIZATION r12,
            # guide §5, same move as the inverted-index delta commit)
            fresh = vectors.join(known, id_col, "left_anti").localCheckpoint()
            ckpts.add(checkpointed_rdd_id(fresh))
            if not fresh.head(1):
                unpersist_rdd_ids(spark, {i for i in ckpts if i is not None})
                return None  # full redelivery — no version churn

        try:
            # in-batch id dedup (deterministic winner by vector hash): a
            # redelivered vector arriving twice IN ONE delta would insert two
            # list entries — the anti-join above only screens committed ids
            wdup = W.partitionBy(id_col).orderBy(F.xxhash64(F.col(vec_col)).asc())
            fresh = (
                fresh.withColumn("__rn", F.row_number().over(wdup))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            assigned = _assign_spill(fresh, cents, spill, id_col, vec_col)
            if quantize:
                assigned = quantize_embeddings_int8(assigned, id_col, vec_col, keep_cols=["centroid_id"])
            listed = assigned.withColumn("__list", F.col("centroid_id"))

            cid = M.new_commit_id()
            if cur is None:
                # own commit dir: a later compaction supersedes v1's lists
                # but keeps the frozen centroids forever — sharing a dir
                # would make v1's dead list files unreclaimable by the
                # dir-granularity vacuum. The two store writes are
                # independent jobs over checkpointed/literal inputs —
                # overlap their scheduling latencies (guide §2.6)
                from concurrent.futures import ThreadPoolExecutor

                cid2 = M.new_commit_id()
                with ThreadPoolExecutor(max_workers=2) as pool:
                    f_lists = pool.submit(
                        M.write_store_files,
                        listed.repartition("__list"), table, cid, "lists",
                        partition_by="__list",
                    )
                    f_cents = pool.submit(
                        M.write_store_files, cents, table, cid2, "centroids"
                    )
                    files = f_lists.result() + f_cents.result()
            else:
                files = M.write_store_files(
                    listed.repartition("__list"), table, cid, "lists", partition_by="__list"
                )
            delta_ids = list((prev or {}).get("meta", {}).get("delta_ids", []))
            if delta_id is not None:
                delta_ids.append(delta_id)
            meta = {"layout": layout, "delta_ids": delta_ids}
            if M._try_commit(
                table,
                (cur or 0) + 1,
                old_files + files,
                cur,
                json.dumps(listed.schema.jsonValue()),
                meta=meta,
            ):
                return (cur or 0) + 1
            # CAS lost — recompute against the winner (orphans → vacuum)
        finally:
            rids = {i for i in ckpts if i is not None}
            if rids:
                unpersist_rdd_ids(spark, rids)


def compact_ivf_index(
    spark, table: str, retrain: bool = False, refine_iters: int = 3, spill: int | None = None
) -> int:
    """Maintenance for the incremental IVF index: each
    :func:`upsert_ivf_index` commit adds one small file per touched
    list, so a long-running vector ingest accumulates per-epoch file
    fragments and probes pay file-open overhead per delta. Rewrites the
    lists store to one file per ``__list`` partition as ONE new manifest
    version; pinned readers unaffected, ``delta_ids`` carried forward so
    replays stay no-ops, CAS retries on a racing delta commit.

    ``retrain=False`` (default) keeps the coarse quantizer FROZEN (the
    FAISS ``add`` contract): centroid files carry forward untouched and
    only file layout changes. ``retrain=True`` is the drift-governance
    path (VERDICT r6 item 4): a corpus whose distribution shifts across
    many deltas degrades unboundedly under a frozen quantizer, so this
    re-clusters the CURRENT vectors (deterministic content-hash SPREAD
    seed — :func:`make_centroids_spread`, proportional to the current
    distribution's modes instead of the oldest ids — +
    ``refine_iters`` Lloyd rounds — the same machinery as a fresh
    build), REASSIGNS every vector to the new centroids, and commits
    new lists + new centroids as ONE manifest version. Readers pinned
    to older versions keep the old quantizer+lists coherently; future
    :func:`upsert_ivf_index` deltas assign against the new centroids.
    For an int8-quantized index the stored ``q·scale`` reconstructions
    feed the retrain (the FAISS reconstruction-retrain practice);
    re-quantization is exact on its own output (scale round-trips), so
    retraining never compounds quantization error.

    ``spill`` (retrain only) re-lays the lists with that spill factor
    (:func:`_assign_spill` — each vector in its ``spill`` nearest lists;
    ``None`` keeps the layout's current factor). Boundary spilling is
    the index-side recall lever when a drifted corpus leaves true
    neighbors straddling list boundaries: measured on the shifted-delta
    workload (RECALL.json), retrained recall@5 at n_probe=4 goes 0.56
    (spill 1) → 0.84 (spill 3) → 0.92 (spill 4, = fresh-build quality on
    the un-drifted corpus), at spill× list storage and ~n_probe·spill/
    n_centroids candidate fraction per probe."""
    import json

    from pyspark.sql import types as T

    from cashback_data_pipeline_spark.sinks import manifest as M

    while True:
        cur = M.current_version(table)
        if cur is None:
            raise FileNotFoundError(f"no committed IVF index in {table}")
        prev = M.read_manifest(table, cur)
        layout = prev["meta"]["layout"]
        cid = M.new_commit_id()
        lists = M.read_store(
            spark,
            table,
            "lists",
            version=cur,
            schema=T.StructType.fromJson(json.loads(prev["schema"])),
        )
        meta = {
            "layout": layout,
            "delta_ids": prev["meta"].get("delta_ids", []),
            "compaction": True,
        }
        if retrain:
            id_col, vec_col = layout["id_col"], layout["vec_col"]
            new_spill = layout.get("spill", 1) if spill is None else spill
            layout = {**layout, "spill": new_spill}
            meta["layout"] = layout
            if layout["quantize"]:
                vectors = dequantize_embeddings_int8(lists, id_col).withColumnRenamed(
                    "embedding", vec_col
                )
            else:
                vectors = lists.select(F.col(id_col), F.col(vec_col))
            # a spilled store holds each vector once PER membership — the
            # copies are identical, so one-per-id is deterministic
            vectors = vectors.dropDuplicates([id_col])
            cents = make_centroids_spread(vectors, layout["n_centroids"], id_col, vec_col)
            if refine_iters > 0:
                cents = kmeans_refine(
                    vectors, cents, n_iter=refine_iters, id_col=id_col, vec_col=vec_col
                )
            assigned = _assign_spill(vectors, cents, new_spill, id_col, vec_col)
            if layout["quantize"]:
                assigned = quantize_embeddings_int8(
                    assigned, id_col, vec_col, keep_cols=["centroid_id"]
                )
            listed = assigned.withColumn("__list", F.col("centroid_id"))
            files = M.write_store_files(
                listed.repartition("__list"), table, cid, "lists", partition_by="__list"
            )
            # the retrained quantizer gets its own commit dir so the old
            # one stays vacuum-reclaimable at dir granularity
            files += M.write_store_files(cents, table, M.new_commit_id(), "centroids")
            meta["retrain"] = True
        else:
            listed = lists.withColumn("__list", F.col("centroid_id"))
            files = M.write_store_files(
                listed.repartition("__list"), table, cid, "lists", partition_by="__list"
            )
            files += M.store_files(prev, "centroids")  # immutable, reused as-is
        if M._try_commit(table, cur + 1, files, cur, prev["schema"], meta=meta):
            return cur + 1


def ivf_query_index_manifest(
    spark,
    table: str,
    queries: DataFrame,
    n_probe: int = 4,
    k: int = 10,
    rescore_with: DataFrame | None = None,
    rescore_factor: int = 4,
    version: int | None = None,
) -> DataFrame:
    """ANN lookup against the manifest IVF index at a PINNED version:
    probes pick ``n_probe`` centroids per query, then ONLY list files
    whose ``__list=`` path segment matches a probed centroid are opened
    — pruning from manifest metadata, no directory listing, and a
    concurrent upsert can never tear the read. Quantized lists are
    scored dequantized; ``rescore_with`` re-ranks top k·factor
    candidates by exact cosine (see :func:`ivf_query_index`)."""
    import json
    import re

    from pyspark.sql import types as T

    from cashback_data_pipeline_spark.sinks import manifest as M

    v = M.current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed IVF index in {table}")
    m = M.read_manifest(table, v)
    layout = m["meta"]["layout"]
    id_col, vec_col = layout["id_col"], layout["vec_col"]

    def _empty() -> DataFrame:
        id_field = T.StructField.fromJson(layout["id_field"])
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", id_field.dataType),
                    T.StructField("neighbor_id", id_field.dataType),
                    T.StructField("cos", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )

    cents = M.read_store(spark, table, "centroids", version=v)
    # checkpointed: the probe pipeline (broadcast-join + window top-n)
    # otherwise executes twice — once for the list-pruning id collect
    # below and again inside the scoring plan's broadcast
    # (OPTIMIZATION r12, guide §5; n_queries×n_probe rows)
    probes = _probe_centroids(queries, cents, n_probe, id_col, vec_col).localCheckpoint()
    want = {r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()}
    if not want:
        # empty query set (or an index with zero centroids): nothing to
        # probe — empty result, not a FileNotFoundError from an
        # all-pruned store read
        return _empty()

    def list_filter(relpath: str) -> bool:
        mt = re.search(r"__list=(\d+)", relpath)
        return mt is not None and int(mt.group(1)) in want

    lists = M.read_store(
        spark,
        table,
        "lists",
        version=v,
        file_filter=list_filter,
        # every probed centroid may have zero assigned vectors (refined
        # centroids can empty a list): an all-pruned read falls back to
        # the manifest schema and yields an empty result
        schema=T.StructType.fromJson(json.loads(m["schema"])),
    )
    cands = _lists_as_candidates(lists, id_col, vec_col)
    return _score_probed_lists(
        cands,
        probes,
        k,
        rescore_with,
        rescore_factor,
        id_col,
        vec_col,
        dedup=layout.get("spill", 1) > 1,
    )


def _float_sql_literal(x) -> str:
    """A float32-exact SQL literal for one collected centroid element.
    ``repr`` of a float32-exact double is its shortest round-tripping
    decimal form, so parse→CAST(AS FLOAT) reproduces the value bit for
    bit; NaN/±Infinity/NULL spelled in the forms Spark's parser takes."""
    if x is None:
        return "CAST(NULL AS FLOAT)"
    if x != x:
        return "CAST('NaN' AS FLOAT)"
    if x == float("inf"):
        return "CAST('Infinity' AS FLOAT)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS FLOAT)"
    return f"CAST({x!r} AS FLOAT)"


def _centroids_literal_df(spark, rows: dict) -> DataFrame:
    """(centroid_id, centroid array<float>) as a constant-folded VALUES
    relation: ResolveInlineTables evaluates the foldable casts eagerly
    into a LocalRelation, so broadcasting it (every ivf_assign) is a
    driver-side executeCollect — zero jobs, zero tasks (the same
    literal-SQL move as retrieval._bucket_ids)."""
    vals = ", ".join(
        f"({int(cid)}, array({', '.join(_float_sql_literal(x) for x in vec)}))"
        for cid, vec in sorted(rows.items())
    )
    return spark.sql(f"SELECT * FROM VALUES {vals} AS t(centroid_id, centroid)")


def kmeans_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of IVF centroids, fully relational:

        assign (broadcast centroids, argmin)            — existing ivf_assign
        → posexplode vectors to (centroid, pos, val)
        → groupBy(centroid, pos).avg                    — element-wise mean
        → collect_list ordered by pos → new centroid vectors

    Each iteration is one assign + one two-level aggregate; no vectors
    ever collect to the driver. Empty clusters keep their previous
    centroid (join-coalesce), so k never shrinks. Deterministic given the
    deterministic seeding (make_centroids_from_sample).

    Each round ends in ``localCheckpoint`` — iterative DataFrames must
    truncate lineage per round (``cache()`` does NOT; analysis cost grows
    with plan depth otherwise). The checkpointed relation is k×dim
    doubles — trivially small.

    OPTIMIZATION r12 (guide §2.3/§2.4): the element-wise mean is ONE
    hash aggregate of ``dim`` ``avg(element_at(vec, i))`` columns
    instead of posexplode → (centroid, pos) aggregate → collect_list →
    array_sort — one shuffle of k×dim partials per round instead of a
    n×dim-row explode shuffle plus a second aggregate, and three fewer
    stages per round. Same values averaged per (centroid, position);
    partial-sum order differences are absorbed by the float32 centroid
    storage exactly as before (that is what it exists for).

    OPTIMIZATION r12b (guide §5): the k×dim float32 centroid table
    lives on the DRIVER between rounds — each round is ONE
    aggregate-and-collect job and the merged table re-enters the next
    round's plan as a constant-folded literal (LocalRelation), so the
    assign's broadcast needs no job and the per-round
    join + localCheckpoint jobs disappear (profiled: semantic_dedup is
    stage-count-bound, ~45 mostly-1-task stages for 2.1 s of task
    time). Values are bit-identical: the float32 cast still happens in
    the SAME plan position (on the collected aggregate), the
    driver-side merge only replaces the empty-cluster
    coalesce-with-previous, and repr→parse round-trips float32-exact
    doubles exactly."""
    first_vec = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if first_vec is None:
        return centroids  # empty corpus: nothing to assign, k unchanged
    dim = int(first_vec["d"])
    spark = corpus.sparkSession
    cur_rows = {
        int(r["centroid_id"]): list(r["centroid"]) for r in centroids.collect()
    }
    if not cur_rows:
        # no centroids to refine: every round would assign nothing and
        # keep the (empty) table — return it unchanged, as before
        return centroids
    current = centroids
    for _ in range(n_iter):
        assigned = ivf_assign(corpus, current, id_col, vec_col)
        v = F.col(vec_col).cast("array<double>")
        means = assigned.groupBy("centroid_id").agg(
            *[F.avg(F.element_at(v, i + 1)).alias(f"__m{i}") for i in range(dim)]
        )
        new_cents = means.select(
            "centroid_id",
            F.array(*[F.col(f"__m{i}") for i in range(dim)])
            .cast("array<float>")
            .alias("centroid_new"),
        )
        for r in new_cents.collect():
            # clusters absent from the assignment keep their previous
            # centroid, exactly as the old left-join + coalesce did
            if r["centroid_id"] in cur_rows:
                cur_rows[int(r["centroid_id"])] = list(r["centroid_new"])
        current = _centroids_literal_df(spark, cur_rows)
    return current


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Symmetric per-vector int8 quantization: (id, scale, qvec) with
    ``scale = max|v|/127`` and ``q_i = round_half_up(v_i / scale)`` —
    4× (vs float32) / 8× (vs float64) smaller embedding storage with
    bounded error (|v − q·scale| ≤ scale/2 per element), the standard
    compression step before a 100 TB ANN corpus goes to disk.

    Pure two-projection map (scale bound once, then the transform) —
    zero shuffle, codegen'd. Rounding is the engine-portable
    ``floor(x + 0.5)`` form so validation oracles replicate it exactly.
    """
    v = F.col(vec_col).cast("array<double>")
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        v.alias("__v"),
        (
            F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)) / 127.0
        ).alias("scale"),
    )
    # tinyint, not int: values are bounded in [-127, 127] by construction
    # (scale = max|v|/127), and a 4-byte element would silently forfeit
    # the advertised 4×/8× storage compression
    q = F.transform(
        "__v", lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("tinyint")
    )
    return base.select(id_col, *keep_cols, "scale", q.alias("qvec"))


def dequantize_embeddings_int8(
    df: DataFrame, id_col: str = "vec_id", qvec_col: str = "qvec", scale_col: str = "scale"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings_int8`: (id, embedding
    array<double>) with ``v_i ≈ q_i · scale``."""
    v = F.transform(F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col))
    return df.select(F.col(id_col), v.alias("embedding"))


def semantic_dedup(
    df: DataFrame,
    n_clusters: int | None = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
    memberships: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings with the IVF coarse quantizer, compute pairwise
    cosine WITHIN clusters only, and drop every vector that has a
    smaller-id in-cluster neighbor at cosine ≥ threshold (deterministic
    keep-lowest-id rule — order-free, replayable in any engine).

    Output: (id, centroid_id, max_prior_cos, keep) for every input row;
    ``max_prior_cos`` is the best cosine against any smaller-id cluster
    mate (NULL when the vector is its cluster's lowest id).

    Scale: the all-pairs space collapses from n²/2 to Σ_c |c|²/2.
    ``n_clusters=None`` auto-sizes k = ceil(n/1024) so expected cluster
    population is constant and total pair work is LINEAR in n (a fixed k
    is quadratic again — the 1×→10× scale check measured exponent 1.19
    on the fixed-k form); the within-cluster maxima run as one GEMM
    applyInPandas group per cluster, and each vector crosses the shuffle
    once keyed by centroid_id. Auto-k's centroid table is n/1024 rows —
    broadcastable to ~1M centroids (≈512 MB at dim 64); beyond that,
    shard the corpus first. Cross-cluster near-dups are missed by
    construction (the SemDeDup trade); raise ``refine_iters`` to tighten
    cluster quality, and/or ``memberships`` > 1 for SHADOW MEMBERSHIP
    (each vector also joins its next-nearest clusters' pair pools, so a
    near-dup pair straddling a cluster edge shares at least one pool
    with high probability — measured drop-recall on the sf0.01 corpus:
    0.21 primary-only → 0.45 top-2 → 0.77 top-3 (0.79 for top-2 plus
    two Lloyd rounds), at k× the membership rows, still linear total
    work; see RECALL.json). The keep decision and ``centroid_id`` stay
    keyed to the PRIMARY cluster; ``max_prior_cos`` is the max across
    all shared pools.
    """
    import math

    import numpy as np
    import pandas as pd

    if n_clusters is None:
        # auto-size so expected cluster population ~1k: total pair work
        # stays ~n*1k (linear) instead of n^2/k — the fixed-k variant
        # measured exponent 1.19 at 1x->10x before this existed
        n_clusters = max(1, math.ceil(df.count() / 1024))
    cents = make_centroids_from_sample(df, n_clusters, id_col, vec_col)
    if refine_iters > 0:
        cents = kmeans_refine(df, cents, n_iter=refine_iters, id_col=id_col, vec_col=vec_col)
    if memberships > 1:
        # checkpointed because BOTH downstream legs (the rank-1 primary
        # assignment and the pair-pool prior) consume it: without this
        # the n×k broadcast-score + window plan executes twice
        # (OPTIMIZATION r12, guide §5 — reuse beats recompute here; the
        # relation is n·k (id, vec, cid, rank) rows, memory-trivial
        # relative to the corpus it derives from)
        member = ivf_assign_topk(
            df, cents, k=memberships, id_col=id_col, vec_col=vec_col
        ).localCheckpoint()
        assigned = member.filter(F.col("member_rank") == 1).drop("member_rank")
    else:
        assigned = ivf_assign(df, cents, id_col, vec_col)
        member = assigned

    # per-cluster GEMM for the smaller-id prior maximum (one applyInPandas
    # group per cluster): sims = M @ M.T on the id-sorted cluster matrix,
    # then column p's prior max is max(sims[:p, p]). Emits rows ONLY for
    # members that have a prior (not the cluster minimum), so the left
    # join below leaves max_prior_cos NULL exactly as the relational
    # formulation did. ~100x the expression-cosine join's per-pair
    # throughput and no two-arrays-per-row join materialization.
    def cluster_prior(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_b": pd.Series(dtype="int64"),
                                 "max_prior_cos": pd.Series(dtype="float64")})
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(list(pdf["v"].iloc[order]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        prior_max = np.max(np.where(np.arange(len(ids))[:, None] < np.arange(len(ids))[None, :], sims, -np.inf), axis=0)[1:]
        return pd.DataFrame({"id_b": ids[1:], "max_prior_cos": prior_max})

    prior = (
        member.select(
            F.col("centroid_id"),
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .groupBy("centroid_id")
        .applyInPandas(cluster_prior, schema="id_b long, max_prior_cos double")
    )
    if memberships > 1:
        # a vector belongs to up to `memberships` pools; its prior is the
        # max over every pool it shares with a smaller id
        prior = prior.groupBy("id_b").agg(F.max("max_prior_cos").alias("max_prior_cos"))
    return (
        assigned.join(prior, assigned[id_col] == prior["id_b"], "left")
        .select(
            F.col(id_col),
            "centroid_id",
            "max_prior_cos",
            (F.coalesce(F.col("max_prior_cos"), F.lit(-1.0)) < threshold).alias("keep"),
        )
    )


def bucket_pairs_gemm(
    bucketed: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | list[str] = "bucket",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Within-bucket exact near-dup pairs via per-bucket GEMM: one
    applyInPandas group per bucket, numpy matmul of the bucket's
    normalized matrix against itself, emit (id_a < id_b, cos ≥
    threshold). ~100× the per-pair throughput of the expression-cosine
    self-join (the 1×→10× scale check measured the expression path at
    84.6 s where this kernel runs in ~2 s on identical buckets), and the
    join's two-arrays-per-row materialization disappears — each vector
    crosses the shuffle once, keyed by bucket.

    ``bucket_col`` may be a list (compound bucket key, e.g. the
    multi-table LSH's (table, bucket)).

    ``max_bucket_size`` bounds the DEGENERATE-BUCKET failure mode (a
    skewed corpus concentrating in one bucket turns that bucket's GEMM
    into a single-task |b|²-memory hot spot): buckets larger than the
    cap are hash-split into ⌈|b|/cap⌉ sub-blocks and every unordered
    sub-block pair becomes its own GEMM task — the same distributed
    blocked-GEMM shape as :func:`embedding_pairs_fast`, so per-task
    memory stays ≤ cap² and a degenerate bucket parallelizes across the
    cluster instead of serializing on one executor. The pair set is
    IDENTICAL to the uncapped path (exact within bucket, each pair in
    exactly one sub-block group). The split is LAZY: the (bucket, count)
    aggregate finds oversized buckets, normal buckets take the plain
    one-group-per-bucket path via a broadcast anti-join against the
    (tiny) oversized-bucket list, and only oversized buckets' rows pay
    the ⌈|b|/cap⌉-way block-pair fan-out — with no skew the overhead is
    just the counts aggregate + a broadcast filter."""
    import numpy as np
    import pandas as pd

    keys = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    kcols = [f"__k{i}" for i in range(len(keys))]
    base = bucketed.select(
        *[F.col(k).alias(a) for k, a in zip(keys, kcols)],
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )

    empty = {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "cos": pd.Series(dtype="float64")}

    def _norm_mat(series) -> "np.ndarray":
        mat = np.array(list(series), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return mat

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(empty)
        mat = _norm_mat(pdf["v"])
        # memory belt-and-braces: a group that exceeded detection (cap
        # disabled, or sub-block hash imbalance) GEMMs in row slices, so
        # task memory is O(B·n) not O(n²); CPU identical, pair set
        # identical (each (i<j) pair is seen in exactly one row slice)
        B = 8192
        if len(ids) <= B:
            sims = mat @ mat.T
            i, j = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
            return pd.DataFrame({"id_a": ids[i], "id_b": ids[j], "cos": sims[i, j]})
        outs = []
        for lo in range(0, len(ids), B):
            sims = mat[lo : lo + B] @ mat.T
            i, j = np.nonzero((sims >= threshold) & (ids[lo : lo + B, None] < ids[None, :]))
            outs.append(pd.DataFrame({"id_a": ids[lo + i], "id_b": ids[j], "cos": sims[i, j]}))
        return pd.concat(outs, ignore_index=True)

    if max_bucket_size is None:
        return base.groupBy(*kcols).applyInPandas(kernel, schema="id_a long, id_b long, cos double")

    oversized_agg = (
        base.groupBy(*kcols)
        .agg(F.ceil(F.count(F.lit(1)) / max_bucket_size).cast("int").alias("__nblk"))
        .filter(F.col("__nblk") > 1)
    )
    # collect the (tiny: oversized buckets only) list to the driver and
    # rebuild it as a local relation: it is broadcast into both joins
    # below anyway, and a localCheckpoint here would pin RDD blocks with
    # no DataFrame-level unpersist handle for the session's lifetime on
    # every skewed invocation
    oversized_rows = oversized_agg.collect()
    if not oversized_rows:
        # no skew: the cap costs exactly one (bucket, count) aggregate and
        # the plan IS the uncapped plan — no anti-join, no second scan
        return base.groupBy(*kcols).applyInPandas(kernel, schema="id_a long, id_b long, cos double")
    from cashback_data_pipeline_spark.session import local_rows_df

    oversized = local_rows_df(base.sparkSession, oversized_rows, oversized_agg.schema)
    normal_pairs = base.join(
        F.broadcast(oversized.select(*kcols)), kcols, "left_anti"
    ).groupBy(*kcols).applyInPandas(kernel, schema="id_a long, id_b long, cos double")

    tagged = (
        base.join(F.broadcast(oversized), kcols)
        .withColumn("__blk", F.pmod(F.xxhash64("id"), F.col("__nblk")).cast("int"))
        .select(
            *kcols, "id", "v", "__blk",
            F.explode(F.sequence(F.lit(0), F.col("__nblk") - 1)).alias("__other"),
        )
        .select(
            *kcols, "id", "v", "__blk",
            F.least("__blk", "__other").alias("__lo"),
            F.greatest("__blk", "__other").alias("__hi"),
        )
    )

    def blocked_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = int(pdf["__lo"].iat[0]), int(pdf["__hi"].iat[0])
        if lo == hi:
            # the shared self-pair kernel: also row-sliced, so a
            # hash-imbalanced sub-block keeps the same memory bound as
            # the normal path
            return kernel(pdf)
        amask = pdf["__blk"].to_numpy() == lo
        aids = pdf["id"].to_numpy()[amask]
        bids = pdf["id"].to_numpy()[~amask]
        if len(aids) == 0 or len(bids) == 0:
            return pd.DataFrame(empty)
        amat = _norm_mat(pdf["v"][amask])
        bmat = _norm_mat(pdf["v"][~amask])
        sims = amat @ bmat.T
        i, j = np.nonzero(sims >= threshold)
        ia, jb = aids[i], bids[j]
        return pd.DataFrame(
            {"id_a": np.minimum(ia, jb), "id_b": np.maximum(ia, jb), "cos": sims[i, j]}
        )

    big_pairs = tagged.groupBy(*kcols, "__lo", "__hi").applyInPandas(
        blocked_kernel, schema="id_a long, id_b long, cos double"
    )
    return normal_pairs.unionByName(big_pairs)


def embedding_near_dups_lsh_fast(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    target_bucket_size: int = 1024,
    seed: int = 42,
    n_tables: int = 1,
    max_bucket_size: int | None = 8192,
    n_hint: int | None = None,
) -> DataFrame:
    """The self-scaling sub-quadratic embedding near-dup path: sign-LSH
    buckets SIZED TO THE CORPUS (``n_planes = ceil(log2(n /
    target_bucket_size))`` when not given — a FIXED plane count makes
    within-bucket work quadratic again, the exact failure the 1×→10×
    scale check caught at exponent 1.7), then per-bucket GEMM
    verification (:func:`bucket_pairs_gemm`).

    Work model: ~n/2^planes vectors per bucket → Σ|bucket|² ≈
    n·target_bucket_size total dot products, i.e. LINEAR in n at fixed
    target size. Recall < 1 vs the exact twin (embedding_pairs_fast) and
    drops as planes grow — target_bucket_size is the recall/throughput
    knob.

    A skew-degenerate bucket (all signs equal — e.g. a corpus of
    all-positive embeddings) degrades to that bucket's |b|² in ONE task;
    ``max_bucket_size`` (default 8× target) routes any bucket over the
    cap through distributed blocked GEMM (hash sub-blocks × block-pair
    tasks — see :func:`bucket_pairs_gemm`), bounding per-task memory and
    re-parallelizing the degenerate bucket with an identical pair set.
    Pass None to disable the (bucket, count) sizing aggregate.

    ``n_hint`` (corpus size, e.g. from table stats or a prior stage)
    sizes the plane count without the per-invocation ``df.count()`` job,
    so the production call is single-job at fixed/hinted n."""
    import math

    if n_planes is None:
        n = n_hint if n_hint is not None else df.count()
        n_planes = max(1, math.ceil(math.log2(max(2.0, n / target_bucket_size))))
    if n_tables <= 1:
        bucketed = hyperplane_lsh_buckets(df, n_planes=n_planes, id_col=id_col, vec_col=vec_col, seed=seed)
        return bucket_pairs_gemm(
            bucketed, threshold, id_col, vec_col, max_bucket_size=max_bucket_size
        )
    # OR-amplification: L independent tables (disjoint hyperplane seeds),
    # union of within-bucket pair sets. Single-table recall for a pair at
    # angle θ is p = (1−θ/π)^planes (measured 0.15 at cos 0.4 with 4
    # planes — exactly theory); L tables lift it to 1−(1−p)^L at L× the
    # (still linear) bucket work. FUSED plan: all L bucket ids compute in
    # ONE scan projection, fan out through ONE posexplode, and every
    # (table, bucket) group GEMMs in ONE applyInPandas stage — the naive
    # L-separate-pipelines formulation re-scanned the source and paid a
    # shuffle per table (measured exponent 1.39 at 1×→10× vs 0.9 fused).
    # groupBy max(cos) dedupes pairs found by several tables.
    first = df.select(vec_col).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cos double")
    dim = len(first[0])
    buckets = F.array(
        *[_sign_bucket_expr(vec_col, dim, n_planes, seed + 7919 * t) for t in range(n_tables)]
    )
    tagged = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.posexplode(buckets).alias("tbl", "bkt")
    )
    allp = bucket_pairs_gemm(
        tagged, threshold, "id", "v", bucket_col=["tbl", "bkt"], max_bucket_size=max_bucket_size
    )
    return allp.groupBy("id_a", "id_b").agg(F.max("cos").alias("cos"))
