"""Lexical and hybrid retrieval over the document corpus.

A training-data pipeline needs LEXICAL search next to the embedding ANN
paths (operators/similarity): targeted corpus probes ("find documents
mentioning X"), keyword-based decontamination audits, and the lexical
leg of hybrid RAG retrieval. Everything here is plain DataFrame algebra
— tokenize → aggregate → window — so Catalyst owns the plan and every
score is replayable in ANSI SQL (these operators' queries are fully
DuckDB-oracled, unlike typical search engines' opaque scoring).

Scale shape: one explode + two aggregations over (term, doc) longs; the
per-term document frequencies are a broadcast-sized relation for any
real vocabulary; top-k cuts are windows over (score, id) total orders.
Scores are quantized at 1e-6 for cross-engine rank stability (repo
convention, same as the embedding cosines).

Public references: BM25 per Robertson/Spärck Jones (the Lucene/Elastic
``k1``/``b`` parameterization and idf form), reciprocal-rank fusion per
Cormack/Clarke/Büttcher 2009.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _q6(c: Column) -> Column:
    """1e-6 quantization — engine-portable floor-half-up."""
    return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000


def _topk_ranked(scored: DataFrame, k: int, id_col: str, score_col: str) -> DataFrame:
    """Distributed global top-k WITH rank column: orderBy+limit compiles
    to TakeOrderedAndProject (per-partition heaps + driver merge — no
    single-partition window over the full scored relation, which is
    what a bare global row_number() costs), then the rank window runs
    on the ≤k surviving rows. Same result as ranking first: the limit
    and the window share one total order."""
    w = W.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (
        scored.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(id_col, score_col, "rank")
    )


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, term) pairs: whitespace tokenization (the corpus convention,
    same as text.vocab_top_terms), empty terms and NULL texts dropped."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
        .filter(F.col("term") != "")
    )


def tfidf_keywords(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k keywords per document by tf·idf (idf = ln(N/df), N = docs
    with text): the classic per-document summarization/indexing score.
    Output (doc_id, term, tfidf, rank); ties broken on term for a total
    order. One explode, tf/df aggregations, a broadcast join of the
    (term, df) relation, one window."""
    base = docs.filter(F.col(text_col).isNotNull())
    n_docs = base.count()
    terms = doc_terms(base, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        id_col,
        "term",
        _q6(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 document ranking for a bag of query terms (Lucene's
    parameterization: idf = ln(1 + (N − df + 0.5)/(df + 0.5)), tf
    saturation ``k1``, length normalization ``b`` against the corpus
    mean length in tokens). Output (doc_id, score, rank), top-k by
    (quantized score desc, doc_id) — the quantized total order is what
    makes the ranking stable across engines.

    Plan: the (term, df/idf) relation for the QUERY terms only is tiny
    and broadcast; each candidate doc contributes one row per matched
    query term; one aggregation sums the per-term contributions. Docs
    matching no query term score nothing (standard BM25 top-k)."""
    spark = docs.sparkSession
    base = docs.filter(F.col(text_col).isNotNull())
    stats = base.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(F.filter(F.split(text_col, " "), lambda t: t != ""))).alias("avgdl"),
    ).first()
    if not stats["n"]:
        # no scorable documents — empty top-k, not a float(None) crash
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                docs.schema[id_col],
                T.StructField("score", T.DoubleType()),
                T.StructField("rank", T.IntegerType()),
            ]
        )
        return spark.createDataFrame([], schema)
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])

    terms = doc_terms(base, id_col, text_col)
    qterms = spark.createDataFrame([(t,) for t in sorted(set(query_terms))], "term string")
    tf = (
        terms.join(F.broadcast(qterms), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .select(
            id_col,
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("c"),
        )
    )
    scored = contrib.groupBy(id_col).agg(_q6(F.sum("c")).alias("score"))
    return _topk_ranked(scored, k, id_col, "score")


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings (Cormack et al. 2009):
    score(d) = Σ_lists 1/(rrf_k + rank_list(d)) over the lists that
    contain d — the standard hybrid-search combiner (lexical ⊕ vector)
    because it needs no score calibration between the legs. Output
    (doc_id, rrf_score, rank), top-k on the quantized fused score."""
    a = ranked_a.select(F.col(id_col), (F.lit(1.0) / (rrf_k + F.col(rank_col))).alias("ra"))
    b_ = ranked_b.select(F.col(id_col), (F.lit(1.0) / (rrf_k + F.col(rank_col))).alias("rb"))
    fused = (
        a.join(b_, id_col, "full_outer")
        .select(
            id_col,
            _q6(F.coalesce(F.col("ra"), F.lit(0.0)) + F.coalesce(F.col("rb"), F.lit(0.0))).alias(
                "rrf_score"
            ),
        )
    )
    return _topk_ranked(fused, k, id_col, "rrf_score")


def build_inverted_index(
    docs: DataFrame,
    path: str,
    n_term_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_tf: bool = False,
) -> None:
    """Persist a lexical inverted index: one row per (term, doc, tf)
    plus per-term df, laid out for QUERY-TIME PRUNING — partitioned by
    ``term_bucket = pmod(xxhash64(term), n_term_buckets)`` and sorted by
    term within files, so a k-term search reads ≤ k partitions and
    row-group min/max term stats prune within them. The corpus-level
    stats BM25 needs (N, avgdl) land in one tiny ``_stats`` parquet so
    queries are zero-full-scan. At 100 TB: the index is (term, id, tf)
    longs + one string column — a fraction of corpus bytes — and
    building it is the tokenize + two-aggregate pipeline every term
    needs anyway, one shuffle keyed by term."""
    base = docs.filter(F.col(text_col).isNotNull())
    spark = docs.sparkSession
    # The (term, doc, tf) aggregate feeds both stores (postings and, as
    # dl = Σtf per doc, the doclens side table; avgdl = Σdl / N equals
    # averaging per-doc token counts over all non-null-text docs since
    # zero-token docs contribute 0 to both). ``cache_tf`` trades one
    # materialized tf for the second tokenize pass: measured 2× SLOWER
    # at bench scale (cache write dominates), the right call once the
    # corpus is large enough that re-tokenizing costs more than writing
    # the compact (term, id, tf) relation — flip it for corpus-scale
    # builds.
    def _tf():
        return doc_terms(base, id_col, text_col).groupBy("term", id_col).agg(
            F.count(F.lit(1)).alias("tf")
        )

    tf = _tf().persist() if cache_tf else _tf()
    try:
        dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        dl.write.mode("overwrite").parquet(f"{path}/doclens")
        n_docs = base.count()
        total_tokens = (
            spark.read.parquet(f"{path}/doclens")
            .agg(F.coalesce(F.sum("dl"), F.lit(0)).alias("t"))
            .first()["t"]
        )
        stats = spark.createDataFrame(
            [(n_docs, (float(total_tokens) / n_docs) if n_docs else None)],
            "n_docs long, avgdl double",
        )
        stats.write.mode("overwrite").parquet(f"{path}/_stats")

        tf2 = tf if cache_tf else _tf()
        df_ = tf2.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        postings = (
            tf2.join(df_, "term")
            .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)))
        )
        if not total_tokens:
            # partitionBy of zero rows writes no footers (unreadable dir);
            # an empty non-partitioned write keeps the schema readable
            postings.write.mode("overwrite").parquet(f"{path}/postings")
        else:
            (
                postings.repartition("term_bucket")
                .sortWithinPartitions("term")
                .write.mode("overwrite")
                .partitionBy("term_bucket")
                .parquet(f"{path}/postings")
            )
    finally:
        if cache_tf:
            tf.unpersist()
    # record the layout so searches hash terms with the same modulus and
    # reconstruct the id column (name AND type) exactly
    import json

    meta = {
        "n_term_buckets": n_term_buckets,
        "id_col": id_col,
        "id_field": docs.schema[id_col].jsonValue(),
    }
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/_meta")


def search_inverted_index(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the PERSISTED index — no corpus scan: the
    postings read carries ``term_bucket IN (buckets of the query
    terms)`` (partition pruning) plus a pushed ``term IN (...)`` filter
    (row-group pruning via the sorted layout); doc lengths and corpus
    stats come from their side tables. Same score and ranking contract
    as :func:`bm25_topk` (quantized total order) — verified equal in
    tests, so the index is a pure access-path change."""
    import json

    from pyspark.sql import types as T

    meta = json.loads(spark.read.parquet(f"{path}/_meta").first()["meta"])
    id_col = meta["id_col"]
    nb = meta["n_term_buckets"]

    def _empty() -> DataFrame:
        id_field = T.StructField.fromJson(meta["id_field"])
        return spark.createDataFrame(
            [], T.StructType([id_field,
                              T.StructField("score", T.DoubleType()),
                              T.StructField("rank", T.IntegerType())])
        )

    stats = spark.read.parquet(f"{path}/_stats").first()
    if not stats["n_docs"] or stats["avgdl"] is None or stats["avgdl"] == 0.0:
        # no docs, or docs with zero tokens anywhere: nothing can match
        return _empty()
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])
    qterms = sorted(set(query_terms))

    postings = spark.read.parquet(f"{path}/postings")
    buckets = (
        spark.createDataFrame([(t,) for t in qterms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(nb)).alias("b"))
        .distinct()
        .collect()
    )
    hits = postings.filter(
        F.col("term_bucket").isin([r["b"] for r in buckets]) & F.col("term").isin(qterms)
    )
    dl = spark.read.parquet(f"{path}/doclens")
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = hits.join(dl, id_col).select(
        id_col,
        (
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
        ).alias("c"),
    )
    scored = contrib.groupBy(id_col).agg(_q6(F.sum("c")).alias("score"))
    return _topk_ranked(scored, k, id_col, "score")
