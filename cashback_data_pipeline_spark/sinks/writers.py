"""Sink operators.

Reference sinks covered (SURVEY §2.2, citations into /root/reference/):

- K2  partitioned parquet warehouse write (glue_script.py:77-78) →
      :func:`write_warehouse`. Identical API; we add dynamic partition
      overwrite so re-runs rewrite only touched partitions instead of the
      reference's truncate-everything (pull_data_glue_job_lambda.py:66-78,
      K5 — which at 100 TB would delete and rewrite the entire warehouse).
- K1/K4 CSV staging/debug sinks (pull_data_glue_job_lambda.py:24-37,
      elt.py:70) → :func:`write_csv`.
- K6+J3 idempotent incremental load — the reference's one hand-written SQL
      query, ``INSERT … WHERE NOT EXISTS`` (load_to_redshift_lambda.py:88-100)
      → :func:`append_if_absent`: left-anti join + append + affected-count.

Scale notes for append_if_absent: the anti-join probes only the serving
table's key column (column-pruned parquet scan), and when the incoming
batch is small relative to the target we broadcast the *incoming* keys and
anti-join target-side — never a full shuffle of the 100 TB target.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_warehouse(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] = "transaction_date",
    mode: str = "overwrite",
    sort_by: list[str] | None = None,
    bloom_filter_cols: list[str] | None = None,
) -> None:
    """Partitioned snappy-parquet warehouse write (K2).

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` (set by
    session.configure) overwrite mode replaces only the partitions present
    in ``df`` — the scale-safe version of the reference's prefix truncate.

    Layout knobs for the 100 TB tier:
    - ``sort_by``: sortWithinPartitions before writing → tighter row-group
      min/max bounds (better skipping on those columns) and better RLE/
      dictionary compression. No extra shuffle — sorts within tasks.
    - ``bloom_filter_cols``: parquet bloom filters per column → point
      lookups (e.g. the serving anti-join probing reward_id) skip row
      groups that provably lack the key.
    """
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.partitionBy(*cols).mode(mode)
    for c in bloom_filter_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header CSV sink (K1/K4) — staging/debug only; parquet is the engine's
    at-rest format."""
    df.write.mode(mode).option("header", True).csv(path)


def append_if_absent(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    key: str = "reward_id",
) -> int:
    """Idempotent incremental load: append rows whose ``key`` is not already
    in the serving table; return the affected-row count (A3).

    Semantics = the reference's ``INSERT INTO cashback SELECT * FROM
    spectrum WHERE NOT EXISTS (… r.reward_id = s.reward_id)`` +
    ``cursor.rowcount`` (load_to_redshift_lambda.py:88-100).

    Plan shape: if the target doesn't exist yet, plain write. Otherwise
    scan ONLY the key column of the target (column pruning keeps this
    cheap even on a huge serving table — bloom filters from
    write_warehouse sharpen it further) and anti-join the incoming batch
    against those keys. Join strategy is left to AQE: it broadcasts
    whichever side is small at runtime; with both sides large it falls
    back to a shuffled anti-join of KEYS only — the full-width target is
    never shuffled either way.
    """
    target_exists = _path_exists(spark, target_path)
    if not target_exists:
        fresh = incoming
    else:
        existing_keys = spark.read.parquet(target_path).select(key).distinct()
        fresh = incoming.join(existing_keys, on=key, how="left_anti")

    # Cache the anti-join output: it feeds both the count (the reference
    # reports affected rows) and the append, and recomputing would re-scan
    # the target keys.
    fresh = fresh.cache()
    try:
        affected = fresh.count()
        if affected > 0:
            fresh.write.mode("append").parquet(target_path)
    finally:
        fresh.unpersist()
    return affected


def _path_exists(spark: SparkSession, path: str) -> bool:
    if "://" not in path:
        return os.path.exists(path)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(hconf).exists(hpath)


def merge_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    key: str,
) -> tuple[int, int]:
    """MERGE-style upsert without a transactional table format: rows whose
    ``key`` exists in the target are REPLACED by the incoming version,
    new keys are appended. Returns (n_updated, n_inserted), counted in
    DISTINCT KEYS.

    The incoming batch is key-deduplicated first (deterministic winner =
    the row whose full tuple sorts lowest for that key), so the target
    keeps its one-row-per-key invariant even when a micro-batch carries
    duplicates. Swap is rename-based (write tmp → rename old aside →
    rename tmp in → drop old): the no-table window is two metadata
    renames, not a full delete-then-copy; a crash between them leaves the
    data recoverable in the ``__old_`` path. True atomicity needs a
    transactional format (Delta/Iceberg MERGE INTO — not in this image).
    """
    import uuid

    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(*[c for c in incoming.columns])
    incoming_unique = (
        incoming.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )

    if not _path_exists(spark, target_path):
        incoming_unique = incoming_unique.cache()
        try:
            n = incoming_unique.count()
            incoming_unique.write.parquet(target_path)
        finally:
            incoming_unique.unpersist()
        return (0, n)

    target = spark.read.parquet(target_path)
    incoming_keys = incoming_unique.select(key).distinct().cache()
    try:
        n_incoming_keys = incoming_keys.count()
        n_updated = target.select(key).distinct().join(incoming_keys, on=key, how="left_semi").count()
        n_inserted = n_incoming_keys - n_updated
        survivors = target.join(incoming_keys, on=key, how="left_anti")
        merged = survivors.unionByName(incoming_unique)

        tmp = f"{target_path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(tmp)
        _swap_paths(spark, tmp, target_path)
    finally:
        incoming_keys.unpersist()
    return (n_updated, n_inserted)


def _swap_paths(spark: SparkSession, new_path: str, target_path: str) -> None:
    """Rename-based swap: target → __old_, new → target, drop __old_.
    The unavailable window is two renames; a crash in between leaves the
    previous data intact under ``__old_`` for manual recovery."""
    import shutil
    import uuid

    old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    if "://" not in target_path:
        import os as _os

        _os.rename(target_path, old)
        _os.rename(new_path, target_path)
        shutil.rmtree(old)
    else:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        P = jvm.org.apache.hadoop.fs.Path
        fs = P(target_path).getFileSystem(hconf)
        if not fs.rename(P(target_path), P(old)):
            raise IOError(f"rename {target_path} -> {old} failed")
        if not fs.rename(P(new_path), P(target_path)):
            # put the old data back before failing
            fs.rename(P(old), P(target_path))
            raise IOError(f"rename {new_path} -> {target_path} failed")
        fs.delete(P(old), True)


def compact_warehouse(
    spark: SparkSession,
    path: str,
    partition_by: str | list[str] | None = None,
    target_file_mb: int = 256,
) -> int:
    """Small-file compaction — the warehouse maintenance operator.

    Streaming/incremental appends accumulate small files (each micro-batch
    or load writes its own); scan cost then scales with FILE COUNT (footer
    reads, task scheduling) rather than bytes. Rewrite each partition into
    ⌈bytes / target_file_mb⌉ files via a repartition keyed like the
    layout. Returns the number of files after compaction.

    Swap semantics match merge_upsert (_swap_paths): rename-based, crash
    window is two renames with the previous data recoverable. At 100 TB
    run it per-partition (the partition column filter makes each rewrite
    partition-local and parallelizable across maintenance jobs).
    """
    import math

    import uuid

    df = spark.read.parquet(path)
    total_bytes = _dir_bytes(spark, path)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 2**20)))

    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        df.repartition(n_files, *cols).write.partitionBy(*cols).parquet(tmp)
    else:
        df.repartition(n_files).write.parquet(tmp)
    _swap_paths(spark, tmp, path)
    return _count_parquet_files(spark, path)


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under a path — local stat or Hadoop ContentSummary, so
    sizing works the same for file:// and object-store URIs."""
    if "://" not in path:
        import pathlib

        return sum(f.stat().st_size for f in pathlib.Path(path).rglob("*.parquet") if f.is_file())
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(hconf).getContentSummary(hpath).getLength()


def _count_parquet_files(spark: SparkSession, path: str) -> int:
    if "://" not in path:
        import pathlib

        return len([f for f in pathlib.Path(path).rglob("*.parquet") if f.is_file()])
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(hconf)
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n += 1
    return n


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink (Hive-warehouse interop). Same layout discipline as the
    parquet warehouse: hive-style partition directories when
    ``partition_by`` is given, so partition pruning works for readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table sink — the co-located-join layout.

    Writing both sides of a hot equi-join bucketed by the join key with
    the SAME bucket count lets Spark join them with ZERO exchanges: each
    task reads bucket i of both tables (plus a sort if ``sort_cols``
    didn't pre-sort them). At 100 TB this turns the nightly
    fact-to-fact join from a full 2-sided shuffle — the single most
    expensive stage in the pipeline — into a scan-local merge, and
    repeated joins against the same layout amortize the one-time
    bucketing shuffle across every downstream run.

    Bucketing requires the table catalog (bucket metadata lives there,
    not in parquet footers), hence ``saveAsTable``; pass ``path`` to
    keep the data external at a chosen location. Verified by plan
    assertion in tests/test_pipeline.py::test_bucketed_join_eliminates_exchange.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def scd2_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    key: str,
    ts_col: str,
    compare_cols: list[str] | None = None,
    same_ts_corrections: bool = False,
) -> tuple[int, int]:
    """Slowly-changing-dimension type 2 upsert without a transactional
    format: the target keeps FULL VERSION HISTORY — each row carries
    ``__valid_from`` (the version's effective timestamp), ``__valid_to``
    (NULL while current) and ``__is_current``. An incoming batch:

    1. key-dedupes to its latest row per key (max ``ts_col``; full-tuple
       tiebreak) — one version step per batch, the standard batch-SCD2
       contract;
    2. drops no-op updates (every ``compare_cols`` value equal to the
       key's current version — change detection uses a null-safe
       comparison so NULL→NULL is "unchanged") AND late updates
       (``ts_col`` ≤ the key's current ``__valid_from``): an
       out-of-order batch must not close the current version with
       ``__valid_to`` earlier than its ``__valid_from`` or promote
       stale data to current;
    3. closes the superseded current rows (``__valid_to`` = incoming
       ``ts_col``, ``__is_current`` = false) and appends the new
       versions.

    Returns (n_closed, n_inserted) in distinct keys/rows. History rows
    are immutable after closing — re-running the same batch is a no-op
    (step 2 filters it), giving the same idempotence contract as
    ``append_if_absent``. Swap discipline is rename-based like
    ``merge_upsert``; true atomicity needs Delta/Iceberg.

    ``same_ts_corrections=True`` additionally accepts an EQUAL-timestamp
    row whose ``compare_cols`` differ as a correction: the current
    version is REPLACED in place (same ``__valid_from``, old row
    discarded, nothing closed — closing would mint a zero-width history
    row), so a same-instant fix is applicable without faking a newer
    timestamp. Off by default: the strict ordering contract treats
    equal-ts as late, and a replayed at-least-once batch with equal ts
    but drifted values should NOT silently rewrite current under that
    contract. Re-running the same correction batch is still a no-op
    (values then compare unchanged).

    Scale: one shuffle to dedupe incoming, one join against ONLY the
    current slice (``__is_current`` filter prunes history at the scan —
    at 100 TB partition the target by ``__is_current`` so the closed
    history is never read), and a union write. History grows by exactly
    the changed keys per batch.
    """
    import uuid

    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(F.col(ts_col).desc(), *[c for c in incoming.columns])
    latest = (
        incoming.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    versioned = latest.select(
        "*",
        F.col(ts_col).alias("__valid_from"),
        F.lit(None).cast("timestamp").alias("__valid_to"),
        F.lit(True).alias("__is_current"),
    )

    if not _path_exists(spark, target_path):
        versioned = versioned.cache()
        try:
            n = versioned.count()
            versioned.write.parquet(target_path)
        finally:
            versioned.unpersist()
        return (0, n)

    target = spark.read.parquet(target_path)
    current = target.filter(F.col("__is_current"))
    history = target.filter(~F.col("__is_current"))

    cmp_cols = compare_cols or [c for c in latest.columns if c not in (key, ts_col)]
    cur_cmp = current.select(
        F.col(key),
        F.col("__valid_from").alias("__cur_from"),
        *[F.col(c).alias(f"__cur_{c}") for c in cmp_cols],
    )
    joined = latest.join(F.broadcast(cur_cmp), on=key, how="left")
    unchanged = F.lit(True)
    for c in cmp_cols:
        unchanged = unchanged & F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
    is_new_key = F.col("__cur_from").isNull()
    # ordering guard: an incoming row no newer than the key's current
    # version is LATE (an out-of-order batch) — applying it would close
    # the current row with __valid_to < __valid_from and promote stale
    # data to current. Late rows are a no-op, like no-op updates.
    is_newer = F.col(ts_col) > F.col("__cur_from")
    effective = joined.filter(is_new_key | (~unchanged & is_newer)).select(*latest.columns).cache()
    corrections = (
        joined.filter(~unchanged & ~is_new_key & (F.col(ts_col) == F.col("__cur_from")))
        .select(*latest.columns)
        .cache()
        if same_ts_corrections
        else None
    )
    try:
        change_keys = effective.select(key).distinct()
        n_inserted = effective.count()
        closing = (
            current.join(F.broadcast(change_keys.withColumnRenamed(key, "__k")), F.col(key) == F.col("__k"), "inner")
            .drop("__k")
        )
        n_closed = closing.count()
        close_ts = effective.select(F.col(key).alias("__k"), F.col(ts_col).alias("__close_ts"))
        closed = (
            current.join(F.broadcast(close_ts), F.col(key) == F.col("__k"), "inner")
            .withColumn("__valid_to", F.col("__close_ts"))
            .withColumn("__is_current", F.lit(False))
            .drop("__k", "__close_ts")
        )
        survivors = current.join(change_keys, on=key, how="left_anti")
        new_versions = effective.select(
            "*",
            F.col(ts_col).alias("__valid_from"),
            F.lit(None).cast("timestamp").alias("__valid_to"),
            F.lit(True).alias("__is_current"),
        )
        if corrections is not None:
            # in-place replacement: the corrected key's current row is
            # dropped (not closed — no zero-width history row) and the
            # correction becomes current at the SAME __valid_from
            corr_keys = corrections.select(key).distinct()
            n_inserted += corrections.count()
            survivors = survivors.join(corr_keys, on=key, how="left_anti")
            new_versions = new_versions.unionByName(
                corrections.select(
                    "*",
                    F.col(ts_col).alias("__valid_from"),
                    F.lit(None).cast("timestamp").alias("__valid_to"),
                    F.lit(True).alias("__is_current"),
                )
            )
        merged = history.unionByName(closed).unionByName(survivors).unionByName(new_versions)

        tmp = f"{target_path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.parquet(tmp)
        _swap_paths(spark, tmp, target_path)
    finally:
        effective.unpersist()
        if corrections is not None:
            corrections.unpersist()
    return (n_closed, n_inserted)


ZORDER_STRING_PREFIX = 6  # bytes packed into the string axis (< 2^48 ≤ double)


def zorder_axis(df: DataFrame, c: str) -> F.Column:
    """The column as a DOUBLE z-axis. Numerics/timestamps cast directly;
    DATE becomes epoch days; STRING packs its first
    ``ZORDER_STRING_PREFIX`` characters big-endian, byte-per-character —
    the Delta OPTIMIZE ZORDER fixed-width-prefix-truncation idea. The
    axis only steers LAYOUT; pruning soundness always comes from the
    real min/max stats parquet collected on the column, so prefix
    collisions (URLs sharing a long common prefix) and non-ASCII code
    points (clamped to 255) can degrade clustering, never correctness.
    NULLs scale to plane 0, like numeric NULLs."""
    dt = df.schema[c].dataType
    if isinstance(dt, T.StringType):
        v = F.lit(0.0)
        for i in range(ZORDER_STRING_PREFIX):
            b = F.coalesce(F.ascii(F.substring(F.col(c), i + 1, 1)), F.lit(0))
            b = F.least(F.lit(255), F.greatest(F.lit(0), b))
            v = v * 256.0 + b.cast("double")
        return v
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(c), F.to_date(F.lit("1970-01-01"))).cast("double")
    return F.col(c).cast("double")


def zorder_column(df: DataFrame, cols: list[str], bits: int = 12) -> DataFrame:
    """Add ``__z``: the Morton (z-order) interleaving of the rank-scaled
    values of ``cols``. Each column is min/max-normalized to ``bits``
    bits (one tiny agg to fetch the bounds), then bit b of column i
    lands at z-bit ``b·k + i`` — points close in EVERY dimension get
    close z-values, so sorting by ``__z`` clusters all dimensions at
    once. Normalization is rank-free (linear min/max): heavily skewed
    columns cluster worse than with an exact-rank scale, but need no
    window over the full table. Strings/dates scale through
    :func:`zorder_axis` (byte-prefix / epoch-day axes — r9 item 8).

    The interleave occupies ``bits·k`` bits of the signed-64 ``__z``;
    Spark's ``shiftleft`` wraps its shift amount mod 64, so bits is
    auto-reduced to keep ``bits·k ≤ 63`` (≥1 bit per column; >63 columns
    raises). An all-NULL column has no bounds and contributes plane 0
    (NULL values likewise scale to 0 via the greatest/least clamp)."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_column needs at least one column")
    if k > 63:
        raise ValueError(f"cannot z-order {k} columns into 63 bits (max 63)")
    bits = max(1, min(bits, 63 // k))
    axes = {c: zorder_axis(df, c) for c in cols}
    bounds = df.agg(
        *[F.min(axes[c]).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(axes[c]).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).first()
    z = F.lit(0).cast("long")
    top = (1 << bits) - 1
    for ci, c in enumerate(cols):
        mn_raw, mx_raw = bounds[f"__mn_{ci}"], bounds[f"__mx_{ci}"]
        if mn_raw is None or mx_raw is None:
            continue  # all-NULL column: no information, plane stays 0
        mn, mx = float(mn_raw), float(mx_raw)
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(top),
            F.greatest(F.lit(0), F.floor((axes[c] - mn) / span * top).cast("long")),
        )
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * k + ci
            )
    return df.withColumn("__z", z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Multi-dimensional data-skipping layout: z-order the rows on
    ``cols`` and write range-partitioned, sorted parquet. Every file /
    row group then holds a contiguous z-range ≈ a hyper-rectangle in
    ALL ``cols`` — min/max stats become selective for predicates on ANY
    of them (a plain sort clusters only its leading column; a contiguous
    z-fraction f covers ≈ f^(1/k) of each of k dimensions). This is the
    engine's answer to Delta/Iceberg OPTIMIZE ZORDER at 100 TB: a
    one-time layout shuffle (repartitionByRange on __z — range, not
    hash, so file boundaries are z-contiguous) that every later
    multi-dimension range scan repays through row-group pruning."""
    zdf = zorder_column(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_tokens_per_shard: int = 100_000,
    n_shards: int | None = None,
) -> dict:
    """Export a curated corpus as deterministic training shards plus a
    manifest — the hand-off format from the data pipeline to a training
    job (each trainer rank reads its shard subset; the manifest carries
    the numbers loaders need without opening files).

    Sharding is a salted hash of the id: stateless, reproducible, and
    shard sizes concentrate tightly around total/n (no coordination, no
    sort). ``n_shards`` defaults to ceil(total_tokens / target) — one
    sizing aggregate. Rows repartition BY THE SHARD COLUMN before a
    partitionBy write, so each shard directory holds exactly one file
    (a shard's rows land in one task; a task may own several shards and
    writes one file per value). The manifest records per-shard doc and
    whitespace-token counts plus an order-insensitive content checksum
    (sum of xxhash64(id || sha of text) — stable across task order).

    Returns the manifest (also written as ``_manifest.json`` in ``path`` —
    underscore-prefixed so parquet readers skip it like ``_SUCCESS``)."""
    import json as _json

    spark = df.sparkSession
    n_tok = F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
    base = df.withColumn("__n_tokens", n_tok)
    if n_shards is None:
        total = base.agg(F.sum("__n_tokens")).first()[0] or 0
        n_shards = max(1, -(-int(total) // target_tokens_per_shard))
    sharded = base.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit("shard-v1")), F.lit(n_shards))
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tokens").alias("n_tokens"),
            F.sum(
                F.xxhash64(F.col(id_col).cast("string"), F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))
            ).alias("checksum"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "total_docs": int(sum(r["n_docs"] for r in stats)),
        "total_tokens": int(sum(r["n_tokens"] for r in stats)),
        "shards": [
            {
                "shard": int(r["shard"]),
                "n_docs": int(r["n_docs"]),
                "n_tokens": int(r["n_tokens"]),
                "checksum": int(r["checksum"]),
            }
            for r in stats
        ],
    }
    # underscore prefix: Spark/Hadoop file listings ignore _-files, so
    # a later spark.read.parquet(path) never trips over the manifest
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/_manifest.json")
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jvm_path, True)
    out.write(bytearray(_json.dumps(manifest, indent=1).encode()))
    out.close()
    return manifest
