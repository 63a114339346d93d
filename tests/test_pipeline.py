"""End-to-end lifecycle + nested + multimodal plumbing tests."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import multimodal, nested
from cashback_data_pipeline_spark.plans import run_pipeline, with_retry
from cashback_data_pipeline_spark.schemas import CONTIS_TRANSACTION

from tests.fixtures import make_rewards, make_transactions


def test_full_pipeline_idempotent(spark):
    base = tempfile.mkdtemp(prefix="pipeline_")
    rewards, transactions = make_rewards(spark), make_transactions(spark)
    res1 = run_pipeline(spark, rewards, transactions, f"{base}/warehouse", f"{base}/serving")
    assert res1.rows_transformed == 5
    assert res1.rows_loaded == 5
    # re-run: warehouse rewritten, serving load admits nothing (J3)
    res2 = run_pipeline(spark, rewards, transactions, f"{base}/warehouse", f"{base}/serving")
    assert res2.rows_loaded == 0
    assert spark.read.parquet(f"{base}/serving").count() == 5
    # partition layout: string yyyy-MM-dd partition dirs (K2 parity)
    parts = spark.read.parquet(f"{base}/warehouse").select("transaction_date").distinct().count()
    assert parts >= 3


def test_with_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky, attempts=3, base_delay=0.01) == "ok"
    with pytest.raises(RuntimeError):
        with_retry(lambda: (_ for _ in ()).throw(RuntimeError("always")), attempts=2, base_delay=0.01)


def test_nested_blob_parse_and_dotted_access(spark):
    rewards = make_rewards(spark)
    staged = rewards.withColumnRenamed("type", "reward_type")
    parsed = nested.parse_reward_blobs(staged)
    row = parsed.filter(F.col("id") == "r1").first()
    assert row["fiat"]["card_transactions"]["description"] == "CRV*PIZZA HUT"
    assert row["fiat"]["card_transactions"]["api_response"]["MerchantDetails"]["MerchantName"] == "PIZZA HUT"


def test_nested_pandas_parse_handles_hostile_blobs(spark):
    df = spark.createDataFrame(
        [
            (1, "{'description': 'BOB'S DINER', 'transaction_amount': 5.0}"),  # embedded quote
            (2, "{'description': 'OK', 'transaction_amount': None, 'transaction_currency': 'GBP'}"),
            (3, None),
            (4, "not a dict at all"),
        ],
        "id int, blob string",
    )
    out = nested.parse_pydict_blobs_pandas(df, "blob", CONTIS_TRANSACTION, "parsed")
    rows = {r["id"]: r["parsed"] for r in out.collect()}
    assert rows[2]["description"] == "OK" and rows[2]["transaction_amount"] is None
    assert rows[3] is None and rows[4] is None  # null/garbage -> null, no crash


def test_legacy_repair_pipeline_coalesces(spark):
    rewards = make_rewards(spark).withColumnRenamed("type", "reward_type")
    out = nested.legacy_repair_pipeline(rewards)
    r1 = out.filter(F.col("id") == "r1").first()
    assert r1["merchant_description"] == "CRV*PIZZA HUT"
    assert r1["merchant_name"] == "PIZZA HUT"
    # r3/r4/r5 have no blobs and are not REBATE_BONUS -> dropped (F4);
    # r2 is REBATE_BONUS -> kept despite null descriptions
    kept = {r["id"] for r in out.collect()}
    assert kept == {"r1", "r2"}


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", (64, 48, None, 1024), b"\x89PNG-fake-bytes-1"),
        (2, "image", "image/png", (64, 48, None, 1024), b"\x89PNG-fake-bytes-1"),  # exact dup
        (3, "audio", "audio/wav", (None, None, 2500, 4096), b"RIFF-fake"),
        (4, "video", "video/mp4", (640, 480, 3500, 9999), b"\x00\x00ftyp-fake"),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_multimodal_metadata_and_dedup(spark, media):
    with_meta = multimodal.attach_byte_metadata(media)
    row = with_meta.filter(F.col("media_id") == 1).first()
    assert row["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    deduped = multimodal.dedup_binary_exact(media)
    assert sorted(r["media_id"] for r in deduped.collect()) == [1, 3, 4]


def test_multimodal_feature_extraction_batch_shape(spark, media):
    feats = multimodal.extract_features(media, dim=8)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 4
    assert len(rows[1]["feature"]) == 8
    assert rows[1]["feature"] == rows[2]["feature"]  # same payload -> same feature
    assert rows[1]["payload_sha"] == rows[2]["payload_sha"]


def test_frame_sample_plan_fanout(spark, media):
    frames = multimodal.frame_sample_plan(media, every_ms=1000)
    got = [r["frame_ts_ms"] for r in frames.orderBy("frame_ts_ms").collect()]
    assert got == [0, 1000, 2000]  # 3500ms video -> frames at 0/1000/2000


def test_decode_real_unknown_formats_are_explicit_stub():
    """Formats beyond PNG/baseline-JPEG still raise with the dependency
    note (the codec seam for video/exotic codecs); a JPEG-magic payload
    that is not a valid JPEG is now a loud ValueError from the real
    decoder (round 9), not a stub."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"bytes")
    with pytest.raises(ValueError):
        multimodal.decode_image_real(b"\xff\xd8\xff jpeg-ish")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"")


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_bit_exact_all_filters(channels):
    """encode_png (filters cycling 0→4) → decode_image_real recovers the
    exact pixel bytes for gray / gray+alpha / RGB / RGBA."""
    w, h = 9, 11  # odd sizes: stride not a multiple of anything handy
    px = bytes((i * 31 + channels * 7) % 256 for i in range(w * h * channels))
    png = multimodal.encode_png(px, w, h, channels, filter_cycle=True)
    img = multimodal.decode_image_real(png)
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == px


def test_png_decoder_rejects_unsupported_and_corrupt():
    px = bytes(range(16))
    png = multimodal.encode_png(px, 4, 4, 1)
    # corrupt a chunk byte: CRC must catch it
    bad = bytearray(png)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated|IHDR"):
        multimodal.decode_image_real(bytes(bad))
    # truncated mid-chunk: ValueError, never a raw struct error
    with pytest.raises(ValueError, match="truncated|IEND"):
        multimodal.decode_image_real(png[: len(png) - 7])
    with pytest.raises(ValueError, match="pixel bytes"):
        multimodal.encode_png(px, 5, 5, 1)  # wrong buffer size
    # 16-bit depth (hand-built IHDR) rejected, not mis-decoded
    import struct
    import zlib as _z

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", _z.crc32(ctype + data) & 0xFFFFFFFF
        )

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = multimodal.PNG_SIG + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_image_real(png16)


def test_extract_features_uses_real_pixels_for_png(spark):
    """PNG payloads feature from decoded pixel stats — two PNGs with the
    same dimensions but different pixels must differ in feature, and the
    channel-mean slots must equal the true means."""
    w, h = 8, 8
    px_dark = bytes([10] * (w * h * 3))
    px_light = bytes([200] * (w * h * 3))
    rows = [
        (1, multimodal.encode_png(px_dark, w, h, 3)),
        (2, multimodal.encode_png(px_light, w, h, 3)),
        (3, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = {r["media_id"]: r["feature"] for r in multimodal.extract_features(df, dim=8).collect()}
    assert feats[1] != feats[2]
    for mid, val in ((1, 10), (2, 200)):
        for slot in (3, 4, 5):  # per-channel means, channels=3
            assert abs(feats[mid][slot] - val / 255.0) < 1e-6
    # non-image payloads keep the sha-derived stand-in (float32 storage)
    want = multimodal._fake_feature(b"not an image", 8)
    assert all(abs(a - b) < 1e-6 for a, b in zip(feats[3], want))


@pytest.mark.parametrize("channels,width", [(1, 1), (2, 1), (1, 2), (2, 2), (4, 2)])
def test_wav_roundtrip_sample_exact(channels, width):
    """stdlib wave writer → decode_audio_real recovers the exact sample
    values, rate, channels, width, and frame count — the decoder is
    cross-validated against CPython's own RIFF implementation."""
    n = 37 * channels
    if width == 1:
        samples = [(i * 13 + channels) % 256 for i in range(n)]
    else:
        samples = [((i * 131 + channels * 7) % 65536) - 32768 for i in range(n)]
    wav = multimodal.encode_wav(samples, 22050, channels, width)
    audio = multimodal.decode_audio_real(wav)
    assert audio["sample_rate"] == 22050
    assert audio["channels"] == channels
    assert audio["sample_width"] == width
    assert audio["n_frames"] == 37
    assert audio["samples"] == samples


def test_wav_decoder_rejects_unsupported_and_corrupt():
    import struct as _s

    # non-WAV payloads hit the codec seam, like non-PNG images
    with pytest.raises(NotImplementedError, match="WAV"):
        multimodal.decode_audio_real(b"ID3\x04 mp3-ish")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio_real(b"")
    wav = multimodal.encode_wav([0, 1, -1, 2], 8000, 1, 2)
    # truncated data chunk: ValueError, never a raw struct error
    with pytest.raises(ValueError, match="truncated|missing"):
        multimodal.decode_audio_real(wav[:-3])
    # IEEE-float format code rejected, not mis-decoded
    floaty = bytearray(wav)
    fmt_at = wav.index(b"fmt ") + 8
    _s.pack_into("<H", floaty, fmt_at, 3)
    with pytest.raises(ValueError, match="format code"):
        multimodal.decode_audio_real(bytes(floaty))
    # 24-bit depth rejected
    deep = bytearray(wav)
    _s.pack_into("<H", deep, fmt_at + 14, 24)
    with pytest.raises(ValueError, match="bit depth|alignment"):
        multimodal.decode_audio_real(bytes(deep))


def test_extract_features_uses_real_samples_for_wav(spark):
    """WAV payloads feature from decoded samples — a silent and a loud
    tone of identical byte length must differ in feature, and the RMS
    slot must match the true RMS."""
    quiet = multimodal.encode_wav([0] * 64, 16000, 1, 2)
    loud = multimodal.encode_wav([20000, -20000] * 32, 16000, 1, 2)
    df = spark.createDataFrame(
        [(1, quiet), (2, loud)], "media_id long, payload binary"
    )
    feats = {r["media_id"]: r["feature"] for r in multimodal.extract_features(df, dim=8).collect()}
    assert feats[1] != feats[2]
    assert abs(feats[1][4] - 0.0) < 1e-6  # silent RMS
    assert abs(feats[2][4] - 20000 / 32768.0) < 1e-6


def test_merge_upsert_updates_and_inserts(spark):
    import tempfile

    from cashback_data_pipeline_spark.sinks import merge_upsert

    target = tempfile.mkdtemp(prefix="merge_") + "/t"
    v1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    upd, ins = merge_upsert(spark, v1, target, "k")
    assert (upd, ins) == (0, 3)
    v2 = spark.createDataFrame([(2, "B2"), (4, "d")], "k int, v string")
    upd, ins = merge_upsert(spark, v2, target, "k")
    assert (upd, ins) == (1, 1)
    final = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert final == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_append_schema_evolution_merge_schema(spark):
    import tempfile

    p = tempfile.mkdtemp(prefix="evolve_") + "/t"
    spark.createDataFrame([(1, "a")], "k int, v string").write.parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], "k int, v string, score double").write.mode(
        "append"
    ).parquet(p)
    back = spark.read.option("mergeSchema", True).parquet(p)
    rows = {r["k"]: (r["v"], r["score"]) for r in back.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}  # old rows null-extend


def test_compact_warehouse_reduces_files(spark):
    import pathlib
    import tempfile

    from cashback_data_pipeline_spark.sinks import append_if_absent, compact_warehouse

    target = tempfile.mkdtemp(prefix="compact_") + "/t"
    # simulate many small incremental loads -> many small files
    for i in range(8):
        batch = spark.range(i * 100, (i + 1) * 100).selectExpr("id AS k", "id * 2 AS v")
        append_if_absent(spark, batch, target, key="k")
    before = len([f for f in pathlib.Path(target).rglob("*.parquet") if f.is_file()])
    assert before >= 8
    after = compact_warehouse(spark, target)
    assert after < before
    assert spark.read.parquet(target).count() == 800  # lossless


def test_merge_upsert_dedups_incoming_batch(spark):
    """Review finding: a batch carrying duplicate keys must not break the
    one-row-per-key invariant or the update/insert counts."""
    import tempfile

    from cashback_data_pipeline_spark.sinks import merge_upsert

    target = tempfile.mkdtemp(prefix="merge_dup_") + "/t"
    merge_upsert(spark, spark.createDataFrame([(1, "a")], "k int, v string"), target, "k")
    dup_batch = spark.createDataFrame([(1, "x1"), (1, "x2"), (2, "y"), (2, "z")], "k int, v string")
    upd, ins = merge_upsert(spark, dup_batch, target, "k")
    assert (upd, ins) == (1, 1)  # distinct keys: 1 updated, 2 inserted-as-one
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 2  # one row per key survives
    final = {r["k"]: r["v"] for r in rows}
    assert final == {1: "x1", 2: "y"}  # deterministic winner: lowest tuple


def test_bucketed_join_eliminates_exchange(spark, sf_dir, tmp_path):
    """Co-located join layout: both sides bucketed by the join key with
    the same bucket count -> the equi-join plans with ZERO exchanges
    (scan-local merge), the scale story bucketing exists for."""
    from cashback_data_pipeline_spark.sinks import write_bucketed
    from cashback_data_pipeline_spark.sources import read_testdata

    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_customer")
    write_bucketed(orders, "bt_orders", ["o_custkey"], 8, sort_cols=["o_custkey"],
                   path=str(tmp_path / "bt_orders"))
    write_bucketed(customer, "bt_customer", ["c_custkey"], 8, sort_cols=["c_custkey"],
                   path=str(tmp_path / "bt_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try:
        # force a non-broadcast join so the exchange question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bt_orders").join(
            spark.table("bt_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        # and it actually runs
        assert j.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_customer")


def test_warehouse_schema_evolution_merge(spark, tmp_path):
    """Operational reality at 100 TB: columns get added over time.
    Parquet + mergeSchema reads the union schema; old files surface the
    new column as nulls, and per-file pruning still works."""
    p = str(tmp_path / "wh_evo")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double").write.mode(
        "append"
    ).parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"k", "v", "score"}
    rows = {r["k"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_warehouse_bloom_filters_written_and_skip_row_groups(spark, tmp_path):
    """VERDICT r3 item 8: pin the write_warehouse bloom-filter claim.

    (a) Footer assertion: parquet-java (the classes Spark itself ships)
    reports a bloom filter offset for the bloom column and -1 for others
    / for a bloom-less write. (b) Skip-metric delta: keys are written in
    hash-random order so every row group's min/max (and every page's
    column index) spans the whole key range — stats pruning is
    impossible, dictionary pruning is impossible (PLAIN-encoded unique
    longs), so a point probe for an absent in-range key can only skip
    via the bloom filter. Scan numOutputRows: 0 with bloom vs the full
    row count without."""
    import glob

    from cashback_data_pipeline_spark.sinks import write_warehouse

    n = 200_000
    df = spark.range(n).select(
        F.xxhash64("id").alias("k"),
        F.col("id").alias("v"),
        F.lit("2024-01-01").alias("transaction_date"),
    ).repartition(3)

    with_bloom = str(tmp_path / "wh_bloom")
    without = str(tmp_path / "wh_plain")
    write_warehouse(df, with_bloom, bloom_filter_cols=["k"])
    write_warehouse(df, without)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def bloom_offsets(path: str) -> dict[str, int]:
        offs: dict[str, int] = {}
        for f in glob.glob(path + "/**/*.parquet", recursive=True):
            inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jvm.org.apache.hadoop.fs.Path(f), conf
            )
            r = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
            fm = r.getFooter()
            for bi in range(fm.getBlocks().size()):
                blk = fm.getBlocks().get(bi)
                for ci in range(blk.getColumns().size()):
                    c = blk.getColumns().get(ci)
                    name = c.getPath().toDotString()
                    offs[name] = max(offs.get(name, -1), c.getBloomFilterOffset())
            r.close()
        return offs

    offs_b, offs_n = bloom_offsets(with_bloom), bloom_offsets(without)
    assert offs_b["k"] > 0, offs_b      # bloom header present
    assert offs_b["v"] == -1            # only the requested column
    assert offs_n["k"] == -1            # bloom-less write has none

    def scan_rows(path: str, val: int) -> int:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            d = spark.read.parquet(path).filter(F.col("k") == val)
            d.collect()
            leaves = d._jdf.queryExecution().executedPlan().collectLeaves()
            return leaves.apply(0).metrics().apply("numOutputRows").value()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    absent = 1234567  # xxhash64 image is sparse; verified absent below
    assert spark.read.parquet(with_bloom).filter(F.col("k") == absent).count() == 0
    assert scan_rows(with_bloom, absent) == 0   # every row group bloom-skipped
    assert scan_rows(without, absent) == n      # nothing else could prune


def test_scd2_upsert_version_history(spark, tmp_path):
    """SCD2: changed keys close their current version and append a new
    one; unchanged keys are untouched (no-op idempotence); history rows
    are immutable."""
    import datetime as dt

    from cashback_data_pipeline_spark.sinks import scd2_upsert

    target = str(tmp_path / "dim")
    t1 = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 2, 1)

    b1 = spark.createDataFrame(
        [("a", "alpha", t1), ("b", "beta", t1)], "k string, v string, ts timestamp"
    )
    closed, inserted = scd2_upsert(spark, b1, target, key="k", ts_col="ts")
    assert (closed, inserted) == (0, 2)

    # a changes, b unchanged, c new; plus a duplicate older row for a
    # that must lose the within-batch dedupe
    b2 = spark.createDataFrame(
        [("a", "ALPHA", t2), ("a", "stale", t1), ("b", "beta", t2), ("c", "gamma", t2)],
        "k string, v string, ts timestamp",
    )
    closed, inserted = scd2_upsert(spark, b2, target, key="k", ts_col="ts", compare_cols=["v"])
    assert (closed, inserted) == (1, 2)  # close a; insert new a + c

    rows = spark.read.parquet(target).collect()
    cur = {r["k"]: r for r in rows if r["__is_current"]}
    hist = [r for r in rows if not r["__is_current"]]
    assert set(cur) == {"a", "b", "c"}
    assert cur["a"]["v"] == "ALPHA" and cur["a"]["__valid_from"] == t2
    assert cur["b"]["v"] == "beta" and cur["b"]["__valid_from"] == t1  # untouched
    assert len(hist) == 1 and hist[0]["k"] == "a"
    assert hist[0]["__valid_to"] == t2 and hist[0]["v"] == "alpha"

    # replay: everything matches current versions -> full no-op
    closed, inserted = scd2_upsert(spark, b2, target, key="k", ts_col="ts", compare_cols=["v"])
    assert (closed, inserted) == (0, 0)
    assert spark.read.parquet(target).count() == 4  # 3 current + 1 history


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    """write_zordered must make per-file min/max stats selective in BOTH
    z-order columns (a plain sort clusters only its leading column; an
    unsorted write clusters neither) — asserted from parquet footers via
    pyarrow, plus a scan-metric delta for a 2-d range probe."""
    import glob

    import pyarrow.parquet as pq

    from cashback_data_pipeline_spark.sinks import write_zordered

    n = 100_000
    # two independent uniform dimensions (decorrelated by hashing)
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("y"),
    )

    zpath, spath, upath = (str(tmp_path / p) for p in ("z", "sorted_x", "unsorted"))
    write_zordered(df, zpath, ["x", "y"], n_files=8)
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(spath)
    df.repartition(8).write.parquet(upath)

    def avg_coverage(path: str, col: str) -> float:
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            schema_idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(schema_idx).statistics
                spans.append((st.max - st.min) / 10_000.0)
        return sum(spans) / len(spans)

    # z-order: both dimensions clustered (f=1/8 -> ~sqrt(1/8)=0.35/dim)
    assert avg_coverage(zpath, "x") < 0.7 and avg_coverage(zpath, "y") < 0.7
    # leading-column sort: x tight, y unclustered
    assert avg_coverage(spath, "x") < 0.2 and avg_coverage(spath, "y") > 0.9
    # unsorted: neither
    assert avg_coverage(upath, "x") > 0.9 and avg_coverage(upath, "y") > 0.9

    # skip-metric delta: a 2-d range probe scans fewer rows on the
    # z-ordered layout than on the unsorted one (row-group pruning)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def scanned(path: str) -> int:
            d = spark.read.parquet(path).filter((F.col("x") < 500) & (F.col("y") < 500))
            d.collect()
            leaves = d._jdf.queryExecution().executedPlan().collectLeaves()
            return leaves.apply(0).metrics().apply("numOutputRows").value()

        assert scanned(zpath) < scanned(upath)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """One file per shard directory, manifest totals equal the corpus,
    checksums reproduce on rewrite (deterministic, order-insensitive),
    and a re-read returns the original rows."""
    import glob
    import json

    from cashback_data_pipeline_spark.sinks import write_training_shards

    docs = spark.createDataFrame(
        [(i, ("tok " * (5 + i % 7)).strip()) for i in range(300)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shards")
    m1 = write_training_shards(docs, path, target_tokens_per_shard=500)

    assert m1["total_docs"] == 300
    assert m1["total_tokens"] == sum(5 + i % 7 for i in range(300))
    assert m1["n_shards"] == -(-m1["total_tokens"] // 500)
    for sh in m1["shards"]:
        files = glob.glob(f"{path}/shard={sh['shard']}/*.parquet")
        assert len(files) == 1, (sh, files)
    disk = json.load(open(f"{path}/_manifest.json"))
    assert disk == m1

    back = spark.read.parquet(path)
    assert back.count() == 300
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == set(range(300))

    # determinism: a second write (different task order) → same manifest
    m2 = write_training_shards(docs.repartition(7), path, target_tokens_per_shard=500)
    assert m2 == m1


def test_run_pipeline_manifest_racing_writers(spark, tmp_path):
    """run_pipeline(use_manifest=True): two racing full pipeline runs
    against the same warehouse + serving tables must SERIALIZE — every
    serving key lands exactly once across the race, reads are never
    torn, and a replay is a no-op (VERDICT r5 item 8)."""
    from concurrent.futures import ThreadPoolExecutor

    from cashback_data_pipeline_spark.plans import run_pipeline
    from cashback_data_pipeline_spark.sinks import manifest as M
    from cashback_data_pipeline_spark.testgen import gen_rewards, gen_transactions

    n_txn, n_rew = 2000, 1500
    transactions = gen_transactions(spark, n_txn)
    rewards = gen_rewards(spark, n_rew, n_txn)
    wh, sv = str(tmp_path / "wh"), str(tmp_path / "serving")

    def go(_):
        return run_pipeline(spark, rewards, transactions, wh, sv, use_manifest=True)

    with ThreadPoolExecutor(2) as ex:
        r1, r2 = list(ex.map(go, range(2)))
    assert r1.rows_transformed == r2.rows_transformed == n_rew

    serving = M.read_table(spark, sv)
    assert serving.count() == n_rew
    assert serving.select("reward_id").distinct().count() == n_rew
    # each key appended by exactly one of the racers, never both
    assert r1.rows_loaded + r2.rows_loaded == n_rew

    # replay is a serving no-op; the warehouse gains one more version
    wh_v = M.current_version(wh)
    r3 = run_pipeline(spark, rewards, transactions, wh, sv, use_manifest=True)
    assert r3.rows_loaded == 0 and r3.rows_transformed == n_rew
    assert M.current_version(wh) == wh_v + 1
    assert M.read_table(spark, sv).count() == n_rew
    # time travel still answers on the warehouse's racing versions
    assert M.read_table(spark, wh, version=1).count() == n_rew
