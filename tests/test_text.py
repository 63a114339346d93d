from __future__ import annotations

from pyspark.sql import functions as F

from cashback_data_pipeline_spark.operators import text
from cashback_data_pipeline_spark.sources import read_testdata


def test_analyze_family_schema_and_values(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents").limit(50)
    out = text.analyze(docs)
    row = out.filter(F.col("doc_id") == 0).first()
    py_tokens = row["text"].split(" ")
    assert row["token_count"] == len(py_tokens)
    assert row["n_chars"] == len(row["text"])
    assert 0.0 < row["distinct_token_ratio"] <= 1.0
    assert 0.0 <= row["quality_score"] <= 1.0
    assert isinstance(row["simhash"], int)
    assert len(row["fingerprint"]) == 32


def test_lang_id_lexicon_argmax(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is a pet"),       # en hits: the,a,and,is
            (2, "el perro y la casa de que"),          # es hits
            (3, "xyzzy qwerty plugh"),                 # no hits -> und
            (4, "la table"),                            # tie es/fr (la) -> alphabetical: es
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", text.lang_id("text").alias("l")).collect()}
    assert got == {1: "en", 2: "es", 3: "und", 4: "es"}


def test_fingerprint_canonicalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello  WORLD"), (4, "different")],
        "doc_id int, text string",
    )
    fps = [r["fp"] for r in df.select(text.fingerprint_md5("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_simhash_similar_docs_close(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("today", "tonight")
    far = "completely unrelated words about spark catalyst optimizer physical plans"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id int, text string")
    sigs = {r["doc_id"]: r["sig"] for r in text.simhash_signatures(df).collect()}
    ham_near = bin((sigs[1] ^ sigs[2]) & 0xFFFFFFFFFFFFFFFF).count("1")
    ham_far = bin((sigs[1] ^ sigs[3]) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham_near < ham_far


def test_bpe_estimate_at_least_words(spark):
    df = spark.createDataFrame([(1, "internationalization is extraordinarily long")], "doc_id int, text string")
    row = df.select(
        text.token_count("text").alias("w"), text.bpe_token_estimate("text").alias("b")
    ).first()
    assert row["b"] >= row["w"]


def test_chunk_documents_overlap_and_coverage(spark):
    doc = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, doc)], "doc_id int, text string")
    chunks = text.chunk_documents(df, chunk_tokens=64, overlap=8).orderBy("chunk_idx").collect()
    assert [r["n_tokens"] for r in chunks] == [64, 64, 38]
    c0, c1 = chunks[0]["chunk_text"].split(" "), chunks[1]["chunk_text"].split(" ")
    assert c0[-8:] == c1[:8]  # overlap region repeats
    covered = {t for r in chunks for t in r["chunk_text"].split(" ")}
    assert covered == {f"w{i}" for i in range(150)}  # lossless coverage
    with __import__("pytest").raises(ValueError):
        text.chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunk_documents_no_contained_trailing_chunk(spark):
    # 120 tokens, chunk 64 / overlap 8 (stride 56): a start at 112 would
    # emit tokens 113-120 — wholly inside chunk 2 (57-120). It must not.
    doc = " ".join(f"w{i}" for i in range(120))
    df = spark.createDataFrame([(1, doc)], "doc_id int, text string")
    chunks = text.chunk_documents(df, chunk_tokens=64, overlap=8).orderBy("chunk_idx").collect()
    assert [r["n_tokens"] for r in chunks] == [64, 64]
    covered = {t for r in chunks for t in r["chunk_text"].split(" ")}
    assert covered == {f"w{i}" for i in range(120)}  # still lossless


def test_simhash_drops_null_text(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, None)], "doc_id int, text string"
    )
    sigs = text.simhash_signatures(df).collect()
    assert [r["doc_id"] for r in sigs] == [1]  # null docs emit no signature


def test_pack_documents_budget_discipline(spark):
    sizes = [100, 200, 300, 250, 50, 400]
    df = spark.createDataFrame(
        [(i, " ".join(["x"] * n)) for i, n in enumerate(sizes)], "doc_id int, text string"
    )
    packs = {r["doc_id"]: r["pack_id"] for r in text.pack_documents(df, target_tokens=512).collect()}
    assert packs == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    # every pack except possibly the last STARTS under budget (exclusive sums)
    running = 0
    for i, n in enumerate(sizes):
        assert packs[i] == running // 512
        running += n


def test_vocab_top_terms_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "b b a"), (2, "a b"), (3, "c  a")], "doc_id long, text string"
    )
    out = [r.asDict() for r in text.vocab_top_terms(df, k=2).collect()]
    # term_freq: a=3,b=3,c=1; tie a/b broken by term asc; empty token (double
    # space) filtered; doc_freq counts docs, not occurrences
    assert out[0]["term"] == "a" and out[0]["term_freq"] == 3 and out[0]["doc_freq"] == 3
    assert out[1]["term"] == "b" and out[1]["term_freq"] == 3 and out[1]["doc_freq"] == 2


def test_greedy_bpe_token_ids_edges(spark):
    """Longest-match wins over shorter prefixes, unknown chars emit -1
    and advance one char, NULL/empty texts keep a row with 0 tokens."""
    from cashback_data_pipeline_spark.operators import text as text_ops

    v = text_ops.GREEDY_BPE_VOCAB
    df = spark.createDataFrame(
        [(1, "the table"), (2, "9!"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text_ops.greedy_bpe_token_ids(df).collect()}
    # 'the ' must win over 'th'/'t'; 'table' has no trailing space so the
    # word-entry 'table ' cannot match and sub-word merges take over
    assert out[1].token_ids[0] == v.index("the ")
    assert v.index("th") not in out[1].token_ids[:1]
    assert out[2].token_ids == [-1, -1] and out[2].n_bpe_tokens == 2
    assert out[3].token_ids == [] and out[3].n_bpe_tokens == 0
    assert out[4].token_ids == []
    # round-trip: decoding with the vocab reproduces the text (no -1s)
    decoded = "".join(v[i] for i in out[1].token_ids)
    assert decoded == "the table"


def test_greedy_bpe_rejects_duplicate_vocab(spark):
    import pytest

    from cashback_data_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unique"):
        text_ops.greedy_bpe_token_ids(df, vocab=("a", "a"))


def _ref_bpe_encode(s, merges, base):
    """Independent reference: ONE pair at a time, always the lowest-rank
    pair present, leftmost occurrence first (the tiktoken-style
    formulation — equivalent to merge-all under dependency-ordered
    tables, which is exactly what the parity test asserts)."""
    ranks = {pair: r for r, pair in enumerate(merges)}
    seq = [ch if ch in base else "\x00" for ch in s]
    while True:
        best = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        seq[i : i + 2] = [seq[i] + seq[i + 1]]
    return seq


def test_merge_bpe_parity_with_reference_implementation(spark):
    """The Spark kernel (merge-all-occurrences per step) must match the
    independent one-pair-at-a-time reference on the fixture vocab,
    including merge-order-sensitive and unknown-char inputs."""
    from cashback_data_pipeline_spark.operators import text as text_ops

    cases = [
        "the data and the table",
        "ath",                      # order-sensitive: (t,h) rank 0 beats (a,t) rank 9
        "thing going in",           # in+g chains through rank 12
        "datadata dat da",          # longest chain da->dat->data
        "the theater is the thing",
        "x9!? the",                 # unknowns interleaved
        "",                         # empty
        "zzz",                      # no merges at all
        "ananan",                   # overlapping pair occurrences, left-to-right
    ]
    df = spark.createDataFrame(list(enumerate(cases)), "doc_id long, text string")
    got = {r["doc_id"]: list(r["token_ids"]) for r in text_ops.merge_bpe_token_ids(df).collect()}
    vocab = text_ops.merge_bpe_vocab()
    for i, s in enumerate(cases):
        ref_syms = _ref_bpe_encode(s, text_ops.MERGE_BPE_MERGES, set(text_ops.MERGE_BPE_BASE))
        want = [vocab.get(sym, -1) for sym in ref_syms]
        assert got[i] == want, (s, got[i], want)


def test_merge_bpe_diverges_from_greedy_longest_match(spark):
    """The defect VERDICT r4 item 6 names: longest-match greedy is NOT
    BPE. On 'ath', BPE applies rank-0 (t,h) first -> [a, th]; a greedy
    longest-match over the same symbol inventory would consume 'at'
    first -> [at, h]. Token COUNTS agree here (2 vs 2) but the ids
    differ — the sequence is what training pipelines consume."""
    from cashback_data_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame([(0, "ath")], "doc_id long, text string")
    out = text_ops.merge_bpe_token_ids(df).collect()[0]
    vocab = text_ops.merge_bpe_vocab()
    assert list(out["token_ids"]) == [vocab["a"], vocab["th"]]
    # greedy longest-match over a vocab containing 'at' would pick it
    greedy = text_ops.greedy_bpe_token_ids(df, vocab=("at", "th") + tuple("ath")).collect()[0]
    assert list(greedy["token_ids"])[0] == 0  # 'at' consumed first


def test_merge_bpe_rejects_dependency_violation(spark):
    from cashback_data_pipeline_spark.operators import text as text_ops
    import pytest

    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no earlier rank"):
        # 'th' is never produced before rank 0 consumes it
        text_ops.merge_bpe_token_ids(df, merges=(("th", "e"),))


def _ref_bpe_train(texts, n_merges, base):
    """Independent reference trainer: the classic get_stats/merge loop
    over symbol lists (overlapping adjacents counted; ties broken on
    lexicographically smallest (lhs, rhs))."""
    UNK = "\x00"
    corpus = [[c if c in base else UNK for c in t] for t in texts]
    out = []
    for rank in range(n_merges):
        stats = {}
        for s in corpus:
            for a, b in zip(s, s[1:]):
                if UNK not in (a, b):
                    stats[(a, b)] = stats.get((a, b), 0) + 1
        if not stats:
            break
        (bl, br), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = bl + br
        nxt = []
        for s in corpus:
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == bl and s[i + 1] == br:
                    res.append(merged); i += 2
                else:
                    res.append(s[i]); i += 1
            nxt.append(res)
        corpus = nxt
        out.append((rank, bl, br, c, sum(len(s) for s in corpus)))
    return out


def test_bpe_train_matches_reference_trainer(spark):
    from cashback_data_pipeline_spark.operators import text as text_ops

    texts = [
        "the cat and the hat and the bat",
        "thing the thin thaw",
        "banana bandana and a band",
        "x1! the end",  # unknowns never merge
        "",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"], r["corpus_tokens_after"])
        for r in text_ops.bpe_train_merges(df, 6).orderBy("rank").collect()
    ]
    want = _ref_bpe_train(texts, 6, set(text_ops.MERGE_BPE_BASE))
    assert got == want, (got, want)
    # sanity on content: the 'an'-family (banana/bandana/and/band)
    # dominates this corpus — 'an' is the first learned merge
    assert (got[0][1], got[0][2]) == ("a", "n")


def test_bpe_train_then_encode_composes(spark):
    """The learned table must be dependency-ordered by construction, so
    merge_bpe_token_ids runs on it directly (train -> tokenize is the
    production loop)."""
    from cashback_data_pipeline_spark.operators import text as text_ops

    texts = ["the theme and the throne", "then and there the thing"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    learned = [
        (r["lhs"], r["rhs"])
        for r in text_ops.bpe_train_merges(df, 5).orderBy("rank").collect()
    ]
    out = {r["doc_id"]: r for r in text_ops.merge_bpe_token_ids(df, merges=tuple(learned)).collect()}
    # encoding with the corpus-trained table compresses vs raw chars
    assert all(out[i]["n_tokens"] < len(t) for i, t in enumerate(texts))
    # and matches the independent reference encoder on the same table
    vocab = text_ops.merge_bpe_vocab(tuple(learned))
    for i, t in enumerate(texts):
        ref = _ref_bpe_encode(t, tuple(learned), set(text_ops.MERGE_BPE_BASE))
        assert list(out[i]["token_ids"]) == [vocab.get(s, -1) for s in ref]


def test_merges_txt_roundtrip_and_encode(spark, tmp_path):
    """Train -> save merges.txt -> load -> tokenize: the standard
    interchange loop, byte-identical table through the file."""
    from cashback_data_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(0, "the theme and the throne"), (1, "then and there the thing")],
        "doc_id long, text string",
    )
    learned = tuple(
        (r["lhs"], r["rhs"]) for r in text_ops.bpe_train_merges(df, 4).orderBy("rank").collect()
    )
    p = str(tmp_path / "merges.txt")
    text_ops.save_merges_txt(learned, p)
    loaded = text_ops.load_merges_txt(p)
    assert loaded == learned
    a = {r["doc_id"]: list(r["token_ids"]) for r in text_ops.merge_bpe_token_ids(df, merges=learned).collect()}
    b = {r["doc_id"]: list(r["token_ids"]) for r in text_ops.merge_bpe_token_ids(df, merges=loaded).collect()}
    assert a == b


def test_merge_bpe_duplicate_product_keeps_stable_ids(spark):
    """Two merges producing the SAME symbol string (('a','bc') then
    ('ab','c') -> 'abc') are legitimate Sennrich output: the symbol must
    keep its first token id and later symbols must still get UNIQUE ids
    (a plain dict assignment silently aliased two symbols to one id)."""
    from cashback_data_pipeline_spark.operators import text as text_ops

    merges = (("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c"), ("c", "a"))
    vocab = text_ops.merge_bpe_vocab(merges)
    assert len(set(vocab.values())) == len(vocab)  # ids are unique
    assert vocab["abc"] == vocab["a" + "bc"]  # same symbol, one id
    df = spark.createDataFrame([(0, "abcabc ca")], "doc_id long, text string")
    out = text_ops.merge_bpe_token_ids(df, merges=merges).collect()[0]
    # every emitted id decodes to exactly one symbol
    rev = {v: k for k, v in vocab.items()}
    assert all(t in rev or t == -1 for t in out["token_ids"])


def test_merge_bpe_rejects_duplicate_pairs(spark):
    from cashback_data_pipeline_spark.operators import text as text_ops
    import pytest

    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="duplicate merge pairs"):
        text_ops.merge_bpe_token_ids(df, merges=(("a", "b"), ("a", "b")))


def test_script_tokens_segment_cjk_per_character(spark):
    """VERDICT r10 item 7: tokens(mode='script') — CJK codepoints one
    token each, other scripts whole words; whitespace mode unchanged."""
    from pyspark.sql import functions as F

    from cashback_data_pipeline_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "我爱数据"),                  # 4 Han chars → 4 tokens
            (2, "spark は 速い engine です"),  # mixed kana/latin
            (3, "한국어 텍스트"),              # Hangul → per character
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", text_ops.tokens("text", mode="script").alias("toks")
        ).collect()
    }
    assert got[0] == ["the", "cat", "sat"]
    assert got[1] == ["我", "爱", "数", "据"]
    assert got[2] == ["spark", "は", "速", "い", "engine", "で", "す"]
    assert got[3] == ["한", "국", "어", "텍", "스", "트"]
    # word-level counting stops degenerating on unspaced scripts
    n = df.select(text_ops.token_count("text", mode="script").alias("n")).collect()
    assert [r["n"] for r in n] == [3, 4, 7, 6]
    with_ws = df.select(text_ops.token_count("text").alias("n")).collect()
    assert [r["n"] for r in with_ws] == [3, 1, 5, 2]


def test_tokens_unknown_mode_refuses(spark):
    import pytest

    from cashback_data_pipeline_spark.operators import text as text_ops

    with pytest.raises(ValueError, match="unknown tokenization mode"):
        text_ops.tokens("text", mode="chars")
