"""Training-data pipeline operators: dedup, similarity, text, multimodal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from heritrix3_spark.datapipe import dedup as DD
from heritrix3_spark.datapipe import multimodal as MM
from heritrix3_spark.datapipe import similarity as SIM
from heritrix3_spark.datapipe import text as TX

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world",), ("  one  two   three ",), ("",), ("punct, done!",)], ["text"]
    )
    got = df.select(
        TX.token_count_col(F.col("text")).alias("n"),
        TX.bpe_ish_token_count_col(F.col("text")).alias("b"),
    ).collect()
    assert [r.n for r in got] == [2, 3, 0, 2]
    assert [r.b for r in got] == [2, 3, 0, 4]  # punct, done! -> punct , done !


def test_quality_and_langid(spark, docs):
    out = docs.select(
        "doc_id",
        "lang",
        TX.quality_score_col(F.col("text")).alias("q"),
        TX.lang_id_col(F.col("text")).alias("lang_guess"),
    )
    rows = out.collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    langs = {r.lang_guess for r in rows}
    assert langs <= {"en", "de", "fr", "es", "und"}


def test_doc_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "hello world"), ("c", "different text")], ["id", "text"]
    )
    got = {r.id: r.fp for r in df.select("id", TX.doc_fingerprint_udf(F.col("text")).alias("fp")).collect()}
    assert got["a"] == got["b"]  # normalization collapses case/whitespace
    assert got["a"] != got["c"]


def test_exact_dedup(spark):
    rows = [(i, f"unique document number {i} with content") for i in range(20)]
    rows += [(100 + i, "a duplicated document body") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = DD.exact_dedup(df, "doc_id", "text")
    assert out.count() == 21
    dup = out.filter(F.col("dup_count") == 5).collect()
    assert len(dup) == 1 and dup[0].keep_id == 100


def _near_dup_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, base),
        (2, base + "with one tiny suffix change"),  # near-dup of 1
        (3, "completely different content about spark dataframes and shuffles " * 6),
        (4, base),  # exact dup of 1
        (5, "another unrelated story concerning robots and crawling the web " * 6),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_candidates_and_clusters(spark):
    df = _near_dup_corpus(spark)
    pairs = {(r.a, r.b) for r in DD.minhash_candidate_pairs(df, "doc_id", "text").collect()}
    assert (1, 4) in pairs  # exact dup always caught
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup shares a band
    assert (3, 5) not in pairs  # unrelated docs don't pair
    labels = {r.id: r.cluster_id for r in DD.minhash_dedup_clusters(df, "doc_id", "text").collect()}
    assert labels[1] == labels[4] == labels[2] == 1
    assert labels[3] == 3 and labels[5] == 5


def test_band_bucket_skew_cap(spark, caplog):
    """Degenerate band values (30 identical docs) exceed the cap: the
    bucket is dropped with a logged count, not self-joined quadratically."""
    import logging

    rows = [(i, "boilerplate page body repeated verbatim " * 4) for i in range(30)]
    rows += [(100, "a genuinely unique document about something else entirely")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with caplog.at_level(logging.WARNING, logger="heritrix3_spark.datapipe.dedup"):
        capped = DD.minhash_candidate_pairs(df, "doc_id", "text", max_bucket=10).count()
    assert capped == 0
    assert any("skew guard" in r.message for r in caplog.records)
    # without the cap binding, the identical docs all pair
    assert DD.minhash_candidate_pairs(df, "doc_id", "text").count() == 30 * 29 // 2


def test_minhash_cluster_chain_converges(spark):
    """Sliding-window docs form a pair chain with no direct 0-3 edge
    (verified: banding is deterministic), so min-label propagation needs
    >1 round; all members collapse to the min id."""
    vocab = [f"w{i:03d}" for i in range(75)]
    rows = [(i, " ".join(vocab[i * 5 : i * 5 + 60])) for i in range(4)]
    rows.append((9, "unrelated content entirely " * 15))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.a, r.b) for r in DD.minhash_candidate_pairs(df, "doc_id", "text").collect()}
    assert (0, 3) not in pairs and (1, 3) in pairs  # 3 reaches 0 only via hops
    labels = {r.id: r.cluster_id for r in DD.minhash_dedup_clusters(df, "doc_id", "text").collect()}
    assert labels[0] == labels[1] == labels[2] == labels[3] == 0
    assert labels[9] == 9


def test_suggest_bits_scales():
    assert SIM.suggest_bits(10**9, target_bucket=256) == 22
    assert SIM.suggest_bits(1000, target_bucket=256) == 4
    assert SIM.suggest_bits(10**6, target_bucket=256) == 12


def test_simhash_near_dups(spark):
    df = _near_dup_corpus(spark)
    pairs = {(r.a, r.b): r.hamming for r in DD.simhash_dedup(df, "doc_id", "text", max_hamming=3).collect()}
    assert pairs[(1, 4)] == 0  # identical
    assert all(h <= 3 for h in pairs.values())
    assert (3, 5) not in pairs


def test_ngram_jaccard(spark):
    df = _near_dup_corpus(spark)
    out = {(r.a, r.b): r.jaccard for r in DD.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()}
    assert out[(1, 4)] == 1.0
    assert (1, 2) in out and 0.5 <= out[(1, 2)] < 1.0


def test_cosine_topk_exact(spark, emb):
    pdf = emb.limit(500).toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries = [mat[3].tolist(), mat[77].tolist()]
    df = spark.createDataFrame(pdf)
    got = SIM.cosine_topk(df, queries, k=5)
    res = {(r.query_id, r.rank): r.vec_id for r in got.collect()}
    # numpy ground truth
    qm = mat[[3, 77]] / np.linalg.norm(mat[[3, 77]], axis=1, keepdims=True)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = qm @ nm.T
    for qi in range(2):
        order = sorted(range(len(ids)), key=lambda i: (-scores[qi, i], ids[i]))[:5]
        for rank, i in enumerate(order, start=1):
            assert res[(qi, rank)] == ids[i], (qi, rank)
    # self-match is rank 1 with score ~1
    assert res[(0, 1)] == ids[3] and res[(1, 1)] == ids[77]


def test_lsh_topk_finds_self(spark, emb):
    pdf = emb.limit(300).toPandas()
    dim = len(pdf["embedding"].iloc[0])
    df = spark.createDataFrame(pdf)
    bucketed = SIM.add_lsh_buckets(df, dim, bits=6)
    q = [pdf["embedding"].iloc[10], pdf["embedding"].iloc[20]]
    got = SIM.lsh_cosine_topk(bucketed, [list(v) for v in q], dim, k=3, bits=6)
    top1 = {r.query_id: r.vec_id for r in got.filter(F.col("rank") == 1).collect()}
    assert top1[0] == pdf["vec_id"].iloc[10]
    assert top1[1] == pdf["vec_id"].iloc[20]


def test_cosine_topk_sql_expr_matches_bruteforce(spark, emb):
    pdf = emb.limit(200).toPandas()
    df = spark.createDataFrame(pdf)
    q = list(pdf["embedding"].iloc[5])
    a = SIM.cosine_topk(df, [q], k=5)
    b = SIM.cosine_topk_sql_expr(df, q, k=5)
    ra = [r.vec_id for r in a.orderBy("rank").collect()]
    rb = [r.vec_id for r in b.orderBy("rank").collect()]
    assert ra == rb


def test_embedding_near_dup_pairs(spark, emb):
    """Inject near-identical vectors; only those pair at threshold 0.99."""
    import pandas as pd

    pdf = emb.limit(200).toPandas()
    v = np.array(pdf["embedding"].iloc[0], dtype=np.float32)
    near = (v + 0.0005).astype(np.float32)  # ~cos 1.0 with v
    extra = pd.DataFrame(
        {"vec_id": [90001, 90002], "embedding": [v.tolist(), near.tolist()], "label": [0, 0]}
    )
    df = spark.createDataFrame(pd.concat([pdf, extra], ignore_index=True))
    pairs = SIM.embedding_near_dup_pairs(df, dim=len(v), threshold=0.99)
    got = {(r.a, r.b) for r in pairs.collect()}
    # vec 0's id duplicates 90001/90002
    vid = int(pdf["vec_id"].iloc[0])
    assert (vid, 90001) in got and (vid, 90002) in got and (90001, 90002) in got
    # random embeddings don't spuriously pair at 0.99
    assert all(a in (vid, 90001, 90002) and b in (vid, 90001, 90002) for a, b in got)


def test_multimodal_plumbing(spark):
    media = MM.synth_media_df(spark, n=30)
    feats = MM.fake_feature_extract(media).collect()
    assert len(feats) == 30
    assert all(len(r.feature) == MM.FEATURE_DIM for r in feats)
    # deterministic across runs
    feats2 = {r.media_id: r.feature for r in MM.fake_feature_extract(media).collect()}
    for r in feats:
        assert feats2[r.media_id] == r.feature
    # payloads with no stdlib codec raise at the marked decode boundary
    with pytest.raises(Exception) as e:
        MM.decode_media(media).count()
    assert "NotImplementedError" in str(e.value) or isinstance(e.value, NotImplementedError)
    # frame sampling plan fan-out
    plan = MM.frame_sample_plan(media, every_ms=500)
    assert plan.count() > 0
    assert plan.groupBy("media_id").count().agg(F.max("count")).collect()[0][0] >= 1


def test_media_decode_real_formats(spark):
    """decode_media really decodes what the stdlib can parse: BMP and P6
    dimensions, WAV duration — metadata comes from the BYTES, not the
    declared columns (declared values are deliberately wrong here)."""
    rows = [
        ("bmp0", "image", "image/bmp", 1, 1, None, bytearray(MM.make_bmp(17, 9))),
        ("ppm0", "image", "image/x-portable-pixmap", 1, 1, None,
         bytearray(MM.make_ppm(5, 3))),
        ("wav0", "audio", "audio/x-wav", None, None, 7, bytearray(MM.make_wav(1250))),
        ("png0", "image", "image/png", 1, 1, None, bytearray(MM.make_png(31, 13))),
        ("gif0", "image", "image/gif", 1, 1, None, bytearray(MM.make_gif(640, 350))),
        ("jpg0", "image", "image/jpeg", 1, 1, None,
         bytearray(MM.make_jpeg(123, 45))),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.decode_media(df, strict=True).collect()}
    assert (got["bmp0"].width, got["bmp0"].height) == (17, 9)
    assert (got["ppm0"].width, got["ppm0"].height) == (5, 3)
    assert got["wav0"].duration_ms == 1250
    assert (got["png0"].width, got["png0"].height) == (31, 13)
    assert (got["gif0"].width, got["gif0"].height) == (640, 350)
    assert (got["jpg0"].width, got["jpg0"].height) == (123, 45)
    # scalar parsers agree with the generators directly (incl. edge forms)
    assert MM._decode_bmp(MM.make_bmp(1, 1)) == (1, 1)
    assert MM._decode_pnm(b"P5\n#c\n 640\t480\n255\n") == (640, 480)
    assert MM._decode_bmp(b"JUNK") is None and MM._decode_wav(b"RIFFxxxx") is None
    # png fixture is a REAL png (zlib-verifiable IDAT, correct CRCs)
    import struct as _struct
    import zlib as _zlib

    png = MM.make_png(4, 2)
    assert _zlib.crc32(png[12:29]) == _struct.unpack(">I", png[29:33])[0]
    # jpeg walk skips APP0/COM and stops at SOF0; truncated streams -> None
    assert MM._decode_jpeg(MM.make_jpeg(9, 7)) == (9, 7)
    assert MM._decode_jpeg(b"\xff\xd8\xff\xd9") is None
    assert MM._decode_png(b"\x89PNG\r\n\x1a\n....") is None
    assert MM._decode_gif(b"GIF89a~~") is None  # too short for the LSD
    # non-strict: undecodable payloads pass through with metadata untouched
    junk = spark.createDataFrame(
        [("j0", "image", "image/gif", 4, 2, None, bytearray(b"GIF89a~~"))],
        MM.MEDIA_SCHEMA,
    )
    out = MM.decode_media(junk, strict=False).collect()[0]
    assert (out.width, out.height) == (4, 2)


def test_ivf_ann_topk(spark):
    """IVF ANN: probe-limited exact rescoring finds the true neighbor and
    high-nprobe converges to the brute-force ranking."""
    import numpy as np

    from heritrix3_spark.datapipe import similarity as SIM

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((400, 16))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = SIM.ivf_centroids(dim=16, n_cells=8)
    celled = SIM.add_ivf_cells(emb, cents).persist()
    q = [float(x) for x in vecs[42]]
    got = SIM.ivf_topk(celled, [q], cents, k=5, nprobe=2).collect()
    assert got[0].vec_id == 42 and got[0].rank == 1  # self always found
    assert len(got) == 5 and [r.rank for r in got] == [1, 2, 3, 4, 5]
    # full-probe IVF == brute force (every cell probed -> exact)
    full = SIM.ivf_topk(celled, [q], cents, k=5, nprobe=8).collect()
    brute = SIM.cosine_topk(emb, [q], k=5).collect()
    assert [(r.vec_id, r.rank) for r in full] == [
        (r.vec_id, r.rank) for r in brute
    ]
    celled.unpersist()


def test_ivf_refine_centroids(spark):
    """Lloyd refinement keeps the centroid count/shape, returns unit-norm
    rows, and does not degrade assignment quality (mean best-cosine)."""
    import numpy as np

    from heritrix3_spark.datapipe import similarity as SIM

    rng = np.random.RandomState(5)
    # three true clusters
    centers = SIM._normalize(rng.standard_normal((3, 8)))
    pts = np.vstack([
        SIM._normalize(c + 0.15 * rng.standard_normal((50, 8))) for c in centers
    ])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    seed = SIM.ivf_centroids(dim=8, n_cells=3)
    refined = SIM.ivf_refine_centroids(emb, seed, iters=3)
    assert refined.shape == seed.shape
    assert np.allclose(np.linalg.norm(refined, axis=1), 1.0)
    before = (SIM._normalize(pts) @ seed.T).max(axis=1).mean()
    after = (SIM._normalize(pts) @ refined.T).max(axis=1).mean()
    assert after >= before  # Lloyd never degrades the objective here


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style repetition removal, Rae et al. 2021)
# ---------------------------------------------------------------------------
def test_repetition_signals_laws(spark):
    from heritrix3_spark.datapipe.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # 4 lines, 'dup dup' twice: 2 dup lines of 4 (7 chars of 22)
            ("d1", "alpha beta\ndup dup\ngamma\ndup dup"),
            # all-unique everything
            ("d2", "one two three four five six"),
            # heavy word repetition, no newlines (the 100TB-corpus shape)
            ("d3", "spam spam spam spam spam spam ham"),
            # empty + single-word edges
            ("d4", ""),
            ("d5", "word"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs).collect()}

    d1 = rows["d1"]
    assert d1["n_lines"] == 4
    assert d1["dup_line_fraction"] == 0.25  # 1 of 4 lines is a repeat
    # chars: lines total 10+7+5+7=29, distinct 10+7+5=22 -> 7/29
    assert d1["dup_line_char_fraction"] == round(7 / 29, 6)
    # words: alpha beta dup dup gamma dup dup -> 7 words, 4 distinct
    assert d1["dup_word_fraction"] == round(3 / 7, 6)

    d2 = rows["d2"]
    assert d2["dup_line_fraction"] == 0.0
    assert d2["dup_word_fraction"] == 0.0
    assert d2["dup_5gram_fraction"] == 0.0
    # 6 words -> 5 bigrams all unique: top count 1
    assert d2["top_2gram_count"] == 1

    d3 = rows["d3"]
    # 'spam spam' x5 of 6 bigrams; word chars 6*4+3=27; frac 5*8/27
    assert d3["top_2gram"] == "spam spam"
    assert d3["top_2gram_count"] == 5
    assert d3["top_2gram_char_fraction"] == round(40 / 27, 6)
    # 5-grams: [s s s s s] x2 + [s s s s h] -> 3 grams, 1 dup
    assert d3["dup_5gram_fraction"] == round(1 / 3, 6)

    for d in ("d4", "d5"):
        r = rows[d]
        assert r["dup_line_fraction"] == 0.0
        assert r["dup_5gram_fraction"] == 0.0
        assert r["top_2gram_count"] == 0
        assert r["top_2gram_char_fraction"] == 0.0
        assert r["top_2gram"] is None


def test_word_ngrams_sequence_guard(spark):
    # Spark sequence(1, stop) DESCENDS for stop < 1 — the guard must kick in
    from heritrix3_spark.datapipe.text import word_ngrams_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c",), ("a",), ("",)], ["text"])
    got = [r[0] for r in df.select(word_ngrams_col(F.col("text"), 5)).collect()]
    assert got == [[], [], []]
    got2 = [r[0] for r in df.select(word_ngrams_col(F.col("text"), 2)).collect()]
    assert got2 == [["a b", "b c"], [], []]


def test_hash_str64_batch_matches_scalar():
    """The vectorized FNV kernel must be bit-identical to the scalar law."""
    import numpy as np

    from heritrix3_spark.datapipe.dedup import hash_str64, hash_str64_batch

    cases = ["", "a", "hello world", "é ü ñ", "x" * 300, "word " * 50, "ÿ"]
    got = hash_str64_batch(cases)
    assert got.dtype == np.uint64
    assert [int(v) for v in got] == [hash_str64(s) for s in cases]
