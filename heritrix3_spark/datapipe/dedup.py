"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
* exact — hash-groupBy on a 64-bit content fingerprint: one shuffle, AQE
  handles skew. The representative is min(doc_id) (deterministic).
* MinHash+LSH — shingle -> minhash signature (numpy, one Arrow batch pass)
  -> band buckets -> bucket-join -> candidate pairs -> exact Jaccard verify.
  Only bucket-mates ever pair: no O(n^2) crossJoin at any point.
* SimHash — 64-bit signature; near-dup candidates share >=1 of 4 exact
  16-bit bands (guarantees recall for Hamming distance <= 3).
* cluster representative — iterative min-propagation over candidate pairs
  (connected components), each iteration localCheckpoint'ed so lineage
  stays O(1) and the convergence check never re-executes the LSH join.
* band-bucket skew guard — a degenerate band value (empty/boilerplate
  docs) would make one bucket's self-join quadratic; every band join caps
  bucket size and LOGS the number of dropped buckets (no silent caps).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

logger = logging.getLogger(__name__)

# A band bucket larger than this is a degenerate key (boilerplate/empty
# docs): its self-join is O(cap^2). Buckets over the cap are dropped with a
# logged count. 1000 bounds any single bucket's pair fan-out at ~500k while
# leaving realistic near-dup buckets (tens of docs) untouched.
DEFAULT_MAX_BUCKET = 1000


def _cap_band_buckets(bands: DataFrame, keys: list[str], max_bucket: int | None, label: str) -> DataFrame:
    """Drop band buckets with > max_bucket members, logging how many.

    The oversized-keys frame is tiny (only degenerate keys), so the
    anti-join broadcasts; the count() that produces the log line runs on
    the persisted bands frame, not a recompute of the signature UDF.
    The big-keys list is collected (bounded: only degenerate keys) so both
    persisted frames can be unpersisted HERE on every path — a long-lived
    pipeline session must not accumulate cached band frames.
    """
    if not max_bucket:
        return bands
    bands = bands.persist()
    big = (
        bands.groupBy(*keys)
        .agg(F.count("*").alias("__bucket_n"))
        .filter(F.col("__bucket_n") > max_bucket)
    )
    big_rows = big.select(*keys).collect()
    if big_rows:
        logger.warning(
            "%s: dropping %d band bucket(s) larger than %d members (skew guard)",
            label,
            len(big_rows),
            max_bucket,
        )
        spark = bands.sparkSession
        big_keys = spark.createDataFrame(big_rows, bands.select(*keys).schema)
        out = bands.join(F.broadcast(big_keys), keys, "left_anti").localCheckpoint()
        bands.unpersist()
        return out
    out = bands.localCheckpoint()
    bands.unpersist()
    return out

# deterministic MinHash parameters
_MERSENNE = (1 << 61) - 1
_N_HASHES = 64
_N_BANDS = 16  # 16 bands x 4 rows
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
# fixed odd multipliers/offsets (derived from a deterministic LCG — public
# standard Kirsch-Mitzenmacher style parameterization)
_A = np.array(
    [(2654435761 * (2 * i + 1)) & _MERSENNE or 1 for i in range(_N_HASHES)],
    dtype=np.uint64,
)
_B = np.array([(40503 * (i + 1) ** 2 + 7) & _MERSENNE for i in range(_N_HASHES)], dtype=np.uint64)


def _shingle_strings(text: str, k: int = 5) -> list:
    """k-word shingle strings (word n-grams) of normalized text."""
    words = text.lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Hashes of k-word shingles (word n-grams) of normalized text."""
    grams = _shingle_strings(text, k)
    if not grams:
        return np.zeros(1, dtype=np.uint64)
    return hash_str64_batch(grams)


def hash_str64(s: str) -> int:
    """Deterministic 64-bit FNV-1a string hash (no PYTHONHASHSEED issues)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_str64_batch(strings: list) -> np.ndarray:
    """Vectorized FNV-1a over a batch of strings (bit-identical to
    hash_str64: uint64 multiply wraps mod 2^64 like the masked scalar).

    One byte-matrix fill + one numpy pass per byte position replaces the
    former per-string per-byte Python loop — that loop dominated both
    signature UDFs' task time (guide §4.2: hand whole batches to
    vectorized native code).
    """
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    enc = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in enc), np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if maxlen == 0:
        return h
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    # row-major mask assignment: flat utf-8 bytes land per-row in order
    buf[np.arange(maxlen)[None, :] < lens[:, None]] = np.frombuffer(
        b"".join(enc), dtype=np.uint8
    )
    prime = np.uint64(0x100000001B3)
    for p in range(maxlen):
        nh = (h ^ buf[:, p]) * prime
        h = np.where(lens > p, nh, h)
    return h


@pandas_udf(ArrayType(LongType()))
def minhash_signature_udf(text: pd.Series) -> pd.Series:
    """64-permutation MinHash signature per document.

    All documents' shingles hash in ONE vectorized FNV batch; the per-doc
    permutation-min runs over precomputed hash segments (same values as
    the former per-shingle scalar hashing, orders of magnitude less
    Python interpretation)."""
    gram_lists = []
    for t in text.fillna(""):
        sh = _shingle_strings(t)
        gram_lists.append(sh)
    flat = [g for grams in gram_lists for g in grams]
    hashes = hash_str64_batch(flat)
    out = []
    off = 0
    zero = np.zeros(1, dtype=np.uint64)
    for grams in gram_lists:
        sh = hashes[off : off + len(grams)] if grams else zero
        off += len(grams)
        # (n_hashes, n_shingles) via broadcasting, min over shingles
        vals = (sh[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
        out.append(vals.min(axis=1).astype(np.int64).tolist())
    return pd.Series(out)


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word hashes (bit-vote; batch-hashed words)."""
    word_lists = [t.lower().split() for t in text.fillna("")]
    hashes = hash_str64_batch([w for ws in word_lists for w in ws])
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    out = np.zeros(len(text), dtype=np.int64)
    off = 0
    powers = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)
    for i, words in enumerate(word_lists):
        if not words:
            continue
        hs = hashes[off : off + len(words)]
        off += len(words)
        bits = ((hs[:, None] >> shifts) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(words)
        sig = (powers * (votes > 0).astype(np.uint64)).sum(dtype=np.uint64)
        out[i] = np.uint64(sig).astype(np.int64)
    return pd.Series(out)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by normalized-content fingerprint; keeps min(id).

    Returns (content_fp, keep_id, dup_count).
    """
    from heritrix3_spark.datapipe.text import doc_fingerprint_udf

    return (
        df.select(F.col(id_col).alias("id"), doc_fingerprint_udf(F.col(text_col)).alias("content_fp"))
        .groupBy("content_fp")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def minhash_bands(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, band_id, band_hash) — LSH bucket keys, one row per band."""
    sig = df.select(
        F.col(id_col).alias("id"), minhash_signature_udf(F.col(text_col)).alias("sig")
    )
    bands = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", i * _ROWS_PER_BAND + j + 1)
                            for j in range(_ROWS_PER_BAND)
                        ]
                    )
                    for i in range(_N_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )
    return bands


def minhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, max_bucket: int | None = DEFAULT_MAX_BUCKET
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing >= 1 LSH band bucket.

    Bucket sizes are capped (skew guard, logged) so no degenerate band
    value can make the bucket self-join quadratic.
    """
    bands = _cap_band_buckets(
        minhash_bands(df, id_col, text_col), ["band_id", "band_hash"], max_bucket, "minhash"
    )
    left = bands.select("band_id", "band_hash", F.col("id").alias("a"))
    right = bands.select("band_id", "band_hash", F.col("id").alias("b"))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_iter: int = 10,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """(id, cluster_id): connected components over LSH candidate pairs via
    iterative min-label propagation (converges in <= component diameter
    rounds; near-dup clusters are tiny, so 2-3 rounds in practice).

    Scale discipline: ``pairs`` is persisted once; every iteration's label
    frame is ``localCheckpoint``-ed so (a) lineage stays O(1) instead of
    growing one join per iteration, and (b) the convergence check reads the
    materialized frame — the LSH join is executed exactly once, not
    O(iterations) times. The old/new label comparison rides in the same
    frame (``old_cid`` column), so convergence costs one cheap count on
    checkpointed data, no extra join. For web-scale components with large
    diameters, swap the propagation loop for large-star/small-star; near-dup
    clusters (the use case here) have diameter ~2.
    """
    pairs = minhash_candidate_pairs(df, id_col, text_col, max_bucket=max_bucket).persist()
    labels = (
        df.select(F.col(id_col).alias("id"))
        .withColumn("cluster_id", F.col("id"))
        # lazy: materializes inside the first iteration's join instead of
        # paying a dedicated pass
        .localCheckpoint(eager=False)
    )
    prev = labels  # previous iteration's checkpoint, released once superseded
    sym = pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nmin"))
        )
        upd = (
            labels.join(neigh, labels["id"] == neigh["a"], "left")
            .select(
                "id",
                F.col("cluster_id").alias("old_cid"),
                F.least(F.col("cluster_id"), F.coalesce(F.col("nmin"), F.col("cluster_id"))).alias(
                    "cluster_id"
                ),
            )
            # lazy checkpoint: the convergence count below is the first
            # action and materializes the blocks in the SAME job (the
            # eager form paid a separate full pass per iteration)
            .localCheckpoint(eager=False)
        )
        changed = upd.filter(F.col("cluster_id") != F.col("old_cid")).count()
        labels = upd.select("id", "cluster_id")
        # upd is materialized — its parent checkpoint's blocks are garbage
        # now; release them so resident blocks stay O(2N), not O(iters x N)
        # (DataFrame.unpersist wouldn't touch localCheckpoint blocks: they
        # hang off the LogicalRDD in the analyzed plan)
        try:
            prev._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
        prev = upd
        if changed == 0:
            break
    pairs.unpersist()
    return labels


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs by SimHash banding + exact Hamming verify.

    4 bands of 16 bits: any pair within Hamming distance 3 shares at least
    one exact band (pigeonhole), so banding has full recall for d<=3.
    Band buckets over ``max_bucket`` are dropped with a logged count (skew
    guard — e.g. sig=0 from empty docs would otherwise go quadratic).
    """
    sig = df.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sig"))
    bands = sig.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    bands = _cap_band_buckets(bands, ["band_id", "band_val"], max_bucket, "simhash")
    left = bands.select("band_id", "band_val", F.col("id").alias("a"), F.col("sig").alias("sig_a"))
    right = bands.select("band_id", "band_val", F.col("id").alias("b"), F.col("sig").alias("sig_b"))
    cand = (
        left.join(right, ["band_id", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.filter(hamming <= max_hamming).select("a", "b", hamming.alias("hamming"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact word-n-gram Jaccard over LSH-pruned candidates.

    |A ∩ B| via exploded distinct n-grams join-count; |A ∪ B| = |A|+|B|-∩.
    Only candidate pairs from MinHash banding are verified — the exact
    computation never goes quadratic.
    """
    # bind the split ONCE: a free subtree captured inside a HOF lambda is
    # re-evaluated per sequence element (O(words^2) splits per doc)
    def _doc_grams(w):
        return F.transform(
            F.filter(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size(w) - n, F.lit(0))
                    ),
                    lambda i: F.slice(w, i + 1, n),
                ),
                lambda arr: F.size(arr) >= n,
            ),
            lambda arr: F.array_join(arr, " "),
        )

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                F.array(F.split(F.lower(F.col(text_col)), r"\s+")), _doc_grams
            )[0]
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    cand = minhash_candidate_pairs(df, id_col, text_col)
    ga = grams.select(F.col("id").alias("a"), "gram")
    gb = grams.select(F.col("id").alias("b"), "gram")
    inter = (
        cand.join(ga, "a").join(gb, ["b", "gram"]).groupBy("a", "b").agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n_grams").alias("nb"))
    jac = (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")
