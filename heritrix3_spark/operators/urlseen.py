"""URL-seen (already-included) set — partitioned bloom + exact anti-join.

Re-expresses Heritrix's UriUniqFilter family
(/root/reference/engine/src/main/java/org/archive/crawler/util/
 BdbUriUniqFilter.java, BloomUriUniqFilter.java:81-98,
 FPMergeUriUniqFilter.java:86-151,252-325;
 interface: engine/.../datamodel/UriUniqFilter.java:42-127 —
 add / addNow / addForce / note / forget / setCount) as set algebra over a
bucketed fingerprint table:

* the key is the reference's exact host-clustered 64-bit Rabin fingerprint
  (:mod:`heritrix3_spark.fp`), so the final seen-set matches the reference
  bit-for-bit (BASELINE "URL-seen exact-match");
* the table is bucketed by the key's high 24 bits (the scheme+authority
  cluster) — the Spark analog of the reference's adjacent-B-tree-page
  locality (BdbUriUniqFilter.java:58-64): candidate probes co-partition
  with their host's bucket, so the anti-join shuffles each host's
  candidates to one partition;
* dedup itself is a sort-merge **left-anti join** — semantically identical
  to FPMergeUriUniqFilter's batch merge of a sorted pending set against a
  sorted store (its flush() IS a merge anti-join);
* an optional **partitioned bloom pre-filter** (north rule: replaces
  BdbUriUniqFilter's in-memory cache / BloomUriUniqFilter): one bloom
  shard per bucket, stored as a (bucket, nbits, bits) DataFrame. The
  probe is a **cogroup by bucket** (candidates grouped ⋈ shards grouped):
  shards stay distributed — there is NO driver broadcast and no per-row
  bitmap duplication; each task sees one bucket's candidates plus that
  bucket's shard bytes exactly once. The scheme survives 10^10
  fingerprints: an executor only ever holds the shards of the buckets it
  processes. Shards are **sized from their key count** at build time
  (~10 bits/key, power-of-two), so the filter keeps its ~1% false-positive
  rate as the seen set grows instead of saturating at a fixed size.
  Candidates whose probe says "definitely new" skip the exact anti-join.
* alternatively a **partitioned cuckoo filter** (``kind="cuckoo"``;
  operators/cuckoo.py, Fan et al. 2014) with the identical cogrouped
  probe shape: ~0.01% false-positive rate at ~19 bits/key, and true
  deletion — `forget` removes the fp's tag from the filter, so forgotten
  URLs become definitely-new again instead of permanent maybe-seen hits.

Scale notes (10^10 URLs ≈ 80 GB of fingerprints): bucket count should be
O(10^3-10^4) so each bucket's parquet file group stays ~10-100 MB; the
anti-join is then a bucket-pruned sort-merge join with no broadcast side.
AQE handles residual skew (one mega-host) by splitting its bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from heritrix3_spark.fp import create_key_batch
from heritrix3_spark.operators import cuckoo as CK
from heritrix3_spark.storage import SnapshotCatalog

SEEN_SCHEMA = StructType(
    [StructField("fp", LongType(), False), StructField("bucket", IntegerType(), False)]
)
#: forget tombstones: exact fp rows (UriUniqFilter.forget) or 24-bit
#: authority-prefix range rows (forgetAllSchemeAuthorityMatching) — both
#: O(delta) appends subtracted at read, folded away at compaction
FORGOT_SCHEMA = StructType(
    [StructField("fp", LongType(), True), StructField("prefix24", LongType(), True)]
)


@pandas_udf(LongType())
def fp_udf(urls: pd.Series) -> pd.Series:
    """Vectorized URL-seen key (Arrow batch -> numpy -> Arrow)."""
    vals = create_key_batch(urls.fillna("").tolist())
    return pd.Series(vals)


def bucket_col(fp: Column, num_buckets: int) -> Column:
    """Bucket id from the key's authority-cluster prefix (high 24 bits)."""
    return F.pmod(F.shiftrightunsigned(fp, 40), F.lit(num_buckets)).cast("int")


# ---------------------------------------------------------------------------
# partitioned bloom filter
# ---------------------------------------------------------------------------
_BLOOM_BITS_PER_KEY = 10  # ~1% fp rate with 7 hashes
_BLOOM_HASHES = 7


def _bloom_positions(fps: np.ndarray, nbits: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing.

    The fp is already a 64-bit Rabin fingerprint, so h1/h2 derive from its
    halves — no extra string hashing needed.
    """
    u = fps.astype(np.uint64)
    h1 = u % np.uint64(nbits)
    h2 = ((u >> np.uint64(17)) | np.uint64(1)) % np.uint64(nbits)
    ks = np.arange(_BLOOM_HASHES, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(nbits)


def _bloom_build(fps: np.ndarray, nbits: int) -> np.ndarray:
    bits = np.zeros((nbits + 7) // 8, dtype=np.uint8)
    pos = _bloom_positions(fps, nbits).ravel()
    np.bitwise_or.at(bits, (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8))
    return bits


def _bloom_maybe_contains(fps: np.ndarray, bits: np.ndarray, nbits: int) -> np.ndarray:
    if len(fps) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(fps, nbits)
    byte = bits[(pos >> 3).astype(np.int64)]
    hit = (byte & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=1)


class UrlSeen:
    """The url_seen state table + batch dedup operators."""

    def __init__(
        self,
        catalog: SnapshotCatalog,
        num_buckets: int = 64,
        bloom: bool = True,
        bloom_bits_per_bucket: int = 1 << 14,
        bloom_min_seen: int = 200_000,
        kind: str = "bloom",
    ):
        if kind not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown prefilter kind {kind!r}")
        self.catalog = catalog
        self.table = catalog.table("url_seen")
        self.bloom_table = catalog.table("url_seen_bloom")
        # cuckoo prefilter shards (north rule's "bloom/cuckoo" alternative;
        # Fan et al. 2014 via operators/cuckoo.py): same cogrouped-probe
        # plumbing as bloom, ~0.01% fp rate at ~19 bits/key, and REAL
        # deletion — a forgotten fp is removed from the filter instead of
        # remaining a permanent maybe-seen hit
        self.cuckoo_table = catalog.table("url_seen_cuckoo")
        self.kind = kind
        # forget tombstones (merge-on-read): admin forgets append here
        # instead of rewriting the seen table; reads subtract, compaction
        # folds. Bloom shards are NOT rebuilt on forget — a forgotten fp
        # still hitting the bloom is just a false positive, resolved by
        # the exact anti-join against the subtracted set.
        self.forgot_t = catalog.table("url_seen_forgot")
        self.num_buckets = num_buckets
        self.bloom = bloom
        # MINIMUM shard size; shards self-size upward from their key count
        # (~_BLOOM_BITS_PER_KEY bits/key) so the fp rate holds as seen grows
        self.bloom_min_nbits = bloom_bits_per_bucket
        # the bloom probe only pays for itself once the exact anti-join side
        # is big; below this approximate seen-set size we skip the probe
        # stage entirely (shards are still maintained, so the prefilter is
        # warm the moment the threshold is crossed)
        self.bloom_min_seen = bloom_min_seen
        self.approx_seen = 0

    # -- reads ------------------------------------------------------------
    def seen(self, spark: SparkSession) -> DataFrame:
        """The live seen set: base minus forget tombstones (merge-on-read).
        The tombstone side is O(forgets since compaction) — broadcast
        anti-joins under AQE; crawls that never forget skip both joins."""
        if not self.table.exists():
            return spark.createDataFrame([], SEEN_SCHEMA)
        base = self.table.read(spark)
        if self.forgot_t.exists():
            fg = self.forgot_t.read(spark)
            fp_tombs = fg.filter(F.col("fp").isNotNull()).select(
                F.col("fp").alias("__fg_fp")
            )
            base = base.join(
                fp_tombs, base["fp"] == F.col("__fg_fp"), "left_anti"
            )
            pr_tombs = (
                fg.filter(F.col("prefix24").isNotNull())
                .select(F.col("prefix24").alias("__fg_pr"))
                .distinct()
            )
            base = base.join(
                F.broadcast(pr_tombs),
                F.shiftrightunsigned(F.col("fp"), 40) == F.col("__fg_pr"),
                "left_anti",
            )
        return base

    def count(self, spark: SparkSession) -> int:
        return self.seen(spark).count()

    # -- dedup (the hot path) ----------------------------------------------
    def filter_novel(self, candidates: DataFrame, fp_field: str = "fp") -> DataFrame:
        """Rows of ``candidates`` whose fp is not in the seen set.

        Equivalent to FPMergeUriUniqFilter.flush()'s sorted-merge: Spark
        plans this as a bucket-co-partitioned sort-merge anti-join (or a
        broadcast anti-join when the seen set is still small — AQE picks).
        In-batch duplicates are NOT collapsed here (the frontier dedups
        within a batch by discovery order so the *first* discovery wins,
        matching the reference's serial add() order).
        """
        spark = candidates.sparkSession
        if not self.table.exists():
            return candidates
        shard_t = self.cuckoo_table if self.kind == "cuckoo" else self.bloom_table
        use_prefilter = (
            self.bloom
            and shard_t.exists()
            and self.approx_seen >= self.bloom_min_seen
        )
        if use_prefilter:
            cand = candidates.withColumn(
                "__bucket", bucket_col(F.col(fp_field), self.num_buckets)
            )
            split = self._cuckoo_split if self.kind == "cuckoo" else self._bloom_split
            cand = split(spark, cand, fp_field)
            # rows flagged maybe-seen need the exact check; definite-new pass
            maybe = cand.filter(F.col("__maybe_seen")).drop("__maybe_seen", "__bucket")
            fresh = cand.filter(~F.col("__maybe_seen")).drop("__maybe_seen", "__bucket")
            checked = self._anti_join(maybe, fp_field)
            return fresh.unionByName(checked)
        return self._anti_join(candidates, fp_field)

    def _anti_join(self, cand: DataFrame, fp_field: str) -> DataFrame:
        # join on fp alone (bucket is fp-derived, so equality on fp implies
        # bucket equality) — candidates arriving hash-partitioned by fp from
        # the in-batch dedup window reuse that exchange
        seen = self.seen(cand.sparkSession).select(F.col("fp").alias("__seen_fp"))
        return cand.join(seen, on=cand[fp_field] == F.col("__seen_fp"), how="left_anti")

    def _bloom_split(self, spark: SparkSession, cand: DataFrame, fp_field: str) -> DataFrame:
        """Attach ``__maybe_seen`` by cogrouping candidates with their
        bucket's bloom shards.

        Co-partitioned, never broadcast: both sides shuffle by bucket, one
        task handles one bucket's candidates + its shard bytes exactly once
        (a join would replicate the bitmap onto every candidate row; a
        broadcast would ship every bucket's bitmap to every executor —
        both scale-killers at 10^3+ buckets x MB shards). Shards are
        append-mode with per-shard nbits: a fp is maybe-seen if ANY shard
        reports it (each shard covers the keys inserted when it was built).
        """
        blooms = self.bloom_table.read(spark).select("bucket", "nbits", "bits")
        out_schema = StructType(
            list(cand.schema.fields) + [StructField("__maybe_seen", BooleanType(), False)]
        )

        def probe(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            out = cand_pdf
            maybe = np.zeros(len(cand_pdf), dtype=bool)
            if len(shard_pdf):
                fps = cand_pdf[fp_field].to_numpy(dtype=np.int64)
                for raw, nb in zip(shard_pdf["bits"], shard_pdf["nbits"]):
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    maybe |= _bloom_maybe_contains(fps, arr, int(nb))
            out["__maybe_seen"] = maybe
            return out

        return (
            cand.groupBy("__bucket")
            .cogroup(blooms.groupBy("bucket"))
            .applyInPandas(probe, schema=out_schema)
        )

    def _cuckoo_split(
        self, spark: SparkSession, cand: DataFrame, fp_field: str
    ) -> DataFrame:
        """Attach ``__maybe_seen`` via the bucket's cuckoo shards — the same
        cogrouped never-broadcast shape as `_bloom_split`, but probing
        16-bit tag tables (operators/cuckoo.py): a fp is maybe-seen if ANY
        shard holds its tag in either candidate bucket."""
        shards = self.cuckoo_table.read(spark).select("bucket", "m", "table")
        out_schema = StructType(
            list(cand.schema.fields) + [StructField("__maybe_seen", BooleanType(), False)]
        )

        def probe(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
            out = cand_pdf
            maybe = np.zeros(len(cand_pdf), dtype=bool)
            if len(shard_pdf):
                fps = cand_pdf[fp_field].to_numpy(dtype=np.int64)
                for raw, m in zip(shard_pdf["table"], shard_pdf["m"]):
                    arr = np.frombuffer(raw, dtype=np.uint16).reshape(-1, CK.SLOTS)
                    maybe |= CK.contains(fps, arr, int(m))
            out["__maybe_seen"] = maybe
            return out

        return (
            cand.groupBy("__bucket")
            .cogroup(shards.groupBy("bucket"))
            .applyInPandas(probe, schema=out_schema)
        )

    # -- writes -------------------------------------------------------------
    def add_fps(
        self,
        fps: DataFrame,
        fp_field: str = "fp",
        assume_novel: bool = False,
        n_hint: int | None = None,
    ) -> int | None:
        """Insert fingerprints (idempotent). Returns new-row count (or None
        on the assume_novel fast path, which skips the counting job).

        Covers add/addNow/addForce/note — they differ only in scheduling
        behavior, which the frontier handles; the seen-set mutation is the
        same "insert if absent" (SetBasedUriUniqFilter.java:89-120).

        ``assume_novel=True`` is the crawl-loop fast path: the caller just
        anti-joined these fps (filter_novel), so we fast-append the delta
        (O(new) per round) and append matching bloom shards; periodic
        compaction re-buckets the table.
        """
        spark = fps.sparkSession
        new = fps.select(
            F.col(fp_field).alias("fp"),
            bucket_col(F.col(fp_field), self.num_buckets).alias("bucket"),
        )
        if not assume_novel:
            new = new.dropDuplicates(["fp"])
        # else: the caller's contract already guarantees uniqueness — the
        # crawl loop feeds the first-discovery-ranked (one row per fp),
        # anti-joined novel set, so the dedup shuffle would be pure cost
        pinned = None
        if self.forgot_t.exists():
            # a re-added fp cancels its forget tombstone (rare admin state;
            # crawls that never forget skip this entirely)
            new = pinned = new.persist()
            # reinsert canceled fps into the cuckoo filter ONLY on the
            # path that won't append them anyway (assume_novel appends the
            # whole batch to the filter below — a second copy would break
            # the one-copy-per-live-fp deletion invariant)
            self._unforget(new, spark, reinsert_filter=not assume_novel)
        if assume_novel and self.table.exists():
            new = new.persist()
            # NB: re-adding a previously-forgotten fp can leave a transient
            # duplicate base row (old physical row + this append) — dedup'd
            # at the next compaction; anti-join semantics are unaffected
            self.table.append(new)
            if self.bloom:
                self._append_filter(new)
            new.unpersist()
            self._maybe_compact(spark)
            if n_hint is not None:
                self.approx_seen += n_hint
            return None
        if self.table.exists():
            # anti-join against the LIVE set (base minus tombstones) so a
            # forgotten fp really re-enters
            old = self.seen(spark)
            new = new.join(old, "fp", "left_anti")
            merged = old.unionByName(new)
        else:
            merged = new
        n_new = new.count()
        self.approx_seen += n_new
        if n_new > 0 or not self.table.exists():
            merged = merged.repartition(self.num_buckets, "bucket").sortWithinPartitions("fp")
            self.table.overwrite(merged)
            if self.forgot_t.exists():
                # the overwrite materialized the subtraction — fold tombstones
                self.forgot_t.overwrite(spark.createDataFrame([], FORGOT_SCHEMA))
            if self.bloom:
                self._rebuild_filter(spark)
        if pinned is not None:
            pinned.unpersist()
        return n_new

    def _unforget(
        self, new: DataFrame, spark: SparkSession, reinsert_filter: bool = False
    ) -> None:
        """Cancel tombstones covered by re-added fps: exact tombstones drop;
        a prefix-range tombstone whose range a re-add touches is EXPANDED
        into exact tombstones for the still-forgotten fps under it (one
        O(base)-scan job, only on this rare collision). O(forgot) rewrite.

        ``reinsert_filter``: a canceled tombstone resurrects its fp in the
        base table, but the cuckoo paths REALLY removed its tag from the
        filter at forget time — re-insert exactly those fps' tags so the
        prefilter can't report a live fp as definitely-new (bloom shards
        never delete, so they need nothing here)."""
        fg = self.forgot_t.read(spark)
        new_fps = new.select("fp")
        pr_hits = [
            r.prefix24
            for r in fg.filter(F.col("prefix24").isNotNull())
            .join(
                F.broadcast(
                    new_fps.select(
                        F.shiftrightunsigned("fp", 40).alias("__np")
                    ).distinct()
                ),
                F.col("prefix24") == F.col("__np"),
                "left_semi",
            )
            .collect()
        ]
        exact_all = fg.filter(F.col("fp").isNotNull())
        exact = exact_all.join(
            new_fps.select(F.col("fp").alias("__n")),
            F.col("fp") == F.col("__n"),
            "left_anti",
        )
        if not pr_hits and exact_all.join(
            new_fps.select(F.col("fp").alias("__n")),
            F.col("fp") == F.col("__n"),
            "left_semi",
        ).isEmpty():
            return  # no tombstone touched — skip the rewrite
        ranges = fg.filter(F.col("prefix24").isNotNull())
        if pr_hits:
            base = self.table.read(spark)
            still = (
                base.filter(
                    F.shiftrightunsigned("fp", 40).isin([int(p) for p in pr_hits])
                )
                .select("fp")
                .distinct()
                .join(new_fps, "fp", "left_anti")
                .select("fp", F.lit(None).cast("long").alias("prefix24"))
            )
            ranges = ranges.filter(~F.col("prefix24").isin([int(p) for p in pr_hits]))
            exact = exact.unionByName(still)
        if (
            reinsert_filter
            and self.kind == "cuckoo"
            and self.cuckoo_table.exists()
        ):
            # fps whose tombstone this call cancels: exact-tombstoned
            # re-adds plus re-adds under a hit prefix range (both had their
            # tag deleted / rebuilt out of the filter at forget time)
            canceled = new_fps.join(
                exact_all.select(F.col("fp").alias("__t")),
                F.col("fp") == F.col("__t"),
                "left_semi",
            )
            if pr_hits:
                canceled = canceled.unionByName(
                    new_fps.filter(
                        F.shiftrightunsigned("fp", 40).isin(
                            [int(p) for p in pr_hits]
                        )
                    )
                ).dropDuplicates(["fp"])
            keyed = canceled.select(
                "fp", bucket_col(F.col("fp"), self.num_buckets).alias("bucket")
            )
            # append BEFORE the forgot rewrite below: `canceled` reads the
            # pre-rewrite tombstone snapshot lazily
            self.cuckoo_table.append(self._cuckoo_shards_for(keyed))
        self.forgot_t.overwrite(exact.unionByName(ranges))

    #: compact after this many delta appends (keeps file counts bounded)
    COMPACT_EVERY = 32

    def _maybe_compact(self, spark: SparkSession) -> None:
        if len(self.table._parents(self.table.latest_version())) >= self.COMPACT_EVERY:
            # fold appends AND forget tombstones into a fresh base snapshot
            merged = (
                self.seen(spark)
                .repartition(self.num_buckets, "bucket")
                .sortWithinPartitions("fp")
            )
            self.table.overwrite(merged)
            if self.forgot_t.exists():
                self.forgot_t.overwrite(spark.createDataFrame([], FORGOT_SCHEMA))
            if self.bloom:
                self._rebuild_filter(spark)

    def forget_fps(self, fps: DataFrame, fp_field: str = "fp") -> None:
        """forget: remove so the URI can be rediscovered (UriUniqFilter
        .forget). O(forgotten) tombstone append — never a base-table
        rewrite. Bloom shards are left alone (false positives are checked
        exactly); cuckoo shards support REAL deletion, so the forgotten
        fp's tag is removed and the fp becomes definitely-new at the
        prefilter instead of a permanent maybe-seen hit."""
        if not self.table.exists():
            return
        dels = fps.select(F.col(fp_field).cast("long").alias("fp")).dropDuplicates(
            ["fp"]
        )
        if self.kind == "cuckoo" and self.cuckoo_table.exists():
            # the cuckoo deletion contract: only delete inserted keys, once.
            # Semi-join against the LIVE seen set (before the tombstone
            # lands) and materialize — the lazy plan would otherwise read
            # the post-append tombstone and delete nothing.
            eligible = dels.join(
                self.seen(dels.sparkSession).select("fp"), "fp", "left_semi"
            ).persist()
            if eligible.count() == 0:
                eligible.unpersist()
                return
            self.forgot_t.append(
                eligible.select(
                    "fp", F.lit(None).cast("long").alias("prefix24")
                )
            )
            self._cuckoo_delete(eligible)
            eligible.unpersist()
            return
        self.forgot_t.append(
            dels.select("fp", F.lit(None).cast("long").alias("prefix24"))
        )

    def forget_authority(self, spark: SparkSession, scheme_authority_prefix24: int) -> None:
        """Range-delete every fp sharing a 24-bit authority prefix
        (BdbUriUniqFilter.forgetAllSchemeAuthorityMatching, :419-449):
        one range-tombstone row, subtracted at read. With a cuckoo
        prefilter the one affected bucket's shards (all fps of a prefix
        share a bucket) are rebuilt from the live set, so the whole
        authority drops out of the filter too."""
        if not self.table.exists():
            return
        self.forgot_t.append(
            spark.createDataFrame(
                [(None, int(scheme_authority_prefix24))], FORGOT_SCHEMA
            )
        )
        if self.kind == "cuckoo" and self.cuckoo_table.exists():
            self._cuckoo_rebuild_buckets(
                spark, [int(scheme_authority_prefix24) % self.num_buckets]
            )

    _BLOOM_SCHEMA = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("nbits", IntegerType()),
            StructField("bits", BinaryType()),
        ]
    )

    def _shards_for(self, fps_df: DataFrame) -> DataFrame:
        """Per-bucket shards sized from their own key count (~10 bits/key,
        power-of-two, floored at bloom_min_nbits) so the false-positive
        rate stays ~1% regardless of how large the seen set grows."""
        min_nbits = self.bloom_min_nbits

        def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
            nbits = max(min_nbits, 1 << int(len(pdf) * _BLOOM_BITS_PER_KEY).bit_length())
            bits = _bloom_build(pdf["fp"].to_numpy(dtype=np.int64), nbits)
            return pd.DataFrame({"bucket": [key[0]], "nbits": [nbits], "bits": [bits.tobytes()]})

        return fps_df.groupBy("bucket").applyInPandas(build, schema=self._BLOOM_SCHEMA)

    def _rebuild_bloom(self, spark: SparkSession) -> None:
        """Full rebuild of per-bucket bloom shards from the seen table."""
        self.bloom_table.overwrite(self._shards_for(self.table.read(spark)))

    def _append_bloom(self, new_fps: DataFrame) -> None:
        """Incremental: append shards covering only the new fps; the probe
        ORs a bucket's shards together (compaction merges them)."""
        self.bloom_table.append(self._shards_for(new_fps))

    def _append_filter(self, new_fps: DataFrame) -> None:
        if self.kind == "cuckoo":
            self.cuckoo_table.append(self._cuckoo_shards_for(new_fps))
        else:
            self._append_bloom(new_fps)

    def _rebuild_filter(self, spark: SparkSession) -> None:
        if self.kind == "cuckoo":
            self.cuckoo_table.overwrite(
                self._cuckoo_shards_for(self.table.read(spark))
            )
        else:
            self._rebuild_bloom(spark)

    # -- cuckoo shards ------------------------------------------------------
    _CUCKOO_SCHEMA = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("m", IntegerType()),
            StructField("table", BinaryType()),
        ]
    )

    def _cuckoo_shards_for(self, fps_df: DataFrame) -> DataFrame:
        """Per-bucket cuckoo shard sized for its own key count at the
        target load factor (operators/cuckoo.py; deterministic build)."""

        def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
            table, m = CK.build(pdf["fp"].to_numpy(dtype=np.int64))
            return pd.DataFrame(
                {"bucket": [key[0]], "m": [m], "table": [table.tobytes()]}
            )

        return fps_df.groupBy("bucket").applyInPandas(
            build, schema=self._CUCKOO_SCHEMA
        )

    def _cuckoo_delete(self, dels: DataFrame) -> None:
        """Remove one tag copy per forgotten fp from its bucket's shards.

        Cogrouped by bucket like the probe; only affected buckets' shards
        are recomputed, then the table is rewritten as untouched ∪
        modified (O(filter bytes) ≈ 2.4 bytes/key — ~100x smaller than the
        seen table itself; forgets are rare admin actions)."""
        spark = dels.sparkSession
        shards = self.cuckoo_table.read(spark)
        keyed = dels.select(
            "fp", bucket_col(F.col("fp"), self.num_buckets).alias("bucket")
        )
        affected = keyed.select("bucket").distinct()

        def apply_deletes(key, dpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
            if not len(spdf):
                return pd.DataFrame(
                    {"bucket": [], "m": [], "table": []}
                ).astype({"bucket": "int32", "m": "int32"})
            arrs = [
                np.frombuffer(b, dtype=np.uint16).reshape(-1, CK.SLOTS).copy()
                for b in spdf["table"]
            ]
            ms = [int(m) for m in spdf["m"]]
            for fp_val in dpdf["fp"].to_numpy(dtype=np.int64):
                one = np.asarray([fp_val], dtype=np.int64)
                for arr, m in zip(arrs, ms):
                    if CK.delete(one, arr, m)[0]:
                        break  # exactly one stored copy per live fp
            return pd.DataFrame(
                {
                    "bucket": spdf["bucket"].to_numpy(),
                    "m": ms,
                    "table": [a.tobytes() for a in arrs],
                }
            )

        modified = (
            keyed.groupBy("bucket")
            .cogroup(
                shards.join(F.broadcast(affected), "bucket", "left_semi")
                .groupBy("bucket")
            )
            .applyInPandas(apply_deletes, schema=self._CUCKOO_SCHEMA)
        )
        untouched = shards.join(F.broadcast(affected), "bucket", "left_anti")
        self.cuckoo_table.overwrite(untouched.unionByName(modified))

    def _cuckoo_rebuild_buckets(self, spark: SparkSession, buckets: list[int]) -> None:
        """Rebuild the given buckets' shards from the live seen set (used
        after a prefix-range forget, where per-tag deletion has no key
        list without scanning the base anyway)."""
        shards = self.cuckoo_table.read(spark)
        live = self.seen(spark).filter(F.col("bucket").isin(buckets))
        rebuilt = self._cuckoo_shards_for(live)
        untouched = shards.filter(~F.col("bucket").isin(buckets))
        self.cuckoo_table.overwrite(untouched.unionByName(rebuilt))
