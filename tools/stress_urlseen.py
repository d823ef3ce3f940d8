"""URL-seen prefilter stress: bloom vs cuckoo at distributed scale.

Evidence for the cuckoo prefilter's scale claims (BENCH/BASELINE.md §R4):
with a seen set of N fingerprints sharded over the bucket layout, probe a
candidate batch (half seen / half novel) through `filter_novel` and
measure

- wall time of the full dedup (cogrouped probe + exact anti-join),
- the prefilter's *maybe-seen* row count — the rows that could not skip
  the exact anti-join. For the novel half this is pure false-positive
  volume: ~1% of novel for bloom, ~0.01% for cuckoo — the gap that
  matters at 10^10 URLs where the exact side is a 80 GB table.

Usage: python tools/stress_urlseen.py [seen_n] [cand_n]  (default 1e7 2e6)
Prints one JSON line per filter kind.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from heritrix3_spark.operators.urlseen import UrlSeen, bucket_col  # noqa: E402
from heritrix3_spark.session import get_spark  # noqa: E402
from heritrix3_spark.storage import SnapshotCatalog  # noqa: E402

NUM_BUCKETS = 32


def synth_fps(spark, n: int, offset: int = 0):
    """Deterministic pseudo-random 64-bit fps (xxhash of ids)."""
    return spark.range(offset, offset + n).select(
        F.xxhash64(F.col("id").cast("string")).alias("fp")
    )


def run(kind: str, seen_n: int, cand_n: int) -> dict:
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        shuffle_partitions=NUM_BUCKETS,
    )
    us = UrlSeen(
        SnapshotCatalog(tempfile.mkdtemp(prefix=f"h3s_useen_{kind}_")),
        num_buckets=NUM_BUCKETS,
        bloom=True,
        bloom_min_seen=0,
        kind=kind,
    )
    seen = synth_fps(spark, seen_n).withColumn(
        "bucket", bucket_col(F.col("fp"), NUM_BUCKETS)
    )
    t0 = time.time()
    us.add_fps(seen)
    build_s = time.time() - t0

    # candidates: half seen (ids overlap), half novel (disjoint id range)
    cand = synth_fps(spark, cand_n // 2).unionByName(
        synth_fps(spark, cand_n - cand_n // 2, offset=seen_n + cand_n)
    )
    t0 = time.time()
    novel_n = us.filter_novel(cand).count()
    probe_s = time.time() - t0

    # prefilter precision: maybe-seen rows among the NOVEL half = pure
    # false positives that still had to pay the exact anti-join
    split_fn = us._cuckoo_split if kind == "cuckoo" else us._bloom_split
    novel_half = synth_fps(spark, cand_n - cand_n // 2, offset=seen_n + cand_n)
    probe_df = novel_half.withColumn(
        "__bucket", bucket_col(F.col("fp"), NUM_BUCKETS)
    )
    fp_rows = (
        split_fn(spark, probe_df, "fp").filter(F.col("__maybe_seen")).count()
    )
    filter_bytes = 0
    table = us.cuckoo_table if kind == "cuckoo" else us.bloom_table
    for root, _, files in os.walk(table.dir):
        filter_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    spark.stop()
    return {
        "kind": kind,
        "seen_n": seen_n,
        "cand_n": cand_n,
        "build_sec": round(build_s, 2),
        "filter_novel_sec": round(probe_s, 2),
        "novel_rows": novel_n,
        "false_positive_rows": fp_rows,
        "fp_rate": round(fp_rows / (cand_n - cand_n // 2), 6),
        "filter_bytes": filter_bytes,
        "bits_per_key": round(filter_bytes * 8 / seen_n, 2),
    }


if __name__ == "__main__":
    seen_n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 10_000_000
    cand_n = int(float(sys.argv[2])) if len(sys.argv) > 2 else 2_000_000
    for kind in ("bloom", "cuckoo"):
        print(json.dumps(run(kind, seen_n, cand_n)), flush=True)
