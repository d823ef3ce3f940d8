"""Frontier-growth stress: round cost + bytes-written as the frontier grows.

Evidence for the merge-on-read claim (round-2 verdict #2): a narrow crawl
round must write O(delta) bytes — NOT O(frontier) — so per-round cost stays
flat as the pending frontier grows 10^5 -> 10^7 rows. Reads still scan the
table (any head-pick must), but scans are cheap columnar IO; the old
copy-on-write rewrote the full table every round.

Usage: python tools/stress_frontier.py [sizes...]   (default 1e5 1e6 1e7)
Prints one JSON line per size: {rows, round_sec, frontier_bytes_written}.
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

from heritrix3_spark import fixtures as FX  # noqa: E402
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine  # noqa: E402
from heritrix3_spark.operators.urlseen import fp_udf  # noqa: E402
from heritrix3_spark.session import get_spark  # noqa: E402

HOSTS = 500


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def synth_frontier(spark, n: int):
    """n pending rows across HOSTS queues (skewed ordinals, FRONTIER shape)."""
    ids = spark.range(2, n + 2)
    host = F.pmod("id", HOSTS)
    uri = F.concat(
        F.lit("http://h"), host.cast("string"), F.lit(".example/deep/p"),
        F.col("id").cast("string"),
    )
    return ids.select(
        uri.alias("uri"),
        uri.alias("canonical"),
        fp_udf(uri).alias("fp"),
        F.concat(F.lit("example,h"), host.cast("string"), F.lit(",")).alias("class_key"),
        F.lit(False).alias("is_seed"),
        F.lit("L").alias("hops_path"),
        F.lit(None).cast("string").alias("via"),
        F.lit(None).cast("string").alias("via_context"),
        F.lit(3).alias("sched_directive"),
        F.lit(1).alias("precedence"),
        F.lit(1).alias("cost"),
        F.col("id").alias("ordinal"),
        F.lit(0).alias("fetch_attempts"),
        F.lit(False).alias("force_fetch"),
        F.lit(None).cast("map<string,string>").alias("data"),
    )


def run_one(spark, n: int) -> dict:
    with tempfile.TemporaryDirectory(prefix="h3s_stress_") as td:
        web = FX.synth_web_df(spark, 4, 4)
        eng = CrawlEngine(
            spark,
            td,
            web,
            CrawlConfig(num_buckets=32, ordinal_partitions=8, k_per_host=4, bloom=False),
        )
        eng.bootstrap(FX.seed_lines(4))
        rows = synth_frontier(spark, n)
        eng.frontier_t.insert(rows.repartition(32, "class_key"))
        eng.next_ordinal = n + 10
        eng._recount_pending()
        front_dir = os.path.join(td, "frontier")
        delta_dir = os.path.join(td, "frontier__delta")
        before = dir_bytes(front_dir) + dir_bytes(delta_dir)
        t0 = time.time()
        eng.run_round()
        sec = time.time() - t0
        written = dir_bytes(front_dir) + dir_bytes(delta_dir) - before
        return {
            "rows": n,
            "round_sec": round(sec, 2),
            "frontier_bytes_written": written,
        }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        app_name="h3s-stress",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps(run_one(spark, n)), flush=True)


if __name__ == "__main__":
    main()
