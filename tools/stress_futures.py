"""Futures-growth stress: maturation-round cost + bytes as futures grows.

Evidence for the round-3 verdict's #1 scale nit: the futures (recrawl)
table was the last O(table)-per-round copy-on-write path — every maturing
round rewrote ALL pending future rows and re-scanned for min(reschedule).
With the time-bucketed append layout a round touches only the DUE batch
dirs (O(matured) read, metadata-only drop) and takes min-wake from batch
metadata, so round cost and futures IO must stay FLAT as the not-yet-due
backlog grows 10^5 -> 10^7 rows.

Shape: one due batch of 10^4 rows (constant) + a far-future backlog of N
rows split over 10 batches. One engine round matures the due batch; we
report the round wall, the bytes written under the futures table during
the round, and a second no-maturation round (nothing due -> no futures
IO at all beyond the new Fu batch the round itself schedules — recrawl
is configured far in the future so it lands in one new batch).

Usage: python tools/stress_futures.py [sizes...]   (default 1e5 1e6 1e7)
One JSON line per size.
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
FAR = 10**15  # backlog reschedule horizon (never due in this run)


def dir_bytes(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def synth_future_rows(spark, n: int, due_at: int, id0: int):
    ids = spark.range(id0, id0 + n)
    host = F.pmod("id", HOSTS)
    uri = F.concat(
        F.lit("http://h"), host.cast("string"), F.lit(".example/f/p"),
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
        F.lit(due_at).cast("long").alias("reschedule_time"),
    )


def run_one(spark, n: int) -> dict:
    with tempfile.TemporaryDirectory(prefix="h3s_futstress_") as td:
        web = FX.synth_web_df(spark, 4, 4)
        eng = CrawlEngine(
            spark,
            td,
            web,
            CrawlConfig(
                num_buckets=32, ordinal_partitions=8, k_per_host=4,
                bloom=False, recrawl_interval_ms=FAR, metrics=False,
            ),
        )
        eng.bootstrap(FX.seed_lines(4))
        eng.next_ordinal = 10 * n + 10**6  # keep injected ordinals unique
        # backlog: N far-future rows over 10 batches (never due)
        per = max(n // 10, 1)
        for b in range(10):
            eng.futures_t.schedule(
                synth_future_rows(spark, per, FAR + b, id0=2 + b * per)
                .repartition(8),
                bucket=FAR + b,
            )
        # the due batch: constant 10^4 rows maturing at the next round clock
        due_n = 10_000
        eng.futures_t.schedule(
            synth_future_rows(spark, due_n, eng.clock, id0=2 + 12 * per)
            .repartition(8),
            bucket=eng.clock,
        )
        fdir = os.path.join(td, "futures")
        b0 = dir_bytes(fdir)
        t0 = time.time()
        eng.run_round()  # matures the due batch
        mature_sec = time.time() - t0
        b1 = dir_bytes(fdir)
        t1 = time.time()
        eng.run_round()  # nothing due
        idle_sec = time.time() - t1
        b2 = dir_bytes(fdir)
    return {
        "backlog_rows": 10 * per,
        "due_rows": due_n,
        "mature_round_sec": round(mature_sec, 2),
        "idle_round_sec": round(idle_sec, 2),
        "futures_bytes_mature_round": b1 - b0,
        "futures_bytes_idle_round": b2 - b1,
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [100_000, 1_000_000, 10_000_000]
    spark = get_spark(
        master="local[16]", app_name="h3s-futstress", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        print(json.dumps({"rows": n, **run_one(spark, n)}), flush=True)


if __name__ == "__main__":
    main()
