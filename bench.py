"""Benchmark harness (driver contract): ONE JSON line on stdout.

Headline: URLs-scheduled/sec through the full frontier scheduling pipeline
(canonicalize -> fingerprint -> class_key -> scope -> in-batch dedup ->
anti-join vs a pre-seeded url_seen -> deterministic ordinal assignment),
on a skewed synthetic candidate stream (one hot host gets ~10% of URLs —
the north rule's hot-domain case). Plus: a multi-round engine crawl on the
bench web, and the sf-table operator queries.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_SCHED_URLS (default 2_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from heritrix3_spark import fixtures as FX  # noqa: E402
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine  # noqa: E402
from heritrix3_spark.functions.canonicalize import canonical_col  # noqa: E402
from heritrix3_spark.functions.surt import class_key_col  # noqa: E402
from heritrix3_spark.operators import scope as SC  # noqa: E402
from heritrix3_spark.operators.urlseen import UrlSeen, bucket_col, fp_udf  # noqa: E402
from heritrix3_spark.session import get_spark  # noqa: E402
from heritrix3_spark.storage import SnapshotCatalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SCHED = int(os.environ.get("BENCH_SCHED_URLS", "2000000"))
HOSTS = 2000


def synth_candidates(spark, n: int):
    """Skewed candidate stream: ~10% of URLs on one hot host, ~25% dups."""
    ids = spark.range(n).withColumn(
        "host",
        F.when(F.pmod("id", 10) == 0, F.lit(0)).otherwise(F.pmod(F.xxhash64("id"), HOSTS)),
    )
    # 25% of ids collide onto an earlier page (within-batch duplicates)
    page = F.when(F.pmod("id", 4) == 3, (F.col("id") / 7).cast("long")).otherwise(F.col("id"))
    return ids.select(
        F.concat(
            F.lit("http://H"),
            F.col("host").cast("string"),
            F.lit(".example/Path/p"),
            page.cast("string"),
            F.when(F.pmod("id", 5) == 0, F.lit("?x=1&")).otherwise(F.lit("")),
        ).alias("uri"),
        F.lit("L").alias("hops_path"),
        F.col("id").alias("parent_ordinal"),
        F.lit(0).alias("outlink_index"),
    )


def bench_schedule_pipeline(spark, state_dir: str) -> dict:
    """The headline: full schedule path on N_SCHED candidates."""
    catalog = SnapshotCatalog(state_dir)
    urlseen = UrlSeen(catalog, num_buckets=max(CPUS * 2, 32), bloom=False)
    # pre-seed the seen set with half the id space (forces real anti-join work)
    pre = synth_candidates(spark, N_SCHED // 2).select(fp_udf(canonical_col(F.col("uri"))).alias("fp"))
    urlseen.add_fps(pre)

    prefixes = [f"http://(example,h{h}," for h in range(HOSTS)] + ["http://(example,"]
    t0 = time.time()
    cand = synth_candidates(spark, N_SCHED)
    # scope runs on the RAW uri, before preparation — Heritrix order
    # (CandidateChain = [CandidateScoper, FrontierPreparer]) and also the
    # fast plan: the scope predicate references only source attributes, so
    # Catalyst pushes it into the scan instead of duplicating the
    # canonicalization expression tree.
    prepared = (
        cand.filter(SC.default_scope(F.col("uri"), F.col("hops_path"), ["http://(example,"]))
        .withColumn("canonical", canonical_col(F.col("uri")))
        .withColumn("fp", fp_udf(F.col("canonical")))
        .withColumn("class_key", class_key_col(F.col("canonical")))
    )
    w = Window.partitionBy("fp").orderBy("parent_ordinal", "outlink_index")
    first = prepared.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") == 1)
    novel = urlseen.filter_novel(first)
    # ordinal assignment (range-partitioned two-pass) + frontier write
    ranged = novel.repartitionByRange(CPUS, "parent_ordinal", "outlink_index").sortWithinPartitions(
        "parent_ordinal", "outlink_index"
    )
    scheduled = ranged.select(
        "uri", "canonical", "fp", "class_key",
        bucket_col(F.col("fp"), 64).alias("bucket"),
    )
    n_scheduled = scheduled.count()
    elapsed = time.time() - t0
    return {
        "candidates": N_SCHED,
        "scheduled": n_scheduled,
        "sec": round(elapsed, 2),
        "urls_scheduled_per_sec": round(n_scheduled / elapsed, 1),
        "candidates_per_sec": round(N_SCHED / elapsed, 1),
    }


def bench_crawl_rounds(
    spark,
    state_dir: str,
    rounds: int = 3,
    hosts: int = 400,
    pages: int = 40,
    hot_factor: int = 20,
    shuffle: int = 8,
) -> dict:
    """Engine rounds on the bench web (hot host exercises salting/AQE).

    Rounds at sandbox scale are fixed-overhead-bound (each round is a full
    DAG of ~10 jobs); wide rounds (many hosts × k) amortize it — which is
    exactly the 1000-executor regime, where a round covers millions of
    hosts. Two standing shapes: the 400×40 narrow round (fixed-overhead
    regime) and the 2000×16 wide round (amortized regime — the one that
    matters at cluster scale; regressions there were invisible to the
    narrow shape). Shuffle partitions drop for this section (tiny
    per-round volumes), restored after.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    try:
        # persist + materialize the synthetic web ONCE: it stands in for a
        # parquet documents table; without this the driver-side row
        # serialization + repartition shuffle re-executes inside every
        # round's fetch join and the bench measures fixture generation,
        # not the engine
        web = FX.synth_web_df(
            spark, hosts=hosts, pages=pages, hot_host=0, hot_factor=hot_factor,
            num_partitions=CPUS,
        ).persist()
        web.count()
        eng = CrawlEngine(
            spark,
            state_dir,
            web,
            CrawlConfig(num_buckets=16, ordinal_partitions=1, k_per_host=16, bloom=True),
        )
        t0 = time.time()
        eng.bootstrap(FX.seed_lines(hosts))
        done = 0
        for _ in range(rounds):
            if not eng.run_round():
                break
            done += 1
        elapsed = time.time() - t0
        fetched = eng.crawl_log().count()
        scheduled = eng.seen_count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        web.unpersist()
    return {
        "rounds": done,
        "fetched": fetched,
        "scheduled": scheduled,
        "sec": round(elapsed, 2),
        "urls_per_sec": round((fetched + scheduled) / elapsed, 1),
    }


def main() -> None:
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="h3s-bench",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict[str, float] = {}

    with tempfile.TemporaryDirectory(prefix="h3s_bench_") as tmp:
        sched = bench_schedule_pipeline(spark, os.path.join(tmp, "sched"))
        queries["schedule_pipeline"] = sched["sec"]
        crawl = bench_crawl_rounds(spark, os.path.join(tmp, "crawl"))
        queries["crawl_rounds"] = crawl["sec"]
        # the amortized regime: 2000 hosts x 16 pages, k=16 — one round
        # emits ~32k rows across 2000 queues (standing row since r4)
        crawl_wide = bench_crawl_rounds(
            spark, os.path.join(tmp, "crawl_wide"),
            rounds=2, hosts=2000, pages=16, hot_factor=1, shuffle=16,
        )
        queries["crawl_rounds_wide"] = crawl_wide["sec"]

    # operator queries on the sf tables
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    for name in [
        "head_pick_orders",
        "fetch_stats_agg",
        "host_budget_running",
        "top_queues",
        "token_count_docs",
        "exact_dedup_docs",
        "ann_topk",
        "quality_docs",
        "lang_id_docs",
        "minhash_clusters",
        "simhash_pairs",
        "lsh_ann",
    ]:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 2)

    total = round(sum(queries.values()), 2)
    print(
        json.dumps(
            {
                "metric": "bench wall (schedule pipeline + crawl rounds + operator queries)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "cpus": CPUS,
                "schedule_pipeline": sched,
                "crawl_rounds": crawl,
                "crawl_rounds_wide": crawl_wide,
            }
        )
    )


if __name__ == "__main__":
    main()
