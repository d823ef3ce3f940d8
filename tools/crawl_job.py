"""Production-shaped crawl entry point for ``spark-submit --py-files``.

Usage (north-rule deployment shape):

    zip -r /tmp/heritrix3_spark.zip heritrix3_spark
    spark-submit --master <cluster> \
        --py-files /tmp/heritrix3_spark.zip \
        tools/crawl_job.py \
        --seeds seeds.txt --web web.parquet --state /path/state \
        --rounds 50 --k 4 --robots obey

The job reads a documents(doc_id, spans) parquet as the fetch universe
(swap the fetch stage for a real HTTP pool in production), runs the
macro-batch engine with per-round checkpoints, and prints a one-line JSON
summary. Resume a killed crawl by re-running with --resume.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", required=True, help="seed list file (one URI/line)")
    p.add_argument("--web", required=True, help="documents(doc_id, spans) parquet path")
    p.add_argument("--state", required=True, help="crawl state directory")
    p.add_argument("--rounds", type=int, default=100)
    p.add_argument("--k", type=int, default=1, help="URIs per host per round")
    p.add_argument("--robots", choices=["ignore", "obey"], default="ignore")
    p.add_argument("--dns", choices=["ignore", "obey"], default="ignore")
    p.add_argument("--total-budget", type=int, default=-1)
    p.add_argument("--max-fetches", type=int, default=-1)
    p.add_argument("--num-buckets", type=int, default=64)
    # CrawlLimitEnforcer family (0 = off)
    p.add_argument("--max-bytes-download", type=int, default=0)
    p.add_argument("--max-novel-bytes", type=int, default=0)
    p.add_argument("--max-novel-urls", type=int, default=0)
    p.add_argument("--max-time-seconds", type=int, default=0)
    # RuntimeLimitEnforcer (-1 = off)
    p.add_argument("--runtime-limit-s", type=int, default=-1)
    p.add_argument(
        "--runtime-limit-op", choices=["pause", "terminate", "block"],
        default="pause",
    )
    # cookie model; --cookies-txt seeds the store (Netscape format file)
    p.add_argument("--cookies", choices=["ignore", "obey"], default="ignore")
    p.add_argument("--cookies-txt", default="")
    # CrawlMapper: "hash:COUNT:LOCALNAME" or "lexical:MAPFILE:LOCALNAME"
    # (MAPFILE lines: "<key> <crawler>", the LexicalCrawlMapper file format)
    p.add_argument("--crawl-mapper", default="")
    p.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    mapper_kw: dict = {}
    if args.crawl_mapper:
        kind, spec, local = args.crawl_mapper.split(":", 2)
        if kind == "hash":
            mapper_kw = dict(
                crawl_mapper="hash",
                mapper_crawler_count=int(spec),
                mapper_local_name=local,
            )
        else:
            with open(spec) as f:
                entries = tuple(
                    tuple(line.split(None, 1))
                    for line in f.read().splitlines()
                    if line.strip() and not line.startswith("#")
                )
            mapper_kw = dict(
                crawl_mapper="lexical",
                mapper_map=entries,
                mapper_local_name=local,
            )
    cookies_txt = ""
    if args.cookies_txt:
        with open(args.cookies_txt) as f:
            cookies_txt = f.read()

    # SparkSession comes from spark-submit's conf; fall back to local
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("heritrix3-spark-crawl").getOrCreate()

    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(
        k_per_host=args.k,
        robots=args.robots,
        dns=args.dns,
        total_budget=args.total_budget,
        max_fetches=args.max_fetches,
        num_buckets=args.num_buckets,
        max_bytes_download=args.max_bytes_download,
        max_novel_bytes=args.max_novel_bytes,
        max_novel_urls=args.max_novel_urls,
        max_time_seconds=args.max_time_seconds,
        runtime_limit_s=args.runtime_limit_s,
        runtime_limit_op=args.runtime_limit_op,
        cookies=args.cookies,
        cookies_txt=cookies_txt,
        seen_filter=args.seen_filter,
        **mapper_kw,
    )
    web = spark.read.parquet(args.web)
    t0 = time.time()
    if args.resume:
        eng = CrawlEngine.resume(spark, args.state, web, cfg)
    else:
        eng = CrawlEngine(spark, args.state, web, cfg)
        with open(args.seeds) as f:
            eng.bootstrap(f.read().splitlines())
    eng.run(max_rounds=args.rounds)
    log = eng.crawl_log()
    summary = {
        "rounds": eng.round,
        "fetched": log.count(),
        "scheduled": eng.seen_count(),
        "documents": eng.documents().count() if eng.documents_t.exists() else 0,
        "diversions": (
            eng.diversions().count() if eng.divert_t.exists() else 0
        ),
        "stop_status": eng.stop_status,
        "wall_sec": round(time.time() - t0, 1),
        "state": args.state,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
