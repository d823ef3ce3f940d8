"""Extra benchmarks for optimization work (guide §1.4): noop-sink isolation
of individual queries, and phase-timed crawl rounds. NOT part of the driver
contract — bench.py stays frozen.

Usage:
  python bench_extra.py crawl [narrow|wide]     # H3S_TIMING honored
  python bench_extra.py query <name> [reps]     # noop-sink timed query
  python bench_extra.py sched                   # schedule pipeline only
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from heritrix3_spark.session import get_spark

    return get_spark(
        master=f"local[{CPUS}]",
        app_name="h3s-bench-extra",
        shuffle_partitions=max(CPUS, 16),
    )


def run_crawl(shape: str) -> None:
    import bench as B

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="h3s_bx_") as tmp:
        if shape == "wide":
            out = B.bench_crawl_rounds(
                spark, os.path.join(tmp, "c"),
                rounds=2, hosts=2000, pages=16, hot_factor=1, shuffle=16,
            )
        else:
            out = B.bench_crawl_rounds(spark, os.path.join(tmp, "c"))
    print(out)


def run_query(name: str, reps: int = 3) -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"bench_extra {name} rep{i}")
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        print(f"{name} rep{i}: {time.time() - t0:.2f}s", flush=True)


def run_sched() -> None:
    import bench as B

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="h3s_bx_") as tmp:
        print(B.bench_schedule_pipeline(spark, os.path.join(tmp, "s")))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "crawl"
    if cmd == "crawl":
        run_crawl(sys.argv[2] if len(sys.argv) > 2 else "narrow")
    elif cmd == "query":
        run_query(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "sched":
        run_sched()
    else:
        raise SystemExit(f"unknown cmd {cmd}")
