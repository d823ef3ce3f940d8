"""SparkSession factory tuned for the crawl workload.

Local-mode settings mirror what we'd submit cluster-side via
``spark-submit --py-files`` (north rule): AQE on (skew-join + coalesce),
Arrow for the pandas-UDF fetch/extract stages, shuffle partitions sized to
cores (overridable per SF).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "heritrix3-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays TRUE (false hangs tiny rounds on this
        # build — see CLAUDE.md), but its adaptive target is floored by
        # minPartitionSize (default 1 MiB): a few-MB crawl round coalesces
        # to 1-3 partitions and the pandas-UDF extract stage then runs
        # SERIAL (measured: task time == wall on every round phase). At
        # cluster scale total/defaultParallelism dominates the floor, so
        # lowering it only restores small-batch parallelism.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # long-lived sessions churn thousands of short-lived RDDs; the
        # ContextCleaner only reaps a cached block once driver GC collects
        # the RDD handle, and the default 30min periodic GC lets orphans
        # pile up on the heap — reap every 5min
        .config("spark.cleaner.periodicGC.interval", os.environ.get("SPARK_PERIODIC_GC", "5min"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
