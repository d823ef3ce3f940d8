"""Physical-plan regression guards for the scale-critical operators.

These assert the *plan properties* PLANS.md documents — if a refactor
silently loses the map-side window limit or column pruning, these fail
long before a 10^10-row run would."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix3_spark.operators.frontier import head_pick
from heritrix3_spark.operators.urlseen import UrlSeen
from heritrix3_spark.storage import SnapshotCatalog


def _frontier(spark, n=1000, queues=50):
    return spark.range(n).select(
        F.concat(F.lit("k"), F.pmod("id", queues).cast("string")).alias("class_key"),
        F.lit("u").alias("uri"),
        F.lit(2).cast("int").alias("sched_directive"),
        F.lit(1).cast("int").alias("precedence"),
        F.col("id").alias("ordinal"),
    )


def test_head_pick_has_mapside_group_limit(spark):
    """row_number<=k must compile to WindowGroupLimit (Partial) BEFORE the
    exchange — the property that keeps hot queues from skewing the shuffle."""
    plan = head_pick(_frontier(spark), k=1)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # partial (map-side) instance present
    assert "Partial" in plan


def test_head_pick_no_global_sort(spark):
    plan = head_pick(_frontier(spark), k=1)._jdf.queryExecution().executedPlan().toString()
    # every Sort is per-partition (global=false); a global sort would print
    # 'Sort [...], true' in the executed plan
    for line in plan.splitlines():
        if "+- Sort" in line or line.strip().startswith("Sort ["):
            assert ", false," in line, line


def test_urlseen_scan_prunes_to_fp(spark, tmp_path):
    """The dedup anti-join must read only the fp column of url_seen."""
    us = UrlSeen(SnapshotCatalog(str(tmp_path)), num_buckets=8, bloom=False)
    us.add_fps(spark.range(100).select(F.xxhash64("id").alias("fp")))
    cand = spark.range(50).select(F.xxhash64("id").alias("fp"), F.col("id").alias("x"))
    plan = us.filter_novel(cand)._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<fp:bigint>" in plan  # bucket column pruned
    assert "LeftAnti" in plan
