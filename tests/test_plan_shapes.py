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


def test_bloom_probe_is_cogrouped_never_broadcast(spark, tmp_path):
    """The bloom pre-filter must cogroup candidates with shards by bucket —
    a BroadcastExchange of the shard table would ship every bucket's bitmap
    to every executor (unbounded at 10^3+ buckets); a join would replicate
    the bitmap bytes onto every candidate row."""
    us = UrlSeen(
        SnapshotCatalog(str(tmp_path)),
        num_buckets=8,
        bloom=True,
        bloom_bits_per_bucket=1 << 14,
        bloom_min_seen=0,
    )
    us.add_fps(spark.range(200).select(F.xxhash64("id").alias("fp")))
    cand = spark.range(100, 160).select(F.xxhash64("id").alias("fp"), F.col("id").alias("x"))
    out = us.filter_novel(cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan  # the co-partitioned probe
    assert "BroadcastExchange" not in plan.split("FlatMapCoGroupsInPandas")[1], (
        "shard side of the probe must not broadcast"
    )
    # correctness unchanged: exact anti-join result
    exact = {r.x for r in us._anti_join(cand, "fp").collect()}
    assert {r.x for r in out.collect()} == exact


def test_bloom_shards_size_with_key_count(spark, tmp_path):
    """Shards must grow with their bucket's key count (~10 bits/key) so the
    filter never saturates at a fixed size."""
    us = UrlSeen(
        SnapshotCatalog(str(tmp_path)),
        num_buckets=2,
        bloom=True,
        bloom_bits_per_bucket=1 << 10,
        bloom_min_seen=0,
    )
    us.add_fps(spark.range(20_000).select(F.xxhash64("id").alias("fp")))
    shards = us.bloom_table.read(spark).collect()
    for r in shards:
        assert r.nbits >= 1 << 10
        assert len(r.bits) == (r.nbits + 7) // 8
    # ~10k keys/bucket * 10 bits -> at least 2^17 bits, far above the floor
    assert max(r.nbits for r in shards) >= 1 << 17
