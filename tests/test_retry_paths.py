"""Failure-injection paths: connect-failed retry backoff + queue snooze law.

Engine-only (the simulator doesn't model fetch failures): asserts the
processFinish reenqueue branch — retryDelay snoozes the QUEUE (900s for
connect/DNS failures), attempts accumulate, cost is expended per retry,
and other queues are unaffected (WorkQueueFrontier.java:947-963,
AbstractFrontier.java:851-856).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def failing_crawl(spark, tmp_path_factory):
    ov = spark.createDataFrame([("http://h0.example/p1", -2)], ["canonical", "status"])
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("ovr")),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
        fetch_status_overrides=ov,
    )
    eng.bootstrap(FX.seed_lines(2))
    log = eng.run(max_rounds=12)
    return dict(eng=eng, log=log)


def test_connect_failed_retries_with_backoff(spark, failing_crawl):
    p1 = (
        failing_crawl["log"]
        .filter(F.col("canonical") == "http://h0.example/p1")
        .orderBy("round")
        .collect()
    )
    assert len(p1) >= 2
    assert all(r.fetch_status == -2 and r.disposition == "retry" for r in p1)
    # still pending with accumulated attempts
    pending = (
        failing_crawl["eng"]
        .export_pending_uris()
        .filter(F.col("canonical") == "http://h0.example/p1")
        .collect()
    )
    assert len(pending) == 1 and pending[0].fetch_attempts == len(p1)


def test_retry_snoozes_queue_900s(spark, failing_crawl):
    """After a connect-failed retry, the host queue's wake time jumps by the
    900s retry delay (not the 3.1s politeness step)."""
    hosts = {r.class_key: r.wake_time for r in failing_crawl["eng"].host_t.read(spark).collect()}
    assert hosts["example,h0,"] >= 900_000  # snoozed by retryDelay
    assert hosts["example,h1,"] < 900_000  # unaffected queue stays on politeness cadence


def test_retries_charge_budget(spark, failing_crawl):
    """Non-deferred retries expend cost (WorkQueueFrontier.java:950-952)."""
    h0 = (
        failing_crawl["eng"]
        .host_t.read(spark)
        .filter(F.col("class_key") == "example,h0,")
        .collect()[0]
    )
    n_h0_rows = failing_crawl["log"].filter(F.col("class_key") == "example,h0,").count()
    assert h0.total_expenditure == n_h0_rows  # unit cost per emission incl. retries
