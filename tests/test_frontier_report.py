"""Frontier report (WorkQueueFrontier.reportTo :1253-1345,
shortReportLineTo :1161-1199; AbstractFrontier counter laws :736-790,
discoveredUriCount == uriUniqFilter.count() :1089-1091)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.operators import stats as ST

# synthetic host_state covering every queue state:
# (class_key, pending, wake_time, total_expenditure, error_count, retired)
_HOSTS = [
    ("a,", 5, 0, 0, 0, "n"),      # ready (awake, live)
    ("b,", 3, 10, 0, 0, "n"),     # ready at clock 10, snoozed at clock 5
    ("c,", 2, 999, 0, 0, "n"),    # snoozed
    ("d,", 0, 0, 0, 0, "n"),      # exhausted
    ("e,", 7, 0, 0, 0, "y"),      # retired (pending kept)
    ("f,", 4, 0, 0, 0, "n"),      # inactive via precedence >= floor (below)
]


def _hosts_df(spark):
    return spark.createDataFrame(
        _HOSTS,
        ["class_key", "pending", "wake_time", "total_expenditure", "error_count", "retired"],
    )


def test_frontier_summary_states(spark):
    qp = spark.createDataFrame([("f,", 255)], ["class_key", "queue_precedence"])
    row = ST.frontier_summary(
        _hosts_df(spark), clock=5, precedence_floor=255,
        default_precedence=3, queue_precedence=qp,
    ).collect()[0]
    assert row.total_queues == 6
    assert row.active_queues == 3          # a (ready), b+c (snoozed)
    assert row.ready_queues == 1           # a
    assert row.snoozed_queues == 2         # b (wake 10 > 5), c
    assert row.inactive_queues == 1        # f at the floor
    assert row.retired_queues == 1         # e
    assert row.exhausted_queues == 1       # d
    # the four unretired states + retired partition all queues exactly
    assert (
        row.active_queues + row.inactive_queues + row.retired_queues
        + row.exhausted_queues == row.total_queues
    )
    # clock movement shifts snoozed -> ready, nothing else
    row10 = ST.frontier_summary(
        _hosts_df(spark), clock=10, precedence_floor=255,
        default_precedence=3, queue_precedence=qp,
    ).collect()[0]
    assert (row10.ready_queues, row10.snoozed_queues) == (2, 1)
    assert row10.active_queues == 3


def test_frontier_summary_empty(spark):
    empty = _hosts_df(spark).limit(0)
    row = ST.frontier_summary(empty, 0, 255, 3).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0, 0, 0)


@pytest.fixture(scope="module")
def report_crawl(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("frep")),
        FX.synth_web_df(spark, 3, 5),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False),
    )
    eng.bootstrap(FX.seed_lines(3))
    return eng


def test_frontier_report_midcrawl_and_final(spark, report_crawl):
    """The engine report equals an independent recompute from the raw
    state tables, both mid-crawl (live/snoozed queues, queued URIs) and
    after completion (everything exhausted, finished == log size)."""
    eng = report_crawl

    def recompute():
        hosts = eng.host_t.read(spark).collect()
        log = eng.crawl_log().collect()
        disp = [r.disposition for r in log]
        live = [h for h in hosts if h.retired == "n" and h.pending > 0]
        return dict(
            total_queues=len(hosts),
            active_queues=len(live),
            ready_queues=sum(1 for h in live if h.wake_time <= eng.clock),
            snoozed_queues=sum(1 for h in live if h.wake_time > eng.clock),
            inactive_queues=0,  # default constant precedence 3 < floor 255
            retired_queues=sum(1 for h in hosts if h.retired == "y"),
            exhausted_queues=sum(
                1 for h in hosts if h.retired == "n" and h.pending <= 0
            ),
            succeeded=disp.count("success"),
            failed=disp.count("fail"),
            disregarded=disp.count("disregard"),
            finished=sum(disp.count(d) for d in ("success", "fail", "disregard")),
            queued=sum(h.pending for h in hosts),
            discovered=eng.seen_count(),
            already_included=eng.seen_count(),
        )

    eng.run(max_rounds=2)  # mid-crawl: pending queues, snoozes in play
    got = eng.frontier_report().collect()[0].asDict()
    assert got == recompute()
    assert got["queued"] > 0  # genuinely mid-crawl

    eng.run(max_rounds=60)  # run to completion
    got = eng.frontier_report().collect()[0].asDict()
    want = recompute()
    assert got == want
    assert want["queued"] == 0 and want["exhausted_queues"] == want["total_queues"]
    assert want["finished"] == eng.crawl_log().count()
