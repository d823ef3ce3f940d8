"""Metrics/reports (§2.13), digest history (§2.12), journal streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.fixtures import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    """Small crawl whose web contains DUPLICATE-content pages (p_dup spans
    identical to p0's) to exercise digest-history revisit accounting."""
    rows = FX.synth_web_rows(2, 4)
    p1_spans = dict(rows)["http://h0.example/p1"]
    dup_rows = [("http://h0.example/pdup", p1_spans)]  # identical payload to h0/p1
    # link pdup from h0/p0 so it gets crawled
    patched = []
    for doc_id, spans in rows:
        if doc_id == "http://h0.example/p0":
            spans = spans + [("link", "dup", "/pdup", len(spans))]
        patched.append((doc_id, spans))
    web_rows = patched + dup_rows
    state = str(tmp_path_factory.mktemp("statscrawl"))
    eng = CrawlEngine(
        spark,
        state,
        spark.createDataFrame(web_rows, DOCUMENTS_SCHEMA),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run(max_rounds=40)
    return dict(eng=eng, state=state)


def test_metrics_rows(crawl):
    m = crawl["eng"].metrics().orderBy("round").collect()
    assert len(m) > 3
    assert all(r.fetched >= 0 and 0 <= r.congestion_ratio <= 1.0 for r in m)
    assert m[0].round == 0 and m[0].fetched > 0
    # queue depth shrinks to 0 by the end
    assert m[-1].queued_uri_count == 0


def test_reports(crawl):
    reps = crawl["eng"].reports()
    codes = {r.fetch_status: r.n for r in reps["response_codes"].collect()}
    assert 200 in codes and 404 in codes
    seeds = reps["seeds"].collect()
    assert len(seeds) == 2  # h0, h1 seeds
    assert all(r.disposition == "success" for r in seeds)
    hs = reps["host_fetch_stats"].collect()
    assert all(r.success > 0 for r in hs)


def test_digest_history_revisits(crawl):
    """pdup duplicates p0's payload: one digest with dup_by_hash = 1."""
    reps = crawl["eng"].reports()
    hist = reps["digest_history"].collect()
    dups = [r for r in hist if r.dup_by_hash > 0]
    assert len(dups) == 1
    assert dups[0].dup_by_hash == 1
    assert dups[0].first_doc == "http://h0.example/p1"  # earlier fetch wins
    cb = {r.kind: r.n for r in reps["crawled_bytes"].collect()}
    assert cb["dupByHash"] == 1
    assert cb["novel"] == sum(1 for _ in hist)


def test_journal_streaming_matches_batch(spark, crawl):
    from heritrix3_spark.streaming.journal_stream import (
        disposition_counts,
        journal_stream,
        per_round_throughput,
        run_available_now,
    )

    stream = journal_stream(spark, crawl["state"])
    assert stream.isStreaming
    run_available_now(disposition_counts(stream), "disp_counts")
    got = {r.tag: r["count"] for r in spark.table("disp_counts").collect()}
    batch = {
        r.tag: r.n
        for r in crawl["eng"].journal().groupBy("tag").agg(F.count("*").alias("n")).collect()
    }
    assert got == batch
    run_available_now(per_round_throughput(journal_stream(spark, crawl["state"])), "rounds_tp")
    tp = spark.table("rounds_tp").collect()
    assert sum(r.scheduled for r in tp) == batch.get("F+", 0)
