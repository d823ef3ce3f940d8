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


def test_windowed_throughput_with_watermark(spark, crawl):
    """Event-time tumbling windows over the VIRTUAL clock with a
    watermark: finalized (append-mode) windows carry exactly the batch
    counts, and the watermark genuinely holds back the trailing windows
    (bounded state, late-data tolerance)."""
    from heritrix3_spark.streaming.journal_stream import (
        EVENTS_SCHEMA,
        journal_stream,
        windowed_throughput,
    )

    agg = windowed_throughput(journal_stream(spark, crawl["state"]))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_tp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.tag): r["count"]
        for r in spark.table("win_tp").collect()
    }
    batch = {
        ((r["window"]["start"]), r.tag): r["count"]
        for r in (
            spark.read.schema(EVENTS_SCHEMA)
            .parquet(crawl["state"] + "/events/v*")
            .withColumn("event_time", F.timestamp_millis(F.col("clock_ms")))
            .groupBy(F.window("event_time", "10 seconds"), "tag")
            .count()
            .collect()
        )
    }
    assert got  # some windows finalized (virtual span >> window+watermark)
    assert set(got) < set(batch)  # strict: the tail is held by the watermark
    assert all(batch[k] == v for k, v in got.items())  # exact counts


def test_host_progress_stateful(spark, crawl, tmp_path):
    """applyInPandasWithState custom stateful operator: per-queue running
    totals folded over micro-batches; each queue's LAST emitted row must
    equal the batch-mode aggregate, and totals must be non-decreasing
    across emissions (state really carries forward)."""
    from heritrix3_spark.streaming.journal_stream import (
        EVENTS_SCHEMA,
        host_progress_stateful,
        journal_stream,
        run_update_available_now,
    )

    rows = run_update_available_now(
        host_progress_stateful(journal_stream(spark, crawl["state"])),
        str(tmp_path / "ck"),
    )
    seen_monotonic: dict[str, tuple] = {}
    final: dict[str, tuple] = {}
    for r in rows:
        cur = (r.successes, r.finished, r.scheduled, r.last_round)
        prev = seen_monotonic.get(r.class_key)
        assert prev is None or all(a >= b for a, b in zip(cur, prev))
        seen_monotonic[r.class_key] = cur
        final[r.class_key] = cur
    batch = {
        r.class_key: (r.suc, r.fin, r.sched, r.last)
        for r in (
            spark.read.schema(EVENTS_SCHEMA)
            .parquet(crawl["state"] + "/events/v*")
            .groupBy("class_key")
            .agg(
                F.sum(F.when(F.col("tag") == "Fs", 1).otherwise(0)).alias("suc"),
                F.sum(
                    F.when(F.col("tag").isin("Fs", "Ff", "Fd"), 1).otherwise(0)
                ).alias("fin"),
                F.sum(F.when(F.col("tag") == "F+", 1).otherwise(0)).alias("sched"),
                F.max("round").cast("long").alias("last"),
            )
            .collect()
        )
    }
    assert final == batch
