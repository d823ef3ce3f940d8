"""WARCLimitEnforcer + crawl-log feed publishers (contrib postprocessors).

Reference: contrib/.../postprocessor/WARCLimitEnforcer.java:87-114 (stop
crawl when WARC-writer stats hit a configured limit),
CrawlLogJsonBuilder.java:21-75 (the JSON record law) and
KafkaCrawlLogFeed.java:131-137 (final dispositions only).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.fixtures import DOCUMENTS_SCHEMA
from heritrix3_spark.functions.mime import mime_truncate
from heritrix3_spark.streaming.crawl_log_feed import crawl_log_feed, crawl_log_json
from heritrix3_spark.streaming.journal_stream import journal_stream


def _dup_web_rows():
    """2x4 web plus one page whose payload duplicates h0/p1 (revisit bait)."""
    rows = FX.synth_web_rows(2, 4)
    p1_spans = dict(rows)["http://h0.example/p1"]
    patched = []
    for doc_id, spans in rows:
        if doc_id == "http://h0.example/p0":
            spans = spans + [("link", "dup", "/pdup", len(spans))]
        patched.append((doc_id, spans))
    return patched + [("http://h0.example/pdup", p1_spans)]


@pytest.fixture(scope="module")
def limited(spark, tmp_path_factory):
    """Crawl with a totals.numRecords WARC limit low enough to stop early."""
    state = str(tmp_path_factory.mktemp("warclim"))
    eng = CrawlEngine(
        spark,
        state,
        spark.createDataFrame(FX.synth_web_rows(2, 6), DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4,
            ordinal_partitions=1,
            bloom=False,
            warc_limits={"totals": {"numRecords": 3}},
        ),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run(max_rounds=40)
    return eng


@pytest.fixture(scope="module")
def feedcrawl(spark, tmp_path_factory):
    """Unlimited crawl (with digest history) for feed + stats-law checks."""
    state = str(tmp_path_factory.mktemp("feedcrawl"))
    eng = CrawlEngine(
        spark,
        state,
        spark.createDataFrame(_dup_web_rows(), DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4,
            ordinal_partitions=1,
            bloom=False,
            digest_history=True,
            warc_limits={"totals": {"contentBytes": 10**12}},  # accumulate, never hit
        ),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run(max_rounds=40)
    return dict(eng=eng, state=state)


def test_write_limit_stops_crawl(limited):
    assert limited.stop_status == "FINISHED_WRITE_LIMIT"
    n = limited._warc_stats["totals"]["numRecords"]
    # at or past the limit, overshooting by at most the final round's batch
    assert n >= 3
    # 2x6 web has 12 fetchable pages + 2 more rounds at least — the stop
    # genuinely truncated the crawl
    assert limited.documents().count() < 12


def test_warc_stats_match_documents_sink(limited):
    """stats are exactly the persisted record set (independent recompute)."""
    docs = limited.documents().collect()
    assert limited._warc_stats["totals"]["numRecords"] == len(docs)
    cb = sum(
        len(s.text or "") + len(s.media_ref or "") for r in docs for s in r.spans
    )
    assert limited._warc_stats["totals"]["contentBytes"] == cb
    assert limited._warc_stats["totals"]["totalBytes"] == cb
    # no digest history -> everything is a "response" record
    assert "revisit" not in limited._warc_stats
    assert limited._warc_stats["response"]["numRecords"] == len(docs)


def test_revisit_records_split(feedcrawl):
    """With digest history on, duplicate-payload rewrites count as
    "revisit" records (WARCWriterProcessor revisit path): the split must
    match the duplicate:digest annotations in the crawl log."""
    eng = feedcrawl["eng"]
    assert eng.stop_status is None  # limit never hit
    stats = eng._warc_stats
    log = eng.crawl_log()
    n_revisit = log.filter(
        F.col("annotation").contains("duplicate:digest")
        & (F.col("fetch_status") >= 200)
        & (F.col("fetch_status") < 300)
    ).count()
    assert n_revisit == 1  # pdup duplicates h0/p1
    assert stats["revisit"]["numRecords"] == n_revisit
    assert (
        stats["response"]["numRecords"] + stats["revisit"]["numRecords"]
        == stats["totals"]["numRecords"]
        == eng.documents().count()
    )


EXPECTED_FIELDS = {
    "timestamp", "content_length", "size", "status_code", "url", "hop_path",
    "via", "mimetype", "thread", "start_time_plus_duration", "content_digest",
    "seed", "host", "annotations", "warc_filename", "warc_offset",
}


def test_crawl_log_json_field_law(feedcrawl):
    """CrawlLogJsonBuilder.buildJson: stable field set with explicit JSON
    nulls, sizes only when positive, mimetype truncated."""
    eng = feedcrawl["eng"]
    out = crawl_log_json(
        eng.crawl_log(),
        extra_fields={"crawl": "t1"},
        clock_ms=F.lit(1_600_000_000_000),
    )
    rows = out.collect()
    assert rows
    for r in rows:
        jo = json.loads(r.value)
        assert set(jo) == EXPECTED_FIELDS | {"crawl"}
        assert jo["crawl"] == "t1"
        assert jo["timestamp"] == "2020-09-13T12:26:40.000Z"
        assert jo["url"] == r.uri
        assert jo["status_code"] == r.fetch_status
        assert jo["mimetype"] == mime_truncate(r.content_type)  # null -> "no-type"
        # size: content size when > 0, else null
        if r.content_length is not None and r.content_length > 0:
            assert jo["size"] == r.content_length
        else:
            assert jo["size"] is None
        # engine carries no threads / WARC offsets -> explicit nulls
        assert jo["thread"] is None and jo["warc_filename"] is None
        # host resolves through the queue key (serverCache.getHostFor analog)
        assert jo["host"] == r.class_key
        assert jo["seed"] == r.source_tag


def test_feed_streams_final_dispositions(spark, feedcrawl, tmp_path):
    """The streaming publisher ships one message per finally-disposed URI
    (KafkaCrawlLogFeed.shouldProcess: retries and F+/Fu schedule events
    are not fed), key = canonical."""
    eng = feedcrawl["eng"]
    stream = journal_stream(spark, feedcrawl["state"], full=True)
    q = crawl_log_feed(
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        path=str(tmp_path / "out"),
        available_now=True,
    )
    q.awaitTermination()
    got = spark.read.json(str(tmp_path / "out"))
    expected = eng.crawl_log().filter(F.col("disposition") != "retry")
    assert got.count() == expected.count()
    assert set(got.columns) == {"key", "value"}
    keys = {r.key for r in got.select("key").collect()}
    exp_keys = {r.canonical for r in expected.select("canonical").collect()}
    assert keys == exp_keys
    # every message obeys the record law
    sample = json.loads(got.limit(1).collect()[0].value)
    assert set(sample) == EXPECTED_FIELDS
