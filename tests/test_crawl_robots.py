"""Robots-obey crawl parity + documents-sink span equality + management ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

H, P = 3, 6


@pytest.fixture(scope="module")
def robots_crawl(spark, tmp_path_factory):
    web = {u: s for u, s in FX.synth_web_rows(H, P, robots=True)}
    seeds = FX.seed_lines(H)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(robots="obey"))
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("robots_crawl")),
        FX.synth_web_df(spark, H, P, robots=True),
        CrawlConfig(num_buckets=8, ordinal_partitions=1, robots="obey", bloom=False),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=80)
    return dict(web=web, sim_log=sim_log, sim_seen=sim_seen, eng=eng, eng_log=eng_log)


def test_robots_crawl_parity(robots_crawl):
    """Full-law parity with robots preconditions: deferrals ('retry' at -50),
    /robots.txt prerequisites (P hop, HIGHEST, trigger's queue), robots
    disallow -> S_ROBOTS_PRECLUDED disregards, crawl-delay politeness."""
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in robots_crawl["sim_log"]
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in robots_crawl["eng_log"].collect()
    )
    assert erows == srows
    dispositions = {d for _, _, _, _, _, d in erows}
    assert {"retry", "success", "disregard"} <= dispositions


def test_robots_seen_parity(spark, robots_crawl):
    eng_seen = {r.fp for r in robots_crawl["eng"].urlseen.seen(spark).collect()}
    assert eng_seen == robots_crawl["sim_seen"]


def test_documents_sink_span_equality(robots_crawl):
    """BASELINE invariant: per-row span-sequence equality (kind, text,
    media_ref, order) of every recorded document vs the source web."""
    docs = robots_crawl["eng"].documents().collect()
    web = robots_crawl["web"]
    assert len(docs) > 0
    seen_ids = set()
    for row in docs:
        assert row.doc_id in web, row.doc_id
        got = [(s.kind, s.text, s.media_ref, s.offset) for s in row.spans]
        assert got == web[row.doc_id], row.doc_id
        assert row.content_digest is not None and len(row.content_digest) == 40
        seen_ids.add(row.doc_id)
    # every 2xx-fetched page recorded exactly once
    fetched_ok = {
        l["canonical"]
        for l in robots_crawl["sim_log"]
        if l["disposition"] == "success" and 200 <= l["fetch_status"] < 300
    }
    assert seen_ids == fetched_ok


def test_dns_and_robots_preconditions_parity(spark, tmp_path):
    """DNS preconditions chained before robots: dns:host prerequisite
    ('P', HIGHEST, S_DNS_SUCCESS=1 result), then robots.txt prerequisite,
    then the trigger — exact parity vs the simulator
    (PreconditionEnforcer.considerDnsPreconditions analog)."""
    h, p = 2, 4
    web = {u: s for u, s in FX.synth_web_rows(h, p, robots=True)}
    seeds = FX.seed_lines(h)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(robots="obey", dns="obey"))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "dns"),
        FX.synth_web_df(spark, h, p, robots=True),
        CrawlConfig(
            num_buckets=8, ordinal_partitions=1, robots="obey", dns="obey", bloom=False
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=80)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    statuses = {s for _, _, _, _, s, _ in erows}
    assert 1 in statuses  # S_DNS_SUCCESS lookups happened
    assert -50 in statuses  # deferrals happened
    eng_seen = {r.fp for r in eng.urlseen.seen(spark).collect()}
    assert eng_seen == sim_seen
    # dns table holds every host
    dns_hosts = {r.host for r in eng.dns_t.read(spark).collect()}
    assert dns_hosts == {f"h{i}.example" for i in range(h)}


def test_export_and_delete_uris(spark, tmp_path):
    """deleteURIs(queueRegex, uriRegex) + exportPendingUris laws."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "mgmt"),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run_round()
    before = eng.export_pending_uris().count()
    assert before > 0
    eng.delete_uris(queue_regex=".*h0.*", uri_regex=".*")
    after = eng.export_pending_uris()
    assert after.filter(F.col("class_key").rlike(".*h0.*")).count() == 0
    assert after.count() < before
    # pending counters recomputed
    hosts = eng.host_t.read(spark)
    h0 = hosts.filter(F.col("class_key").rlike(".*h0.*")).collect()
    assert all(r.pending == 0 for r in h0)


def test_forget_and_consider_included(spark, tmp_path):
    eng = CrawlEngine(
        spark,
        str(tmp_path / "forget"),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(2))
    n0 = eng.seen_count()
    eng.consider_included("http://h0.example/p99")  # mark seen, never schedule
    assert eng.seen_count() == n0 + 1
    assert eng.export_pending_uris().filter(F.col("uri").contains("p99")).count() == 0
    eng.forget_uri("http://h0.example/p0")  # rediscoverable again
    assert eng.seen_count() == n0


def test_journal_replay_rebuilds_seen(spark, tmp_path):
    """importRecoverFormat include-only pass: replaying the event journal
    reconstructs the url_seen set (AbstractFrontier.java:909-967)."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "replay_src"),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run(max_rounds=30)
    journal = eng.events_t.read(spark)
    seen_src = {r.fp for r in eng.urlseen.seen(spark).collect()}

    eng2 = CrawlEngine(
        spark,
        str(tmp_path / "replay_dst"),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng2.import_recover_journal(journal)
    seen_dst = {r.fp for r in eng2.urlseen.seen(spark).collect()}
    assert seen_dst == seen_src
