"""IdenticalPayloadDigestRevisit dispositions + CrawledBytesHistotable.

Laws: modules/.../revisit/IdenticalPayloadDigestRevisit.java (duplicate
payload digest -> revisit record; crawl.log "duplicate:digest" annotation),
engine/.../util/CrawledBytesHistotable.java:36-63 (novel vs dupByHash
accounting)."""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate


def _twin_web():
    """Two hosts; h0/p1 and h1/p1 carry IDENTICAL span payloads."""
    rows = []
    shared = [("text", "identical payload text", None, 0)]
    for h in range(2):
        base = f"http://h{h}.example"
        rows.append(
            (
                f"{base}/p0",
                [
                    ("text", f"front page {h}", None, 0),
                    ("link", "p1", f"{base}/p1", 1),
                ],
            )
        )
        rows.append((f"{base}/p1", list(shared)))
    return dict(rows)


def test_revisit_annotation_parity(spark, tmp_path):
    """Identical payloads across hosts: the LATER fetch (by ordinal /
    digest-history order) logs duplicate:digest; exact engine-vs-simulator
    parity including the annotation column."""
    web = _twin_web()
    seeds = [f"http://h{h}.example/p0" for h in range(2)]
    cfg_kw = dict(digest_history=True)
    sim_log, _ = simulate(web, seeds, SimConfig(**cfg_kw))
    web_df = spark.createDataFrame(
        [(u, s) for u, s in web.items()], FX.DOCUMENTS_SCHEMA
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "revisit"),
        web_df,
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=30)
    srows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l["disposition"], l.get("annotation"))
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.canonical, r.ordinal, r.disposition, r.annotation)
        for r in eng_log.collect()
    )
    assert erows == srows
    dups = [r for r in erows if r[4] == "duplicate:digest"]
    assert len(dups) == 1  # exactly one of the twin pages is the revisit


def test_recrawl_second_visit_is_revisit(spark, tmp_path):
    """futureUris recrawl: the forced second visit of an unchanged page
    must log duplicate:digest (verdict #5 'second visit logs a revisit')."""
    web = {u: s for u, s in FX.synth_web_rows(1, 2)}
    seeds = FX.seed_lines(1)
    cfg_kw = dict(digest_history=True, recrawl_interval_ms=40_000)
    sim_log, _ = simulate(web, seeds, SimConfig(**cfg_kw, max_rounds=14))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "recrawl"),
        FX.synth_web_df(spark, 1, 2),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=14)
    srows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l["disposition"], l.get("annotation"))
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.canonical, r.ordinal, r.disposition, r.annotation)
        for r in eng_log.collect()
    )
    assert erows == srows
    # the same canonical appears first without, then with the annotation
    revisits = [r for r in erows if r[4] == "duplicate:digest"]
    assert revisits, "recrawled unchanged pages must log duplicate:digest"
    for r in revisits:
        firsts = [
            x for x in erows if x[1] == r[1] and x[0] < r[0] and x[4] is None
        ]
        assert firsts, r


def test_fetch_history_rolling_depth(spark, tmp_path):
    """A_FETCH_HISTORY analog: after a recrawl, each page's history holds
    the latest K final fetch records, newest first, with digests."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "fhist"),
        FX.synth_web_df(spark, 1, 2),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            recrawl_interval_ms=40_000,
        ),
    )
    eng.bootstrap(FX.seed_lines(1))
    eng.run(max_rounds=14)
    hist = {r.canonical: r.history for r in eng.reports()["fetch_history"].collect()}
    seed = "http://h0.example/p0"
    assert seed in hist
    records = hist[seed]
    assert len(records) == 2  # recrawled once, depth default 2
    assert records[0]["round"] > records[1]["round"]  # newest first
    # unchanged page: identical digests across visits
    assert records[0]["content_digest"] == records[1]["content_digest"]
    assert records[0]["content_digest"] is not None


def test_not_modified_accounting(spark, tmp_path):
    """A 304 response (status override) tallies as notModified in the
    CrawledBytesHistotable (it has no payload, so it is neither novel nor
    dupByHash)."""
    ov = spark.createDataFrame([("http://h0.example/p1", 304)], ["canonical", "status"])
    eng = CrawlEngine(
        spark,
        str(tmp_path / "nm"),
        FX.synth_web_df(spark, 1, 3),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
        fetch_status_overrides=ov,
    )
    eng.bootstrap(FX.seed_lines(1))
    eng.run(max_rounds=20)
    histo = {r.kind: r.n for r in eng.reports()["crawled_bytes"].collect()}
    assert histo.get("notModified") == 1
    assert "http://h0.example/p1" not in {
        r.doc_id for r in eng.documents().collect()
    }


def test_crawled_bytes_histotable_report(spark, tmp_path):
    """novel/dupByHash split over the documents sink."""
    web = _twin_web()
    seeds = [f"http://h{h}.example/p0" for h in range(2)]
    eng = CrawlEngine(
        spark,
        str(tmp_path / "histo"),
        spark.createDataFrame([(u, s) for u, s in web.items()], FX.DOCUMENTS_SCHEMA),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, digest_history=True),
    )
    eng.bootstrap(seeds)
    eng.run(max_rounds=30)
    histo = {r.kind: r.n for r in eng.reports()["crawled_bytes"].collect()}
    assert histo.get("dupByHash") == 1
    assert histo.get("novel", 0) >= 3
