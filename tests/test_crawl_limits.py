"""CrawlLimitEnforcer limit family (CrawlLimitEnforcerTest.java:36-200,
CrawlLimitEnforcer.java:145-163): byte / novel / time limits stop the
crawl with the reference's CrawlStatus, first matching limit in the
reference's if/else-if order — in exact engine-vs-simulator parity.
(maxDocumentsDownload == the long-standing max_fetches law, covered by
test_precedence_limits.py.)
"""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

H, P = 2, 4


def _run(spark, tmp_path, name, **kw):
    web = {u: s for u, s in FX.synth_web_rows(H, P)}
    seeds = FX.seed_lines(H)
    sim_log, _ = simulate(web, seeds, SimConfig(**kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        FX.synth_web_df(spark, H, P),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    log = eng.run(max_rounds=60)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition)
        for r in log
        .collect()
    )
    assert erows == srows
    return eng, erows


def test_max_bytes_download_parity(spark, tmp_path):
    unlimited, _ = simulate(
        {u: s for u, s in FX.synth_web_rows(H, P)}, FX.seed_lines(H), SimConfig()
    )
    eng, rows = _run(spark, tmp_path, "bytes", max_bytes_download=300)
    assert eng.stop_status == "FINISHED_DATA_LIMIT"
    assert len(rows) < len(unlimited)
    # the limit round still completed (its successes are in the log)
    assert any(r[4] == 200 for r in rows)


def test_max_novel_urls_with_digest_history_parity(spark, tmp_path):
    # synth pages are all distinct -> novel == successes; the crawl stops
    # once 3 novel URLs accumulated, via FINISHED_DOCUMENT_LIMIT
    eng, rows = _run(
        spark, tmp_path, "novel", max_novel_urls=3, digest_history=True
    )
    assert eng.stop_status == "FINISHED_DOCUMENT_LIMIT"
    n_success = sum(1 for r in rows if r[5] == "success" and r[4] >= 200)
    assert n_success >= 3
    # checked per-round: can overshoot within the final round but not by
    # more than that round's emissions (2 hosts x k=1)
    assert n_success <= 3 + 2


def test_max_time_seconds_parity(spark, tmp_path):
    eng, rows = _run(spark, tmp_path, "time", max_time_seconds=7)
    assert eng.stop_status == "FINISHED_TIME_LIMIT"
    unlimited, _ = simulate(
        {u: s for u, s in FX.synth_web_rows(H, P)}, FX.seed_lines(H), SimConfig()
    )
    assert len(rows) < len(unlimited)


def test_limit_order_bytes_wins(spark, tmp_path):
    # both the byte and the novel-URL limit exceed in the same round: the
    # reference's chain checks bytes FIRST -> FINISHED_DATA_LIMIT
    eng, _ = _run(
        spark, tmp_path, "order", max_bytes_download=1, max_novel_urls=1
    )
    assert eng.stop_status == "FINISHED_DATA_LIMIT"
