"""futureUris forced re-visit + QuotaEnforcer parity: engine vs simulator.

futureUris law: WorkQueueFrontier.checkFutures (/root/reference/engine/src/
main/java/org/archive/crawler/frontier/WorkQueueFrontier.java:743-760),
CrawlURI.rescheduleTime (modules/.../CrawlURI.java:1650-1653).
QuotaEnforcer law: engine/.../prefetch/QuotaEnforcer.java:62-81, 389-463.
"""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate


def _sim_rows(log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in log
    )


def _eng_rows(log_df):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in log_df.collect()
    )


def test_recrawl_futures_parity(spark, tmp_path):
    """Forced re-visits: successes re-enter their queue after the interval
    with the same ordinal; engine log == simulator log, and at least one
    URI is fetched in two different rounds."""
    h, p = 2, 4
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    rounds = 14
    sim_log, _ = simulate(
        web, seeds, SimConfig(recrawl_interval_ms=8000, max_rounds=rounds)
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "recrawl"),
        FX.synth_web_df(spark, h, p),
        CrawlConfig(
            num_buckets=4,
            ordinal_partitions=1,
            bloom=False,
            metrics=False,
            recrawl_interval_ms=8000,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=rounds)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    # a re-visit actually happened: some canonical logged in >= 2 rounds
    per_uri_rounds = {}
    for l in sim_log:
        per_uri_rounds.setdefault(l["canonical"], set()).add(l["round"])
    assert any(len(rs) >= 2 for rs in per_uri_rounds.values())
    # journal has Fu rows for the scheduled futures
    fu = eng.journal().filter("tag = 'Fu'").count()
    assert fu > 0
