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


def _run_pair(spark, tmp_path, name, web_hp, sim_cfg, eng_cfg, rounds=40):
    h, p = web_hp
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    sim_log, _ = simulate(web, seeds, sim_cfg)
    eng = CrawlEngine(
        spark, str(tmp_path / name), FX.synth_web_df(spark, h, p), eng_cfg
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=rounds)
    assert _eng_rows(eng_log) == _sim_rows(sim_log), name
    return eng, sim_log


def test_quota_force_retire_parity(spark, tmp_path):
    """serverMaxFetchSuccesses with forceRetire (the reference default):
    over-quota URIs re-queue undisposed and their queue retires."""
    quotas = (("serverMaxFetchSuccesses", 2),)
    eng, sim_log = _run_pair(
        spark,
        tmp_path,
        "qret",
        (2, 5),
        SimConfig(quotas=quotas, force_retire=True),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False,
            quotas=quotas, force_retire=True,
        ),
    )
    hosts = eng.host_t.read(spark)
    assert hosts.filter(hosts.retired == "y").count() == 2  # both servers
    # exactly 2 successes per class_key were allowed
    per_ck = {}
    for l in sim_log:
        if l["disposition"] == "success":
            per_ck[l["class_key"]] = per_ck.get(l["class_key"], 0) + 1
    assert all(n == 2 for n in per_ck.values())
    # blocked URIs were re-queued, not disposed (still pending)
    assert eng.frontier_t.read(spark).count() > 0


def test_quota_blocked_fail_parity(spark, tmp_path):
    """hostMaxFetchResponses without forceRetire: over-quota URIs get
    S_BLOCKED_BY_QUOTA (-5003) and dispose as failures."""
    quotas = (("hostMaxFetchResponses", 3),)
    eng, sim_log = _run_pair(
        spark,
        tmp_path,
        "qfail",
        (2, 5),
        SimConfig(quotas=quotas, force_retire=False),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False,
            quotas=quotas, force_retire=False,
        ),
    )
    blocked = [l for l in sim_log if l["fetch_status"] == -5003]
    assert blocked and all(l["disposition"] == "fail" for l in blocked)


def test_quota_kb_and_novel_parity(spark, tmp_path):
    """Byte-derived (KB floor law) + novel-URL quotas bind identically."""
    quotas = (("serverMaxSuccessKb", 1), ("groupMaxNovelUrls", 4))
    _run_pair(
        spark,
        tmp_path,
        "qkb",
        (2, 6),
        SimConfig(quotas=quotas, force_retire=False),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False,
            quotas=quotas, force_retire=False,
        ),
    )


def test_seed_redirect_promotion_parity(spark, tmp_path):
    """seedsRedirectNewSeeds: seeds 301-redirect to brand-new hosts; the
    targets become seeds (forceFetch, MEDIUM, scope extended by their
    implied SURT prefix) and the crawl proceeds onto the new hosts.
    CandidatesProcessor.java:186-194, 270-278 + SeedAcceptDecideRule."""
    h, p = 2, 4
    web = {u: s for u, s in FX.redirect_web_rows(h, p)}
    seeds = FX.redirect_seed_lines(h)
    ov = FX.redirect_status_overrides(h)
    sim_log, sim_seen = simulate(
        web,
        seeds,
        SimConfig(seed_accept=True),
        status_overrides=ov,
    )
    ov_df = spark.createDataFrame(list(ov.items()), ["canonical", "status"])
    eng = CrawlEngine(
        spark,
        str(tmp_path / "redirseed"),
        spark.createDataFrame(list(web.items()), FX.DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False,
            seed_accept=True,
        ),
        fetch_status_overrides=ov_df,
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    # the crawl actually reached the redirect targets' hosts
    assert any(l["canonical"].startswith("http://h0.example/") for l in sim_log)
    assert any(l["canonical"].startswith("http://h1.example/p") for l in sim_log)
    # promoted seeds are flagged in the journal F+ rows
    promoted = (
        eng.journal()
        .filter("tag = 'F+' AND is_seed AND canonical LIKE 'http://h%'")
        .count()
    )
    assert promoted == h
    # engine seen set matches the simulator's exactly
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


def test_session_budget_cost_law_parity(spark, tmp_path):
    """sessionBudget binding below k: emit while spend-this-activation <=
    budget (WorkQueue.java:233-265). With unit cost and budget 2, each
    queue emits 3 URIs per round (spend_before of the 3rd is 2 <= 2)."""
    quotaless = dict(num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False)
    eng, sim_log = _run_pair(
        spark,
        tmp_path,
        "sbudget",
        (2, 6),
        SimConfig(k_per_host=5, session_budget=2),
        CrawlConfig(k_per_host=5, session_budget=2, **quotaless),
    )
    per_round_ck = {}
    for l in sim_log:
        per_round_ck.setdefault((l["round"], l["class_key"]), 0)
        per_round_ck[(l["round"], l["class_key"])] += 1
    assert max(per_round_ck.values()) == 3  # budget binds below k=5


def test_bandwidth_cap_parity(spark, tmp_path):
    """maxPerHostBandwidthUsageKbSec (DispositionProcessor.java:275-291):
    big pages + 1 KB/s cap raise the inter-fetch gap far above the
    politeness floor; serial clock + next-round carry match the simulator
    exactly."""
    web = {}
    for i in range(2):
        for j in range(3):
            url = f"http://h{i}.example/p{j}"
            web[url] = [
                ("text", "x" * 20000, None, 0),
                ("link", f"n{j}", f"/p{(j + 1) % 3}", 1),
            ]
    seeds = [f"http://h{i}.example/p0" for i in range(2)]
    cap = 1  # KB/s -> ~19.5 s gap per 20 KB page, >> 3 s politeness
    sim_log, _ = simulate(
        web, seeds, SimConfig(k_per_host=2, max_per_host_bandwidth_kb=cap)
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "bw"),
        spark.createDataFrame(list(web.items()), FX.DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, metrics=False,
            k_per_host=2, max_per_host_bandwidth_kb=cap,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=20)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    # the cap actually raised the host clock: wake gaps ~19.5s not ~3.1s
    wakes = {r.class_key: r.wake_time for r in eng.host_t.read(spark).collect()}
    assert all(w > 15_000 for w in wakes.values())
