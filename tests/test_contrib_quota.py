"""Contrib HostQuotaEnforcer / SourceQuotaEnforcer parity.

Reference: contrib/src/main/java/org/archive/crawler/prefetch/
HostQuotaEnforcer.java:1-135 (per-URI check of the URI's OWN host substats
against raw FetchStats keys; applyToSubdomains = InternetDomainName
ancestor walk; block -5003 + "hostQuota:<key>", ProcessResult.FINISH — no
forceRetire) and SourceQuotaEnforcer.java:1-111 (per-source
CrawledBytesHistotable keys, only once the source's stats exist;
"sourceQuota:<key>").
"""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate


def _rows(sim_log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"], l.get("annotation"))
        for l in sim_log
    )


def _erows(eng_log):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition, r.annotation)
        for r in eng_log.collect()
    )


def _run_pair(spark, tmp_path, name, web, seeds, kw):
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _erows(eng_log) == _rows(sim_log)
    return sim_log, eng, eng_log


def _chain_web(host, n):
    """host/p0 -> p1 -> ... -> p(n-1), one link per page (k=1 crawls one
    page per round per host)."""
    web = {}
    for j in range(n):
        spans = [("text", f"page{j}", None, 0)]
        if j + 1 < n:
            spans.append(("link", "n", f"/p{j + 1}", 1))
        web[f"http://{host}/p{j}"] = spans
    return web


def test_host_quota_blocks_own_host_only(spark, tmp_path):
    """fetchSuccesses quota on h0: after 2 successes every further h0 URI
    fails -5003 with hostQuota:fetchSuccesses; h1 is untouched."""
    web = {**_chain_web("h0.example", 5), **_chain_web("h1.example", 4)}
    kw = dict(
        host_quotas=(("h0.example", False, (("fetchSuccesses", 2),)),),
        k_per_host=1,
    )
    seeds = ["http://h0.example/p0", "http://h1.example/p0"]
    sim_log, eng, eng_log = _run_pair(spark, tmp_path, "hostq", web, seeds, kw)
    rows = {r.canonical: r for r in eng_log.collect()}
    # h0: p0, p1 succeed (checks see round-START stats); p2 blocks
    assert rows["http://h0.example/p1"].fetch_status == 200
    blocked = [
        r for r in eng_log.collect()
        if r.fetch_status == -5003 and r.canonical.startswith("http://h0")
    ]
    assert blocked and all(
        r.annotation == "hostQuota:fetchSuccesses" and r.disposition == "fail"
        for r in blocked
    )
    # h1 crawled to the end, never blocked
    assert rows["http://h1.example/p3"].fetch_status == 200


def test_host_quota_subdomains_law(spark, tmp_path):
    """applyToSubdomains: sub.h0.example URIs check THEIR OWN host's
    substats against the h0.example entry (HostQuotaEnforcer.java:100-115
    ancestor walk); without the flag only the exact host matches."""
    web = {
        "http://h0.example/a": [
            ("text", "a", None, 0),
            ("link", "s", "http://sub.h0.example/s0", 1),
        ],
        **_chain_web("sub.h0.example", 4),
    }
    web["http://sub.h0.example/s0"] = [
        ("text", "s0", None, 0),
        ("link", "n", "/p0", 1),
    ]
    seeds = ["http://h0.example/a", "http://sub.h0.example/s0"]
    # subdomains on: the sub host trips its own 2-success quota
    kw = dict(
        host_quotas=(("h0.example", True, (("fetchSuccesses", 2),)),),
        k_per_host=1,
        max_hops=30,
    )
    sim_log, eng, eng_log = _run_pair(spark, tmp_path, "subs_on", web, seeds, kw)
    sub_blocked = [
        r for r in eng_log.collect()
        if r.fetch_status == -5003
        and r.canonical.startswith("http://sub.h0.example")
    ]
    assert sub_blocked
    # subdomains off: the sub host is out of the enforcer's reach
    kw = dict(
        host_quotas=(("h0.example", False, (("fetchSuccesses", 2),)),),
        k_per_host=1,
        max_hops=30,
    )
    sim_log, eng, eng_log = _run_pair(spark, tmp_path, "subs_off", web, seeds, kw)
    assert not [
        r for r in eng_log.collect()
        if r.fetch_status == -5003
        and r.canonical.startswith("http://sub.h0.example")
    ]


def test_source_quota_blocks_after_stats_exist(spark, tmp_path):
    """novelCount quota on seed-0's source: blocks only once the source's
    stats EXIST (shouldProcess law) — so even limit 1 lets the first
    round through; the other source is untouched."""
    web = {**_chain_web("h0.example", 5), **_chain_web("h1.example", 4)}
    kw = dict(
        source_tag_seeds=True,
        source_quotas=(("http://h0.example/p0", (("novelCount", 1),)),),
        k_per_host=1,
    )
    seeds = ["http://h0.example/p0", "http://h1.example/p0"]
    sim_log, eng, eng_log = _run_pair(spark, tmp_path, "srcq", web, seeds, kw)
    rows = sorted(
        (r for r in eng_log.collect() if r.canonical.startswith("http://h0")),
        key=lambda r: r.ordinal,
    )
    # p0 fetched (no stats yet), p1 blocked (novelCount=1 >= 1)
    assert rows[0].fetch_status == 200
    assert rows[1].fetch_status == -5003
    assert rows[1].annotation == "sourceQuota:novelCount"
    assert rows[1].disposition == "fail"
    byc = {r.canonical: r for r in eng_log.collect()}
    assert byc["http://h1.example/p3"].fetch_status == 200


def test_source_quota_dup_by_hash_lane(spark, tmp_path):
    """dupByHashCount: identical payloads after the first are dupByHash in
    the source's histotable (CrawledBytesHistotable.java:60-62); the quota
    binds on the dup lane, not the novel one."""
    # identical leaf payloads (the digest is over the WHOLE span payload,
    # so the leaves must carry no distinguishing links)
    web = {
        "http://h0.example/idx": [("text", "index", None, 0)]
        + [("link", f"l{j}", f"/p{j}", j + 1) for j in range(5)]
    }
    for j in range(5):
        web[f"http://h0.example/p{j}"] = [("text", "SAME-PAYLOAD", None, 0)]
    kw = dict(
        source_tag_seeds=True,
        source_quotas=(("http://h0.example/idx", (("dupByHashCount", 2),)),),
        k_per_host=1,
    )
    seeds = ["http://h0.example/idx"]
    sim_log, eng, eng_log = _run_pair(spark, tmp_path, "dupq", web, seeds, kw)
    rows = sorted(eng_log.collect(), key=lambda r: r.ordinal)
    # idx + p0 novel; p1, p2 dupByHash (count hits 2); p3, p4 blocked
    assert [r.fetch_status for r in rows] == [200, 200, 200, 200, -5003, -5003]
    assert rows[4].annotation == "sourceQuota:dupByHashCount"


def test_standard_quota_wins_overlap(spark, tmp_path):
    """When the standard QuotaEnforcer (force_retire default) and a host
    quota both bind, the standard enforcer ran first: the row requeues
    (blocked) without the contrib annotation."""
    web = _chain_web("h0.example", 5)
    kw = dict(
        quotas=(("hostMaxFetchSuccesses", 2),),
        host_quotas=(("h0.example", False, (("fetchSuccesses", 2),)),),
        k_per_host=1,
    )
    seeds = ["http://h0.example/p0"]
    sim_log, eng, eng_log = _run_pair(spark, tmp_path, "overlap", web, seeds, kw)
    assert not [
        r for r in eng_log.collect() if (r.annotation or "").startswith("hostQuota")
    ]


def test_contrib_quota_off_is_plan_neutral(spark, tmp_path):
    """Default config: no contrib columns, no stats tables written."""
    web = _chain_web("h0.example", 3)
    sim_log, eng, eng_log = _run_pair(
        spark, tmp_path, "off", web, ["http://h0.example/p0"], dict(k_per_host=1)
    )
    assert not eng.source_t.exists()
    assert not eng.quota_t.exists()
