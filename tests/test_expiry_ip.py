"""DNS/robots expiry + the CrawlHost IP model and IP queue policies.

Laws: PreconditionEnforcer.isIpExpired (engine/.../prefetch/
PreconditionEnforcer.java:60, 327-360), CrawlServer.isRobotsExpired
(modules/.../net/CrawlServer.java:300-315), prerequisite forceFetch
(CrawlURI.markPrerequisite :1717-1734), IPQueueAssignmentPolicy.java:45-53,
BucketQueueAssignmentPolicy.java:43-63 (all three branches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.functions import surt as SU
from heritrix3_spark.simulator import SimConfig, simulate


def _logs(sim_log, eng_log):
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in eng_log.collect()
    )
    return srows, erows


def test_robots_expiry_parity(spark, tmp_path):
    """A short robots validity forces /robots.txt refetches: the stale
    entry re-defers its trigger and the prerequisite re-enters via
    forceFetch even though its fp is in url_seen. Exact engine-vs-simulator
    parity, and the log must contain >1 robots.txt fetch per server."""
    h, p = 2, 4
    web = {u: s for u, s in FX.synth_web_rows(h, p, robots=True)}
    seeds = FX.seed_lines(h)
    cfg_kw = dict(robots="obey", robots_validity_duration_s=9)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**cfg_kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "rbexp"),
        FX.synth_web_df(spark, h, p, robots=True),
        CrawlConfig(num_buckets=8, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    srows, erows = _logs(sim_log, eng_log)
    assert erows == srows
    robots_fetches = [r for r in erows if r[2].endswith("/robots.txt")]
    servers = {r[2] for r in robots_fetches}
    assert len(robots_fetches) > len(servers), "expiry must force refetches"
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


def test_dns_expiry_parity(spark, tmp_path):
    """ipValidityDurationSeconds: expired dns entries re-defer and re-issue
    forced dns: prerequisites; exact parity."""
    h, p = 2, 3
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    cfg_kw = dict(dns="obey", ip_validity_duration_s=8)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**cfg_kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "dnsexp"),
        FX.synth_web_df(spark, h, p),
        CrawlConfig(num_buckets=8, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    srows, erows = _logs(sim_log, eng_log)
    assert erows == srows
    dns_fetches = [r for r in erows if r[2].startswith("dns:")]
    hosts = {r[2] for r in dns_fetches}
    assert len(dns_fetches) > len(hosts), "expiry must force dns refetches"
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


def test_dns_table_carries_ip_model(spark, tmp_path):
    """The dns table stores the deterministic CrawlHost IP + resolution
    clock (CrawlHost.setIP analog)."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "ipmodel"),
        FX.synth_web_df(spark, 2, 3),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, dns="obey"),
    )
    eng.bootstrap(FX.seed_lines(2))
    for _ in range(4):
        if not eng.run_round():
            break
    rows = {r.host: (r.ip, r.resolved_at) for r in eng.dns_t.read(spark).collect()}
    assert set(rows) == {"h0.example", "h1.example"}
    for host, (ip, at) in rows.items():
        assert ip == SU.synthetic_ip(host)
        assert at >= 0


def test_ip_queue_assignment_policy(spark):
    """IP when resolved, hostname-policy fallback when not."""
    df = spark.createDataFrame(
        [
            ("http://a.example/x", "10.1.2.3"),
            ("https://b.example/y", None),
        ],
        ["uri", "ip"],
    )
    got = [
        r[0]
        for r in df.select(SU.ip_class_key_col(F.col("uri"), F.col("ip"))).collect()
    ]
    assert got == ["10.1.2.3", "b.example#443"]


def test_bucket_ip_branches(spark):
    """All three BucketQueueAssignmentPolicy branches, with the IP branch
    matching Java's abs(Inet4Address.hashCode) % 1021 law."""
    df = spark.createDataFrame(
        [
            ("http:///nohost", None),
            ("http://x.example/a", None),
            ("http://y.example/b", "10.1.2.3"),
        ],
        ["uri", "ip"],
    )
    got = [
        r[0]
        for r in df.select(
            SU.bucket_ip_class_key_col(F.col("uri"), F.col("ip"))
        ).collect()
    ]
    assert got[0] == "NO-HOST"
    h = abs(SU.java_string_hashcode("x.example")) & 1023
    assert got[1] == f"NO-IP-{h}"
    ip_int = (10 << 24) | (1 << 16) | (2 << 8) | 3
    assert got[2] == str(abs(ip_int) % 1021)


def test_synthetic_ip_column_matches_scalar(spark):
    hosts = [f"h{i}.example" for i in range(20)] + ["x.co.uk", "a.b.c.d.e"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = [r[0] for r in df.select(SU.synthetic_ip_col(F.col("host"))).collect()]
    assert got == [SU.synthetic_ip(h) for h in hosts]
    for ip in got:
        parts = ip.split(".")
        assert parts[0] == "10" and all(0 <= int(x) <= 255 for x in parts[1:])
