"""FetchWhois analog: pure-law golden vectors + crawl parity.

Reference: modules/src/main/java/org/archive/modules/fetcher/FetchWhois.java
(WHOIS_SERVER_REGEX :139-146, specialQueryTemplates :160-166,
deferOrFinishGeneric :257-304, makeWhoisUrl :306-321, fetch :323-378,
getWhoisQuery/getWhoisServer :382-411, addWhoisLinks :427-460).
"""

from __future__ import annotations

from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.functions.canonicalize import canonicalize
from heritrix3_spark.functions.surt import synthetic_ip
from heritrix3_spark.operators import whois as W
from heritrix3_spark.simulator import SimConfig, simulate


# ---------------------------------------------------------------------------
# pure laws
# ---------------------------------------------------------------------------


def test_uri_parse_laws():
    # javadoc :61-96 + getWhoisServer/getWhoisQuery (:382-411)
    assert W.parse_whois_uri("whois:archive-it.org") == (
        None, None, "archive-it.org",
    )
    assert W.parse_whois_uri("whois://whois.pir.org/archive-it.org") == (
        "whois.pir.org", None, "archive-it.org",
    )
    assert W.parse_whois_uri("whois://rwhois.gblx.net:4321/1.2.3.4") == (
        "rwhois.gblx.net", 4321, "1.2.3.4",
    )
    # the wire query is the url-DECODED path (the verisign key law
    # depends on the space surviving)
    assert W.parse_whois_uri("whois://whois.arin.net/z+%2B+1.2.3.4") == (
        "whois.arin.net", None, "z + 1.2.3.4",
    )
    assert W.parse_whois_uri("http://h/") is None


def test_make_whois_url_templates():
    # specialQueryTemplates (:160-166) + URLEncoder (:316)
    assert (
        W.make_whois_url("whois.verisign-grs.com", "foo.net")
        == "whois://whois.verisign-grs.com/domain+foo.net"
    )
    assert (
        W.make_whois_url("whois.arin.net", "1.2.3.4")
        == "whois://whois.arin.net/z+%2B+1.2.3.4"
    )
    assert (
        W.make_whois_url("whois.denic.de", "foo.de")
        == "whois://whois.denic.de/-T+dn+foo.de"
    )
    assert (
        W.make_whois_url("whois.iana.org", "org")
        == "whois://whois.iana.org/org"
    )
    # custom template override
    assert (
        W.make_whois_url("w.example", "q", (("w.example", "ask %s now"),))
        == "whois://w.example/ask+q+now"
    )


def test_referral_line_vectors():
    """The comment block's observed-in-the-wild vectors (:139-145)."""
    vec = [
        ("ReferralServer: whois://whois.apnic.net", "whois.apnic.net"),
        ("ReferralServer: rwhois://rwhois.gblx.net:4321", "rwhois.gblx.net:4321"),
        ("ReferralServer: whois://whois.ripe.net:43", "whois.ripe.net:43"),
        ("Whois Server (port 43): whois.nic.fr", "whois.nic.fr"),
        ("whois:        whois.nic.fr", "whois.nic.fr"),
        ("   Whois Server: whois.fastdomain.com", "whois.fastdomain.com"),
    ]
    for line, want in vec:
        got = W.referral_from_body("q", line)
        assert got == ("q", want), (line, got)
    # the fixed false positive (:145) must NOT match
    assert W.referral_from_body("q", "WHOIS lookup made at 23:48:04 13-Jan-2011") is None
    # last matching line wins; key strips the template tokens
    assert W.referral_from_body(
        "domain foo.net",
        "whois: a.example\nnoise\nWhois Server: b.example\n",
    ) == ("foo.net", "b.example")
    assert W.referral_from_body("z + 1.2.3.4", "whois: w.example") == (
        "1.2.3.4", "w.example",
    )


def test_serverless_next_branches():
    # (a) full-key referral: RAW concat, no template, no encoding (:259)
    assert W.serverless_next(
        "foo.org", {"foo.org": "whois.reg.example"}, {}
    ) == ("mark", "whois://whois.reg.example/foo.org")
    # (b) IPv4 -> arin with its template
    assert W.serverless_next("1.2.3.4", {}, {}) == (
        "mark", "whois://whois.arin.net/z+%2B+1.2.3.4",
    )
    # (c) suffix referral -> makeWhoisUrl (template applies)
    assert W.serverless_next("foo.org", {"org": "whois.pir.org"}, {}) == (
        "mark", "whois://whois.pir.org/foo.org",
    )
    # (d) first visit to the iana suffix lookup
    assert W.serverless_next("foo.org", {}, {}) == (
        "mark", "whois://whois.iana.org/org",
    )
    # iana lookup already attempted and no referral -> no route (-62)
    assert W.serverless_next(
        "foo.org", {}, {"whois://whois.iana.org/org": W.DONE}
    ) == ("fail", None)
    assert W.serverless_next(
        "foo.org", {}, {"whois://whois.iana.org/org": W.IN_PROGRESS}
    ) == ("fail", None)
    # DONE tryThis -> finished (2002)
    assert W.serverless_next(
        "foo.org",
        {"org": "whois.pir.org"},
        {"whois://whois.pir.org/foo.org": W.DONE},
    ) == ("finished", "whois://whois.pir.org/foo.org")
    # IN_PROGRESS tryThis -> wait (bare re-defer, :296-299)
    assert W.serverless_next(
        "foo.org",
        {"org": "whois.pir.org"},
        {"whois://whois.pir.org/foo.org": W.IN_PROGRESS},
    ) == ("wait", "whois://whois.pir.org/foo.org")
    # no '.' in the query: the suffix is the whole query (:258)
    assert W.ultra_suffix("org") == "org"
    assert W.ultra_suffix("Foo.ORG") == "org"


def test_host_laws():
    assert W.is_valid_domain("www.h.org")
    assert W.is_valid_domain("under_score.example")
    assert not W.is_valid_domain("1.2.3.4")  # all-numeric final part
    assert not W.is_valid_domain("-bad.example")
    assert not W.is_valid_domain("bad-.example")
    assert not W.is_valid_domain("a..b")
    assert not W.is_valid_domain("a" * 254)
    assert W.topmost_assigned("www.foo.h.org") == "h.org"
    assert W.topmost_assigned("www.bbc.co.uk") == "bbc.co.uk"
    assert W.topmost_assigned("localhost") == "localhost"  # fallback (:453)
    # addWhoisLinks composition: IP first, then domain; literals keep IP
    assert W.whois_targets("www.h.org", None) == ["whois:h.org"]
    assert W.whois_targets("www.h.org", "9.8.7.6") == [
        "whois:9.8.7.6", "whois:h.org",
    ]
    assert W.whois_targets("1.2.3.4", W.host_ip("1.2.3.4", False)) == [
        "whois:1.2.3.4",
    ]
    assert W.host_ip("h.example", False) is None
    assert W.host_ip("h.example", True) == synthetic_ip("h.example")


# ---------------------------------------------------------------------------
# crawl parity
# ---------------------------------------------------------------------------

IANA_ORG = "whois://whois.iana.org/org"
PIR_HORG = "whois://whois.pir.org/h.org"

WEB = {
    "http://www.h.org/": [
        ("text", "front", None, 0),
        ("link", "a", "/p1", 1),
    ],
    "http://www.h.org/p1": [("text", "p1", None, 0)],
    # the iana suffix lookup answers with a referral (ExtractorHTTP-free
    # fetch law: referral scan over the recorded text)
    IANA_ORG: [("text", "refer:\nwhois:        whois.pir.org", None, 0)],
    # the registry answers with plain data (no referral -> walk ends)
    PIR_HORG: [("text", "Domain: h.org\nRegistrant: someone", None, 0)],
}


def _rows(sim_log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"], l["content_type"],
         l["content_length"])
        for l in sim_log
    )


def _erows(eng_log):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition, r.content_type, r.content_length)
        for r in eng_log.collect()
    )


def _engine(spark, tmp_path, web, name, **kw):
    return CrawlEngine(
        spark,
        str(tmp_path / name),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )


def test_whois_walk_parity(spark, tmp_path):
    """The full serverless referral walk: pages discover whois:h.org, the
    iana suffix lookup referral leads to the registry, and the generic uri
    finishes 2002 — exact engine/simulator parity with k=1 politeness (the
    serial regime, where the walk matches the reference step for step)."""
    kw = dict(whois="on", k_per_host=1)
    seeds = ["http://www.h.org/"]
    sim_log, sim_seen = simulate(WEB, seeds, SimConfig(**kw))
    eng = _engine(spark, tmp_path, WEB, "walk", **kw)
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _erows(eng_log) == _rows(sim_log)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {}
    for r in eng_log.collect():
        by.setdefault(r.canonical, []).append(r)
    # both whois servers answered 2001 text/plain with the body size
    (iana,) = by[IANA_ORG]
    assert iana.fetch_status == 2001
    assert iana.content_type == "text/plain"
    assert iana.content_length > 0
    (pir,) = by[PIR_HORG]
    assert pir.fetch_status == 2001
    # the generic uri deferred (mark iana, mark pir) then finished 2002
    states = [r.fetch_status for r in sorted(by["whois:h.org"], key=lambda r: r.round)]
    assert states == [-50, -50, 2002]
    assert by["whois:h.org"][0].content_type is None
    # pages discovered exactly one whois link (no IP: dns off, not literal)
    assert "whois:org" not in by


def test_whois_ip_and_dns_parity(spark, tmp_path):
    """dns=obey: every page adds whois:{resolved-ip} + whois:{domain}; the
    IP walks through arin's 'z + %s' template; whois rows themselves are
    exempt from the dns precondition (no dns:whois.arin.net prereq)."""
    ip = synthetic_ip("h2.example")
    arin_url = canonicalize(W.make_whois_url("whois.arin.net", ip))
    web = {
        "http://h2.example/": [("text", "x", None, 0)],
        # arin answers with a referral for the ip
        arin_url: [("text", "ReferralServer: whois://rwhois.gblx.net:4321", None, 0)],
        # the raw-concat referral target (full-key branch, :259)
        f"whois://rwhois.gblx.net:4321/{ip}": [("text", "netblock data", None, 0)],
        # the domain walk: iana has no referral for 'example' -> -62
        "whois://whois.iana.org/example": [("text", "no match", None, 0)],
    }
    kw = dict(whois="on", dns="obey", k_per_host=1)
    seeds = ["http://h2.example/"]
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
    eng = _engine(spark, tmp_path, web, "ip", **kw)
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    assert _erows(eng_log) == _rows(sim_log)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {}
    for r in eng_log.collect():
        by.setdefault(r.canonical, []).append(r)
    # the ip walk finished 2002; the domain walk found no route (-62 fail)
    ip_states = [r.fetch_status for r in sorted(by[f"whois:{ip}"], key=lambda r: r.round)]
    assert ip_states[-1] == 2002
    dom = sorted(by["whois:h2.example"], key=lambda r: r.round)
    assert dom[-1].fetch_status == -62
    assert dom[-1].disposition == "fail"
    # whois fetches never triggered dns prerequisites for whois servers
    assert not [c for c in by if c.startswith("dns:whois")]
    assert not [c for c in by if c.startswith("dns:rwhois")]


def test_whois_connect_failure_marks_done(spark, tmp_path):
    """A whois server with no recorded response is a -2 connect failure
    that RETRIES (needsReenqueuing) — and the finally still marks the url
    DONE, so the generic uri ends -62 (no route) instead of looping.
    Truncated-crawl parity (the -2 row would retry for 30 attempts)."""
    web = {
        "http://h3.example/": [("text", "x", None, 0)],
        # no whois://whois.iana.org/example doc -> connect failure
    }
    kw = dict(whois="on", k_per_host=2)
    seeds = ["http://h3.example/"]
    sim_log, _ = simulate(web, seeds, SimConfig(max_rounds=8, **kw))
    eng = _engine(spark, tmp_path, web, "cfail", **kw)
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=8)
    assert _erows(eng_log) == _rows(sim_log)
    by = {}
    for r in eng_log.collect():
        by.setdefault(r.canonical, []).append(r)
    iana = sorted(
        by["whois://whois.iana.org/example"], key=lambda r: r.round
    )
    assert {r.fetch_status for r in iana} == {-2}
    assert {r.disposition for r in iana} == {"retry"}
    # DONE was marked by the failed fetch: the generic uri's next retry
    # found no route (-62 fail) instead of re-marking forever
    dom = sorted(by["whois:h3.example"], key=lambda r: r.round)
    assert dom[-1].fetch_status == -62
    assert dom[-1].disposition == "fail"
