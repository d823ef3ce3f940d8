"""CookieStore laws (AbstractCookieStore / BdbCookieStore).

Ports the law assertions of the reference's CookieStoreTest
(engine/src/test/java/org/archive/modules/fetcher/CookieStoreTest.java:
104-266 — there the oracle is Apache's BasicCookieStore; here the
documented end-states ARE the assertions), plus the hostSubset /
cookieStoreFor parent-domain composition (BdbCookieStore.java:156-190)
and the Netscape cookies.txt round-trip (AbstractCookieStore.java:
122-199). Engine wiring (cookies="obey") is covered by
test_cookie_crawl_parity at the bottom.
"""

from __future__ import annotations

from heritrix3_spark.operators.cookies import (
    MAX_COOKIES_FOR_DOMAIN,
    Cookie,
    CookieStore,
    parse_set_cookie,
)


# -- CookieStoreTest.testBasics / testSimpleReplace -------------------------
def test_basics_and_simple_replace():
    s = CookieStore()
    assert s.add(Cookie("name1", "value1"))
    assert len(s) == 1
    # same key replaces (BasicCookieStore equivalence law)
    s.add(Cookie("name1", "value2"))
    assert len(s) == 1
    assert s.cookies()[0].value == "value2"


# -- CookieStoreTest.testDomains --------------------------------------------
def test_domains_replace_and_case():
    s = CookieStore()
    s.add(Cookie("name1", "value1", domain="example.org"))
    s.add(Cookie("name1", "value2", domain="example.com"))
    s.add(Cookie("name1", "value3", domain="foo.example.com"))
    assert len(s) == 3  # same name, three domains
    # replace 1st by domain
    s.add(Cookie("name1", "value4", domain="example.org"))
    assert len(s) == 3
    # replace 2nd: domain matching is case-insensitive (normalizeHost)
    s.add(Cookie("name1", "value5", domain="eXaMpLe.CoM"))
    assert len(s) == 3
    by_dom = {c.key(): c.value for c in s.cookies()}
    assert by_dom["example.org;name1;/"] == "value4"
    assert by_dom["example.com;name1;/"] == "value5"
    assert by_dom["foo.example.com;name1;/"] == "value3"


# -- CookieStoreTest.testPaths -----------------------------------------------
def test_paths_identity():
    s = CookieStore()
    s.add(Cookie("name1", "value1"))
    # explicit "/" is the SAME identity as no path (sortableKey default)
    s.add(Cookie("name1", "value2", path="/"))
    assert len(s) == 1
    assert s.cookies()[0].value == "value2"
    s.add(Cookie("name1", "value3", path="/path1"))
    assert len(s) == 2
    s.add(Cookie("name1", "value4", path="/path2"))
    assert len(s) == 3
    # replace at existing path
    s.add(Cookie("name1", "value5", path="/path1"))
    assert len(s) == 3
    # new name at a previously-used path
    s.add(Cookie("name2", "value6", path="/path1"))
    assert len(s) == 4


# -- CookieStoreTest.testMaxCookieDomain -------------------------------------
def test_max_cookies_for_domain():
    s = CookieStore()
    for i in range(1, MAX_COOKIES_FOR_DOMAIN + 1):
        assert s.add(Cookie(f"name{i}", f"value{i}"))
        assert len(s) == i
    assert not s.add(Cookie("nametoomany1", "v"))
    assert len(s) == MAX_COOKIES_FOR_DOMAIN
    assert not s.add(Cookie("nametoomany2", "v"))
    assert len(s) == MAX_COOKIES_FOR_DOMAIN
    # replacement of an EXISTING key still works at the cap
    assert s.add(Cookie("name1", "replaced"))
    assert len(s) == MAX_COOKIES_FOR_DOMAIN
    # the cap is per-domain: another domain still accepts
    assert s.add(Cookie("other", "v", domain="elsewhere.example"))


# -- BdbCookieStore.cookieStoreFor (HER-2070 parent-domain composite) --------
def test_cookies_for_host_includes_parent_domains():
    s = CookieStore()
    s.add(Cookie("sess", "1", domain="example.com"))
    s.add(Cookie("sub", "2", domain="foo.example.com"))
    s.add(Cookie("other", "3", domain="unrelated.org"))
    got = {c.name for c in s.cookies_for_host("foo.example.com")}
    assert got == {"sess", "sub"}
    assert {c.name for c in s.cookies_for_host("example.com")} == {"sess"}
    # sibling subdomain sees only the parent's cookie
    assert {c.name for c in s.cookies_for_host("bar.example.com")} == {"sess"}


def test_request_cookies_path_and_secure():
    s = CookieStore()
    s.add(Cookie("a", "1", domain="h.example", path="/dir/"))
    s.add(Cookie("b", "2", domain="h.example", path="/dir"))
    s.add(Cookie("c", "3", domain="h.example", path="/other"))
    s.add(Cookie("d", "4", domain="h.example", secure=True))
    names = lambda path, sec=False: {  # noqa: E731
        c.name for c in s.request_cookies("h.example", path, secure=sec)
    }
    assert names("/dir/page") == {"a", "b"}
    assert names("/dir") == {"b"}
    assert names("/dirx") == set()  # prefix must end at a boundary
    assert names("/", sec=True) == {"d"}
    assert names("/") == set()


# -- cookies.txt round-trip ---------------------------------------------------
def test_cookies_txt_round_trip():
    s = CookieStore()
    s.add(Cookie("details-visit", "texts-cralond", domain="www.archive.org",
                 path="/", expiry_s=1311699995))
    s.add(Cookie("sess", "xyz", domain="h.example", path="/p", secure=True))
    txt = s.save_txt()
    # the reference's documented example shape: 7 tab-separated fields
    line = [l for l in txt.splitlines() if l.startswith("www.archive.org")][0]
    assert line.split("\t") == [
        "www.archive.org", "TRUE", "/", "FALSE", "1311699995",
        "details-visit", "texts-cralond",
    ]
    s2 = CookieStore()
    assert s2.load_txt(txt) == 2
    assert [c.key() for c in s2.cookies()] == [c.key() for c in s.cookies()]
    assert [c.value for c in s2.cookies()] == [c.value for c in s.cookies()]


def test_parse_set_cookie():
    c = parse_set_cookie("sess=abc; Path=/p; Secure", "h.example")
    assert (c.name, c.value, c.domain, c.path, c.secure) == (
        "sess", "abc", "h.example", "/p", True)
    c2 = parse_set_cookie("k=v; Domain=.example.com; Max-Age=60", "h.example.com",
                          now_s=100)
    assert c2.key().startswith("example.com;")  # leading dot normalized
    assert c2.expiry_s == 160
    assert parse_set_cookie("garbage", "h.example") is None


def test_clear_expired():
    s = CookieStore()
    s.add(Cookie("a", "1", domain="h", expiry_s=10))
    s.add(Cookie("b", "2", domain="h"))  # session cookie: never expires
    assert s.clear_expired(now_s=11) == 1
    assert [c.name for c in s.cookies()] == ["b"]


# ---------------------------------------------------------------------------
# engine-vs-simulator crawl parity: cookie zones + Set-Cookie application
# ---------------------------------------------------------------------------
def test_cookie_crawl_parity(spark, tmp_path):
    """A login page sets the session cookie; a zone-gated page fetched
    BEFORE the cookie lands answers 403, one fetched after answers 200;
    cookies_txt bootstraps a second zone's cookie. Exact parity."""
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    web = {
        # seed: /private discovered BEFORE /login; /vip gated by the
        # bootstrap cookie; /login's page links the second private page
        "http://h.example/a": [
            ("text", "seed", None, 0),
            ("link", "p", "/private/one", 1),
            ("link", "l", "/login", 2),
            ("link", "v", "/vip/page", 3),
        ],
        "http://h.example/login": [
            ("text", "login ok", None, 0),
            ("set-cookie", "sess=ok; Path=/", None, 1),
            ("link", "p2", "/private/two", 2),
        ],
        "http://h.example/private/one": [("text", "secret1", None, 0)],
        "http://h.example/private/two": [("text", "secret2", None, 0)],
        "http://h.example/vip/page": [("text", "vip", None, 0)],
    }
    cookies_txt = "h.example\tTRUE\t/\tFALSE\t-1\tboot\t1\n"
    kw = dict(
        cookies="obey",
        cookie_zones=(
            ("h.example", "/private", "sess"),
            ("h.example", "/vip", "boot"),
        ),
        cookies_txt=cookies_txt,
        k_per_host=1,
    )
    seeds = ["http://h.example/a"]
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "cookies"),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {r.canonical: r.fetch_status for r in eng_log.collect()}
    # discovered before the cookie landed -> 403 (and never refetched)
    assert by["http://h.example/private/one"] == 403
    # discovered on the login page, fetched after round-end application
    assert by["http://h.example/private/two"] == 200
    # bootstrap cookies_txt granted the /vip zone from the start
    assert by["http://h.example/vip/page"] == 200
    assert by["http://h.example/login"] == 200


def test_cookie_cap_crawl_parity(spark, tmp_path):
    """The 50-cookies/domain cap holds in the ENGINE's distributed cookie
    table (round-5 verdict #2; BdbCookieStore.java:52,288-304): a login
    page sets 50 cookies then the zone cookie as the 51st — the 51st is
    dropped in serial add order, so the zoned page stays 403 forever; a
    later replacement of an existing key still applies, but a later NEW
    key on the full domain is dropped. Exact engine-vs-simulator parity
    plus a direct check of the engine's committed cookie-table keys."""
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    fill = [(f"c{i:02d}", f"v{i}") for i in range(MAX_COOKIES_FOR_DOMAIN)]
    login_spans = [("text", "login", None, 0)] + [
        ("set-cookie", f"{n}={v}; Path=/", None, i + 1)
        for i, (n, v) in enumerate(fill)
    ]
    k = len(login_spans)
    login_spans += [
        # 51st NEW key in span order: dropped by the cap
        ("set-cookie", "sess=ok; Path=/", None, k),
        ("link", "p", "/private/two", k + 1),
        ("link", "o", "/open/page", k + 2),
        ("link", "m", "/more", k + 3),
    ]
    web = {
        "http://h.example/a": [
            ("text", "seed", None, 0),
            ("link", "p", "/private/one", 1),
            ("link", "l", "/login", 2),
        ],
        "http://h.example/login": login_spans,
        "http://h.example/more": [
            ("text", "more", None, 0),
            # replacement of an existing key on the full domain: applies
            ("set-cookie", "c00=changed; Path=/", None, 1),
            # NEW key on the full domain in a later round: dropped
            ("set-cookie", "late=x; Path=/", None, 2),
        ],
        "http://h.example/private/one": [("text", "s1", None, 0)],
        "http://h.example/private/two": [("text", "s2", None, 0)],
        "http://h.example/open/page": [("text", "open", None, 0)],
    }
    kw = dict(
        cookies="obey",
        cookie_zones=(
            ("h.example", "/private", "sess"),
            ("h.example", "/open", "c07"),
        ),
        k_per_host=1,
    )
    seeds = ["http://h.example/a"]
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "cookiecap"),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {r.canonical: r.fetch_status for r in eng_log.collect()}
    # "sess" was the 51st add: both gated pages stay 403 forever
    assert by["http://h.example/private/one"] == 403
    assert by["http://h.example/private/two"] == 403
    # "c07" was within the cap: its zone opens after the login round
    assert by["http://h.example/open/page"] == 200
    # the engine's committed table holds exactly the capped key set
    rows = {
        (r.key, r.value)
        for r in eng.cookie_t.read(spark).select("key", "value").collect()
    }
    expect = {
        (f"h.example;{n};/", v if n != "c00" else "changed")
        for n, v in fill
    }
    assert rows == expect
