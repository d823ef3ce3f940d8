"""HTTP auth (RFC2617) crawl parity: the HttpAuthSelfTest analog.

Reference: engine/src/test/java/org/archive/crawler/selftest/
HttpAuthSelfTest.java (Jetty basic-auth constraint on /basic/* with realm
"Hyrule"; EXPECTED = every page incl. the protected ones),
FetchHTTP.handle401 / promoteCredentials (FetchHTTP.java:766-887),
AbstractFrontier.needsReenqueuing 401 branch (AbstractFrontier.java:
1093-1126). Laws in operators/auth.py; engine vs independent simulator.
"""

from __future__ import annotations

import pytest

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

H, P = 2, 6

#: the selftest analog: every page on h0.example under /p is protected by
#: basic auth realm "Hyrule" for (Mr. Happy Pants, xyzzy)
ZONES = (("h0.example", "/p", "Hyrule", "Mr. Happy Pants", "xyzzy"),)
CREDS_GOOD = (("h0.example", "Hyrule", "Mr. Happy Pants", "xyzzy"),)
CREDS_BAD = (("h0.example", "Hyrule", "Mr. Happy Pants", "wrong"),)


def _sim_rows(log):
    return sorted(
        (
            l["round"], l["class_key"], l["canonical"], l["ordinal"],
            l["fetch_status"], l["disposition"],
        )
        for l in log
    )


def _eng_rows(log_df):
    return sorted(
        (
            r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
            r.disposition,
        )
        for r in log_df.collect()
    )


def _run_pair(spark, tmp_path, name, sim_cfg, eng_cfg, k=1):
    web = {u: s for u, s in FX.synth_web_rows(H, P)}
    seeds = FX.seed_lines(H)
    sim_log, _ = simulate(web, seeds, sim_cfg)
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        FX.synth_web_df(spark, H, P),
        eng_cfg,
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    return sim_log, eng_log


def test_auth_crawl_parity_with_creds(spark, tmp_path):
    """401 -> attach -> retry succeeds -> promote; every protected page is
    eventually crawled (the HttpAuthSelfTest EXPECTED-set law) and the
    engine matches the simulator row-exactly."""
    sim_log, eng_log = _run_pair(
        spark, tmp_path, "good",
        SimConfig(auth_zones=ZONES, credentials=CREDS_GOOD),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            auth_zones=ZONES, credentials=CREDS_GOOD,
        ),
    )
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    succ = {l["canonical"] for l in sim_log if l["disposition"] == "success"
            and 200 <= l["fetch_status"] < 300}
    # every protected h0 page is crawled in the end
    assert {f"http://h0.example/p{j}" for j in range(P)} <= succ
    # and the first visit of a protected page really went through a 401 retry
    retries = [l for l in sim_log
               if l["fetch_status"] == 401 and l["disposition"] == "retry"]
    assert retries and all(
        l["canonical"].startswith("http://h0.example/") for l in retries
    )


def test_auth_no_creds_terminal_401(spark, tmp_path):
    """Without store credentials a 401 is terminal: isSuccess()==true with
    no loaded creds (CrawlURI.java:868-876), so the page disposes like a
    404 — one 401 row, never retried, no outlinks followed."""
    sim_log, eng_log = _run_pair(
        spark, tmp_path, "none",
        SimConfig(auth_zones=ZONES),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            auth_zones=ZONES,
        ),
    )
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    by_canon = {}
    for l in sim_log:
        by_canon.setdefault(l["canonical"], []).append(l)
    # the h0 seed answers one terminal 401; its outlinks are never seen,
    # so no other h0 page enters the crawl
    rows = by_canon["http://h0.example/p0"]
    assert [(r["fetch_status"], r["disposition"]) for r in rows] == [
        (401, "success")
    ]
    assert not any(
        c.startswith("http://h0.example/p") and c != "http://h0.example/p0"
        for c in by_canon
    )
    assert all(
        r["disposition"] == "success" and r["fetch_status"] == 200
        for r in by_canon["http://h1.example/p0"]
    )


def test_auth_wrong_password_tried_and_failed(spark, tmp_path):
    """A store credential with a wrong password attaches and retries once,
    still gets 401, detaches and dies a natural 401 death (handle401's
    already-tried branch) — exactly one retry, then a terminal 401
    disposed as success (the detached CrawlURI.isSuccess law)."""
    sim_log, eng_log = _run_pair(
        spark, tmp_path, "bad",
        SimConfig(auth_zones=ZONES, credentials=CREDS_BAD),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            auth_zones=ZONES, credentials=CREDS_BAD,
        ),
    )
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    seed_rows = sorted(
        (l["round"], l["fetch_status"], l["disposition"])
        for l in sim_log
        if l["canonical"] == "http://h0.example/p0"
    )
    assert [r[1:] for r in seed_rows] == [(401, "retry"), (401, "success")]


def test_auth_intra_round_promotion(spark, tmp_path):
    """k>1: once an attached retry earlier in a queue's round batch
    succeeds, a FRESH URI later in the SAME batch rides the just-promoted
    server credential (the batch analog of serial promote-then-fetch-next;
    engine = insert-key-ordered window, simulator = serial loop)."""
    # staggered discovery puts h0/p5 (fresh) in the same round batch as
    # h0/p0's attached retry: a(r0) -> {h0/p0, b}; b(r1) -> h0/p5
    web = {
        "http://h1.example/a": [
            ("text", "x", None, 0),
            ("link", "l0", "http://h0.example/p0", 1),
            ("link", "l1", "/b", 2),
        ],
        "http://h1.example/b": [("link", "l2", "http://h0.example/p5", 0)],
        "http://h0.example/p0": [("text", "w", None, 0)],
        "http://h0.example/p5": [("text", "w", None, 0)],
    }
    # h0 must be in scope: seed it on an unprotected path (404s harmlessly)
    seeds = ["http://h1.example/a", "http://h0.example/ok"]
    sim_log, _ = simulate(
        web, seeds, SimConfig(auth_zones=ZONES, credentials=CREDS_GOOD, k_per_host=3)
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "intra"),
        spark.createDataFrame(list(web.items()), FX.DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, k_per_host=3,
            auth_zones=ZONES, credentials=CREDS_GOOD,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    # p0: 401-retry then 200; p5: a single direct 200 — never a 401,
    # because p0's in-batch promotion covers it
    p0 = sorted((l["fetch_status"], l["disposition"]) for l in sim_log
                if l["canonical"] == "http://h0.example/p0")
    p5 = [(l["fetch_status"], l["disposition"]) for l in sim_log
          if l["canonical"] == "http://h0.example/p5"]
    assert p0 == [(200, "success"), (401, "retry")]
    assert p5 == [(200, "success")]


@pytest.mark.parametrize("robots", ["ignore", "obey"])
def test_auth_with_robots_gate(spark, tmp_path, robots):
    """Auth composed with the robots/DNS precondition gates: the protected
    server's robots.txt itself 401s (non-2xx -> NO_ROBOTS allow-all), then
    retries with creds; parity holds throughout."""
    zones_all = (("h0.example", "/", "Hyrule", "Mr. Happy Pants", "xyzzy"),)
    web = {u: s for u, s in FX.synth_web_rows(H, 4, robots=True)}
    seeds = FX.seed_lines(H)
    sim_cfg = SimConfig(auth_zones=zones_all, credentials=CREDS_GOOD, robots=robots)
    sim_log, _ = simulate(web, seeds, sim_cfg)
    eng = CrawlEngine(
        spark,
        str(tmp_path / f"robots_{robots}"),
        FX.synth_web_df(spark, H, 4, robots=True),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            auth_zones=zones_all, credentials=CREDS_GOOD, robots=robots,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)


# -- HtmlFormCredential (FormAuthSelfTest analog) ---------------------------
FORM_CREDS = (("h0.example", "http://h0.example/login"),)


def _form_web(login_host="h0"):
    """h0 pages guarded by a form credential; the login page links onward
    (the FormAuthSelfTest success.html shape)."""
    web = {u: s for u, s in FX.synth_web_rows(H, 3)}
    web[f"http://{login_host}.example/login"] = [
        ("text", "login form", None, 0),
        ("link", "success", "http://h0.example/success", 1),
    ]
    web["http://h0.example/success"] = [("text", "you are in", None, 0)]
    return web


def test_form_auth_crawl_parity(spark, tmp_path):
    """credentialPrecondition: guarded pages defer behind the login-URI
    prerequisite; the login fetch authenticates the domain; everything then
    crawls — engine matches simulator row-exactly, and the login is fetched
    before any guarded page."""
    web = _form_web()
    seeds = FX.seed_lines(H)
    sim_log, _ = simulate(web, seeds, SimConfig(form_credentials=FORM_CREDS))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "form"),
        spark.createDataFrame(list(web.items()), FX.DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            form_credentials=FORM_CREDS,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    h0 = [l for l in sim_log if "h0.example" in l["canonical"]]
    login_round = min(
        l["round"] for l in h0
        if l["canonical"].endswith("/login") and l["disposition"] == "success"
    )
    first_page = min(
        l["round"] for l in h0
        if not l["canonical"].endswith("/login") and l["disposition"] == "success"
    )
    assert login_round < first_page
    # the guarded seed deferred at least once, and the FormAuthSelfTest
    # EXPECTED-set law: login + success + all guarded pages crawled
    assert any(
        l["fetch_status"] == -50 and l["canonical"] == "http://h0.example/p0"
        for l in sim_log
    )
    succ = {l["canonical"] for l in sim_log if l["disposition"] == "success"}
    assert {
        "http://h0.example/login", "http://h0.example/success",
        "http://h0.example/p0", "http://h0.example/p1", "http://h0.example/p2",
    } <= succ


def test_form_auth_cross_domain_login(spark, tmp_path):
    """The login URI may live on ANOTHER host ("such as yahoo" —
    PreconditionEnforcer.java:393-396): promotion keys by the credential
    DOMAIN, and the prerequisite-accepts rule admits the out-of-scope
    login host."""
    creds = (("h0.example", "http://auth.other/login"),)
    web = {u: s for u, s in FX.synth_web_rows(H, 3)}
    web["http://auth.other/login"] = [("text", "sso", None, 0)]
    seeds = FX.seed_lines(H)
    sim_log, _ = simulate(web, seeds, SimConfig(form_credentials=creds))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "xdom"),
        spark.createDataFrame(list(web.items()), FX.DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            form_credentials=creds,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    succ = {l["canonical"] for l in sim_log if l["disposition"] == "success"}
    assert "http://auth.other/login" in succ  # out-of-scope host, prereq-accepted
    assert "http://h0.example/p0" in succ


def test_form_auth_failed_login_keeps_deferring(spark, tmp_path):
    """A login URI that never succeeds (404) keeps the guarded pages
    deferring — truncated-run parity (both sides stopped at 5 rounds)."""
    creds = (("h0.example", "http://h0.example/nologin"),)
    web = {u: s for u, s in FX.synth_web_rows(H, 2)}
    seeds = FX.seed_lines(H)
    sim_log, _ = simulate(
        web, seeds, SimConfig(form_credentials=creds, max_rounds=5)
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "badlogin"),
        FX.synth_web_df(spark, H, 2),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            form_credentials=creds,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=5)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    h0_rows = [l for l in sim_log if l["canonical"] == "http://h0.example/p0"]
    assert all(l["fetch_status"] == -50 and l["disposition"] == "retry" for l in h0_rows)
    assert any(
        l["canonical"] == "http://h0.example/nologin" and l["fetch_status"] == 404
        for l in sim_log
    )
