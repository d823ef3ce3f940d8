"""robots.txt law (RobotstxtTest + RobotsDirectives floor-law port)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark.operators.robots import (
    Robotstxt,
    robots_allow_udf,
    robots_crawl_delay_udf,
)
from heritrix3_spark.vectors import ROBOTS_VECTORS


@pytest.mark.parametrize("server,body,ua,path,allow,delay", ROBOTS_VECTORS)
def test_scalar_law(server, body, ua, path, allow, delay):
    r = Robotstxt(body)
    assert r.allows(ua, path) == allow, (server, path)
    assert r.crawl_delay(ua) == delay, server


def test_group_sharing_and_order():
    """Multiple User-agent lines before directives share one group; first
    declared named UA match wins (Robotstxt.java:230-256)."""
    body = "User-agent: alpha\nUser-agent: beta\nDisallow: /x\nUser-agent: gamma\nDisallow: /y\n"
    r = Robotstxt(body)
    assert not r.allows("i am beta", "/x/1")
    assert r.allows("i am beta", "/y/1")
    assert not r.allows("gamma bot", "/y/1")
    # 'alpha' declared before 'gamma': a UA matching both takes alpha's group
    assert r.allows("alpha gamma", "/y/1")
    assert not r.allows("alpha gamma", "/x/1")


def test_truncation_drops_partial_line():
    body = "User-agent: *\nDisallow: /blocked\n" + "#pad\n" * 200_000 + "Disallow: /tail"
    r = Robotstxt(body)
    assert not r.allows("any", "/blocked/x")
    assert r.allows("any", "/tail/x")  # truncated partial line ignored


def test_html_markup_and_comments_stripped():
    body = "User-agent: *  # main group\nDisallow: <b>/secret</b>\n"
    r = Robotstxt(body)
    assert not r.allows("any", "/secret/page")


def test_udf_parity(spark):
    df = spark.createDataFrame(
        [(b, u, p) for _, b, u, p, _, _ in ROBOTS_VECTORS], ["body", "ua", "path"]
    )
    got = df.select(
        "body",
        "ua",
        "path",
        robots_allow_udf(F.col("body"), F.col("ua"), F.col("path")).alias("allow"),
        robots_crawl_delay_udf(F.col("body"), F.col("ua")).alias("delay"),
    ).collect()
    expected = {(v[1], v[2], v[3]): (v[4], v[5]) for v in ROBOTS_VECTORS}
    for r in got:
        want_allow, want_delay = expected[(r.body, r.ua, r.path)]
        assert r.allow == want_allow, (r.ua, r.path)
        assert abs(r.delay - want_delay) < 1e-6


# ===========================================================================
# Named RobotstxtTest ports (modules/src/test/java/org/archive/modules/net/
# RobotstxtTest.java:32-256) — each test mirrors one reference method.
# ===========================================================================
_SAMPLE_ROBOTS_1 = (
    "User-agent: *\n"
    "Disallow: /cgi-bin/\n"
    "Disallow: /details/software\n"
    "\n"
    "User-agent: denybot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: allowbot1\n"
    "Disallow: \n"
    "\n"
    "User-agent: allowbot2\n"
    "Disallow: /foo\n"
    "Disallow: /ok?butno\n"
    "Allow: /\n"
    "\n"
    "User-agent: delaybot\n"
    "Disallow: /\n"
    "Crawl-Delay: 20\n"
    "Allow: /images/\n"
)
_WHITESPACE_FLAWED = (
    "  User-agent: *\n"
    " Disallow: /cgi-bin/\n"
    "  Disallow: /details/software\n"
    " User-agent: denybot\n"
    " Disallow: /\n"
    "  User-agent: allowbot1\n"
    "  Disallow: \n"
    " User-agent: allowbot2\n"
    " Disallow: /foo\n"
    " Disallow: /ok?butno\n"
    " Allow: /\n"
    " User-agent: delaybot\n"
    "  Disallow: /\n"
    " Crawl-Delay: 20\n"
    " Allow: /images/\n"
)


def test_parse_robots():
    """RobotstxtTest.testParseRobots: named-agent bookkeeping."""
    r = Robotstxt("BLAH")
    assert r.named_uas == []
    agent = "archive.org_bot"
    r = Robotstxt(f"User-agent: {agent}\nDisallow: /cgi-bin/\n"
                  "Disallow: /details/software\n")
    assert r.named_uas == [agent]
    assert len(r.agents) == 1
    r = Robotstxt("User-agent: *\nDisallow: /cgi-bin/\n"
                  "Disallow: /details/software\n")
    assert r.named_uas == []
    assert len(r.agents) == 0


def _eval_robots(r: Robotstxt):
    """RobotstxtTest.evalRobots — the shared assertion matrix."""
    # bot allowed with empty disallows
    assert r.allows("Mozilla allowbot1 99.9", "/path")
    assert r.allows("Mozilla allowbot1 99.9", "/")
    # bot allowed with explicit allow
    assert r.allows("Mozilla allowbot2 99.9", "/path")
    assert r.allows("Mozilla allowbot2 99.9", "/")
    # bot denied with specific disallow overriding general allow
    assert not r.allows("Mozilla allowbot2 99.9", "/foo")
    # HER-1976: query-string disallow
    assert not r.allows("Mozilla allowbot2 99.9", "/ok?butno=something")
    # bot denied with blanket deny
    assert not r.allows("Mozilla denybot 99.9", "/path")
    assert not r.allows("Mozilla denybot 99.9", "/")
    # unnamed bot with mixed catchall allow/deny
    assert r.allows("Mozilla anonbot 99.9", "/path")
    assert not r.allows("Mozilla anonbot 99.9", "/cgi-bin/foo.pl")
    # no crawl-delay / with crawl-delay
    assert r.crawl_delay("Mozilla denybot 99.9") == -1.0
    assert r.crawl_delay("Mozilla delaybot 99.9") == 20.0


def test_valid_robots():
    _eval_robots(Robotstxt(_SAMPLE_ROBOTS_1))


def test_whitespace_flawed_robots():
    _eval_robots(Robotstxt(_WHITESPACE_FLAWED))


def test_html_markup_robots():
    body = (
        '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 3.2 Final//EN"><HTML>\n'
        "<HEAD>\n<TITLE>/robots.txt</TITLE>\n<HEAD>\n<BODY>\n"
        "User-agent: *<BR>\n"
        "Disallow: /<BR>\n"
        "Crawl-Delay: 30<BR>\n"
        "\n</BODY>\n</HTML>\n"
    )
    r = Robotstxt(body)
    assert not r.allows("anybot", "/index.html")
    assert r.crawl_delay("anybot") == 30.0


def test_compact_serialization_shared_directives():
    """RobotstxtTest.testCompactSerialization (HER-1912): user-agents of one
    group share ONE directives object — the Java test asserts identity
    survives kryo; the analog is identity in the parsed model (the engine
    stores the BODY and re-parses via an LRU, so blowup can't occur)."""
    body = (
        "User-Agent:a\nUser-Agent:b\nUser-Agent:c\nUser-Agent:d\n"
        "Disallow:/service\n"
    )
    r = Robotstxt(body)
    assert r.directives_for("a") is r.directives_for("b")
    # and the law itself: all four share the disallow
    for ua in "abcd":
        assert not r.allows(ua, "/service/x")


def test_separated_sections():
    """RobotstxtTest.testSeparatedSections: re-opened User-agent sections
    merge into the same group."""
    body = (
        "User-agent: *\n"
        "Crawl-delay: 5\n"
        "User-agent: a\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Disallow: /disallowed\n"
        "User-agent: a\n"
        "Crawl-delay: 99\n"
    )
    r = Robotstxt(body)
    assert not r.allows("a", "/foo")
    assert r.allows("c", "/foo")
    assert not r.allows("c", "/disallowed")
    assert r.crawl_delay("c") == 5.0
    assert r.crawl_delay("a") == 99.0


def test_size_limit():
    """RobotstxtTest.testSizeLimit: parse to MAX_SIZE, drop the partial
    line that crosses it and everything after."""
    from heritrix3_spark.operators.robots import MAX_SIZE

    body = (
        "User-agent: a\n  Disallow: /\nUser-Agent: b\nDisallow: /"
        + " " * MAX_SIZE
        + "\nUser-Agent: c\nDisallow: /\n"
    )
    r = Robotstxt(body)
    assert not r.allows("a", "/foo")  # parsed before the limit
    assert r.allows("b", "/foo")      # the limit-crossing line is ignored
    assert r.allows("c", "/foo")      # lines after the limit are ignored


def test_all_blank_lines():
    """RobotstxtTest.testAllBlankLines: a MAX_SIZE-of-newlines body parses
    clean and allows everything."""
    from heritrix3_spark.operators.robots import MAX_SIZE

    r = Robotstxt("\n" * MAX_SIZE)
    assert r.allows("anybot", "/foo")


def test_first_named_robots_policy_decisions_by_listed_candidates():
    """FirstNamedRobotsPolicyTest.testDecisionsByListedCandidates
    (modules/src/test/java/org/archive/modules/net/
    FirstNamedRobotsPolicyTest.java:61-83)."""
    from heritrix3_spark.operators.robots import (
        first_named_matched_agent,
        policy_allows,
    )

    body = (
        "User-agent: *\n"
        "Disallow: /cgi-bin/\n"
        "Disallow: /details/software\n"
        "\n"
        "User-agent: denybot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: allowbot1\n"
        "Disallow: \n"
        "\n"
        "User-agent: allowbot2\n"
        "Disallow: /foo\n"
        "\n"
        "User-agent: delaybot\n"
        "Disallow: /\n"
        "Crawl-Delay: 20\n"
        "Allow: /images/\n"
    )
    robots = Robotstxt(body)
    cands = ("unnamedBot", "allowbot2")
    path = "/cgi-bin/whatever"
    # disallowed by immediate match on primary user-agent disallow-all
    assert not policy_allows("firstNamed", robots, "denybot", path, cands)
    # allowed by immediate match on primary user-agent allow-all,
    # and no custom user-agent is assigned
    assert policy_allows("firstNamed", robots, "allowbot1", path, cands)
    assert first_named_matched_agent(robots, "allowbot1", cands) is None
    # allowed by the specific allowbot2 rules tried 3rd (after the
    # unmatched primary and the unnamed candidate), which also assigns
    # the matched candidate as the fetch's user-agent
    assert policy_allows("firstNamed", robots, "goodbot", path, cands)
    assert first_named_matched_agent(robots, "goodbot", cands) == "allowbot2"
    # disallowed by the specific allowbot2 directive tried 3rd
    assert not policy_allows("firstNamed", robots, "goodbot", "/foo", cands)
