"""DecideRule tail + RobotsPolicy variants (reference-law vectors).

Rules: modules/.../deciderules/*.java; policies: modules/.../net/*Policy.java.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import heritrix3_spark.operators.scope as SC
from heritrix3_spark.operators.robots import (
    Robotstxt,
    obeys_meta_robots_nofollow,
    policy_allows,
)

ROWS = [
    # uri, via, hops_path, fetch_status, content_type, content_length, source_tag
    ("http://sub.shop.example/a.jpg", "http://shop.example/", "LE", 200, "image/jpeg", 1200, "s1"),
    ("http://other.org/x", None, "", 404, "text/html", 90000, "s2"),
    ("https://shop.example/video.mp4", "http://x.example/", "LLL", 301, "video/mp4", 5000, "s1"),
    ("http://deep.sub.archive.org/doc.pdf", "http://deep.sub.archive.org/i", "LXR", 200, "application/pdf", 100, "s3"),
]
COLS = ["uri", "via", "hops_path", "fetch_status", "content_type", "content_length", "source_tag"]


def _vals(spark, col):
    df = spark.createDataFrame(ROWS, COLS)
    return [r.d for r in df.select(col.alias("d")).collect()]


def test_domain_host_rules(spark):
    assert _vals(spark, SC.on_domains(F.col("uri"), ["shop.example", "archive.org"])) == [1, 0, 1, 1]
    assert _vals(spark, SC.not_on_domains(F.col("uri"), ["shop.example"])) == [0, -1, 0, -1]
    assert _vals(spark, SC.on_hosts(F.col("uri"), ["other.org", "shop.example"])) == [0, 1, 1, 0]
    assert _vals(spark, SC.not_on_hosts(F.col("uri"), ["other.org"])) == [-1, 0, -1, -1]


def test_surt_and_via_rules(spark):
    prefixes = SC.seed_surt_prefixes(["http://shop.example/"])
    # prefixes carry the authority-closing ')' and the http form, so the
    # subdomain (row 0) is non-prefixed; the https candidate (row 2) IS
    # prefixed — getCandidateSurt coerces https to http before comparing
    # (SurtPrefixedDecideRule.java:186 via SurtPrefixSet.getCandidateSurt)
    assert _vals(spark, SC.not_surt_prefixed(F.col("uri"), prefixes)) == [-1, -1, 0, -1]
    assert _vals(spark, SC.via_surt_prefixed(F.col("via"), prefixes)) == [1, 0, 0, 0]
    assert _vals(spark, SC.has_via(F.col("via"))) == [1, 0, 1, 1]


def test_hops_source_rules(spark):
    assert _vals(spark, SC.hops_path_matches_regex(F.col("hops_path"), "^L+$")) == [0, 0, 1, 0]
    assert _vals(spark, SC.source_seed(F.col("source_tag"), ["s1"])) == [1, 0, 1, 0]
    # hop crossing assignment-level domains (uri vs via)
    assert _vals(
        spark, SC.hop_crosses_assignment_level_domain(F.col("uri"), F.col("via"))
    ) == [0, 0, -1, 0]


def test_file_pattern_and_postfetch_rules(spark):
    assert _vals(spark, SC.matches_file_pattern(F.col("uri"), "IMAGES")) == [1, 0, 0, 0]
    assert _vals(spark, SC.matches_file_pattern(F.col("uri"), "ALL")) == [1, 0, 1, 1]
    assert _vals(spark, SC.fetch_status_matches_regex(F.col("fetch_status"), "^2..$")) == [1, 0, 0, 1]
    assert _vals(spark, SC.fetch_status_not_matches_regex(F.col("fetch_status"), "^2..$")) == [0, -1, -1, 0]
    assert _vals(spark, SC.content_type_matches_regex(F.col("content_type"), "^text/")) == [0, 1, 0, 0]
    assert _vals(spark, SC.content_length_at_most(F.col("content_length"), 10000)) == [1, 0, 1, 1]
    assert _vals(spark, SC.resource_longer_than(F.col("content_length"), 10000)) == [0, -1, 0, 0]
    assert _vals(spark, SC.scripted(F.col("uri").contains("pdf"))) == [0, 0, 0, 1]


def test_expression_rule(spark):
    """ExpressionDecideRule (contrib ExpressionDecideRule.java:38-76): the
    reference's documented example — a Groovy expression over curi.via and
    a URI regex — written as its ANSI-SQL equivalent."""
    expr = r"via IS NULL AND uri RLIKE '^https?://[^/]*other\\.org/.*$'"
    assert _vals(spark, SC.expression_rule(expr)) == [0, 1, 0, 0]
    # arbitrary column predicates, custom decision
    assert _vals(
        spark, SC.expression_rule("content_length > 1000", decision=SC.REJECT)
    ) == [-1, -1, -1, 0]
    # NULL evaluation (via RLIKE on a null via) renders not-"true" -> NONE,
    # mirroring String.valueOf(result).equals("true")
    assert _vals(spark, SC.expression_rule("via RLIKE 'shop'")) == [1, 0, 0, 0]


def test_expression_rule_in_sequence(spark):
    seq = SC.decide_sequence(
        F.lit(SC.ACCEPT),
        SC.expression_rule("fetch_status >= 400", decision=SC.REJECT),
    )
    assert _vals(spark, (seq == SC.ACCEPT).cast("int")) == [1, 0, 1, 1]


def test_rules_fold_into_sequence(spark):
    # accept shop.example domain, but reject anything video-patterned
    seq = SC.decide_sequence(
        SC.reject_all(),
        SC.on_domains(F.col("uri"), ["shop.example"]),
        SC.matches_file_pattern(F.col("uri"), "VIDEO", decision=SC.REJECT),
    )
    assert _vals(spark, (seq == SC.ACCEPT).cast("int")) == [1, 0, 0, 0]


_POLICY_BODY = (
    "User-agent: goodbot\nDisallow:\n\n"
    "User-agent: badbot\nDisallow: /\n\n"
    "User-agent: *\nDisallow: /private\n"
)


def test_robots_policy_variants():
    rb = Robotstxt(_POLICY_BODY)
    # obey: wildcard group for an unlisted UA
    assert policy_allows("obey", rb, "mybot", "/public")
    assert not policy_allows("obey", rb, "mybot", "/private/x")
    # ignore: always allowed
    assert policy_allows("ignore", rb, "badbot", "/private/x")
    # firstNamed: named group of first candidate wins over wildcard
    assert policy_allows("firstNamed", rb, "mybot", "/private/x", ("goodbot", "badbot"))
    assert not policy_allows("firstNamed", rb, "mybot", "/private/x", ("badbot", "goodbot"))
    # firstNamed with no candidates falls back to full lookup (wildcard)
    assert not policy_allows("firstNamed", rb, "mybot", "/private/x")
    # mostFavored: allowed if ANY candidate is allowed
    assert not policy_allows("mostFavored", rb, "badbot", "/x")
    assert policy_allows("mostFavored", rb, "badbot", "/x", ("goodbot",))
    # custom: delegate
    assert policy_allows(
        "custom", rb, "x", "/y", custom_fn=lambda r, u, p: p.startswith("/y")
    )
    # robotsTxtOnly differs from obey only in meta-robots handling
    assert policy_allows("robotsTxtOnly", rb, "mybot", "/public")
    assert obeys_meta_robots_nofollow("obey")
    assert not obeys_meta_robots_nofollow("robotsTxtOnly")
    assert not obeys_meta_robots_nofollow("ignore")


def test_policy_udf(spark):
    from heritrix3_spark.operators.robots import make_policy_allow_udf

    udf = make_policy_allow_udf("firstNamed", ("goodbot",))
    df = spark.createDataFrame(
        [(_POLICY_BODY, "mybot", "/private/x"), (_POLICY_BODY, "badbot", "/q")],
        ["body", "ua", "path"],
    )
    got = [r.a for r in df.select(udf(F.col("body"), F.col("ua"), F.col("path")).alias("a")).collect()]
    assert got == [True, False]


# -- hops-path display truncation (round 4) --------------------------------
def test_extend_hops_path_law(spark):
    """CrawlURI.extendHopsPath/getHopCount byte-exact vectors + Column
    twins: sliding 49-symbol window behind an overflow-count prefix."""
    from pyspark.sql import functions as F

    from heritrix3_spark.operators import scope as SC

    p = ""
    for _ in range(49):
        p = SC.extend_hops_path(p, "L")
    assert p == "L" * 49 and SC.hop_count(p) == 49
    p50 = SC.extend_hops_path(p, "E")  # len 49 < 50 -> plain append
    assert p50 == "L" * 49 + "E" and SC.hop_count(p50) == 50
    p51 = SC.extend_hops_path(p50, "X")  # overflow engages: drop 1st, "1+"
    assert p51 == "1+" + p50[1:] + "X"
    assert SC.hop_count(p51) == 51
    p52 = SC.extend_hops_path(p51, "R")  # window slides, count bumps
    assert p52 == "2+" + p51[3:] + "R"
    assert SC.hop_count(p52) == 52
    assert p52.endswith("XR") and len(p52) == 52
    # Column twins agree on every vector
    rows = [(pp, h) for pp, h in ((p, "E"), (p50, "X"), (p51, "R"), (p52, "P"))]
    df = spark.createDataFrame(rows, "path string, hop string")
    got = df.select(
        SC.extend_hops_path_col(F.col("path"), F.col("hop")).alias("ext"),
        SC.hop_count_col(F.col("path")).alias("n"),
        "path", "hop",
    ).collect()
    for r in got:
        assert r.ext == SC.extend_hops_path(r.path, r.hop)
        assert r.n == SC.hop_count(r.path)


def test_deep_chain_truncation_parity(spark, tmp_path):
    """A 58-deep link chain with maxHops=54: the displayed path truncates
    past 50 symbols but TooManyHops still rejects by the REAL hop count
    (getHopCount overflow law) — a length-based check would never fire
    once the display caps. Engine == simulator row-exactly."""
    from heritrix3_spark import fixtures as FX
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    n = 58
    web = {
        f"http://chain.example/c{i}": [
            ("text", f"page {i}", None, 0),
            ("link", "next", f"/c{i + 1}", 1),
        ]
        for i in range(n)
    }
    seeds = ["http://chain.example/c0"]
    sim_log, _ = simulate(web, seeds, SimConfig(max_hops=54))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "chain"),
        spark.createDataFrame(list(web.items()), FX.DOCUMENTS_SCHEMA),
        CrawlConfig(num_buckets=2, ordinal_partitions=1, bloom=False, max_hops=54),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=70)
    sim_rows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l["disposition"])
        for l in sim_log
    )
    eng_rows = sorted(
        (r.round, r.canonical, r.ordinal, r.disposition)
        for r in eng_log.collect()
    )
    assert eng_rows == sim_rows
    crawled = {l["canonical"] for l in sim_log}
    deepest = max(int(c.rsplit("c", 1)[1]) for c in crawled)
    # c_i carries i hops; REJECT when hops > 54 -> c54 is the deepest
    assert deepest == 54
