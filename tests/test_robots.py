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
