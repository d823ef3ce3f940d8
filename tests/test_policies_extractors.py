"""Queue-assignment policy variants + additional extractors."""

from __future__ import annotations

from pyspark.sql import functions as F

import heritrix3_spark.functions.surt as S
from heritrix3_spark.operators.extract import (
    extract_http_headers,
    extract_js_udf,
    extract_robots_sitemaps_udf,
    extract_sitemap_udf,
)


def test_hostname_class_key(spark):
    rows = [
        ("http://www.archive.org/x", "www.archive.org"),
        ("http://www.archive.org:8080/x", "www.archive.org#8080"),
        ("https://secure.example.com/x", "secure.example.com#443"),  # https default port
        ("https://secure.example.com:444/x", "secure.example.com#444"),
        ("http://user:pw@host.example/x", "host.example"),
        ("not-a-url", "default..."),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["uri"])
    got = {r.uri: r.ck for r in df.select("uri", S.hostname_class_key_col(F.col("uri")).alias("ck")).collect()}
    for uri, expected in rows:
        assert got[uri] == expected, uri


def test_java_string_hash_matches_java(spark):
    """Java String.hashCode golden values ('' = 0, 'a' = 97,
    'hello' = 99162322, 'archive.org' computed in Java)."""
    # 'polygenelubricants' is the classic Integer.MIN_VALUE hashCode string
    vals = {"": 0, "a": 97, "hello": 99162322, "polygenelubricants": -2147483648}
    df = spark.createDataFrame([(s,) for s in vals], ["s"])
    got = {r.s: r.h for r in df.select("s", S.java_string_hash_col(F.col("s")).alias("h")).collect()}
    for s, expected in vals.items():
        assert got[s] == expected, s


def test_bucket_class_key_range(spark):
    df = spark.createDataFrame([(f"http://host{i}.example/x",) for i in range(50)], ["uri"])
    got = [int(r.b) for r in df.select(S.bucket_class_key_col(F.col("uri")).alias("b")).collect()]
    assert all(0 <= b <= 1023 for b in got)
    assert len(set(got)) > 10  # spreads


def test_assignment_level_class_key(spark):
    rows = [
        ("http://deep.sub.archive.org/x", "org,archive,"),
        ("http://www.example.co.uk/x", "uk,co,example,"),
        ("http://single/x", "default..."),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["uri"])
    got = {
        r.uri: r.ck
        for r in df.select("uri", S.assignment_level_class_key_col(F.col("uri")).alias("ck")).collect()
    }
    for uri, expected in rows:
        assert got[uri] == expected, uri


def test_extract_robots_sitemaps(spark):
    body = "User-agent: *\nDisallow: /x\nSitemap: http://a.example/sitemap.xml\nsitemap: /relative.xml\n"
    df = spark.createDataFrame([(body,)], ["body"])
    got = df.select(F.explode(extract_robots_sitemaps_udf(F.col("body"))).alias("l")).collect()
    urls = [(r.l.url, r.l.hop) for r in got]
    assert ("http://a.example/sitemap.xml", "M") in urls
    assert ("/relative.xml", "M") in urls


def test_extract_sitemap_xml(spark):
    xml = """<?xml version="1.0"?><urlset><url><loc>http://a.example/p1</loc></url>
             <url><loc> http://a.example/p2 </loc></url></urlset>"""
    df = spark.createDataFrame([(xml,), ("<html>not a sitemap</html>",)], ["xml"])
    got = df.select(F.explode(extract_sitemap_udf(F.col("xml"))).alias("l")).collect()
    assert sorted(r.l.url for r in got) == ["http://a.example/p1", "http://a.example/p2"]
    assert all(r.l.hop == "M" for r in got)


def test_extract_js_speculative(spark):
    js = """var a = "http://cdn.example/app.js"; var b = 'images/logo.png';
            var c = "not a uri"; var d = "text/javascript"; var e = "x";"""
    df = spark.createDataFrame([(js,)], ["js"])
    got = [r.l.url for r in df.select(F.explode(extract_js_udf(F.col("js"))).alias("l")).collect()]
    assert "http://cdn.example/app.js" in got
    assert "images/logo.png" in got
    assert "not a uri" not in got
    assert "text/javascript" not in got  # detector exception list
    assert "x" not in got


def test_extract_http_headers(spark):
    df = spark.createDataFrame(
        [
            ("http://a.example/old", "/new", None),
            ("http://b.example/x", None, "http://cdn.example/x"),
        ],
        ["uri", "location", "content_location"],
    )
    got = {(r.doc_id, r.hop): r.url for r in extract_http_headers(df).collect()}
    assert got[("http://a.example/old", "R")] == "http://a.example/new"
    assert got[("http://b.example/x", "E")] == "http://cdn.example/x"
