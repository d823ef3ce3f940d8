"""Public-suffix assignment-level law (PublicSuffixes.
reduceSurtToAssignmentLevel analog; AssignmentLevelSurtQueueAssignment
Policy.java:44, HopCrossesAssignmentLevelDomainDecideRule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix3_spark.functions import psl as P
from heritrix3_spark.functions import surt as S
from heritrix3_spark.operators import scope as SC

CASES = [
    # (host, assignable domain)
    ("www.example.com", "example.com"),
    ("deep.sub.archive.org", "archive.org"),
    ("www.bbc.co.uk", "bbc.co.uk"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("shop.example.com.au", "example.com.au"),
    ("a.b.example.co.jp", "example.co.jp"),
    ("x.gov.br", "x.gov.br"),
    ("someone.github.io", "someone.github.io"),
    ("deep.someone.github.io", "someone.github.io"),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    ("co.uk", "co.uk"),  # bare suffix stays whole
    ("localhost", "localhost"),
]


def test_assignment_level_domain_scalar():
    for host, want in CASES:
        assert P.assignment_level_domain(host) == want, host


def test_assignment_level_domain_column_matches_scalar(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], ["host"])
    got = [
        r[0]
        for r in df.select(P.assignment_level_domain_col(F.col("host"))).collect()
    ]
    assert got == [w for _, w in CASES]


def test_reduce_surt_form():
    assert P.reduce_surt_to_assignment_level("uk,co,bbc,www,") == "uk,co,bbc,"
    assert P.reduce_surt_to_assignment_level("org,archive,deep,sub,") == "org,archive,"
    assert P.reduce_surt_to_assignment_level("uk,co,") == "uk,co,"


def test_assignment_level_class_key_psl(spark):
    rows = [
        ("http://news.bbc.co.uk/x", "uk,co,bbc,"),
        ("http://a.b.example.co.jp/x", "jp,co,example,"),
        ("http://someone.github.io/page", "io,github,someone,"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], ["uri"])
    got = {
        r.uri: r.ck
        for r in df.select(
            "uri", S.assignment_level_class_key_col(F.col("uri")).alias("ck")
        ).collect()
    }
    for uri, want in rows:
        assert got[uri] == want, uri


def test_hop_crosses_assignment_level_domain_psl(spark):
    """Same registered domain across different ccTLD subhosts must NOT
    count as a crossing; different registrants under co.uk must."""
    df = spark.createDataFrame(
        [
            ("http://a.bbc.co.uk/x", "http://b.bbc.co.uk/y"),   # same domain
            ("http://a.bbc.co.uk/x", "http://other.co.uk/y"),   # crossing
        ],
        ["uri", "via"],
    )
    got = [
        r[0]
        for r in df.select(
            SC.hop_crosses_assignment_level_domain(F.col("uri"), F.col("via"))
        ).collect()
    ]
    assert got[0] == SC.NONE
    assert got[1] != SC.NONE
