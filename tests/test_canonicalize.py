"""Canonicalization chain law — reference rule tests re-expressed.

Scalar python vs the reference laws, and Spark Column parity vs scalar.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import heritrix3_spark.functions.canonicalize as C
from heritrix3_spark.vectors import CANONICALIZATION_VECTORS, HEX32, LET24


@pytest.mark.parametrize("url,expected", CANONICALIZATION_VECTORS)
def test_default_chain_scalar(url, expected):
    assert C.canonicalize(url) == expected


def test_individual_rules():
    base = "http://archive.org/index.html"
    assert C.strip_session_ids(base + "?jsessionid=" + HEX32) == base + "?"
    assert C.strip_session_ids(base + "?jsessionid=tooshort") == base + "?jsessionid=tooshort"
    assert (
        C.strip_session_ids(base + "?one=two&jsessionid=" + HEX32 + "&x=y")
        == base + "?one=two&x=y"
    )
    assert C.strip_session_ids(base + "?aspsessionidABCDEFGH=" + LET24) == base + "?"
    assert C.strip_userinfo("http://u:p@h/") == "http://h/"
    assert C.strip_userinfo("mailto:u@h") == "mailto:u@h"
    assert C.strip_wwwn("http://www.archive.org") == "http://www.archive.org"
    assert C.strip_wwwn("http://www2.a.org/x") == "http://a.org/x"
    assert C.strip_www("http://www2.a.org/x") == "http://www2.a.org/x"
    assert C.strip_extra_slashes("http://a//b///c") == "http://a/b/c"
    assert C.strip_extra_slashes("ftp://a//b") == "ftp://a//b"


def test_fixup_query_string_exact_branches():
    f = C.fixup_query_string
    assert f("http://a/i?") == "http://a/i"
    assert f("http://a/i?&") == "http://a/i"
    assert f("http://a/i?&x=y") == "http://a/i?x=y"
    assert f("http://a/i?x=y&") == "http://a/i?x=y"
    assert f("http://a/i?x=y") == "http://a/i?x=y"
    assert f("?x") == "?x"  # '?' at index 0: untouched
    assert f("") == ""
    assert f("a?&?") == "a?&"  # single-branch law: only trailing '?' stripped


def test_spark_column_parity(spark):
    """canonical_col must equal the scalar chain on every vector + edges."""
    inputs = [u for u, _ in CANONICALIZATION_VECTORS] + [
        "a?&?",
        "http://a/i?&",
        "HTTPS://U:P@WWW9.X.COM/p/q?SID=" + HEX32,
        "http://h/??",
        "http://h/?&&",
    ]
    df = spark.createDataFrame([(u,) for u in inputs], ["url"])
    got = df.select("url", C.canonical_col(F.col("url")).alias("canonical")).collect()
    for row in got:
        assert row.canonical == C.canonicalize(row.url), row.url
