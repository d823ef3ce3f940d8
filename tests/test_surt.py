"""SURT + class_key law (SURTTest.java:62-105 port)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import heritrix3_spark.functions.surt as S
from heritrix3_spark.vectors import CLASS_KEY_VECTORS, SURT_VECTORS


@pytest.mark.parametrize("uri,expected", SURT_VECTORS)
def test_surt_scalar(uri, expected):
    assert S.surt(uri) == expected


@pytest.mark.parametrize("uri,hops,via,expected", CLASS_KEY_VECTORS)
def test_class_key_scalar(uri, hops, via, expected):
    assert S.surt_authority_class_key(uri, hops, via) == expected


def test_surt_column_parity(spark):
    df = spark.createDataFrame([(u,) for u, _ in SURT_VECTORS], ["uri"])
    got = {r.uri: r.surt for r in df.select("uri", S.surt_col(F.col("uri")).alias("surt")).collect()}
    for uri, expected in SURT_VECTORS:
        assert got[uri] == expected, uri


def test_class_key_column_parity(spark):
    rows = [(u, h, v) for u, h, v, _ in CLASS_KEY_VECTORS]
    df = spark.createDataFrame(rows, ["uri", "hops_path", "via"])
    got = {
        r.uri: r.ck
        for r in df.select(
            "uri",
            S.class_key_col(F.col("uri"), F.col("hops_path"), F.col("via")).alias("ck"),
        ).collect()
    }
    for uri, _, _, expected in CLASS_KEY_VECTORS:
        assert got[uri] == expected, uri


def test_parallel_queues_salting(spark):
    """parallelQueues=N: same first path segment -> same sub-queue; suffix +n."""
    rows = [(f"http://hot.example/seg{i % 4}/p{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, ["uri"])
    got = df.select(
        "uri", S.class_key_col(F.col("uri"), parallel_queues=8).alias("ck")
    ).collect()
    by_seg = {}
    for r in got:
        seg = r.uri.split("/")[3]
        by_seg.setdefault(seg, set()).add(r.ck)
    for seg, keys in by_seg.items():
        assert len(keys) == 1, (seg, keys)  # consistent assignment
        (key,) = keys
        assert key.startswith("example,hot,")
