"""Frontier insert-key ordering law (BdbMultipleWorkQueuesTest.java:34-90 port)
+ preparation/disposition column laws."""

from __future__ import annotations

from pyspark.sql import functions as F

import heritrix3_spark.operators.frontier as FR
from heritrix3_spark.vectors import ORDERING_VECTORS


def _ordering_df(spark):
    return spark.createDataFrame(
        [(ck, u, d, p, o) for ck, u, d, p, o, _ in ORDERING_VECTORS],
        ["class_key", "uri", "sched_directive", "precedence", "ordinal"],
    )


def test_queue_rank_matches_reference_law(spark):
    df = FR.queue_rank(_ordering_df(spark))
    got = {r.uri: r.queue_rank for r in df.collect()}
    for ck, uri, d, p, o, expected in ORDERING_VECTORS:
        assert got[uri] == expected, (uri, got[uri], expected)


def test_queue_rank_ordinal_sweep(spark):
    """The reference sweeps ordinalOrigin = 1<<k up to 2^61: ordering must
    hold at every magnitude (48-bit mask law)."""
    rows = []
    for k in range(0, 47, 7):
        origin = 1 << k
        rows += [
            (f"q{k}", "first", FR.NORMAL, 3, origin),
            (f"q{k}", "second", FR.NORMAL, 3, origin + 1),
            (f"q{k}", "high", FR.HIGH, 3, origin + 2),
            (f"q{k}", "low-prec", FR.NORMAL, 1, origin + 3),
        ]
    df = spark.createDataFrame(
        rows, ["class_key", "uri", "sched_directive", "precedence", "ordinal"]
    )
    ranked = FR.queue_rank(df).collect()
    for r in ranked:
        expected = {"high": 1, "low-prec": 2, "first": 3, "second": 4}[r.uri]
        assert r.queue_rank == expected, (r.class_key, r.uri)


def test_head_pick_one_per_queue(spark):
    heads = FR.head_pick(_ordering_df(spark), k=1).collect()
    by_key = {r.class_key: r.uri for r in heads}
    assert by_key == {
        "foo": "http://archive.org/baz",  # HIGH directive wins
        "bar": "http://example.org/b",  # HIGHEST wins
    }
    assert len(heads) == 2


def test_scheduling_directive_law(spark):
    rows = [
        ("", FR.MEDIUM),  # seed stays MEDIUM
        ("L", FR.NORMAL),  # plain navlink stays NORMAL
        ("LR", FR.MEDIUM),  # redirect -> MEDIUM (preferenceDepthHops=-1)
        ("LE", FR.MEDIUM),  # 1 embed hop promoted NORMAL->MEDIUM
        ("LEE", FR.NORMAL),  # 2 trailing embeds > preferenceEmbedHops(1)
        ("LEL", FR.NORMAL),  # embed not trailing: stays
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], ["hops_path"]).withColumn(
        "cur",
        F.when(F.col("hops_path") == "", F.lit(FR.MEDIUM)).otherwise(F.lit(FR.NORMAL)),
    )
    got = {
        r.hops_path: r.directive
        for r in df.select(
            "hops_path",
            FR.scheduling_directive_col(F.col("hops_path"), F.col("cur")).alias("directive"),
        ).collect()
    }
    for hops, expected in rows:
        assert got[hops] == expected, (hops, got[hops], expected)


def test_disposition_predicates(spark):
    df = spark.createDataFrame(
        [(200, 1), (404, 1), (FR.S_DEFERRED, 1), (FR.S_CONNECT_FAILED, 29),
         (FR.S_CONNECT_FAILED, 30), (FR.S_ROBOTS_PRECLUDED, 1), (FR.S_OUT_OF_SCOPE, 1)],
        ["status", "attempts"],
    ).select(
        "status",
        "attempts",
        FR.is_success_col(F.col("status")).alias("success"),
        FR.is_disregarded_col(F.col("status")).alias("disregard"),
        FR.needs_retry_col(F.col("status"), F.col("attempts")).alias("retry"),
        FR.retry_delay_col(F.col("status")).alias("delay"),
    )
    got = {(r.status, r.attempts): r for r in df.collect()}
    assert got[(200, 1)].success and not got[(200, 1)].retry
    # 404 IS a success disposition in Heritrix (fetched + response recorded):
    # CrawlURI.isSuccess == status > 0 (CrawlURI.java:868-877)
    assert got[(404, 1)].success and not got[(404, 1)].retry
    assert got[(FR.S_DEFERRED, 1)].retry and got[(FR.S_DEFERRED, 1)].delay == 0
    assert got[(FR.S_CONNECT_FAILED, 29)].retry
    assert got[(FR.S_CONNECT_FAILED, 29)].delay == 900_000
    assert not got[(FR.S_CONNECT_FAILED, 30)].retry  # maxRetries=30 exhausted
    assert got[(FR.S_ROBOTS_PRECLUDED, 1)].disregard
    assert got[(FR.S_OUT_OF_SCOPE, 1)].disregard


def test_politeness_delay_law(spark):
    df = spark.createDataFrame(
        [(100, None), (100, 2.5), (10_000, None), (100, 9999.0), (1_000, 10.0)],
        "duration long, crawl_delay double",
    ).select(
        "duration",
        "crawl_delay",
        FR.politeness_delay_col(F.col("duration"), F.col("crawl_delay")).alias("delay"),
    )
    got = {(r.duration, r.crawl_delay): r.delay for r in df.collect()}
    assert got[(100, None)] == 3_000  # 5*100 clamped up to min
    assert got[(100, 2.5)] == 3_000  # crawl-delay 2.5s < computed 3s floor
    assert got[(10_000, None)] == 30_000  # clamped to max
    assert got[(100, 9999.0)] == 300_000  # crawl-delay capped at respect limit
    assert got[(1_000, 10.0)] == 10_000  # raised to crawl-delay


def test_trivial_cost_and_precedence_policies(spark):
    """ZeroCost / BaseUriPrecedence / PreloadedUriPrecedence laws."""
    from pyspark.sql import functions as F

    from heritrix3_spark.operators import frontier as FR

    df = spark.createDataFrame(
        [("http://a.example/x",), ("http://b.example/y",)], ["canonical"]
    )
    rows = df.select(
        FR.zero_cost_col().alias("z"), FR.base_uri_precedence_col(7).alias("b")
    ).collect()
    assert all(r.z == 0 and r.b == 7 for r in rows)
    hist = spark.createDataFrame(
        [("http://a.example/x", 9)], ["canonical", "precedence"]
    )
    got = {
        r.canonical: r.precedence
        for r in FR.preloaded_uri_precedence(df, hist, default_precedence=3).collect()
    }
    assert got == {"http://a.example/x": 9, "http://b.example/y": 3}
