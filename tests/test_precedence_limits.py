"""Queue precedence policies, precedence floor, crawl limits, salting, CSS."""

from __future__ import annotations

from pyspark.sql import functions as F

import heritrix3_spark.operators.frontier as FR
from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.operators.extract import extract_css_udf


def test_highest_uri_queue_precedence(spark):
    fr = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 4), ("b", 9)], ["class_key", "precedence"]
    )
    got = {r.class_key: r.queue_precedence for r in FR.highest_uri_queue_precedence(fr).collect()}
    assert got == {"a": 2, "b": 5}  # base(1) + min pending precedence


def test_success_counts_queue_precedence(spark):
    log = spark.createDataFrame(
        [("a", "success")] * 150 + [("b", "success")] * 5 + [("c", "success")] * 1200,
        ["class_key", "disposition"],
    )
    got = {
        r.class_key: r.queue_precedence
        for r in FR.success_counts_queue_precedence(log).collect()
    }
    assert got == {"a": 4, "b": 3, "c": 5}  # base 3, +1 per threshold crossed


def test_precedence_floor_blocks_crawl(spark, tmp_path):
    """All queues at/above the floor are never activated -> crawl ends with
    zero fetches (WorkQueueFrontier.java:165-171, 595-601)."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "floor"),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(
            num_buckets=4,
            ordinal_partitions=1,
            bloom=False,
            queue_precedence="highest_uri",
            queue_precedence_base=1,
            precedence_floor=2,  # base(1) + min URI precedence(1) = 2 >= floor
        ),
    )
    eng.bootstrap(FX.seed_lines(2))
    assert eng.run_round() is False
    # with the default floor the same crawl proceeds
    eng2 = CrawlEngine(
        spark,
        str(tmp_path / "nofloor"),
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            queue_precedence="highest_uri",
        ),
    )
    eng2.bootstrap(FX.seed_lines(2))
    assert eng2.run_round() is True
    assert eng2.crawl_log().count() > 0


def test_crawl_limit_enforcer(spark, tmp_path):
    """Global fetch cap stops the crawl (framework/CrawlLimitEnforcer.java)."""
    eng = CrawlEngine(
        spark,
        str(tmp_path / "limit"),
        FX.synth_web_df(spark, 2, 6),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, max_fetches=3),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run(max_rounds=30)
    fetched = eng.crawl_log().count()
    assert 3 <= fetched <= 4  # stops at the first round-boundary past the cap
    assert eng.export_pending_uris().count() > 0  # work remained


def test_parallel_queue_salting_in_engine(spark, tmp_path):
    """parallelQueues splits one hot authority into +n sub-queues
    (URIAuthorityBasedQueueAssignmentPolicy.java:118-145)."""
    # web with full first path segments (bucketBasis needs "/seg/..." — a
    # path without a second '/' yields sub-queue 0, the unsuffixed queue)
    rows = [
        (
            "http://h0.example/p0",
            [("text", "root", None, 0)]
            + [("link", f"s{i}", f"/sec{i}/page", i + 1) for i in range(6)],
        )
    ] + [
        (f"http://h0.example/sec{i}/page", [("text", "leaf", None, 0)])
        for i in range(6)
    ]
    eng = CrawlEngine(
        spark,
        str(tmp_path / "salt"),
        spark.createDataFrame(rows, FX.DOCUMENTS_SCHEMA),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False, parallel_queues=4,
            k_per_host=2,
        ),
    )
    eng.bootstrap(["http://h0.example/p0"])
    eng.run(max_rounds=16)
    keys = {r.class_key for r in eng.crawl_log().select("class_key").distinct().collect()}
    base = {k for k in keys if "+" not in k}
    salted = {k for k in keys if "+" in k}
    assert all(k.startswith("example,h0,") for k in keys)
    assert len(salted) >= 1  # the hot host actually split
    assert base  # segment-less URIs (the seed) stay on the unsuffixed queue


def test_sheet_overlays_parity(spark, tmp_path):
    """Per-SURT-prefix sheet overlays (Sheet/SheetOverlaysManager analog,
    commons/.../spring/Sheet.java:50): h0 gets a tiny total budget (early
    retirement) and h1 a larger k — engine matches the simulator exactly."""
    from heritrix3_spark.simulator import SimConfig, simulate

    overlays = (
        {"surt_prefix": "example,h0,", "total_budget": 3},
        {"surt_prefix": "example,h1,", "k_per_host": 3},
    )
    h, p = 2, 6
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    sim_log, _ = simulate(web, seeds, SimConfig(overlays=overlays))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "sheets"),
        FX.synth_web_df(spark, h, p),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, overlays=overlays),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    hosts = {r.class_key: r.retired for r in eng.host_t.read(spark).collect()}
    assert hosts["example,h0,"] == "y"  # overlay budget retired h0
    assert hosts["example,h1,"] == "n"  # h1 ran to completion under k=3


def test_extract_css_standalone(spark):
    css = "@import url('/theme.css'); .a { background: url(img/bg.png); }"
    df = spark.createDataFrame([(css,)], ["css"])
    got = [r.l.url for r in df.select(F.explode(extract_css_udf(F.col("css"))).alias("l")).collect()]
    assert got == ["/theme.css", "img/bg.png"]
