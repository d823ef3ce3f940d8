"""Engine-pluggable queue-assignment policies
(frontier/{Hostname,AssignmentLevelSurt,Bucket}QueueAssignmentPolicy.java):
exact engine-vs-simulator crawl parity under each policy, including the
base-policy law that prerequisites ride their trigger's queue."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.functions import surt as SU
from heritrix3_spark.simulator import SimConfig, simulate


@pytest.mark.parametrize("policy", ["hostname", "assignment_level", "bucket"])
def test_queue_policy_crawl_parity(spark, tmp_path, policy):
    h, p = 2, 4
    web = {u: s for u, s in FX.synth_web_rows(h, p, robots=True)}
    seeds = FX.seed_lines(h)
    cfg_kw = dict(queue_assignment=policy, robots="obey")
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**cfg_kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / policy),
        FX.synth_web_df(spark, h, p, robots=True),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    keys = {r[1] for r in erows}
    if policy == "hostname":
        assert keys == {f"h{i}.example" for i in range(h)}
    elif policy == "bucket":
        assert all(k.isdigit() for k in keys)
    # robots prerequisites were fetched and rode their trigger's queue
    assert any(r[2].endswith("/robots.txt") for r in erows)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


def test_policy_scalar_column_twins(spark):
    uris = [
        "http://a.example/x",
        "https://b.example/y",
        "https://c.example:8443/z",
        "http://news.bbc.co.uk/p",
        "http://user:pw@d.example/q",
    ]
    df = spark.createDataFrame([(u,) for u in uris], ["uri"])
    for col_fn, scalar in (
        (SU.hostname_class_key_col, SU.hostname_class_key),
        (SU.assignment_level_class_key_col, SU.assignment_level_class_key),
        (SU.bucket_class_key_col, SU.bucket_class_key),
    ):
        got = [r[0] for r in df.select(col_fn(F.col("uri"))).collect()]
        assert got == [scalar(u) for u in uris], col_fn.__name__
