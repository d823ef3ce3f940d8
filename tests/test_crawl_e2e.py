"""End-to-end golden-crawl parity: Spark engine vs pure-Python simulator.

The analog of Heritrix's selftest suite (engine/src/test/java/org/archive/
crawler/selftest/SimpleSelfTest, CheckpointSelfTest): crawl the synthetic
span web, assert exact (round, class_key, uri, ordinal, disposition)
sequence equality and final url_seen set equality, plus kill/resume
equivalence from a mid-crawl checkpoint.
"""

from __future__ import annotations

import pytest

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

H, P = 3, 8


def _sim_rows(log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["disposition"])
        for l in log
    )


def _eng_rows(log_df):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.disposition)
        for r in log_df.collect()
    )


@pytest.fixture(scope="module")
def smoke_crawl(spark, tmp_path_factory):
    """Run the golden smoke crawl once; several tests assert against it."""
    web = {u: s for u, s in FX.synth_web_rows(H, P)}
    seeds = FX.seed_lines(H)
    sim_log, sim_seen = simulate(web, seeds, SimConfig())
    state = str(tmp_path_factory.mktemp("crawl"))
    eng = CrawlEngine(
        spark,
        state,
        FX.synth_web_df(spark, H, P),
        CrawlConfig(num_buckets=8, ordinal_partitions=2),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    return dict(
        sim_log=sim_log, sim_seen=sim_seen, eng=eng, eng_log=eng_log, state=state
    )


def test_crawl_order_parity(smoke_crawl):
    assert _eng_rows(smoke_crawl["eng_log"]) == _sim_rows(smoke_crawl["sim_log"])


def test_url_seen_parity(spark, smoke_crawl):
    eng_seen = {r.fp for r in smoke_crawl["eng"].urlseen.seen(spark).collect()}
    assert eng_seen == smoke_crawl["sim_seen"]


def test_journal_counts(spark, smoke_crawl):
    """Journal F+ count == scheduled URIs; Fs count == successes."""
    j = smoke_crawl["eng"].journal()
    by_tag = {r.tag: r.cnt for r in j.groupBy("tag").count().withColumnRenamed("count", "cnt").collect()}
    assert by_tag["F+"] == len(smoke_crawl["sim_seen"])
    n_success = sum(1 for l in smoke_crawl["sim_log"] if l["disposition"] == "success")
    assert by_tag["Fs"] == n_success


def test_checkpoint_resume_midcrawl(spark, smoke_crawl):
    """Kill after round 3, resume from checkpoint, finish: identical log
    (CheckpointSelfTest analog)."""
    full = _eng_rows(smoke_crawl["eng_log"])
    eng2 = CrawlEngine.resume(
        spark,
        smoke_crawl["state"],
        FX.synth_web_df(spark, H, P),
        CrawlConfig(num_buckets=8, ordinal_partitions=2),
        tag="r000013",
    )
    assert eng2.round == 13
    resumed_log = eng2.run(max_rounds=60)
    assert _eng_rows(resumed_log) == full


def test_k_per_host_politeness_serialization(spark, tmp_path):
    """k>1 throughput mode: within a round a queue's m-th fetch begins at
    T + m*(duration+politeness) — the serialized politeness clock must
    match the simulator exactly."""
    h, p = 2, 6
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(k_per_host=3))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "k3"),
        FX.synth_web_df(spark, h, p),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, k_per_host=3, bloom=False),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)


def test_total_budget_retirement(spark, tmp_path):
    """Low queueTotalBudget retires queues; engine == simulator
    (WorkQueueFrontier.isOverTotalBudget law)."""
    h, p = 2, 4
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(total_budget=4))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "budget"),
        FX.synth_web_df(spark, h, p),
        CrawlConfig(num_buckets=8, ordinal_partitions=2, total_budget=4, bloom=False),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    hosts = eng.host_t.read(spark)
    assert hosts.filter(hosts.retired == "y").count() > 0
