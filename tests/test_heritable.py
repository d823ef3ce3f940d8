"""Heritable data keys (CrawlURI.makeHeritable/inheritFrom,
CrawlURI.java:1360-1375, 1469-1483) + sourceTagSeeds
(SeedModule.java:40-46): the source tag stamped on each seed rides the
generic data-map inheritance to every descendant."""

from __future__ import annotations

from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate


def test_source_tag_inheritance_parity(spark, tmp_path):
    """Exact parity of (round, canonical, ordinal, source_tag): every URI's
    source_tag equals its seed ancestor's URI, via the generic mechanism."""
    h, p = 2, 4
    web = {u: s for u, s in FX.synth_web_rows(h, p)}
    seeds = FX.seed_lines(h)
    cfg_kw = dict(source_tag_seeds=True)
    sim_log, _ = simulate(web, seeds, SimConfig(**cfg_kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "herit"),
        FX.synth_web_df(spark, h, p),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    srows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l.get("source_tag"))
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.canonical, r.ordinal, r.source_tag) for r in eng_log.collect()
    )
    assert erows == srows
    # every fetched URI carries its seed's URI as the tag
    tags = {r[3] for r in erows}
    assert tags == {f"http://h{i}.example/p0" for i in range(h)}
    # descendants (non-seeds) inherited the tag through the data map
    descendants = [r for r in erows if not r[1].endswith("/p0")]
    assert descendants and all(r[3] is not None for r in descendants)
    # the SourceTagsReport groups by (source, queue)
    rep = eng.reports()["source_tags"].collect()
    assert {r.source for r in rep} == tags
    assert sum(r.n_urls for r in rep) == len(erows)


def test_source_tag_off_by_default(spark, tmp_path):
    eng = CrawlEngine(
        spark,
        str(tmp_path / "nosrc"),
        FX.synth_web_df(spark, 1, 2),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(1))
    eng.run_round()
    rows = eng.crawl_log().collect()
    assert rows and all(r.source_tag is None for r in rows)
