"""Round frames must not leak BlockManager blocks across rounds.

localCheckpoint/persist blocks are held strongly by the BlockManager until
the ContextCleaner reaps a GC'd RDD handle — on a long-lived driver
(a months-long crawl; this test suite's session fixture) leaked round
frames once accumulated into a full-GC death spiral. The engine now
releases every round-scoped frame at end-of-round (`_free_round_frames`);
this pins it: after a multi-round crawl the session's cached-RDD count
returns to its pre-crawl level.
"""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_rounds_release_their_cached_blocks(spark, tmp_path):
    before = _n_cached(spark)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "state"),
        FX.synth_web_df(spark, 3, 8),
        CrawlConfig(num_buckets=8, ordinal_partitions=2, bloom=True),
    )
    eng.bootstrap(FX.seed_lines(3))
    rounds = 0
    while rounds < 6 and eng.run_round():
        rounds += 1
        # every round ends clean — no monotonic growth round-over-round
        assert _n_cached(spark) <= before + 1, (
            f"round {rounds} leaked cached RDDs: "
            f"{_n_cached(spark)} vs {before} before the crawl"
        )
    assert rounds >= 3  # the crawl actually ran multiple rounds
    assert _n_cached(spark) <= before + 1
