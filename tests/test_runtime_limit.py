"""RuntimeLimitEnforcer (prefetch/RuntimeLimitEnforcer.java:64-197).

The reference's RuntimeLimitEnforcerTest is an empty shell ("TODO
TESTME!"), so the three operations are asserted against the documented
laws: PAUSE (resumable; raising the limit continues, re-running without
raising pauses again immediately), TERMINATE (FINISHED_TIME_LIMIT), and
BLOCK_URIS (-5004 fail + "Runtime exceeded {ms}ms" annotation on every
subsequently-processed URI) — each in exact engine-vs-simulator parity.
"""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

HOSTS, PAGES = 2, 4


def _rows(log_df):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition)
        for r in log_df.collect()
    )


def _sim_rows(sim_log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"])
        for l in sim_log
    )


def _engine(spark, tmp_path, name, **cfg_kw):
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        FX.synth_web_df(spark, HOSTS, PAGES),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(FX.seed_lines(HOSTS))
    return eng


def test_runtime_limit_block_parity(spark, tmp_path):
    web = {u: s for u, s in FX.synth_web_rows(HOSTS, PAGES)}
    kw = dict(runtime_limit_s=5, runtime_limit_op="block")
    sim_log, sim_seen = simulate(web, FX.seed_lines(HOSTS), SimConfig(**kw))
    eng = _engine(spark, tmp_path, "block", **kw)
    log = eng.run(max_rounds=60)
    assert _rows(log) == _sim_rows(sim_log)
    rows = log.collect()
    blocked = [r for r in rows if r.fetch_status == -5004]
    assert blocked, "rounds past the limit must block"
    assert all(r.disposition == "fail" for r in blocked)
    assert all(r.annotation == "Runtime exceeded 5000ms" for r in blocked)
    # rounds before the limit crawled normally
    assert any(r.fetch_status == 200 for r in rows)
    # blocked URIs still wound up in the crawl log (the reference's stated
    # purpose for BLOCK_URIS) and the frontier drained to completion
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


def test_runtime_limit_terminate_parity(spark, tmp_path):
    web = {u: s for u, s in FX.synth_web_rows(HOSTS, PAGES)}
    kw = dict(runtime_limit_s=5, runtime_limit_op="terminate")
    sim_log, _ = simulate(web, FX.seed_lines(HOSTS), SimConfig(**kw))
    eng = _engine(spark, tmp_path, "term", **kw)
    log = eng.run(max_rounds=60)
    assert eng.stop_status == "FINISHED_TIME_LIMIT"
    assert _rows(log) == _sim_rows(sim_log)
    # strictly fewer rows than an unlimited crawl
    unlimited, _ = simulate(web, FX.seed_lines(HOSTS), SimConfig())
    assert len(_rows(log)) < len(unlimited)


def test_runtime_limit_pause_resume_law(spark, tmp_path):
    web = {u: s for u, s in FX.synth_web_rows(HOSTS, PAGES)}
    eng = _engine(spark, tmp_path, "pause", runtime_limit_s=5,
                  runtime_limit_op="pause")
    eng.run(max_rounds=60)
    assert eng.stop_status == "PAUSED_RUNTIME_LIMIT"
    paused_round = eng.round
    # re-running WITHOUT raising the limit pauses again immediately
    eng.run(max_rounds=60)
    assert eng.stop_status == "PAUSED_RUNTIME_LIMIT"
    assert eng.round == paused_round
    # raising the limit resumes the crawl to completion; the final log is
    # byte-identical to a never-limited crawl (pause loses nothing)
    eng.cfg.runtime_limit_s = 10_000_000
    log = eng.run(max_rounds=60)
    sim_log, sim_seen = simulate(web, FX.seed_lines(HOSTS), SimConfig())
    assert _rows(log) == _sim_rows(sim_log)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
