"""processErrorOutlinks law (postprocessor/CandidatesProcessor.java:101-112):
error responses drop their outlinks by default; the flag schedules them."""

from __future__ import annotations

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.simulator import SimConfig, simulate

WEB = {
    "http://h0.example/p0": [
        ("text", "front", None, 0),
        ("link", "bad", "http://h0.example/broken", 1),
    ],
    # this page answers 500 (override) but still carries outlinks
    "http://h0.example/broken": [
        ("text", "server error page", None, 0),
        ("link", "hidden", "http://h0.example/behind", 1),
    ],
    "http://h0.example/behind": [("text", "leaf", None, 0)],
}
SEEDS = ["http://h0.example/p0"]
OVERRIDES = {"http://h0.example/broken": 500}


def _run(spark, tmp_path, name, **cfg_kw):
    sim_log, sim_seen = simulate(
        WEB, SEEDS, SimConfig(**cfg_kw), status_overrides=OVERRIDES
    )
    ov = spark.createDataFrame(
        [(u, s) for u, s in OVERRIDES.items()], ["canonical", "status"]
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        spark.createDataFrame([(u, s) for u, s in WEB.items()], FX.DOCUMENTS_SCHEMA),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
        fetch_status_overrides=ov,
    )
    eng.bootstrap(SEEDS)
    eng_log = eng.run(max_rounds=20)
    srows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in eng_log.collect()
    )
    return srows, erows


def test_error_outlinks_dropped_by_default(spark, tmp_path):
    srows, erows = _run(spark, tmp_path, "off")
    assert erows == srows
    assert not any(r[1].endswith("/behind") for r in erows)


def test_error_outlinks_followed_with_flag(spark, tmp_path):
    srows, erows = _run(spark, tmp_path, "on", process_error_outlinks=True)
    assert erows == srows
    behind = [r for r in erows if r[1].endswith("/behind")]
    assert behind and behind[0][4] == "success"
