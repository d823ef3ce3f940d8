"""CrawlMapper family laws (CrawlMapper/HashCrawlMapper/LexicalCrawlMapper).

The reference's HashCrawlMapperTest and LexicalCrawlMapperTest are empty
shells ("TODO TESTME!", engine/src/test/java/org/archive/crawler/processor/
*CrawlMapperTest.java), so these tests assert the documented laws directly:
the javadoc mapping example (LexicalCrawlMapper.java:63-71), the
mapString modulo/reduce law (HashCrawlMapper.java:122-135), and the
innerProcessResult divert law (CrawlMapper.java:196-296).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from heritrix3_spark.fp import std64
from heritrix3_spark.functions.psl import reduce_surt_to_assignment_level
from heritrix3_spark.operators.frontier import S_BLOCKED_BY_CUSTOM_PROCESSOR
from heritrix3_spark.operators.mapper import (
    crawl_mapper_split,
    divert_log,
    hash_crawler_name,
    hash_crawler_name_col,
    lexical_crawler_name,
    lexical_crawler_name_col,
)

# the javadoc example map (LexicalCrawlMapper.java:63-71):
#   d crawlerA
#   ~ crawlerB
JAVADOC_MAP = [("d", "crawlerA"), ("~", "crawlerB")]


# ---------------------------------------------------------------------------
# LexicalCrawlMapper.map — TreeMap.tailMap law
# ---------------------------------------------------------------------------
def test_lexical_javadoc_example():
    # "All URIs with 'com,' classKeys will find the 'd' key as the nearest
    # subsequent mapping key, and thus be mapped to 'crawlerA'."
    assert lexical_crawler_name("com,example,", JAVADOC_MAP) == "crawlerA"
    # past 'd' but before '~' -> crawlerB
    assert lexical_crawler_name("org,example,", JAVADOC_MAP) == "crawlerB"
    # tailMap is INCLUSIVE: a classKey equal to a mapping key maps to it
    assert lexical_crawler_name("d", JAVADOC_MAP) == "crawlerA"
    assert lexical_crawler_name("~", JAVADOC_MAP) == "crawlerB"
    # wraparound: nothing lexically >= the key -> first mapping entry
    assert lexical_crawler_name("étude,", JAVADOC_MAP) == "crawlerA"


def test_lexical_column_matches_scalar(spark):
    keys = [
        "com,example,", "org,example,", "d", "dz,", "net,a,", "~", "zz,",
        "étude,", "a,", "",
    ]
    df = spark.createDataFrame([(k,) for k in keys], ["class_key"])
    got = {
        r["class_key"]: r["name"]
        for r in df.select(
            "class_key",
            lexical_crawler_name_col(F.col("class_key"), JAVADOC_MAP).alias("name"),
        ).collect()
    }
    for k in keys:
        assert got[k] == lexical_crawler_name(k, JAVADOC_MAP), k


def test_lexical_map_requires_entries():
    with pytest.raises(ValueError):
        lexical_crawler_name("com,", [])


# ---------------------------------------------------------------------------
# HashCrawlMapper.mapString — fp % bucketCount with Java modulo semantics
# ---------------------------------------------------------------------------
def test_hash_map_string_law():
    for key in ("com,example,", "org,archive,www,", "uk,co,bbc,"):
        fp = std64.fp(key)
        signed = fp - (1 << 64) if fp >= (1 << 63) else fp
        # Java: bucket = fp % count; name = abs(bucket)  (truncated division)
        java_mod = int(np.fmod(np.int64(signed), np.int64(7)))
        assert hash_crawler_name(key, 7) == str(abs(java_mod))


def test_hash_negative_fp_uses_truncated_modulo():
    # find a key whose signed std64 fp is negative: Python's % would give a
    # different residue than Java's truncated % for these
    neg = None
    for i in range(200):
        k = f"com,host{i},"
        if std64.fp(k) >= (1 << 63):
            neg = k
            break
    assert neg is not None
    signed = std64.fp(neg) - (1 << 64)
    assert signed < 0
    python_mod = signed % 7          # floored (wrong for Java)
    java_mod = int(np.fmod(np.int64(signed), np.int64(7)))  # truncated
    if python_mod != abs(java_mod):  # only meaningful when they differ
        assert hash_crawler_name(neg, 7) == str(abs(java_mod))
        assert hash_crawler_name(neg, 7) != str(python_mod)


def test_hash_reduce_regex_takes_first_match():
    # reducePattern keeps matcher.group() of the FIRST find
    key = "com,example,sub,"
    assert hash_crawler_name(key, 5, reduce_regex=r"^[^,]+,[^,]+,") == \
        hash_crawler_name("com,example,", 5)


def test_hash_column_matches_scalar_and_psl_mode(spark):
    keys = ["com,example,", "com,example,sub,", "uk,co,bbc,www,", "org,a,b,c,"]
    df = spark.createDataFrame([(k,) for k in keys], ["class_key"])
    rows = df.select(
        "class_key",
        hash_crawler_name_col(F.col("class_key"), 11).alias("plain"),
        hash_crawler_name_col(F.col("class_key"), 11, use_psl=True).alias("psl"),
    ).collect()
    for r in rows:
        assert r["plain"] == hash_crawler_name(r["class_key"], 11)
        reduced = reduce_surt_to_assignment_level(r["class_key"])
        assert r["psl"] == hash_crawler_name(reduced, 11)
    # PSL mode: www-variant hashes with its assignment-level twin
    by_key = {r["class_key"]: r["psl"] for r in rows}
    assert by_key["uk,co,bbc,www,"] == hash_crawler_name("uk,co,bbc,", 11)


# ---------------------------------------------------------------------------
# CrawlMapper.innerProcessResult + divertLog
# ---------------------------------------------------------------------------
def _candidates(spark):
    rows = [
        # (canonical, class_key, hops_path, via, fetch_status)
        ("http://com.example/a", "com,example,", "L", "http://seed/", 0),
        ("http://org.example/b", "org,example,", "LL", "http://com.example/a", 0),
        ("http://org.example/b2", "org,example,", "LE", None, 0),
        # already fetched (status > 0) -> never re-mapped
        ("http://org.example/done", "org,example,", "L", None, 200),
    ]
    return spark.createDataFrame(
        rows, ["canonical", "class_key", "hops_path", "via", "fetch_status"]
    ).withColumn("annotations", F.lit(None).cast("string"))


def test_crawl_mapper_split_marks_nonlocal(spark):
    df = _candidates(spark)
    target = lexical_crawler_name_col(F.col("class_key"), JAVADOC_MAP)
    out = crawl_mapper_split(df, target, local_name="crawlerA")
    rows = {r["canonical"]: r for r in out.collect()}
    # local (crawlerA) rows untouched
    assert rows["http://com.example/a"]["fetch_status"] == 0
    assert rows["http://com.example/a"]["annotations"] is None
    # non-local unfetched rows -> -5002 + to: annotation (disregard law)
    for u in ("http://org.example/b", "http://org.example/b2"):
        assert rows[u]["fetch_status"] == S_BLOCKED_BY_CUSTOM_PROCESSOR
        assert rows[u]["annotations"] == "to:crawlerB"
    # fetched rows pass the fetchStatus<=0 gate untouched
    assert rows["http://org.example/done"]["fetch_status"] == 200
    assert rows["http://org.example/done"]["annotations"] is None


def test_divert_log_line_format_and_fp_dedup(spark):
    df = _candidates(spark)
    target = lexical_crawler_name_col(F.col("class_key"), JAVADOC_MAP)
    out = crawl_mapper_split(df, target, local_name="crawlerA")
    diverted = out.filter(F.col("fetch_status") == S_BLOCKED_BY_CUSTOM_PROCESSOR)
    # duplicate URI in the same batch -> ONE line (recentlySeen law)
    diverted = diverted.unionAll(diverted.limit(1))
    log = divert_log(diverted).collect()
    by_line = sorted(r["line"] for r in log)
    assert by_line == [
        "org,example, CrawlURI http://org.example/b LL http://com.example/a",
        "org,example, CrawlURI http://org.example/b2 LE ",
    ]
    assert all(r["target"] == "crawlerB" for r in log)
    # dedup key is the std64 uri fingerprint
    fps = [r["fp"] for r in log]
    assert len(fps) == len(set(fps)) == 2


# ---------------------------------------------------------------------------
# engine-vs-simulator crawl parity (mapper as part of the round laws)
# ---------------------------------------------------------------------------
def _parity(spark, tmp_path, name, cfg_kw, hosts=4, pages=3):
    from heritrix3_spark import fixtures as FX
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    web = {u: s for u, s in FX.synth_web_rows(hosts, pages)}
    seeds = FX.seed_lines(hosts)
    sim_div: list = []
    sim_log, sim_seen = simulate(
        web, seeds, SimConfig(**cfg_kw), diversions=sim_div
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        FX.synth_web_df(spark, hosts, pages),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=60)
    srows = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    ediv = sorted(
        (r.round, r.target, r.line) for r in eng.diversions().collect()
    )
    assert ediv == sorted(sim_div)
    return eng, eng_log, sim_log


def test_lexical_mapper_crawl_parity_check_uri(spark, tmp_path):
    # h0/h1 -> crawlerA (local), h2/h3 -> crawlerB; check_uri only: foreign
    # seeds are scheduled, then diverted at emit time (-5002 disregard)
    cfg = dict(
        crawl_mapper="lexical",
        mapper_map=(("example,h1,~", "crawlerA"), ("~", "crawlerB")),
        mapper_local_name="crawlerA",
        mapper_check_uri=True,
        mapper_check_outlinks=False,
    )
    eng, eng_log, _ = _parity(spark, tmp_path, "lex_uri", cfg)
    rows = eng_log.collect()
    diverted = [r for r in rows if r.fetch_status == -5002]
    assert diverted, "foreign-host rows must divert"
    assert all(r.disposition == "disregard" for r in diverted)
    assert all(r.annotation == "to:crawlerB" for r in diverted)
    assert all(r.class_key.startswith(("example,h2,", "example,h3,"))
               for r in diverted)
    # local rows crawled normally
    assert any(r.fetch_status == 200 and r.class_key.startswith("example,h0,")
               for r in rows)
    # every diverted row produced a divert-log line on the foreign target
    div = eng.diversions().collect()
    assert div and all(r.target == "crawlerB" for r in div)
    assert all(" CrawlURI " in r.line for r in div)


def test_lexical_mapper_crawl_parity_check_outlinks(spark, tmp_path):
    # check_outlinks only: foreign candidates never enter the frontier (no
    # -5002 rows; the seen set excludes foreign URLs beyond the seeds)
    cfg = dict(
        crawl_mapper="lexical",
        mapper_map=(("example,h1,~", "crawlerA"), ("~", "crawlerB")),
        mapper_local_name="crawlerA",
        mapper_check_uri=False,
        mapper_check_outlinks=True,
    )
    eng, eng_log, _ = _parity(spark, tmp_path, "lex_out", cfg)
    rows = eng_log.collect()
    # seeds of foreign hosts were bootstrapped pre-mapper and crawl normally
    # (checkOutlinks never touches already-queued URIs) but their foreign
    # outlink candidates are dropped
    assert not [r for r in rows if r.fetch_status == -5002]
    div = eng.diversions().collect()
    assert div and all(r.target == "crawlerB" for r in div)


def test_hash_mapper_crawl_parity_both_checks(spark, tmp_path):
    # hash mode with the PSL reduce: pick the local name h0 actually maps to
    local = hash_crawler_name(
        reduce_surt_to_assignment_level("example,h0,"), 2
    )
    cfg = dict(
        crawl_mapper="hash",
        mapper_crawler_count=2,
        mapper_psl_reduce=True,
        mapper_local_name=local,
        mapper_check_uri=True,
        mapper_check_outlinks=True,
    )
    eng, eng_log, _ = _parity(spark, tmp_path, "hash_both", cfg)
    # at least one of the 4 hosts should map away (2 buckets, 4 hosts);
    # if all map local the test web is degenerate — guard on that
    targets = {
        hash_crawler_name(reduce_surt_to_assignment_level(f"example,h{i},"), 2)
        for i in range(4)
    }
    if len(targets) > 1:
        assert eng.diversions().count() > 0
