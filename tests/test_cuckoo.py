"""Cuckoo-filter URL-seen prefilter (north rule: "bloom/cuckoo-filter
URL-seen set" replacing BdbUriUniqFilter / BloomUriUniqFilter).

Laws from Fan et al. 2014 (public algorithm; operators/cuckoo.py), plus
the url_seen integration: identical dedup semantics to the bloom/exact
paths, cogrouped never-broadcast probe, and the cuckoo-only property —
real deletion on forget.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from heritrix3_spark.operators import cuckoo as CK
from heritrix3_spark.operators.urlseen import UrlSeen, fp_udf
from heritrix3_spark.storage import SnapshotCatalog


# ---------------------------------------------------------------------------
# numpy-level filter laws
# ---------------------------------------------------------------------------
def _rand_fps(n, seed=7):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(-(2**63), 2**63, size=n, dtype=np.int64))


def test_no_false_negatives_and_low_fpp():
    fps = _rand_fps(100_000)
    table, m = CK.build(fps)
    assert CK.contains(fps, table, m).all()  # every inserted key found
    absent = np.setdiff1d(_rand_fps(300_000, seed=11), fps)
    fpp = CK.contains(absent, table, m).mean()
    assert fpp < 0.002  # ~2*SLOTS/2^16 expected ≈ 0.012%


def test_build_is_deterministic():
    fps = _rand_fps(30_000)
    t1, m1 = CK.build(fps)
    t2, m2 = CK.build(fps)
    assert m1 == m2 and (t1 == t2).all()


def test_alt_index_is_involution():
    fps = _rand_fps(10_000)
    m = 1 << 12
    tags = CK._tags(fps)
    i1 = CK._index1(fps, m)
    i2 = CK._alt_index(i1, tags, m)
    back = CK._alt_index(i2, tags, m)
    assert (back == i1).all()


def test_kick_loop_relocation_at_high_load():
    """Force a small table (past-target load) so insertion must kick."""
    fps = _rand_fps(1000)[:900]
    m = 256  # 900 keys / 1024 slots = 88% load — kicks guaranteed
    table, m_out = CK.build(fps, m=m)
    assert CK.contains(fps, table, m_out).all()


def test_delete_removes_only_own_copy():
    fps = _rand_fps(50_000)
    table, m = CK.build(fps)
    half, rest = fps[: len(fps) // 2], fps[len(fps) // 2 :]
    found = CK.delete(half, table, m)
    assert found.all()  # every inserted key's copy located
    # the cuckoo deletion guarantee: NO false negatives for remaining keys
    assert CK.contains(rest, table, m).all()
    # deleted keys drop to the false-positive floor
    assert CK.contains(half, table, m).mean() < 0.005
    # deleted keys can be re-inserted (slots actually freed)
    for fp_val in half[:50]:
        one = np.asarray([fp_val], dtype=np.int64)
        tag = int(CK._tags(one)[0])
        i1 = int(CK._index1(one, m)[0])
        i2 = int(CK._alt_index(np.asarray([i1]), np.asarray([tag], dtype=np.uint16), m)[0])
        assert CK._insert_one(table, m, tag, i1, i2)


def test_shared_tag_copies_are_independent():
    """Two distinct keys colliding on (bucket, tag) hold two copies:
    deleting one leaves the other covered."""
    base = _rand_fps(200_000)
    tags = CK._tags(base)
    m = CK.table_size_for(len(base))
    i1 = CK._index1(base, m)
    # find a colliding pair: same tag, same primary bucket, different fp
    import collections

    seen = {}
    pair = None
    for k in range(len(base)):
        key = (int(tags[k]), int(i1[k]))
        if key in seen and base[seen[key]] != base[k]:
            pair = (base[seen[key]], base[k])
            break
        seen[key] = k
    assert pair is not None, "no collision in sample — widen the sample"
    a, b = pair
    both = np.asarray([a, b], dtype=np.int64)
    table, m2 = CK.build(both, m=64)
    assert CK.delete(np.asarray([a], dtype=np.int64), table, m2)[0]
    assert CK.contains(np.asarray([b], dtype=np.int64), table, m2)[0]


# ---------------------------------------------------------------------------
# url_seen integration (the dedup-semantics suite itself runs for
# kind="cuckoo" via the parametrized fixture in test_urlseen.py)
# ---------------------------------------------------------------------------
def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["canonical"]).withColumn(
        "fp", fp_udf(F.col("canonical"))
    )


@pytest.fixture
def cuckoo_seen(tmp_path):
    return UrlSeen(
        SnapshotCatalog(str(tmp_path / "cat")),
        num_buckets=8,
        bloom=True,
        bloom_min_seen=0,
        kind="cuckoo",
    )


def test_forget_really_deletes_from_filter(spark, cuckoo_seen):
    """The cuckoo-only property: after forget, the PREFILTER itself says
    definitely-new (bloom would stay maybe-seen forever)."""
    urls = [f"http://c.example/p{i}" for i in range(50)]
    cuckoo_seen.add_fps(_urls_df(spark, urls))
    probe = _urls_df(spark, urls).withColumn(
        "__bucket",
        F.pmod(F.shiftrightunsigned("fp", 40), F.lit(8)).cast("int"),
    )
    split = cuckoo_seen._cuckoo_split(spark, probe, "fp")
    assert split.filter(F.col("__maybe_seen")).count() == 50
    cuckoo_seen.forget_fps(_urls_df(spark, urls[:10]))
    split2 = cuckoo_seen._cuckoo_split(spark, probe, "fp")
    maybe = {r.canonical for r in split2.filter(F.col("__maybe_seen")).collect()}
    # the 40 kept urls MUST still hit (no false negatives); the 10
    # forgotten ones are gone from the filter (up to fp-rate stragglers)
    assert set(urls[10:]) <= maybe
    assert len(maybe & set(urls[:10])) <= 1
    # and dedup semantics agree end-to-end
    novel = cuckoo_seen.filter_novel(_urls_df(spark, urls))
    assert sorted(r.canonical for r in novel.collect()) == sorted(urls[:10])


def test_forget_unseen_fp_is_noop(spark, cuckoo_seen):
    """Deleting a never-inserted key would violate the cuckoo contract —
    the layer must drop it before it reaches the filter."""
    urls = [f"http://d.example/p{i}" for i in range(20)]
    cuckoo_seen.add_fps(_urls_df(spark, urls))
    v = cuckoo_seen.cuckoo_table.latest_version()
    cuckoo_seen.forget_fps(_urls_df(spark, ["http://never.example/x"]))
    assert cuckoo_seen.cuckoo_table.latest_version() == v  # untouched
    assert cuckoo_seen.filter_novel(_urls_df(spark, urls)).count() == 0


def test_double_forget_single_copy(spark, cuckoo_seen):
    """Forgetting the same fp twice deletes at most one copy (the second
    forget sees the fp as already-forgotten and is a no-op) — another
    key sharing its tag stays covered."""
    urls = [f"http://e.example/p{i}" for i in range(30)]
    cuckoo_seen.add_fps(_urls_df(spark, urls))
    cuckoo_seen.forget_fps(_urls_df(spark, [urls[0]]))
    v = cuckoo_seen.cuckoo_table.latest_version()
    cuckoo_seen.forget_fps(_urls_df(spark, [urls[0]]))  # no-op
    assert cuckoo_seen.cuckoo_table.latest_version() == v
    novel = cuckoo_seen.filter_novel(_urls_df(spark, urls))
    assert [r.canonical for r in novel.collect()] == [urls[0]]


def test_cuckoo_crawl_parity(spark, tmp_path):
    """Full engine rounds through the cuckoo probe (prefilter_min_seen=0)
    produce the exact crawl AND final seen set the simulator produces —
    the prefilter never changes semantics."""
    from heritrix3_spark import fixtures as FX
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    web = {u: s for u, s in FX.synth_web_rows(3, 5)}
    seeds = FX.seed_lines(3)
    sim_log, sim_seen = simulate(web, seeds, SimConfig())
    eng = CrawlEngine(
        spark,
        str(tmp_path / "state"),
        FX.synth_web_df(spark, 3, 5),
        CrawlConfig(
            num_buckets=4,
            ordinal_partitions=1,
            bloom=True,
            seen_filter="cuckoo",
            prefilter_min_seen=0,
            metrics=False,
        ),
    )
    eng.bootstrap(seeds)
    log = eng.run(max_rounds=60)
    got = sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.disposition)
        for r in log.collect()
    )
    want = sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"], l["disposition"])
        for l in sim_log
    )
    assert got == want
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
