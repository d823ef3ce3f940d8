"""URL-seen set semantics (BdbUriUniqFilterTest / UriUniqFilter interface port)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fp
from heritrix3_spark.operators.urlseen import UrlSeen, fp_udf
from heritrix3_spark.storage import SnapshotCatalog


def _urls_df(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["canonical"]).withColumn(
        "fp", fp_udf(F.col("canonical"))
    )


@pytest.fixture(params=["exact", "bloom", "cuckoo"])
def urlseen(request, tmp_path):
    return UrlSeen(
        SnapshotCatalog(str(tmp_path / "cat")),
        num_buckets=8,
        bloom=request.param != "exact",
        bloom_bits_per_bucket=1 << 14,
        bloom_min_seen=0,  # engage the probe immediately for the test
        kind=request.param if request.param != "exact" else "bloom",
    )


def test_add_then_dedup(spark, urlseen):
    batch1 = _urls_df(spark, [f"http://h{i % 3}.example/p{i}" for i in range(20)])
    assert urlseen.filter_novel(batch1).count() == 20  # empty set: all novel
    assert urlseen.add_fps(batch1) == 20
    assert urlseen.filter_novel(batch1).count() == 0
    batch2 = _urls_df(
        spark, [f"http://h{i % 3}.example/p{i}" for i in range(15, 25)]
    )  # 5 old, 5 new
    novel = urlseen.filter_novel(batch2)
    assert sorted(r.canonical for r in novel.collect()) == sorted(
        f"http://h{i % 3}.example/p{i}" for i in range(20, 25)
    )


def test_fp_udf_matches_scalar(spark):
    df = _urls_df(spark, ["dns:archive.org", "http://archive.org/index.html"])
    got = {r.canonical: r.fp for r in df.collect()}
    assert got["dns:archive.org"] == 8812917769287344085
    assert got["http://archive.org/index.html"] == 6613237167064754714


def test_forget_allows_rediscovery(spark, urlseen):
    urls = ["http://a.example/1", "http://a.example/2"]
    urlseen.add_fps(_urls_df(spark, urls))
    assert urlseen.filter_novel(_urls_df(spark, urls)).count() == 0
    urlseen.forget_fps(_urls_df(spark, ["http://a.example/2"]))
    novel = urlseen.filter_novel(_urls_df(spark, urls)).collect()
    assert [r.canonical for r in novel] == ["http://a.example/2"]


def test_forget_authority_range_delete(spark, urlseen):
    """forgetAllSchemeAuthorityMatching: drop every fp of one authority."""
    a = [f"http://gone.example/p{i}" for i in range(5)]
    b = [f"http://kept.example/p{i}" for i in range(5)]
    urlseen.add_fps(_urls_df(spark, a + b))
    prefix = fp.authority_prefix24(fp.create_key("http://gone.example/p0"))
    urlseen.forget_authority(spark, prefix)
    novel = urlseen.filter_novel(_urls_df(spark, a + b))
    assert sorted(r.canonical for r in novel.collect()) == sorted(a)


def test_count_and_idempotent_add(spark, urlseen):
    df = _urls_df(spark, ["http://x.example/1", "http://x.example/1", "http://x.example/2"])
    assert urlseen.add_fps(df) == 2  # in-batch dup collapsed
    assert urlseen.count(spark) == 2
    assert urlseen.add_fps(df) == 0  # idempotent
    assert urlseen.count(spark) == 2


def test_forget_is_o_delta_and_readd_cancels(spark, urlseen):
    """Admin forgets are tombstone appends (base snapshot untouched, no
    bloom rebuild) and a re-add cancels the tombstone; compaction folds."""
    urls = [f"http://t.example/p{i}" for i in range(8)]
    urlseen.add_fps(_urls_df(spark, urls))
    base_v = urlseen.table.latest_version()
    urlseen.forget_fps(_urls_df(spark, urls[:3]))
    # O(delta): the base table got NO new snapshot, only the tombstone side
    assert urlseen.table.latest_version() == base_v
    assert urlseen.forgot_t.exists()
    assert urlseen.count(spark) == 5
    # re-add one forgotten fp: tombstone canceled, fp seen again
    urlseen.add_fps(_urls_df(spark, [urls[0]]))
    assert urlseen.filter_novel(_urls_df(spark, [urls[0]])).count() == 0
    assert urlseen.filter_novel(_urls_df(spark, [urls[1]])).count() == 1
    # range tombstone + re-add under the same authority: expansion law —
    # the re-added fp lives, its forgotten siblings stay forgotten
    prefix = fp.authority_prefix24(fp.create_key(urls[4]))
    urlseen.forget_authority(spark, prefix)
    assert urlseen.count(spark) == 0  # whole authority gone
    urlseen.add_fps(_urls_df(spark, [urls[4]]))
    assert urlseen.filter_novel(_urls_df(spark, [urls[4]])).count() == 0
    assert urlseen.filter_novel(_urls_df(spark, [urls[5]])).count() == 1
