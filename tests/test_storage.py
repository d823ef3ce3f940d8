"""Snapshot table layer: append chains, time-travel, prune safety."""

from __future__ import annotations

from heritrix3_spark.storage import SnapshotCatalog


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["x"])


def test_overwrite_and_time_travel(spark, tmp_path):
    t = SnapshotCatalog(str(tmp_path)).table("t")
    t.overwrite(_df(spark, [1, 2]))
    t.overwrite(_df(spark, [3]))
    assert sorted(r.x for r in t.read(spark).collect()) == [3]
    assert sorted(r.x for r in t.read(spark, version=1).collect()) == [1, 2]


def test_append_chain_reads_all_deltas(spark, tmp_path):
    t = SnapshotCatalog(str(tmp_path)).table("t")
    t.overwrite(_df(spark, [1]))
    t.append(_df(spark, [2]))
    t.append(_df(spark, [3]))
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]
    # mid-chain time travel
    assert sorted(r.x for r in t.read(spark, version=2).collect()) == [1, 2]
    # an overwrite resets the chain
    t.overwrite(_df(spark, [9]))
    assert sorted(r.x for r in t.read(spark).collect()) == [9]


def test_rollback_then_continue(spark, tmp_path):
    """Pointer rollback (resume) + new writes after it."""
    t = SnapshotCatalog(str(tmp_path)).table("t")
    t.overwrite(_df(spark, [1]))
    t.append(_df(spark, [2]))
    t.append(_df(spark, [3]))
    t._commit(2)  # roll back to v2 (1,2)
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2]
    t.append(_df(spark, [4]))  # overwrites the abandoned v3 dir
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 4]


def test_prune_keeps_live_chain(spark, tmp_path):
    """GC never drops a delta dir still referenced by the latest chain."""
    t = SnapshotCatalog(str(tmp_path)).table("t")
    t.overwrite(_df(spark, [1]))  # v1 (in live chain)
    t.append(_df(spark, [2]))  # v2
    t.append(_df(spark, [3]))  # v3
    t.append(_df(spark, [4]))  # v4
    t.prune(keep_last=1)
    # all of v1..v4 are in the live chain -> still readable
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3, 4]
    # a fresh overwrite orphans the old chain; prune then removes it
    t.overwrite(_df(spark, [9]))
    t.prune(keep_last=1)
    assert sorted(r.x for r in t.read(spark).collect()) == [9]
    import os

    assert not os.path.exists(t.snapshot_path(1))


def test_checkpoint_aware_gc_keeps_resume_working(spark, tmp_path):
    """prune_checkpoints GCs history but every kept checkpoint stays
    resumable (Iceberg expire_snapshots analog)."""
    import os

    from heritrix3_spark import fixtures as FX
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine

    state = str(tmp_path / "gc")
    eng = CrawlEngine(
        spark,
        state,
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(FX.seed_lines(2))
    eng.run(max_rounds=6)
    all_tags = eng.catalog.list_checkpoints()
    assert len(all_tags) >= 5
    # merge-on-read: every frontier dir is live until a compaction folds
    # the chain (Iceberg: expire_snapshots only frees files a
    # rewrite_data_files made unreachable) — compact, checkpoint the
    # compacted state, then GC down to checkpoints that no longer
    # reference the pre-compaction chain
    eng.frontier_t.compact(spark, repartition_by="class_key", num_parts=4)
    eng._checkpoint()
    n_dirs_before = len(os.listdir(f"{state}/frontier"))
    kept = eng.catalog.prune_checkpoints(keep_last=1)
    assert eng.catalog.list_checkpoints() == kept
    n_dirs_after = len(os.listdir(f"{state}/frontier"))
    assert n_dirs_after < n_dirs_before  # actually freed something
    # resume from the oldest KEPT checkpoint and finish the crawl
    eng2 = CrawlEngine.resume(
        spark,
        state,
        FX.synth_web_df(spark, 2, 4),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
        tag=kept[0],
    )
    log = eng2.run(max_rounds=30)
    assert log.count() > 0
    assert eng2.export_pending_uris().count() == 0  # crawl completed


def test_catalog_checkpoints(tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    cat.write_checkpoint("r000001", {"t": 3}, {"clock": 42})
    cat.write_checkpoint("r000002", {"t": 4}, {"clock": 99})
    assert cat.list_checkpoints() == ["r000001", "r000002"]
    ck = cat.read_checkpoint("r000001")
    assert ck["tables"] == {"t": 3} and ck["state"]["clock"] == 42
    assert cat.read_checkpoint("missing") is None


def test_time_bucketed_table_mature_and_min(spark, tmp_path):
    """Futures-table storage law: whole-bucket drain, metadata-only min."""
    from heritrix3_spark.storage import TimeBucketedAppendTable

    cat = SnapshotCatalog(str(tmp_path))
    t = TimeBucketedAppendTable(cat, "fut", "rt")

    def batch(vals, rt):
        return spark.createDataFrame([(v, rt) for v in vals], ["x", "rt"])

    t.schedule(batch([1, 2], 100), bucket=100)
    t.schedule(batch([3], 200), bucket=200)
    t.schedule(batch([4, 5], 300), bucket=300)
    assert t.min_bucket() == 100
    # nothing due -> no read, no commit
    v0 = t.latest_version()
    assert t.mature(spark, 50) is None and t.latest_version() == v0
    # drain buckets <= 200 (two whole batches), O(1)-metadata drop
    matured = t.mature(spark, 200)
    assert sorted(r.x for r in matured.collect()) == [1, 2, 3]
    assert t.min_bucket() == 300
    assert sorted(r.x for r in t.read(spark).collect()) == [4, 5]
    # re-schedule after drain keeps working
    t.schedule(batch([6], 150), bucket=150)
    assert t.min_bucket() == 150
    got = t.mature(spark, 400)
    assert sorted(r.x for r in got.collect()) == [4, 5, 6]
    assert t.min_bucket() is None


def test_time_bucketed_table_time_travel(spark, tmp_path):
    """Rolling the pointer back past a retain commit restores the batch."""
    from heritrix3_spark.storage import TimeBucketedAppendTable

    cat = SnapshotCatalog(str(tmp_path))
    t = TimeBucketedAppendTable(cat, "fut", "rt")
    t.schedule(spark.createDataFrame([(1, 10)], ["x", "rt"]), bucket=10)
    v_before = t.latest_version()
    t.mature(spark, 10)
    assert t.min_bucket() is None
    t.t._commit(v_before)  # checkpoint-resume rollback path
    assert t.min_bucket() == 10


def test_fold_tail_bounds_chain_and_never_refolds(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    t = cat.table("events")
    t.overwrite(_df(spark, [0]))
    for i in range(1, 9):
        t.append(_df(spark, [i]))
    assert len(t._parents(t.latest_version())) == 9
    assert t.fold_tail(spark, every=8)
    chain = t._parents(t.latest_version())
    # base overwrite + 1 folded dir
    assert len(chain) == 2
    assert sorted(r.x for r in t.read(spark).collect()) == list(range(9))
    # folded dir is marked: the next fold waits for 8 NEW appends
    assert not t.fold_tail(spark, every=8)
    for i in range(9, 17):
        t.append(_df(spark, [i]))
    assert t.fold_tail(spark, every=8)
    assert len(t._parents(t.latest_version())) == 3
    assert sorted(r.x for r in t.read(spark).collect()) == list(range(17))


def test_schema_pinning_recorded_and_legacy_fallback(spark, tmp_path):
    """r5: commits record schema.json in the sidecar and reads pass it
    explicitly (no footer-inference job); snapshots written BEFORE the
    key existed (r4 checkpoints being resumed) must still read via
    inference."""
    import json
    import os

    t = SnapshotCatalog(str(tmp_path)).table("t")
    t.overwrite(_df(spark, [1, 2]))
    t.append(_df(spark, [3]))
    metas = [t._meta(v) for v in t._parents(t.latest_version())]
    assert all("schema" in m for m in metas)
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]
    # simulate a legacy sidecar: strip the schema key from every meta
    for f in os.listdir(t.dir):
        if f.startswith("_meta_"):
            p = os.path.join(t.dir, f)
            with open(p) as fh:
                m = json.load(fh)
            m.pop("schema", None)
            with open(p, "w") as fh:
                json.dump(m, fh)
    assert sorted(r.x for r in t.read(spark).collect()) == [1, 2, 3]
