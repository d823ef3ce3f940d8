"""Structured-Streaming consumption of the frontier journal.

Heritrix's recovery journal (`frontier.recover.gz`,
engine/.../frontier/FrontierJournal.java:52-115) and its 20-second
statistics cadence (StatisticsTracker.java:222) are stream-shaped: an
append-only event feed consumed incrementally. The engine's ``events``
table is exactly that feed, and because every round lands as a new
snapshot directory, Spark's file-source streaming consumes it natively —
each round's delta is one micro-batch.

Use cases:
* live crawl dashboards (disposition counts, per-host progress) without
  touching the crawl loop;
* incremental downstream pipelines (e.g. ship each round's fetched doc
  ids to a training-data ingest) with exactly-once file-source semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), True),
        StructField("tag", StringType(), True),
        StructField("class_key", StringType(), True),
        StructField("uri", StringType(), True),
        StructField("canonical", StringType(), True),
        StructField("ordinal", LongType(), True),
        StructField("fetch_status", IntegerType(), True),
        StructField("disposition", StringType(), True),
        StructField("is_seed", BooleanType(), True),
        # event time: the crawl's virtual clock (ms) at emission — the
        # round's serial clock base; windowed aggs and watermarks key on it
        StructField("clock_ms", LongType(), True),
    ]
)

#: the full persisted event row — EVENTS_SCHEMA plus the crawl.log detail
#: columns (annotation / source seed / mimetype / size) that feed
#: publishers need (CrawlLogJsonBuilder field set). Kept separate so the
#: dashboard aggregates keep their pruned 9-column scan.
FULL_EVENTS_SCHEMA = StructType(
    list(EVENTS_SCHEMA.fields)
    + [
        StructField("annotation", StringType(), True),
        StructField("source_tag", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", LongType(), True),
    ]
)


def journal_stream(
    spark: SparkSession, state_dir: str, full: bool = False
) -> DataFrame:
    """Streaming DataFrame over the crawl's events table (all snapshots).

    ``full=True`` reads the complete event row (FULL_EVENTS_SCHEMA) for
    record-shaped consumers like ``crawl_log_feed``; the default pruned
    schema keeps dashboard aggregates cheap."""
    schema = FULL_EVENTS_SCHEMA if full else EVENTS_SCHEMA
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(f"{state_dir}/events/v*")
    )


def disposition_counts(stream: DataFrame) -> DataFrame:
    """Running journal-tag counts (F+/Fs/Fr/Fd/Ff) — the live progress
    dashboard aggregate."""
    return stream.groupBy("tag").count()


def per_round_throughput(stream: DataFrame) -> DataFrame:
    """Per-round fetched/scheduled counts — CrawlStatSnapshot cadence
    analog keyed by round instead of wall-clock."""
    return stream.groupBy("round").agg(
        F.sum(F.when(F.col("tag") == "F+", 1).otherwise(0)).alias("scheduled"),
        F.sum(F.when(F.col("tag") != "F+", 1).otherwise(0)).alias("finished"),
    )


def run_available_now(agg: DataFrame, query_name: str):
    """Drain everything currently in the journal into an in-memory table
    (availableNow trigger) and return the finished StreamingQuery."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def windowed_throughput(
    stream: DataFrame,
    window_duration: str = "10 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Tumbling event-time windows of journal-tag counts with a watermark.

    Event time is the crawl's VIRTUAL clock (``clock_ms`` — the same
    serial politeness clock the frontier runs on), so the aggregate means
    "dispositions per N seconds of crawl time" regardless of how fast the
    engine replays them. The watermark bounds state: a window finalizes
    (append-mode emit) once the watermark passes its end, tolerating
    late-arriving events up to the threshold — in this journal, rows of a
    round that lands while later rounds' files are already committed
    (file-source micro-batches are per-file, not per-round). This is the
    StatisticsTracker 20-second-snapshot cadence (StatisticsTracker.java:
    222) re-expressed as a standard Structured Streaming windowed agg."""
    ev = stream.withColumn("event_time", F.timestamp_millis(F.col("clock_ms")))
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window_duration), "tag")
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "tag",
            "count",
        )
    )


#: output/state columns of :func:`host_progress_stateful`
_PROGRESS_OUT = (
    "class_key string, successes long, finished long, scheduled long, "
    "last_round long"
)
_PROGRESS_STATE = "successes long, finished long, scheduled long, last_round long"


def host_progress_stateful(stream: DataFrame) -> DataFrame:
    """Per-queue running progress as a CUSTOM stateful streaming operator
    (``applyInPandasWithState``): for every class_key, arbitrary state
    (success / finished / scheduled totals + last round seen) folds over
    the journal micro-batches, one updated row emitted per queue per
    batch — the live per-host dashboard without re-aggregating history
    each trigger (the groupBy().count() dashboards recompute; this one
    carries O(queues) state forward). The update function sees Arrow
    batches per group, never per-row Python."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        suc, fin, sched, last = (
            state.get if state.exists else (0, 0, 0, -1)
        )
        for pdf in pdfs:
            tags = pdf["tag"]
            suc += int((tags == "Fs").sum())
            fin += int(tags.isin(["Fs", "Ff", "Fd"]).sum())
            sched += int((tags == "F+").sum())
            if len(pdf):
                last = max(last, int(pdf["round"].max()))
        state.update((suc, fin, sched, last))
        yield pd.DataFrame(
            [[key[0], suc, fin, sched, last]],
            columns=["class_key", "successes", "finished", "scheduled", "last_round"],
        )

    return stream.groupBy("class_key").applyInPandasWithState(
        update,
        _PROGRESS_OUT,
        _PROGRESS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_update_available_now(out: DataFrame, checkpoint_dir: str) -> list:
    """Drain an update-mode stateful stream, collecting every emitted row
    (driver-side list — dashboard-scale outputs only)."""
    rows: list = []
    q = (
        out.writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows
