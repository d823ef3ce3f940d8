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
