"""Statistics / reporting aggregations (SURVEY §2.13).

Re-expresses Heritrix's StatisticsTracker / CrawlStatSnapshot / report
generators as grouped aggregations:

- per-round crawl snapshot: docs/sec, congestion ratio, average depth,
  deepest queue (reporting/CrawlStatSnapshot.java:74-120;
  congestionRatio WorkQueueFrontier.java:1583-1593;
  averageDepth/deepestUri WorkQueueFrontier.java:1566-1577)
- FetchStats per host (modules/.../fetcher/FetchStats.java:45-100;
  AbstractFrontier.tally :620-645): per-host pivot of dispositions
- response-code report, seeds report (reporting/*.java)
- Histotable analog = plain groupBy().count()

And the recrawl/content-digest history (SURVEY §2.12):
- fetch_history keyed by content digest
  (modules/.../recrawl/*.java, BdbContentDigestHistory.java); duplicate-
  by-hash accounting mirrors CrawledBytesHistotable's novel/dupByHash
  (engine/.../util/CrawledBytesHistotable.java:36-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def host_fetch_stats(crawl_log: DataFrame) -> DataFrame:
    """FetchStats per queue: disposition pivot + URI counts."""
    return (
        crawl_log.groupBy("class_key")
        .pivot("disposition", ["success", "retry", "disregard", "fail"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


def response_code_report(crawl_log: DataFrame) -> DataFrame:
    return (
        crawl_log.groupBy("fetch_status")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("fetch_status"))
    )


def seeds_report(crawl_log: DataFrame, frontier_journal: DataFrame) -> DataFrame:
    """SeedRecord disposition: the first disposition of each seed-scheduled
    URI (ordinals assigned at bootstrap round 0)."""
    seeds = frontier_journal.filter((F.col("tag") == "F+") & F.col("is_seed")).select(
        "canonical", "ordinal"
    )
    w = Window.partitionBy("canonical").orderBy("round")
    first_disp = (
        crawl_log.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("canonical", "disposition", "fetch_status")
    )
    return seeds.join(first_disp, "canonical", "left").select(
        "canonical", "ordinal", "disposition", "fetch_status"
    )


def frontier_summary(
    host_state: DataFrame,
    clock: int,
    precedence_floor: int,
    default_precedence: int,
    queue_precedence: DataFrame | None = None,
) -> DataFrame:
    """Queue-state counts of the frontier report (WorkQueueFrontier
    .reportTo, WorkQueueFrontier.java:1253-1345; shortReportLineTo
    :1161-1199): one row with

    - ``total_queues`` — allQueues.size()
    - ``active_queues`` = ready + snoozed (the reference adds in-process;
      the macro-batch engine fully disposes each round's picks, so
      in-process is structurally 0 between rounds)
    - ``ready_queues`` — live (unretired, pending > 0, precedence below
      the floor) and awake (wake_time <= clock)
    - ``snoozed_queues`` — live but wake_time > clock
    - ``inactive_queues`` — unretired with pending > 0 whose queue
      precedence sits at/above the precedence floor (the reference's
      ineligible-inactive; the engine has no managed inactive rotation —
      every eligible queue activates each round)
    - ``retired_queues`` — retired == 'y'
    - ``exhausted_queues`` — unretired with pending == 0 (the reference
      derives this by subtraction; the four unretired states partition
      exactly here, so both derivations agree)

    ``queue_precedence`` joins an optional (class_key, queue_precedence)
    frame (HighestUriQueuePrecedencePolicy output); absent keys take
    ``default_precedence`` — the same law run_round uses for activation.
    One aggregate job over host_state (O(queues), never the frontier).
    """
    hs = host_state
    if queue_precedence is not None:
        hs = hs.join(queue_precedence, "class_key", "left")
        prec = F.coalesce(
            F.col("queue_precedence"), F.lit(default_precedence)
        )
    else:
        prec = F.lit(default_precedence)
    unretired = F.col("retired") == "n"
    live = unretired & (F.col("pending") > 0) & (prec < precedence_floor)

    def tally(cond, name):
        return F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).alias(name)

    return hs.agg(
        F.count("*").alias("total_queues"),
        tally(live, "active_queues"),
        tally(live & (F.col("wake_time") <= F.lit(clock)), "ready_queues"),
        tally(live & (F.col("wake_time") > F.lit(clock)), "snoozed_queues"),
        tally(
            unretired & (F.col("pending") > 0) & (prec >= precedence_floor),
            "inactive_queues",
        ),
        tally(~unretired, "retired_queues"),
        tally(unretired & (F.col("pending") <= 0), "exhausted_queues"),
    )


def frontier_uri_totals(crawl_log: DataFrame) -> DataFrame:
    """URI-count half of the frontier report (AbstractFrontier counter
    laws, AbstractFrontier.java:736-790): succeeded / failed /
    disregarded tallies of finally-disposed URIs and their sum
    ``finished`` (finishedUriCount :752-753). Retry rows are not finished
    (needsReenqueuing); quota-"blocked" rows never reach the crawl log
    (they re-enter the frontier via forceRetire)."""
    return crawl_log.agg(
        F.coalesce(
            F.sum(F.when(F.col("disposition") == "success", 1)), F.lit(0)
        ).alias("succeeded"),
        F.coalesce(
            F.sum(F.when(F.col("disposition") == "fail", 1)), F.lit(0)
        ).alias("failed"),
        F.coalesce(
            F.sum(F.when(F.col("disposition") == "disregard", 1)), F.lit(0)
        ).alias("disregarded"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("disposition").isin("success", "fail", "disregard"), 1
                )
            ),
            F.lit(0),
        ).alias("finished"),
    )


def queue_depth_stats(host_state: DataFrame) -> DataFrame:
    """averageDepth + deepestUri over live queues (one-row DataFrame)."""
    live = host_state.filter(F.col("pending") > 0)
    return live.agg(
        F.count("*").alias("n_queues"),
        F.sum("pending").alias("queued_uri_count"),
        F.round(F.avg("pending"), 4).alias("average_depth"),
        F.max("pending").alias("deepest_queue"),
    )


def digest_history(documents_out: DataFrame) -> DataFrame:
    """Content-digest fetch history: first fetch + revisit accounting.

    One row per distinct payload digest: the first doc/round that produced
    it and how many identical-payload revisits followed
    (IdenticalPayloadDigestRevisit analog).
    """
    w = Window.partitionBy("content_digest").orderBy("fetch_round", "doc_id")
    ranked = documents_out.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.groupBy("content_digest")
        .agg(
            F.min(F.when(F.col("__rk") == 1, F.col("doc_id"))).alias("first_doc"),
            F.min("fetch_round").alias("first_round"),
            (F.count("*") - 1).alias("dup_by_hash"),
        )
    )


def mimetypes_report(
    log: DataFrame,
    content_type: str = "content_type",
    content_length: str = "content_length",
) -> DataFrame:
    """MimetypesReport: '[#urls] [#bytes] [mime-types]' rows, most-fetched
    type first (engine/.../reporting/MimetypesReport.java:38-50 — the
    report walks StatisticsTracker.getFileDistribution reverse-sorted by
    count and joins in getBytesPerFileType)."""
    return (
        log.groupBy(F.col(content_type).alias("mime_type"))
        .agg(
            F.count("*").alias("n_urls"),
            F.coalesce(F.sum(content_length), F.lit(0)).alias("n_bytes"),
        )
        .orderBy(F.desc("n_urls"), F.asc("mime_type"))
    )


def source_tags_report(
    log: DataFrame, source_tag: str = "source_tag", host: str = "host"
) -> DataFrame:
    """SourceTagsReport: '[source] [host] [#urls]' per (sourceTag, host),
    hosts reverse-sorted by count within each source
    (engine/.../reporting/SourceTagsReport.java:40-67;
    StatisticsTracker.sourceHostDistribution tally at saveSourceStats)."""
    return (
        log.filter(F.col(source_tag).isNotNull())
        .groupBy(F.col(source_tag).alias("source"), F.col(host).alias("host"))
        .agg(F.count("*").alias("n_urls"))
        .orderBy(F.asc("source"), F.desc("n_urls"), F.asc("host"))
    )


def crawled_bytes_histotable(
    documents_out: DataFrame, crawl_log: DataFrame | None = None
) -> DataFrame:
    """novel vs dupByHash vs notModified fetch accounting
    (CrawledBytesHistotable law, engine/.../util/
    CrawledBytesHistotable.java:36-63): the first fetch of a digest is
    'novel', later identical payloads are 'dupByHash'; with the crawl log
    supplied, 304 responses tally as 'notModified' (they carry no payload
    so they never reach the documents sink)."""
    w = Window.partitionBy("content_digest").orderBy("fetch_round", "doc_id")
    tagged = documents_out.withColumn(
        "kind", F.when(F.row_number().over(w) == 1, "novel").otherwise("dupByHash")
    )
    out = tagged.groupBy("kind").agg(F.count("*").alias("n"))
    if crawl_log is not None:
        nm = (
            crawl_log.filter(F.col("fetch_status") == 304)
            .agg(F.count("*").alias("n"))
            .select(F.lit("notModified").alias("kind"), "n")
            .filter(F.col("n") > 0)
        )
        out = out.unionByName(nm)
    return out


def fetch_history(
    crawl_log: DataFrame, documents_out: DataFrame, depth: int = 2
) -> DataFrame:
    """A_FETCH_HISTORY analog (CrawlURI.java:79, 1778-1786;
    recrawl/FetchHistoryProcessor.java): per canonical URI, the latest
    ``depth`` final fetch records (round, status, content digest), newest
    first — the rolling history the reference keeps on the CrawlURI for
    revisit/not-modified decisions."""
    finals = crawl_log.filter(F.col("disposition") != "retry").select(
        "canonical", "round", "ordinal", "fetch_status"
    )
    digests = documents_out.select(
        F.col("doc_id").alias("canonical"),
        F.col("fetch_round").alias("round"),
        "content_digest",
    )
    joined = finals.join(digests, ["canonical", "round"], "left")
    w = Window.partitionBy("canonical").orderBy(F.desc("round"), F.desc("ordinal"))
    return (
        joined.withColumn("__k", F.row_number().over(w))
        .filter(F.col("__k") <= depth)
        .groupBy("canonical")
        .agg(
            F.reverse(
                F.sort_array(
                    F.collect_list(
                        F.struct("round", "fetch_status", "content_digest")
                    )
                )
            ).alias("history")
        )
    )
