"""Crawl-log-as-a-feed: the contrib Kafka/AMQP crawl-log publishers.

Reference (contrib/src/main/java/org/archive/modules/postprocessor/):

- ``CrawlLogJsonBuilder.java:21-75`` — the JSON record law shared by all
  feed publishers (field set, null rules, mimetype truncation, the
  ``start_time_plus_duration`` composite, warc_filename/offset unrolled
  out of extra_info).
- ``KafkaCrawlLogFeed.java`` / ``AMQPCrawlLogFeed.java`` — publish one
  such JSON message per *finally-disposed* URI (``shouldProcess`` is
  ``!frontier.needsReenqueuing(curi)``, KafkaCrawlLogFeed.java:131-137 —
  retries are not fed).

Spark-first shape: the record law is pure column algebra
(``to_json(struct(...))``), so it runs identically over the batch
``crawl_log()`` DataFrame and over the events *stream*
(``journal_stream``), and the publisher is a Structured Streaming
``writeStream``. The sandbox has no Kafka broker; ``crawl_log_feed``
writes the standard ``key``/``value`` message frame to any sink format —
on a real cluster pass ``format="kafka"`` plus
``options={"kafka.bootstrap.servers": ..., "topic": ...}`` and the same
plan publishes to the broker (the Kafka sink consumes exactly this
key/value contract).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix3_spark.functions.mime import mime_truncate_col

#: columns the JSON law knows how to render, in reference field order
#: (CrawlLogJsonBuilder.buildJson). Input columns are optional: an absent
#: column renders as JSON null, like the reference's checkForNull.
_FIELD_SOURCES = (
    ("content_length", "content_length"),
    ("size", "content_length"),
    ("status_code", "fetch_status"),
    ("url", "uri"),
    ("hop_path", "hops_path"),
    ("via", "via"),
    ("mimetype", "content_type"),
    ("thread", "thread"),
    ("start_time_plus_duration", None),  # composite, built below
    ("content_digest", "content_digest"),
    ("seed", "source_tag"),
    ("host", "host"),
    ("annotations", "annotation"),
    ("warc_filename", "warc_filename"),
    ("warc_offset", "warc_offset"),
)


def _opt(df: DataFrame, name: str | None) -> Column:
    if name is not None and name in df.columns:
        return F.col(name)
    if name == "host" and "class_key" in df.columns:
        # the reference resolves host via the server cache
        # (CrawlLogJsonBuilder: serverCache.getHostFor) — the engine's
        # queue key is that host identity
        return F.col("class_key")
    return F.lit(None).cast("string")


def crawl_log_json(
    log: DataFrame,
    extra_fields: dict[str, str] | None = None,
    clock_ms: Column | None = None,
) -> DataFrame:
    """Append a ``value`` column holding the CrawlLogJsonBuilder record.

    Field law (CrawlLogJsonBuilder.java:21-75):

    - ``timestamp`` — Log17Date (``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'``, UTC) of
      the feed moment; the engine's virtual clock column is passed in as
      ``clock_ms`` (the reference stamps wall-clock at build time — a
      macro-batch feed stamps the round clock; pass
      ``F.lit(<ms>)`` for a fixed stamp or omit for null).
    - ``content_length`` — only for HTTP transactions with a nonnegative
      length, else null; ``size`` — content size when > 0, else null.
    - ``mimetype`` — through MimetypeUtils.truncate.
    - ``start_time_plus_duration`` — 17-digit begin time + ``+`` +
      duration ms, when a ``fetch_begin_ms``/``fetch_duration_ms`` pair is
      present.
    - ``host`` — the reference resolves via the server cache; the engine's
      queue key (or an explicit ``host`` column) plays that role.
    - every ``extra_fields`` entry is a constant top-level field.
    - absent engine columns (thread, warc_filename/offset on a
      non-WARC sink) render as JSON null, mirroring checkForNull.
    - the reference's trailing ``extra_info`` object (leftover extraInfo
      after unrolling warc_filename/offset) is omitted: the engine
      carries no per-URI extraInfo map.
    """
    fields: list[Column] = []
    if clock_ms is None and "clock_ms" in log.columns:
        # the journal stamps each event with the virtual clock at its
        # disposition round — the natural feed timestamp
        clock_ms = F.col("clock_ms")
    ts = (
        F.date_format(
            F.timestamp_millis(clock_ms.cast("long")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
        )
        if clock_ms is not None
        else F.lit(None).cast("string")
    )
    fields.append(ts.alias("timestamp"))
    for k, v in (extra_fields or {}).items():
        fields.append(F.lit(v).alias(k))
    for field, src in _FIELD_SOURCES:
        if field == "content_length":
            c = _opt(log, src).cast("long")
            fields.append(F.when(c >= 0, c).alias(field))
        elif field == "size":
            c = _opt(log, src).cast("long")
            fields.append(F.when(c > 0, c).alias(field))
        elif field == "mimetype":
            fields.append(mime_truncate_col(_opt(log, src)).alias(field))
        elif field == "start_time_plus_duration":
            if "fetch_begin_ms" in log.columns and "fetch_duration_ms" in log.columns:
                begin = F.col("fetch_begin_ms").cast("long")
                comp = F.concat(
                    F.date_format(F.timestamp_millis(begin), "yyyyMMddHHmmssSSS"),
                    F.lit("+"),
                    F.col("fetch_duration_ms").cast("string"),
                )
                fields.append(comp.alias(field))
            else:
                fields.append(F.lit(None).cast("string").alias(field))
        else:
            fields.append(_opt(log, src).alias(field))
    # to_json drops null fields by default; the reference emits explicit
    # JSON nulls — keep them (ignoreNullFields=false) so consumers see a
    # stable field set
    return log.withColumn(
        "value",
        F.to_json(F.struct(*fields), {"ignoreNullFields": "false"}),
    )


def crawl_log_feed(
    stream: DataFrame,
    checkpoint_dir: str,
    path: str | None = None,
    fmt: str = "json",
    key_col: str = "canonical",
    extra_fields: dict[str, str] | None = None,
    options: dict[str, str] | None = None,
    available_now: bool = False,
):
    """Publish the crawl-log stream as key/value messages.

    ``stream`` is a streaming DataFrame (e.g. ``journal_stream``); retries
    are excluded per the reference's ``shouldProcess`` (only final
    dispositions are fed). Returns the started StreamingQuery.

    With ``fmt="kafka"`` and broker options this is the literal
    KafkaCrawlLogFeed (the Kafka sink reads the same key/value columns);
    the default file sink writes one JSON message per line for the
    sandbox.
    """
    final = stream
    if "tag" in stream.columns:
        final = final.filter(~F.col("tag").isin("F+", "Fu"))
    if "disposition" in stream.columns:
        final = final.filter(F.col("disposition") != "retry")
    msgs = crawl_log_json(final, extra_fields=extra_fields).select(
        F.col(key_col).cast("string").alias("key"), "value"
    )
    writer = (
        msgs.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if path is not None:
        writer = writer.option("path", path)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if available_now:
        # drain-everything-then-stop: publish the feed as a macro-batch
        # (exactly-once over the current journal contents)
        writer = writer.trigger(availableNow=True)
    return writer.start()
