"""CrawlMapper family — splitting one logical crawl across crawler nodes.

Re-expresses the reference's crawl splitter/mapper processors
(/root/reference/engine/src/main/java/org/archive/crawler/processor/
 CrawlMapper.java:47-271, HashCrawlMapper.java:107-135,
 LexicalCrawlMapper.java:40-154) as DataFrame column laws plus a
split-and-log operator:

* ``hash_crawler_name_col`` — HashCrawlMapper.mapString
  (HashCrawlMapper.java:122-135): optionally reduce the class key to the
  first match of a reduce regex (the reference's default is the
  PublicSuffixes topmost-assigned-SURT-prefix regex — the same reduction
  :mod:`heritrix3_spark.functions.psl` implements directly), then
  ``abs(FPGenerator.std64.fp(key) % crawlerCount)`` rendered as a decimal
  string. Java's ``%`` truncates toward zero (C semantics), NOT Python's
  floored modulo — the law uses ``np.fmod``.
* ``lexical_crawler_name_col`` — LexicalCrawlMapper.map
  (LexicalCrawlMapper.java:144-154): a sorted (key, crawler) map; a URI
  goes to the crawler of the nearest mapping key lexically >= its class
  key (``TreeMap.tailMap`` is inclusive), wrapping around to the FIRST
  mapping entry when no key follows. Compiles to a whole-stage-codegen
  CASE chain over the sorted keys — crawler maps are O(number of crawler
  nodes), i.e. tiny, so O(nodes)/row beats a range join's shuffle.
* ``crawl_mapper_split`` — CrawlMapper.innerProcessResult
  (CrawlMapper.java:196-233): rows mapped to a non-local crawler are
  marked ``S_BLOCKED_BY_CUSTOM_PROCESSOR`` (-5002, a *disregard*
  disposition per AbstractFrontier.isDisregarded:1069-1082) with the
  reference's ``to:<target>`` annotation; local rows pass untouched.
* ``divert_log`` — CrawlMapper.divertLog (CrawlMapper.java:280-296): one
  line per diverted URI, ``<classKey> CrawlURI <uri> <hopsPath> <via>``
  (classKey + space + CrawlURI.shortReportLineTo, CrawlURI.java:1303-1313),
  grouped by target crawler. The reference dedups lines through a lossy
  in-memory LongFPSetCache of std64 URI fingerprints
  (CrawlMapper.recentlySeen:303-306); the Spark re-expression dedups
  EXACTLY on that same fingerprint within the batch — same law, no
  eviction-driven duplicate lines.

At cluster scale the mapper is embarrassingly parallel: both name laws
are per-row column expressions (no shuffle), the split is a filter, and
the divert log's dedup is one hash aggregate keyed by the 64-bit URI
fingerprint — partitioned by ``target`` so each crawler node's log writes
from its own partition set.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

from ..fp import std64
from ..functions.psl import reduce_surt_to_assignment_level
from .frontier import S_BLOCKED_BY_CUSTOM_PROCESSOR


@pandas_udf(LongType())
def std64_fp_udf(strings: pd.Series) -> pd.Series:
    """FPGenerator.std64 fingerprints (signed, as Java long) — the
    recentlySeen dedup key (CrawlMapper.java:303-306)."""
    return pd.Series(std64.fp_batch(strings.fillna("").tolist()).view(np.int64))

__all__ = [
    "hash_crawler_name",
    "hash_crawler_name_col",
    "lexical_crawler_name",
    "lexical_crawler_name_col",
    "crawl_mapper_split",
    "divert_log",
]


# ---------------------------------------------------------------------------
# HashCrawlMapper.mapString (HashCrawlMapper.java:122-135)
# ---------------------------------------------------------------------------

def hash_crawler_name(key: str, crawler_count: int, reduce_regex: str | None = None) -> str:
    """Scalar twin of the mapString law (for tests / the simulator)."""
    if reduce_regex:
        m = re.search(reduce_regex, key)
        if m:
            key = m.group(0)
    fp = std64.fp(key)
    signed = fp - (1 << 64) if fp >= (1 << 63) else fp
    bucket = int(np.fmod(np.int64(signed), np.int64(crawler_count)))
    return str(abs(bucket))


def hash_crawler_name_col(
    key: Column,
    crawler_count: int,
    reduce_regex: str | None = None,
    use_psl: bool = False,
) -> Column:
    """HashCrawlMapper.map as a vectorized column.

    ``use_psl=True`` is the reference's default ``usePublicSuffixesRegex``
    mode (HashCrawlMapper.java:114-120): the class key is reduced to its
    topmost-assigned SURT prefix before hashing. The reference builds a
    giant regex from the public-suffix list; we apply the PSL reduction
    law directly (functions/psl.py — same snapshot that backs the
    AssignmentLevelSurt queue policy), which is the semantics the regex
    encodes.
    """
    count = int(crawler_count)
    pattern = reduce_regex

    @pandas_udf(StringType())
    def _map(keys: pd.Series) -> pd.Series:
        vals = keys.fillna("").tolist()
        if use_psl:
            vals = [reduce_surt_to_assignment_level(k) for k in vals]
        elif pattern:
            rx = re.compile(pattern)
            out = []
            for k in vals:
                m = rx.search(k)
                out.append(m.group(0) if m else k)
            vals = out
        fps = std64.fp_batch(vals).view(np.int64)
        buckets = np.abs(np.fmod(fps, np.int64(count)))
        return pd.Series(buckets.astype(str))

    return _map(key)


# ---------------------------------------------------------------------------
# LexicalCrawlMapper.map (LexicalCrawlMapper.java:144-154)
# ---------------------------------------------------------------------------

def _sorted_map(mapping) -> list[tuple[str, str]]:
    if isinstance(mapping, dict):
        items = list(mapping.items())
    else:
        items = [tuple(kv) for kv in mapping]
    if not items:
        raise ValueError("lexical crawler map must be non-empty")
    return sorted(items, key=lambda kv: kv[0])


def lexical_crawler_name(class_key: str, mapping) -> str:
    """Scalar twin: nearest mapping key >= class_key, else wrap to first."""
    items = _sorted_map(mapping)
    for k, name in items:
        if class_key <= k:
            return name
    return items[0][1]


def lexical_crawler_name_col(class_key: Column, mapping) -> Column:
    """LexicalCrawlMapper.map as a pure Column (CASE chain, codegen'd)."""
    items = _sorted_map(mapping)
    expr = F.lit(items[0][1])  # wraparound: tail empty -> first entry
    for k, name in reversed(items):
        expr = F.when(class_key <= F.lit(k), F.lit(name)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# CrawlMapper.innerProcessResult / divertLog (CrawlMapper.java:196-296)
# ---------------------------------------------------------------------------

def crawl_mapper_split(
    df: DataFrame,
    target: Column,
    local_name: str = ".",
    status_col: str = "fetch_status",
    annotations_col: str | None = "annotations",
) -> DataFrame:
    """Apply the check-URI mapping law to a batch of due URIs.

    Adds a ``mapper_target`` column; rows whose target differs from
    ``local_name`` get ``fetch_status = S_BLOCKED_BY_CUSTOM_PROCESSOR``
    (-5002 -> disregard disposition) and the ``to:<target>`` annotation
    (CrawlMapper.java:203-212). Rows already carrying a positive
    fetch_status (fetched/successful) are never re-mapped — the reference
    gates on ``curi.getFetchStatus() <= 0`` (CrawlMapper.java:201).
    """
    out = df.withColumn("mapper_target", target)
    diverted = (F.col("mapper_target") != F.lit(local_name)) & (
        F.coalesce(F.col(status_col), F.lit(0)) <= 0
    )
    out = out.withColumn(
        status_col,
        F.when(diverted, F.lit(S_BLOCKED_BY_CUSTOM_PROCESSOR)).otherwise(
            F.col(status_col)
        ),
    )
    if annotations_col is not None and annotations_col in df.columns:
        note = F.concat(F.lit("to:"), F.col("mapper_target"))
        out = out.withColumn(
            annotations_col,
            F.when(
                diverted,
                F.concat_ws(",", F.col(annotations_col), note),
            ).otherwise(F.col(annotations_col)),
        )
    return out


def divert_log(
    diverted: DataFrame,
    uri_col: str = "canonical",
    class_key_col: str = "class_key",
    hops_col: str = "hops_path",
    via_col: str = "via",
    target_col: str = "mapper_target",
) -> DataFrame:
    """Build the diversion-log lines for a batch of diverted URIs.

    Returns (target, fp, line) — ``line`` is the reference's
    ``<classKey> CrawlURI <uri> <hopsPath> <via>`` format
    (CrawlMapper.divertLog:280-296 printing classKey + space +
    CrawlURI.shortReportLineTo, CrawlURI.java:1303-1313; className of a
    CrawlURI is the literal "CrawlURI"). Deduped on the std64 URI
    fingerprint (the recentlySeen law, CrawlMapper.java:303-306 —
    FPGenerator.std64, NOT the url-seen FP24||FP40 key) — one hash
    aggregate keyed by (target, fp), no shuffle beyond it.
    """
    line = F.concat_ws(
        " ",
        F.col(class_key_col),
        F.lit("CrawlURI"),
        F.col(uri_col),
        F.coalesce(F.col(hops_col), F.lit("")),
        F.coalesce(F.col(via_col), F.lit("")),
    )
    return (
        diverted.select(
            F.col(target_col).alias("target"),
            std64_fp_udf(F.col(uri_col)).alias("fp"),
            line.alias("line"),
        )
        .groupBy("target", "fp")
        .agg(F.min("line").alias("line"))
    )
