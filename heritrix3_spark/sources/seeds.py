"""Seed list source (TextSeedModule re-expressed).

Law (/root/reference/modules/src/main/java/org/archive/modules/seeds/
TextSeedModule.java:96-188): lines are trimmed; blank lines and lines
starting with ``#`` are non-seeds; a line that does not full-match the
RFC2396 scheme pattern ``[a-zA-Z][\\w+\\-]+:.*`` gets ``http://`` prefixed;
each seed gets ``isSeed=true`` and directive MEDIUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from heritrix3_spark.operators.frontier import MEDIUM

SCHEME_PATTERN = r"^[a-zA-Z][\w+\-]+:"


def seeds_from_lines(lines_df: DataFrame, line_col: str = "line") -> DataFrame:
    """lines -> (uri, is_seed, hops_path, via, sched_directive) DataFrame."""
    c = F.trim(F.col(line_col))
    kept = lines_df.select(c.alias("raw")).filter(
        (F.length("raw") > 0) & ~F.col("raw").startswith("#")
    )
    uri = F.when(F.col("raw").rlike(SCHEME_PATTERN), F.col("raw")).otherwise(
        F.concat(F.lit("http://"), F.col("raw"))
    )
    return kept.select(
        uri.alias("uri"),
        F.lit(True).alias("is_seed"),
        F.lit("").alias("hops_path"),
        F.lit(None).cast("string").alias("via"),
        F.lit(None).cast("string").alias("via_context"),
        F.lit(MEDIUM).alias("sched_directive"),
    )


def seeds_from_file(spark, path: str) -> DataFrame:
    return seeds_from_lines(spark.read.text(path).withColumnRenamed("value", "line"))
