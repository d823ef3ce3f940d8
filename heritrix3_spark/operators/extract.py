"""Link extraction — flatMap operators over fetched documents.

Two extraction paths, mirroring the reference's Extractor chain
(/root/reference/modules/src/main/java/org/archive/modules/extractor/):

1. **Span documents** (the BASELINE input shape): link discovery reads the
   ``link``/``img``/``script``/``css``/``media`` spans of
   ``documents(doc_id, spans)`` — hop L for ``link`` and E for the rest,
   matching ExtractorHTML's NAVLINK/EMBED split (ExtractorHTML.java:199-231,
   Hop.java:34-63). Pure Spark: ``explode`` + column expressions — the
   whole extract stage is JVM-side.

2. **Raw HTML text** — a vectorized regex scanner over an html/text column
   (ExtractorHTML's attribute regex family + ExtractorCSS/ExtractorJS
   heuristics), as an Arrow-batched pandas UDF (regex compiled once per
   worker). Used for the sf ``documents`` table and any non-span corpus.

Both honor the reference's max-outlinks cap (6000/page,
AbstractFrontier.java:139) and skip ``data:`` URIs (Extractor.java:140-170).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

MAX_OUTLINKS = 6000

OUTLINK_TYPE = StructType(
    [
        StructField("url", StringType(), False),
        StructField("context", StringType(), True),
        StructField("hop", StringType(), False),
    ]
)

#: span kind -> hop char (FIXTURES.md §1; ExtractorHTML semantics)
KIND_HOP = {"link": "L", "img": "E", "script": "E", "css": "E", "media": "E"}


def resolve_ref_col(base: Column, ref: Column) -> Column:
    """Resolve a possibly-relative reference against a base URL.

    Absolute (has scheme) -> as-is; host-absolute ``/x`` -> scheme://host/x;
    relative -> against the base's directory. Pure column algebra.
    """
    has_scheme = ref.rlike(r"^[a-zA-Z][\w+\-.]*:")
    # scheme://host of base (authority ends at first / ? #)
    origin = F.regexp_extract(base, r"^([^:/?#]+://[^/?#]*)", 1)
    # directory of base path: up to last '/'
    path = F.regexp_extract(base, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    last_slash = F.when(
        F.locate("/", F.reverse(path)) > 0,
        F.length(path) - F.locate("/", F.reverse(path)) + 1,
    ).otherwise(F.lit(0))
    dir_part = F.when(last_slash > 0, F.substring(path, 1, last_slash.cast("int"))).otherwise(
        F.lit("/")
    )
    return (
        F.when(has_scheme, ref)
        .when(ref.startswith("/"), F.concat(origin, ref))
        .otherwise(F.concat(origin, dir_part, ref))
    )


def extract_outlinks_from_spans(
    documents: DataFrame,
    doc_id: str = "doc_id",
    spans: str = "spans",
    max_outlinks: int = MAX_OUTLINKS,
) -> DataFrame:
    """documents(doc_id, spans) -> (doc_id, url, context, hop, outlink_index).

    ``outlink_index`` is the span offset order — the deterministic
    discovery order used for ordinal assignment (SURVEY §7.3).
    """
    s = (
        documents.select(
            F.col(doc_id).alias("doc_id"), F.posexplode(F.col(spans)).alias("pos", "span")
        )
        .filter(F.col("span.kind").isin(*KIND_HOP.keys()))
        .filter(F.col("span.media_ref").isNotNull())
        .filter(~F.col("span.media_ref").startswith("data:"))
    )
    hop = F.element_at(
        F.create_map(*[F.lit(x) for kv in KIND_HOP.items() for x in kv]), F.col("span.kind")
    )
    out = s.select(
        "doc_id",
        resolve_ref_col(F.col("doc_id"), F.col("span.media_ref")).alias("url"),
        F.coalesce(F.col("span.text"), F.lit("")).alias("context"),
        hop.alias("hop"),
        F.col("pos").alias("outlink_index"),
    )
    if max_outlinks is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy("outlink_index")
        out = (
            out.withColumn("__n", F.row_number().over(w))
            .filter(F.col("__n") <= max_outlinks)
            .drop("__n")
        )
    return out


# ---------------------------------------------------------------------------
# raw-HTML regex extractor (vectorized pandas UDF)
# ---------------------------------------------------------------------------
# Re-stated (not copied) from ExtractorHTML.java:148-231 attribute scanning:
# href/src/action/srcset attributes inside tags, plus CSS url(...) and
# (lightweight) quoted likely-URIs in script bodies.
_RE_ATTR = re.compile(
    r"""(?is)<\s*(\w+)[^>]*?\s(?:href|src|action|data-src)\s*=\s*(?:"([^"]+)"|'([^']+)'|([^\s>]+))"""
)
_RE_CSS_URL = re.compile(r"""(?i)(?:@import\s+(?:url\()?|url\()\s*(["']?)([^"')]+)\1\s*[);]""")
_RE_META_ROBOTS = re.compile(
    r"""(?is)<\s*meta[^>]+name\s*=\s*["']?robots["']?[^>]*content\s*=\s*["']?([^"'>]+)"""
)

_NAV_TAGS = {"a", "link"}
_EMBED_TAGS = {"img", "script", "iframe", "frame", "embed", "source", "audio", "video"}


def _extract_html_one(base: str, html: str) -> list[tuple]:
    if not html:
        return []
    m = _RE_META_ROBOTS.search(html)
    if m and ("nofollow" in m.group(1).lower() or "none" in m.group(1).lower()):
        # meta robots nofollow aborts link extraction (ExtractorHTML.java:1002-1050)
        return []
    out = []
    for tag_m in _RE_ATTR.finditer(html):
        tag = tag_m.group(1).lower()
        url = tag_m.group(2) or tag_m.group(3) or tag_m.group(4)
        if not url or url.startswith("data:") or url.startswith("javascript:"):
            continue
        if tag == "form":
            continue
        hop = "L" if tag in _NAV_TAGS else "E"
        out.append((url.strip(), f"{tag}/@href", hop))
        if len(out) >= MAX_OUTLINKS:
            return out
    for css_m in _RE_CSS_URL.finditer(html):
        out.append((css_m.group(2).strip(), "css/url()", "E"))
        if len(out) >= MAX_OUTLINKS:
            return out
    return out


_RE_SITEMAP_LINE = re.compile(r"(?i)Sitemap:\s*(.+)$", re.MULTILINE)
_RE_SITEMAP_LOC = re.compile(r"(?is)<loc[^>]*>\s*([^<\s]+)\s*</loc>")
# ExtractorJS string scanner (ExtractorJS.java:69-195): quoted strings run
# through the likely-URI detector (UriUtils.java:483-487: no whitespace or
# <>, an internal dot or slash, word-char/slash at both ends)
_RE_JS_STRING = re.compile(r"""(?:"((?:[^"\\]|\\.){3,256})"|'((?:[^'\\]|\\.){3,256})')""")
_RE_LIKELY_URI = re.compile(r"^(?:\w|[.]{0,2}/)[^\s<>]*(?:[./])[^\s<>]*(?:\w|/)$")
_JS_URI_EXCEPTIONS = {"text/javascript"}


def _extract_robots_sitemaps_one(body: str) -> list[tuple]:
    """ExtractorRobotsTxt.java:16-80: `Sitemap:` lines -> 'M' manifest hop."""
    if not body:
        return []
    return [
        (m.group(1).strip(), "robots.txt:sitemap", "M")
        for m in _RE_SITEMAP_LINE.finditer(body)
    ][:MAX_OUTLINKS]


def _extract_sitemap_one(xml: str) -> list[tuple]:
    """ExtractorSitemap.java:98-190: urlset/sitemapindex <loc> -> 'M' hop."""
    if not xml or ("<urlset" not in xml and "<sitemapindex" not in xml):
        return []
    return [
        (m.group(1).strip(), "sitemap/loc", "M") for m in _RE_SITEMAP_LOC.finditer(xml)
    ][:MAX_OUTLINKS]


def _extract_js_one(js: str) -> list[tuple]:
    """ExtractorJS-style speculative extraction: quoted likely-URIs -> 'X'."""
    if not js:
        return []
    out = []
    for m in _RE_JS_STRING.finditer(js):
        s = (m.group(1) or m.group(2) or "").strip()
        if not s or s in _JS_URI_EXCEPTIONS:
            continue
        if _RE_LIKELY_URI.match(s):
            out.append((s, "js/string", "X"))
            if len(out) >= MAX_OUTLINKS:
                break
    return out


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_robots_sitemaps_udf(body: pd.Series) -> pd.Series:
    return pd.Series([_extract_robots_sitemaps_one(b) for b in body.fillna("")])


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_sitemap_udf(xml: pd.Series) -> pd.Series:
    return pd.Series([_extract_sitemap_one(x) for x in xml.fillna("")])


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_js_udf(js: pd.Series) -> pd.Series:
    return pd.Series([_extract_js_one(j) for j in js.fillna("")])


def _extract_css_one(css: str) -> list[tuple]:
    """ExtractorCSS.java:79-152: @import / url(...) references -> 'E' hop."""
    if not css:
        return []
    return [
        (m.group(2).strip(), "css/url()", "E") for m in _RE_CSS_URL.finditer(css)
    ][:MAX_OUTLINKS]


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_css_udf(css: pd.Series) -> pd.Series:
    return pd.Series([_extract_css_one(c) for c in css.fillna("")])


def extract_http_headers(
    df: DataFrame,
    base_col: str = "uri",
    location_col: str = "location",
    content_location_col: str = "content_location",
) -> DataFrame:
    """ExtractorHTTP: the `Location` response header is an 'R' (refer/
    redirect) hop, `Content-Location` an 'E' hop — pure column algebra."""
    loc = df.select(
        F.col(base_col).alias("doc_id"),
        resolve_ref_col(F.col(base_col), F.col(location_col)).alias("url"),
        F.lit("hdr/Location").alias("context"),
        F.lit("R").alias("hop"),
    ).filter(F.col(location_col).isNotNull())
    cloc = df.select(
        F.col(base_col).alias("doc_id"),
        resolve_ref_col(F.col(base_col), F.col(content_location_col)).alias("url"),
        F.lit("hdr/Content-Location").alias("context"),
        F.lit("E").alias("hop"),
    ).filter(F.col(content_location_col).isNotNull())
    return loc.unionByName(cloc)


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_html_udf(base: pd.Series, html: pd.Series) -> pd.Series:
    """Vectorized HTML outlink extraction (regexes compiled once/worker)."""
    return pd.Series(
        [_extract_html_one(b, h) for b, h in zip(base.fillna(""), html.fillna(""))]
    )


def extract_outlinks_from_html(
    df: DataFrame, base_col: str = "doc_id", html_col: str = "text"
) -> DataFrame:
    """(doc_id, html) -> exploded outlinks with resolved absolute URLs."""
    links = df.select(
        F.col(base_col).alias("doc_id"),
        F.posexplode(extract_html_udf(F.col(base_col), F.col(html_col))).alias("pos", "l"),
    )
    return links.select(
        "doc_id",
        resolve_ref_col(F.col("doc_id"), F.col("l.url")).alias("url"),
        F.col("l.context").alias("context"),
        F.col("l.hop").alias("hop"),
        F.col("pos").alias("outlink_index"),
    )
