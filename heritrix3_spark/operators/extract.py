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

#: span kind -> hop char (FIXTURES.md §1; ExtractorHTML/ExtractorHTTP
#: semantics — a "location" span is the Location-header redirect, hop R)
KIND_HOP = {"link": "L", "img": "E", "script": "E", "css": "E", "media": "E", "location": "R"}


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
# Faithful re-statement of ExtractorHTML's two-level scan
# (ExtractorHTML.java:148-231 RELEVANT_TAG_EXTRACTOR /
# EACH_ATTRIBUTE_EXTRACTOR, processGeneralTag :380-590, processMeta
# :1002-1062, processEmbed srcset split :733-760, processLink javascript:
# hand-off :693-712). The two published regex families ARE the law; the
# surrounding control flow is re-implemented in Python.
_RE_TAG = re.compile(
    r"(?is)<(?:"
    r"((script[^>]*)>.*?</script)"  # 1 full, 2 tag innards
    r"|((style[^>]*)>.*?</style)"  # 3 full, 4 tag innards
    r"|((meta|\w{1,24})\s+[^>]*)"  # 5 innards, 6 element name
    r"|(!--(?!\[if|>).*?--)"  # 7 comment (conditional comments scanned)
    r")>"
)
_RE_EACH_ATTR = re.compile(
    r"(?is)\s?((href)|(action)|(on\w*)"  # 1 name, 2 href, 3 action, 4 on*
    r"|((?:src)|(?:srcset)|(?:lowsrc)|(?:background)|(?:cite)"
    r"|(?:longdesc)|(?:usemap)|(?:profile)|(?:datasrc)"
    r"|(?:data-src)|(?:data-srcset)|(?:data-original)|(?:data-original-set))"  # 5
    r"|(codebase)|((?:classid)|(?:data))|(archive)|(code)"  # 6, 7, 8, 9
    r"|(value)|(style)|(method)"  # 10, 11, 12
    r"|([-\w]{1,64}))"  # 13 any other attribute
    r"\s*=\s*"
    r"(?:(?:\"(.{0,2048}?)(?:\"|$))"  # 14 double-quoted
    r"|(?:'(.{0,2048}?)(?:'|$))"  # 15 single-quoted
    r"|(\S{1,2048}))"  # 16 bare
)
_RE_CSS_URL = re.compile(r"""(?i)(?:@import\s+(?:url\()?|url\()\s*(["']?)([^"')]+)\1\s*[);]""")
#: srcset item matcher (processEmbed :748): url then optional descriptors
_RE_SRCSET_ITEM = re.compile(r"[\s,]*(\S*[^,\s])(?:\s(?:[^,(]+|\([^)]*(?:\)|$))*)?")
#: (element, attr) pairs whose value is a srcset multi-URI list
_SRCSET_CONTEXTS = {
    ("img", "srcset"), ("source", "srcset"), ("img", "data-srcset"),
    ("img", "data-original-set"), ("source", "data-original-set"),
}
#: link@rel keywords -> treatment (processLinkTagWithRel :609-637)
_REL_EMBED = {"icon", "stylesheet", "modulepreload", "prefetch", "prerender"}
_REL_IGNORE = {"dns-prefetch", "preconnect", ""}


# common TLD set for speculativeFixup's dotted-domain heuristic
# (UriUtils.speculativeFixup, commons/.../util/UriUtils.java:323-360;
# ArchiveUtils.isTld approximated: common gTLDs or any 2-letter ccTLD)
_COMMON_TLDS = {
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "mobi", "asia", "arpa", "aero", "coop", "museum",
}


# isVeryLikelyUri — the EXACT UriUtils.isVeryLikelyUri law
# (UriUtils.java:412-477), implemented and UriUtilsTest-vector-verified in
# functions/uriutils.py (an earlier hybrid approximation lived here)
from heritrix3_spark.functions.uriutils import (  # noqa: E402
    is_very_likely_uri as _is_very_likely_uri,
)


def _speculative_fixup(candidate: str, base: str) -> str:
    """Scheme-less intended-absolute URIs ("www.example.com/x") get an
    http:// prefix (base's scheme when on the same host)."""
    s = candidate.replace("&amp;", "&")
    m = re.fullmatch(r"(?:[^./]+\.)+([^./]+)(?:/.*)?", s)
    if m:
        tld = m.group(1).lower()
        if tld in _COMMON_TLDS or (len(tld) == 2 and tld.isalpha()):
            scheme = "http"
            bm = re.match(r"^([a-zA-Z][\w+\-.]*)://([^/?#]*)", base or "")
            if bm and s.startswith(bm.group(2)):
                scheme = bm.group(1)
            return f"{scheme}://{s}"
    return s


def _py_resolve(base: str, ref: str) -> str:
    """Resolve a possibly-relative reference (same law as resolve_ref_col)."""
    if re.match(r"^[a-zA-Z][\w+\-.]*:", ref):
        return ref
    m = re.match(r"^([^:/?#]+://[^/?#]*)([^?#]*)", base)
    if not m:
        return ref
    origin, path = m.group(1), m.group(2)
    if ref.startswith("/"):
        return origin + ref
    d = path.rfind("/")
    return origin + (path[: d + 1] if d >= 0 else "/") + ref


def _srcset_urls(value: str) -> list[str]:
    out, pos = [], 0
    while pos < len(value):
        m = _RE_SRCSET_ITEM.match(value, pos)
        if not m or m.end() == pos:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def _extract_html_one(
    base: str,
    html: str,
    frames_as_embeds: bool = True,
    ignore_form_actions: bool = False,
    extract_only_form_gets: bool = True,
    extract_javascript: bool = True,
    extract_value_attributes: bool = True,
    aggressive: bool = False,
) -> list[tuple]:
    """One document through the ExtractorHTML scan. Returns
    (absolute_url, context, hop) tuples in document order. Option defaults
    mirror ExtractorHTML.java:244-315. ``aggressive`` is the
    AggressiveExtractorHTML subclass (AggressiveExtractorHTML.java:43-50):
    script bodies are additionally re-scanned as HTML tag innards."""
    if not html:
        return []
    import html as _htmlmod

    out: list[tuple] = []
    cur_base = base  # first <base href> overrides (processGeneralTag :443-451)
    base_set = False

    def add(url, context, hop, resolve_base=None):
        url = (url or "").strip()
        if not url or url.startswith("data:"):
            return  # data: URIs skipped (Extractor.java:140-170)
        out.append((_py_resolve(resolve_base or cur_base, url), context, hop))

    def add_js_strings(code):
        if extract_javascript:
            for url, ctx, hop in _extract_js_one(code):
                out.append((_py_resolve(cur_base, _speculative_fixup(url, cur_base)), ctx, hop))

    def set_base(val):
        nonlocal cur_base, base_set
        if not base_set:
            cur_base = _py_resolve(base, val)
            base_set = True

    def process_general_tag(element, innards):
        _process_general_tag_impl(
            element,
            innards,
            add=add,
            add_js_strings=add_js_strings,
            set_base=set_base,
            base_state=lambda: cur_base,
            frames_as_embeds=frames_as_embeds,
            ignore_form_actions=ignore_form_actions,
            extract_only_form_gets=extract_only_form_gets,
            extract_value_attributes=extract_value_attributes,
        )

    for tag_m in _RE_TAG.finditer(html):
        if len(out) >= MAX_OUTLINKS:
            break
        if tag_m.group(7):  # comment
            continue
        if tag_m.group(1):  # <script ...>body</script>
            innards = tag_m.group(2)
            body = tag_m.group(1)[len(innards) + 1 : -len("</script")]
            element = "script"
        elif tag_m.group(3):  # <style ...>body</style>
            innards = tag_m.group(4)
            body = tag_m.group(3)[len(innards) + 1 : -len("</style")]
            element = "style"
        else:
            innards = tag_m.group(5)
            body = None
            element = tag_m.group(6).lower()

        if element == "meta":
            # processMeta (:1002-1062)
            name = http_equiv = content = None
            for a in _RE_EACH_ATTR.finditer(innards):
                val = _htmlmod.unescape(a.group(14) or a.group(15) or a.group(16) or "")
                an = a.group(1).lower()
                if an == "name":
                    name = val
                elif an == "http-equiv":
                    http_equiv = val
                elif an == "content":
                    content = val
            if name and name.lower() == "robots" and content is not None:
                cl = content.lower()
                if "nofollow" in cl or "none" in cl:
                    return out  # abort further extraction, keep earlier links
            elif http_equiv and http_equiv.lower() == "refresh" and content:
                i = content.find("=") + 1
                if i > 0:
                    add(re.sub(r"[\"']", "", content[i:]), "meta", "R")
            elif content and _is_very_likely_uri(content):
                add(content, "meta", "X")
            continue

        process_general_tag(element, innards)

        if body is not None:
            if element == "script":
                add_js_strings(body)
                if aggressive:
                    # AggressiveExtractorHTML.processScript (:43-50): after
                    # the normal script handling, run the ENTIRE javascript
                    # body through processGeneralTag as if it were HTML —
                    # "this may cause a lot of false positives" by design
                    process_general_tag("script", body)
            else:  # style body
                for u, cctx, hop in _extract_css_one(body):
                    add(u, cctx, hop)
    return out[:MAX_OUTLINKS]


def _process_general_tag_impl(
    element: str,
    innards: str,
    *,
    add,
    add_js_strings,
    set_base,
    base_state,
    frames_as_embeds: bool,
    ignore_form_actions: bool,
    extract_only_form_gets: bool,
    extract_value_attributes: bool,
) -> None:
    """processGeneralTag (ExtractorHTML.java:380-590) over one tag's
    attribute innards; shared by the normal tag scan and the Aggressive
    mode's whole-script-body re-scan."""
    import html as _htmlmod

    _py = _py_resolve
    codebase = None
    resources: list[str] = []
    action = action_ctx = method = None
    value_val = value_ctx = name_val = None
    link_href = link_rel = None
    for a in _RE_EACH_ATTR.finditer(innards):
        val = _htmlmod.unescape(a.group(14) or a.group(15) or a.group(16) or "")
        attr = a.group(1).lower()
        ctx = f"{element}/@{attr}"
        if a.group(2):  # HREF
            if element == "link":
                link_href = val
            elif val.lower().startswith("javascript:"):
                add_js_strings(val[len("javascript:"):])
            else:
                add(val, ctx, "L")
            if element == "base":
                set_base(val)
        elif a.group(3):  # ACTION — finished after METHOD is known
            if not ignore_form_actions:
                action, action_ctx = val, ctx
        elif a.group(4):  # ON* script handler
            add_js_strings(val)
        elif a.group(5):  # SRC family
            hop = (
                "L"
                if not frames_as_embeds and element in ("frame", "iframe")
                else "E"
            )
            if (element, attr) in _SRCSET_CONTEXTS:
                for u in _srcset_urls(val):
                    add(u, ctx, hop)
            else:
                add(val, ctx, hop)
        elif a.group(6):  # CODEBASE
            codebase = val
            add(val, ctx, "L")
        elif a.group(7):  # CLASSID / DATA
            resources.append(val)
        elif a.group(8):  # ARCHIVE — space-delimited URI list
            resources.extend(val.split())
        elif a.group(9):  # CODE (+ .class for applets)
            if element == "applet" and not val.lower().endswith(".class"):
                val += ".class"
            resources.append(val)
        elif a.group(10):  # VALUE — finished after NAME is known
            value_val, value_ctx = val, ctx
        elif a.group(11):  # inline STYLE: CSS url() scan
            for u, cctx, hop in _extract_css_one(val):
                add(u, cctx, hop)
        elif a.group(12):  # METHOD
            method = val
        elif a.group(13):
            if attr == "name":
                name_val = val
            elif attr == "rel":
                link_rel = val
            elif attr == "flashvars":
                for kv in val.split("&"):
                    v = kv.split("=", 1)[-1]
                    if _is_very_likely_uri(v):
                        add(v, ctx, "X")
    # codebase-relative resources (processGeneralTag :548-576)
    cb = _py(base_state(), codebase) if codebase else None
    for res in resources:
        add(res, element, "E", resolve_base=cb)
    # LINK tag needs both HREF and REL (processLinkTagWithRel :609-637)
    if link_href is not None and link_rel is not None:
        nav = False
        for kw in re.split(r"[ \t\n\f\r]+", link_rel):
            lt = kw.lower()
            if lt in _REL_EMBED:
                add(link_href, f"link[rel='{lt}']/@href", "E")
                nav = False
                break
            if lt == "pingback":
                nav = False
                break
            if lt in _REL_IGNORE:
                continue
            nav = True
        if nav:
            add(link_href, "link/@href", "L")
    # FORM action: only GETs by default (HER-1280, :583-589)
    if action is not None:
        if (
            method is None
            or method.upper() == "GET"
            or not extract_only_form_gets
        ):
            add(action, action_ctx, "L")
    # VALUE attribute: flashvars params or likely-URI values (:591-607)
    if value_val is not None:
        if element == "param" and name_val and name_val.lower() == "flashvars":
            for kv in value_val.split("&"):
                v = kv.split("=", 1)[-1]
                if _is_very_likely_uri(v):
                    add(v, value_ctx, "X")
        elif extract_value_attributes and _is_very_likely_uri(value_val):
            add(value_val, value_ctx, "L")


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


# ---------------------------------------------------------------------------
# text-extractor tail (round-3): ExtractorXML / ExtractorURI /
# ExtractorImpliedURI / ExtractorMultipleRegex / TrapSuppressExtractor
# ---------------------------------------------------------------------------
# ExtractorXML.java:58-59: URI-shaped strings between quote/bracket
# delimiters, optionally CDATA-wrapped; candidates are XML-unescaped then
# run through isVeryLikelyUri; hop SPECULATIVE ('X').
_RE_XML_URI = re.compile(r"(?s)[\"'>]\s*(?:<!\[CDATA\[)?([^<>\s'\"@]+)\s*(?:\]\]>)?[\"'<]")
#: ExtractorXML.shouldExtract content sniff (:81-88): XML preamble and not
#: an early html doctype/tag
_RE_XML_PREAMBLE = re.compile(r"(?is)^﻿?<\?xml\s")
_RE_XML_HTMLISH = re.compile(r"(?is)<!doctype\s+html|<html[>\s]")

_XML_UNESCAPES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"))


def _unescape_xml(s: str) -> str:
    # StringEscapeUtils.unescapeXml: the five XML entities (&amp; last)
    for ent, ch in _XML_UNESCAPES:
        s = s.replace(ent, ch)
    return s


def _extract_xml_one(body: str) -> list[tuple]:
    """ExtractorXML.processXml (ExtractorXML.java:150-173): regex scan,
    XML-unescape, isVeryLikelyUri filter -> speculative 'X' outlinks."""
    if not body:
        return []
    out = []
    for m in _RE_XML_URI.finditer(body):
        cand = _unescape_xml(m.group(1))
        if _is_very_likely_uri(cand):
            out.append((cand, "xml", "X"))
            if len(out) >= MAX_OUTLINKS:
                break
    return out


def looks_like_xml(body: str, content_type: str | None = None, uri: str | None = None) -> bool:
    """ExtractorXML.shouldExtract (:70-92): xml mimetype (excluding OOXML
    zips), .rss/.xml extension, or an XML preamble without early html."""
    if content_type:
        ctl = content_type.lower()
        if "xml" in ctl and not ctl.startswith("application/vnd.openxmlformats"):
            return True
    if uri and (uri.lower().endswith(".rss") or uri.lower().endswith(".xml")):
        return True
    head = (body or "")[:400]
    return bool(_RE_XML_PREAMBLE.match(head)) and not _RE_XML_HTMLISH.search(head)


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_xml_udf(body: pd.Series) -> pd.Series:
    return pd.Series([_extract_xml_one(b) for b in body.fillna("")])


# ExtractorURI.java:57,139-163: absolute http(s) URIs inside an already-
# discovered outlink's query string — the whole decoded query, then each
# &-split param's %-decoded value. Speculative 'X' hops.
_RE_ABS_HTTP = re.compile(r"^https?://[^\s<>]*$")


def _extract_uri_one(uri: str) -> list[tuple]:
    if not uri:
        return []
    from urllib.parse import unquote_plus

    q = uri.partition("?")[2]
    if not q:
        return []
    out = []
    decoded_q = unquote_plus(q)
    if _RE_ABS_HTTP.match(decoded_q):
        out.append((decoded_q, "uri/query", "X"))
    for param in q.split("&"):
        kv = param.split("=")
        if len(kv) == 2:
            cand = unquote_plus(kv[1])
            if _RE_ABS_HTTP.match(cand):
                out.append((cand, "uri/param", "X"))
    return out[:MAX_OUTLINKS]


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_uri_udf(uri: pd.Series) -> pd.Series:
    return pd.Series([_extract_uri_one(u) for u in uri.fillna("")])


def extract_uri_outlinks(outlinks: DataFrame, url_col: str = "url") -> DataFrame:
    """ExtractorURI over a frame of discovered outlinks: one 'X' row per
    query-string URI found inside each outlink's URL."""
    return outlinks.select(
        "doc_id",
        F.posexplode(extract_uri_udf(F.col(url_col))).alias("pos", "l"),
    ).select(
        "doc_id",
        F.col("l.url").alias("url"),
        F.col("l.context").alias("context"),
        F.col("l.hop").alias("hop"),
        F.col("pos").alias("outlink_index"),
    )


def implied_uri_col(url: Column, trigger_regex: str, build_format: str) -> Column:
    """ExtractorImpliedURI.extractImplied (ExtractorImpliedURI.java:168-178):
    when the URL fully matches ``trigger_regex``, the implied URI is the
    regex's replaceFirst with ``build_format`` ($1-style groups); else NULL.
    Pure column algebra — JVM regexp, no Python."""
    anchored = f"^(?:{trigger_regex})$"
    return F.when(
        url.rlike(anchored), F.regexp_replace(url, anchored, build_format)
    ).otherwise(F.lit(None).cast("string"))


def extract_implied_uris(
    outlinks: DataFrame,
    trigger_regex: str,
    build_format: str,
    remove_trigger_uris: bool = False,
    url_col: str = "url",
) -> DataFrame:
    """ExtractorImpliedURI (ExtractorImpliedURI.java:52,123-165): each
    discovered outlink matching the trigger yields an INFERRED 'I' link
    built from the replacement format; ``remove_trigger_uris`` drops the
    trigger rows themselves from the outlink set."""
    implied = implied_uri_col(F.col(url_col), trigger_regex, build_format)
    inferred = (
        outlinks.withColumn("__implied", implied)
        .filter(F.col("__implied").isNotNull())
        .select(
            "doc_id",
            F.col("__implied").alias("url"),
            F.lit("inferred").alias("context"),
            F.lit("I").alias("hop"),
            "outlink_index",
        )
    )
    base = outlinks
    if remove_trigger_uris:
        base = outlinks.filter(implied.isNull())
    return base.select("doc_id", "url", "context", "hop", "outlink_index").unionByName(
        inferred
    )


def _interp_template(template: str, bindings: dict[str, list[str]]) -> str:
    """${name[n]} interpolation — the subset of Groovy templating the
    reference's documented examples use (ExtractorMultipleRegex.java:75-78;
    full Groovy evaluation is out of scope by design)."""

    def repl(m: re.Match) -> str:
        name, idx = m.group(1), int(m.group(2))
        groups = bindings.get(name)
        if groups is None or idx >= len(groups):
            return ""
        return groups[idx] or ""

    return re.sub(r"\$\{(\w+)\[(\d+)\]\}", repl, template)


def _extract_multiple_regex_one(
    uri: str, body: str, uri_regex: str, content_regexes: list[tuple[str, str]], template: str
) -> list[tuple]:
    """ExtractorMultipleRegex.extract (ExtractorMultipleRegex.java:212-268):
    URI must fully match uriRegex; every content regex must match at least
    once; one INFERRED outlink per combination of matches, combination i
    decoded base-mixed-radix (matchIndex = tmp % size; tmp /= size) in
    regex order, groups bound as ${name[n]} (n=0 is the whole match)."""
    m = re.fullmatch(uri_regex, uri or "")
    if not m:
        return []
    match_lists: list[tuple[str, list[list[str]]]] = [
        ("uriRegex", [[m.group(0), *m.groups("")] if m.groups() else [m.group(0)]])
    ]
    for name, regex in content_regexes:
        matches = [
            [mm.group(0), *[g if g is not None else "" for g in mm.groups()]]
            for mm in re.finditer(regex, body or "")
        ]
        if not matches:
            return []
        match_lists.append((name, matches))
    n_out = 1
    for _, lst in match_lists:
        n_out *= len(lst)
    out = []
    for i in range(min(n_out, MAX_OUTLINKS)):
        tmp = i
        bindings = {}
        for name, lst in match_lists:
            bindings[name] = lst[tmp % len(lst)]
            tmp //= len(lst)
        out.append((_interp_template(template, bindings), "inferred", "I"))
    return out


def extract_multiple_regex(
    documents: DataFrame,
    uri_regex: str,
    content_regexes: dict[str, str],
    template: str,
    uri_col: str = "doc_id",
    body_col: str = "text",
) -> DataFrame:
    """ExtractorMultipleRegex as an Arrow-batched scanner over documents."""
    regex_items = list(content_regexes.items())

    @pandas_udf(ArrayType(OUTLINK_TYPE))
    def mr_udf(uri: pd.Series, body: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _extract_multiple_regex_one(u, b, uri_regex, regex_items, template)
                for u, b in zip(uri.fillna(""), body.fillna(""))
            ]
        )

    return documents.select(
        F.col(uri_col).alias("doc_id"),
        F.posexplode(mr_udf(F.col(uri_col), F.col(body_col))).alias("pos", "l"),
    ).select(
        "doc_id",
        F.col("l.url").alias("url"),
        F.col("l.context").alias("context"),
        F.col("l.hop").alias("hop"),
        F.col("pos").alias("outlink_index"),
    )


# ExtractorUniversal (ExtractorUniversal.java:358-470): last-resort scan of
# ANY content for URL-shaped character runs. A run of URLable chars
# (isURLableChar :496-504) containing a dot "looks like an URL" when
# http(s)://dotted-quad fully matches, or any dot-suffix's first <=6 chars
# is a TLD (the reference enumerates every ccTLD + the classic gTLDs —
# equivalently: any 2 letters, or the gTLD set). Garbage before 'http' is
# stripped, trailing dots stripped; hop SPECULATIVE 'X'.
_RE_UNIV_RUN = re.compile(r"[#-&+-;=?-Z_a-z~]+")
_RE_UNIV_IP = re.compile(r"(?:(?:http://)|(?:https://))\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
_RE_UNIV_TLD = re.compile(
    # case-sensitive like the reference's TLDs pattern (lowercase entries)
    r"(?:[a-z]{2}|aero|arpa|biz|com|coop|edu|gov|info|int|mil|museum|name|net|org|pro)"
    r"(?:/.*)?$"
)
_UNIV_MAX_PARSE = 1 << 20  # maxSizeToParse default 1MB
_UNIV_MAX_URL = 2083  # UURI.MAX_URL_LENGTH


def _univ_looks_like_url(s: str) -> bool:
    if s.startswith("http://") or s.startswith("https://"):
        if _RE_UNIV_IP.fullmatch(s):
            return True
    dot = s.find(".")
    if dot != 0:
        while dot != -1 and dot < len(s):
            s = s[dot + 1 :]
            if _RE_UNIV_TLD.fullmatch(s[:6] if len(s) > 6 else s):
                return True
            dot = s.find(".")
    return False


def _extract_universal_one(body: str) -> list[tuple]:
    if not body:
        return []
    out = []
    for m in _RE_UNIV_RUN.finditer(body[:_UNIV_MAX_PARSE]):
        run = m.group(0)
        if len(run) > _UNIV_MAX_URL or len(run) <= 3 or "." not in run:
            continue
        if _univ_looks_like_url(run):
            i = run.lower().find("http")
            if i > 0:
                run = run[i:]  # strip garbage before the protocol
            run = run.rstrip(".")
            out.append((run, "universal", "X"))
            if len(out) >= MAX_OUTLINKS:
                break
    return out


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_universal_udf(body: pd.Series) -> pd.Series:
    return pd.Series([_extract_universal_one(b) for b in body.fillna("")])


def text_extractor_chain_udf(extractors: tuple):
    """Engine-facing chain over a page's joined text spans — the FetchChain
    extractor-sequence analog for the text-extractor tail. Each output URL
    is made absolute the way the reference does: ExtractorXML
    addRelativeToBase; ExtractorUniversal feeds the raw string to
    UURIFactory, so scheme-less host-shaped strings get the speculative
    http:// fixup first. Order within a page: configured extractor order,
    then match order."""
    valid = {"xml", "universal"}
    unknown = set(extractors) - valid
    if unknown:
        raise ValueError(f"unknown text extractors: {sorted(unknown)}")

    @pandas_udf(ArrayType(OUTLINK_TYPE))
    def chain(uri: pd.Series, body: pd.Series) -> pd.Series:
        out = []
        for u, b in zip(uri.fillna(""), body.fillna("")):
            links: list[tuple] = []
            for name in extractors:
                if name == "xml" and looks_like_xml(b, uri=u):
                    links += [
                        (_py_resolve(u, x), c, h) for x, c, h in _extract_xml_one(b)
                    ]
                elif name == "universal":
                    links += [
                        (_py_resolve(u, _speculative_fixup(x, u)), c, h)
                        for x, c, h in _extract_universal_one(b)
                    ]
            out.append(links[:MAX_OUTLINKS])
        return pd.Series(out)

    return chain


# ---------------------------------------------------------------------------
# binary-payload extractors (PDF / SWF / DOC) — pandas UDFs over a binary
# column. The reference wraps full format parsers (PDFParser.extractURIs,
# ExtractorPDF.java:97; SWFReader action-tag visitor, ExtractorSWF.java:129;
# Word text-piece extraction, ExtractorDOC.java:43-48). Here:
# * DOC uses the reference's OWN link law verbatim — the extracted text is
#   scanned with `HYPERLINK.*?"(.*?)"` (ExtractorDOC.java:48); text
#   recovery is the UTF-16LE/latin-1 decode of the payload (a Word
#   text-stream subset of the OLE2 parse).
# * PDF covers uncompressed object streams: `/URI (...)` action entries
#   with PDF string escapes; links inside compressed streams need a codec
#   (documented boundary, returns nothing rather than guessing).
# * SWF handles both FWS (raw) and CWS (zlib — stdlib, really
#   decompressed) bodies, then scans action payloads for URL strings —
#   the same material the reference's GetURL visitor yields.
# All emit hop 'E' like the reference's addOutlink(..., EMBED) for PDF and
# speculative/navlink mixes collapse to the embed treatment it uses.
_RE_PDF_URI = re.compile(rb"/URI\s*\(((?:[^()\\]|\\.)*)\)")
_RE_DOC_HYPERLINK = re.compile(r"HYPERLINK.*?\"(.*?)\"")
_RE_SWF_URL = re.compile(rb"(https?://[\x21-\x7e]{4,2000})\x00?")


def _pdf_unescape(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            mapped = {b"n": "\n", b"r": "\r", b"t": "\t", b"(": "(", b")": ")", b"\\": "\\"}
            out.append(mapped.get(nxt, nxt.decode("latin-1")))
            i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


_RE_PDF_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)


def _extract_pdf_one(content: bytes) -> list[tuple]:
    """PDF /URI actions in raw bytes AND inside FlateDecode'd object
    streams (the reference's PDFParser inflates object streams before the
    action walk — PDFParser.java; real-world PDFs almost always compress
    their content). Non-Flate streams fail zlib and are skipped."""
    if not content or not content.startswith(b"%PDF"):
        return []
    import zlib

    links = [
        (_pdf_unescape(m.group(1)), "pdf/URI", "E")
        for m in _RE_PDF_URI.finditer(content)
    ]
    for sm in _RE_PDF_STREAM.finditer(content):
        try:
            blob = zlib.decompress(sm.group(1).rstrip(b"\r\n"))
        except zlib.error:
            continue
        links += [
            (_pdf_unescape(m.group(1)), "pdf/URI", "E")
            for m in _RE_PDF_URI.finditer(blob)
        ]
    return links[:MAX_OUTLINKS]


# --- SWF tag walk (ExtractorSWF.java:387 + CustomSWFTags.java) ------------
# Tag stream: RECT header, then (code<<6|len) records; DoAction(12) and
# DoInitAction(59) carry action records, DefineSprite(39) nests a tag
# stream. Action records >=0x80 carry a 2-byte LE length. The visitor laws
# (CrawlUriSWFAction, ExtractorSWF.java:300-390):
#   GetURL(0x83)      -> embed 'E' outlink; javascript: URLs go through the
#                        ExtractorJS string scan instead
#   ConstantPool(0x88)-> each pool string through considerStringAsUri
#   Push(0x96) string -> considerStringAsUri (isVeryLikelyUri -> 'X')
_SWF_PUSH_FIXED = {1: 4, 2: 0, 3: 0, 4: 1, 5: 1, 6: 8, 7: 4, 8: 1, 9: 2}


def _swf_consider(s: str, out: list) -> None:
    if _is_very_likely_uri(s):
        out.append((s, "swf/string", "X"))


def _swf_actions_urls(actions: bytes, out: list) -> None:
    i, n = 0, len(actions)
    while i < n:
        code = actions[i]
        i += 1
        if code == 0:
            break
        if code < 0x80:
            continue
        if i + 2 > n:
            break
        ln = int.from_bytes(actions[i : i + 2], "little")
        i += 2
        payload = actions[i : i + ln]
        i += ln
        if code == 0x83:  # ActionGetURL: url\0 target\0
            url = payload.split(b"\x00", 1)[0].decode("latin-1", "replace")
            if not url:
                continue
            if url.startswith("javascript:"):
                for u, c, h in _extract_js_one(url[len("javascript:"):]):
                    out.append((u, c, h))
            else:
                out.append((url, "swf/GetURL", "E"))
        elif code == 0x88:  # ActionConstantPool: count + strings
            for s in payload[2:].split(b"\x00"):
                if s:
                    _swf_consider(s.decode("latin-1", "replace"), out)
        elif code == 0x96:  # ActionPush: typed value records
            j, m = 0, len(payload)
            while j < m:
                t = payload[j]
                j += 1
                if t == 0:  # string
                    end = payload.find(b"\x00", j)
                    if end == -1:
                        break
                    _swf_consider(
                        payload[j:end].decode("latin-1", "replace"), out
                    )
                    j = end + 1
                elif t in _SWF_PUSH_FIXED:
                    j += _SWF_PUSH_FIXED[t]
                else:
                    break


def _swf_walk_tags(buf: bytes, i: int, out: list, depth: int = 0) -> None:
    n = len(buf)
    while i < n:
        if i + 2 > n:
            raise ValueError("truncated tag header")
        val = int.from_bytes(buf[i : i + 2], "little")
        i += 2
        code, ln = val >> 6, val & 0x3F
        if ln == 0x3F:
            if i + 4 > n:
                raise ValueError("truncated long tag")
            ln = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        if i + ln > n:
            raise ValueError("tag overruns body")
        payload = buf[i : i + ln]
        i += ln
        if code == 0:  # End
            break
        if code == 12:  # DoAction
            _swf_actions_urls(payload, out)
        elif code == 59:  # DoInitAction: sprite id (2) then actions
            _swf_actions_urls(payload[2:], out)
        elif code == 39 and depth < 4:  # DefineSprite: id+framecount+tags
            _swf_walk_tags(payload, 4, out, depth + 1)


def _swf_tag_walk(body: bytes) -> list[tuple] | None:
    """Walk the parsed tag stream; None when the body is not a coherent
    tag stream (caller falls back to the flat byte scan)."""
    try:
        nbits = body[0] >> 3
        i = (5 + 4 * nbits + 7) // 8  # RECT
        i += 4  # frame rate + frame count
        out: list[tuple] = []
        _swf_walk_tags(body, i, out)
        return out
    except (IndexError, ValueError):
        return None


def _extract_swf_one(content: bytes) -> list[tuple]:
    """SWF extraction: FWS raw / CWS zlib body, then the DoAction /
    DoInitAction / DefineSprite tag walk with the reference's visitor laws
    (drops URL-ish bytes in non-action tags — e.g. image payloads). A body
    that does not parse as a tag stream falls back to the flat URL byte
    scan (salvage path for truncated/nonstandard files)."""
    if not content or len(content) < 8:
        return []
    sig = content[:3]
    if sig == b"CWS":
        import zlib

        try:
            body = zlib.decompress(content[8:])
        except zlib.error:
            return []
    elif sig == b"FWS":
        body = content[8:]
    else:
        return []
    walked = _swf_tag_walk(body)
    if walked is not None:
        return walked[:MAX_OUTLINKS]
    return [
        (m.group(1).decode("latin-1"), "swf/GetURL", "E")
        for m in _RE_SWF_URL.finditer(body)
    ][:MAX_OUTLINKS]


def _extract_doc_one(content: bytes) -> list[tuple]:
    if not content:
        return []
    # Word text streams are UTF-16LE; fall back to latin-1 for plain bodies
    try:
        text = content.decode("utf-16-le", errors="ignore")
    except Exception:  # pragma: no cover - decode('...', ignore) won't raise
        text = ""
    if "HYPERLINK" not in text:
        text = content.decode("latin-1", errors="ignore")
    return [
        (m.group(1), "doc/HYPERLINK", "L")
        for m in _RE_DOC_HYPERLINK.finditer(text)
    ][:MAX_OUTLINKS]


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_pdf_udf(content: pd.Series) -> pd.Series:
    return pd.Series([_extract_pdf_one(b) for b in content])


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_swf_udf(content: pd.Series) -> pd.Series:
    return pd.Series([_extract_swf_one(b) for b in content])


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_doc_udf(content: pd.Series) -> pd.Series:
    return pd.Series([_extract_doc_one(b) for b in content])


def trap_suppress_mask(pages: DataFrame, parent_digests: DataFrame) -> DataFrame:
    """TrapSuppressExtractor (TrapSuppressExtractor.java:50-73): a page
    whose content digest equals its via's digest is a suspected crawler
    trap — extraction is suppressed (`trapSuppressExtractor` annotation).

    ``pages``: (page, via, __digest, ...); ``parent_digests``:
    (doc_id, content_digest) — pass a VIA-pruned slice, never the full
    archive table. Returns pages + boolean ``__trap_suppressed``."""
    pd_ = parent_digests.select(
        F.col("doc_id").alias("__via_doc"), F.col("content_digest").alias("__via_digest")
    )
    joined = pages.join(pd_, pages["via"] == F.col("__via_doc"), "left")
    return joined.withColumn(
        "__trap_suppressed",
        F.col("__via_digest").isNotNull()
        & (F.col("__digest") == F.col("__via_digest")),
    ).drop("__via_doc", "__via_digest")


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_html_udf(base: pd.Series, html: pd.Series) -> pd.Series:
    """Vectorized HTML outlink extraction (regexes compiled once/worker)."""
    return pd.Series(
        [_extract_html_one(b, h) for b, h in zip(base.fillna(""), html.fillna(""))]
    )


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_html_aggressive_udf(base: pd.Series, html: pd.Series) -> pd.Series:
    """AggressiveExtractorHTML (AggressiveExtractorHTML.java:34-50): the
    ExtractorHTML scan with script bodies re-run through processGeneralTag."""
    return pd.Series(
        [
            _extract_html_one(b, h, aggressive=True)
            for b, h in zip(base.fillna(""), html.fillna(""))
        ]
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
