"""Contrib-tier extractors, re-expressed as Arrow-batched pandas UDFs.

Reference (contrib/src/main/java/org/archive/modules/extractor/):

- ``ExtractorPDFContent.java`` — parse the *text* of a PDF and harvest
  URLs from the prose with a permissive pattern (vs the core
  ExtractorPDF, which only walks ``/URI`` actions).
- ``KnowledgableExtractorJS.java`` — ExtractorJS with two page-specific
  smarts: a Drupal ``basePath`` override for relative JS strings, and a
  ``new YT.Player(..., {videoId: ...})`` -> watch-page inferred link.
- ``ExtractorYoutubeFormatStream.java`` /
  ``ExtractorYoutubeChannelFormatStream.java`` — decode the
  ``url_encoded_fmt_stream_map`` of a watch/channel page and emit the
  highest-priority format-stream URLs as embeds.

Intentionally absent: ``ExtractorChrome.java`` (drives a live headless
Chrome over its devtools socket) and ``ExtractorYoutubeDL.java`` (shells
out to the youtube-dl binary) — both are process-integration modules
with no pure data law to re-express in a Spark operator.

All laws here run inside ``mapInPandas``-style vectorized UDFs over the
fetched-body column; nothing touches the driver, so the shapes scale
with the documents table exactly like the core extractor family.
"""
from __future__ import annotations

import html as _html
import json
import re
import zlib
from urllib.parse import unquote_plus

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType

from heritrix3_spark.operators.extract import (
    MAX_OUTLINKS,
    OUTLINK_TYPE,
    _extract_js_one,
    _py_resolve,
    _speculative_fixup,
)

# ---------------------------------------------------------------------------
# ExtractorPDFContent (ExtractorPDFContent.java:52-148)
# ---------------------------------------------------------------------------

#: ExtractorPDFContent.URLPattern translated verbatim (the Java source
#: embeds an empty inline-flags group ``(?)`` — a no-op that Python's re
#: rejects, dropped here; it captures nothing so group numbers match).
#: Group numbers used by the law: 1=protocol, 2=userinfo-with-@,
#: 6=host[:port], 13=path+query, 19=newline continuation.
_RE_PDF_CONTENT_URL = re.compile(
    r"(?i)\(?(https?)://"
    r"(([a-z0-9$_\.\+!\*\'\(\),;\?&=-]|%[0-9a-f]{2})+"
    r"(:([a-z0-9$_\.\+!\*\'\(\),;\?&=-]|%[0-9a-f]{2})+)?"
    r"@)?"
    r"((([a-z0-9]\.|[a-z0-9][a-z0-9-]*[a-z0-9]\.)*"
    r"[a-z][a-z0-9-]*[a-z0-9]"
    r"|((\d|[1-9]\d|1\d{2}|2[0-4][0-9]|25[0-5])\.){3}"
    r"(\d|[1-9]\d|1\d{2}|2[0-4][0-9]|25[0-5])"
    r")(:\d+)?)"
    r"(((/+([a-z0-9$_\.\+!\*\'\(\),;:@&=-]|%[0-9a-f]{2})*)*"
    r"(\?([a-z0-9$_\.\+!\*\'\(\),;:@&=-]|%[0-9a-f]{2})*)?)?)?"
    r"(\n(?!http://)"
    r"((/)?([a-z0-9$_\.\+!\*\'\(\),;:@&=-]|%[0-9a-f]{2})*)*"
    r"(\?([a-z0-9$_\.\+!\*\'\(\),;:@&=-]|%[0-9a-f]{2})*)?"
    r")?"
)

_RE_PDF_STREAM = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

#: text-showing / line-advance operators inside a content stream.
#: ``(s) Tj`` and ``(s) '`` show a string, ``[ (a) -250 (b) ] TJ`` shows
#: an array, ``Td``/``TD``/``T*`` (and ``'``) advance to the next line.
_RE_PDF_TEXT_TOKEN = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)\s*(Tj|')"
    rb"|\[((?:\((?:[^()\\]|\\.)*\)|[^\]])*)\]\s*TJ"
    rb"|(?:-?[\d.]+\s+-?[\d.]+\s+)?(T\*|TD|Td)"
)
_RE_PDF_ARRAY_STR = re.compile(rb"\(((?:[^()\\]|\\.)*)\)")


def _pdf_str(raw: bytes) -> str:
    """Decode a PDF literal string (subset: \\n \\r \\t \\( \\) \\\\)."""
    out = []
    i = 0
    mapped = {b"n": "\n", b"r": "\r", b"t": "\t"}
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            out.append(mapped.get(nxt, nxt.decode("latin-1")))
            i += 2
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out)


def pdf_page_texts(content: bytes) -> list[str]:
    """Extract the page prose of a PDF, one string per content stream.

    Simplified SimpleTextExtractionStrategy (the reference binds iText's
    ``PdfReaderContentParser`` + ``SimpleTextExtractionStrategy``,
    ExtractorPDFContent.java:150-163): each ``stream...endstream``
    segment is inflated when FlateDecode'd, then its text-showing
    operators are concatenated with a newline at every line-advance
    (``Td``/``TD``/``T*``/``'``). iText additionally tracks the exact
    text matrix to decide line breaks; for link harvesting the
    operator-level approximation is equivalent on any PDF whose writer
    emits one ``Td`` per line (the overwhelmingly common shape).
    """
    if not content or not content.startswith(b"%PDF"):
        return []
    pages = []
    for sm in _RE_PDF_STREAM.finditer(content):
        blob = sm.group(1)
        try:
            blob = zlib.decompress(blob.rstrip(b"\r\n"))
        except zlib.error:
            pass
        parts: list[str] = []
        for m in _RE_PDF_TEXT_TOKEN.finditer(blob):
            if m.group(2) == b"'":  # ' = next-line-then-show
                parts.append("\n" + _pdf_str(m.group(1)))
            elif m.group(1) is not None:
                parts.append(_pdf_str(m.group(1)))
            elif m.group(3) is not None:  # TJ array
                parts.append(
                    "".join(
                        _pdf_str(s.group(1))
                        for s in _RE_PDF_ARRAY_STR.finditer(m.group(3))
                    )
                )
            elif parts and not parts[-1].endswith("\n"):
                parts.append("\n")
        text = "".join(parts)
        if text.strip():
            pages.append(text)
    return pages


def pdf_content_urls(page_text: str) -> list[str]:
    """The ExtractorPDFContent harvest law (ExtractorPDFContent.java:96-124).

    Per match: trim; strip a wrapping paren pair; queue it; if it ends in
    a sentence '.', also queue the dot-less twin; if the match continued
    across a newline (group 19), also queue the pre-newline alternate
    rebuilt from groups 1/2/6/13.
    """
    uris: list[str] = []
    for m in _RE_PDF_CONTENT_URL.finditer(page_text):
        u = m.group(0).strip()
        if u.startswith("("):
            u = u[1:]
            if u.endswith(")"):
                u = u[:-1]
        uris.append(u)
        if u.endswith(".") and len(u) > 2:
            uris.append(u[:-1])
        if m.group(19) is not None:
            alt = m.group(1) + "://" + (m.group(2) or "") + m.group(6) + (
                m.group(13) or ""
            )
            if u.startswith("(") and alt.endswith(")"):
                alt = alt[:-1]
            uris.append(alt)
    return uris


def _extract_pdf_content_one(content: bytes) -> list[tuple]:
    out = []
    for page in pdf_page_texts(content):
        # NAVLINK_MISC / Hop.NAVLINK (ExtractorPDFContent.java:140)
        out += [(u, "pdf/text", "L") for u in pdf_content_urls(page)]
    return out[:MAX_OUTLINKS]


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_pdf_content_udf(content: pd.Series) -> pd.Series:
    return pd.Series([_extract_pdf_content_one(b) for b in content])


# ---------------------------------------------------------------------------
# KnowledgableExtractorJS (KnowledgableExtractorJS.java:89-133)
# ---------------------------------------------------------------------------

_RE_DRUPAL_BASEPATH = re.compile(
    r"jQuery\.extend\(Drupal\.settings,[^'\"]*['\"]basePath['\"]:"
    r"[^'\"]*['\"]([^'\"]+)['\"]"
)
_RE_YT_PLAYER = re.compile(
    r"new[\s]+YT\.Player\(['\"][^'\"]+['\"],[\s]+\{[\n\s\w:'\",]+videoId:"
    r"[\s]+['\"]([\w-]+)['\"],"
)
_RE_JS_ESCAPE = re.compile(r"\\(u[0-9a-fA-F]{4}|x[0-9a-fA-F]{2}|.)")


def _unescape_js(s: str) -> str:
    """StringEscapeUtils.unescapeJavaScript subset: \\uXXXX, \\xXX, \\c."""

    def repl(m: re.Match) -> str:
        e = m.group(1)
        if e[0] == "u":
            return chr(int(e[1:], 16))
        if e[0] == "x":
            return chr(int(e[1:], 16))
        return {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}.get(e, e)

    return _RE_JS_ESCAPE.sub(repl, s)


def _extract_js_knowledgable_one(base: str, body: str) -> list[tuple]:
    """ExtractorJS plus the two knowledgable laws, with resolution.

    Returns ABSOLUTE urls (unlike the speculative core ``_extract_js_one``
    which defers resolution): the whole point of the Drupal law is that
    relative JS strings resolve against ``basePath``, not the page URL.
    """
    if not body:
        return []
    out: list[tuple] = []
    eff_base = base or ""
    m = _RE_DRUPAL_BASEPATH.search(body)
    if m:
        bp = _unescape_js(m.group(1))
        try:
            eff_base = _py_resolve(eff_base, bp)
        except Exception:
            pass
    m = _RE_YT_PLAYER.search(body)
    if m:
        # INFERRED_MISC / Hop.INFERRED (KnowledgableExtractorJS.java:119-123)
        out.append(
            ("https://www.youtube.com/watch?v=" + m.group(1), "js/yt-player", "I")
        )
    for url, ctx, hop in _extract_js_one(body):
        try:
            out.append(
                (_py_resolve(eff_base, _speculative_fixup(url, eff_base)), ctx, hop)
            )
        except Exception:
            out.append((url, ctx, hop))
        if len(out) >= MAX_OUTLINKS:
            break
    return out[:MAX_OUTLINKS]


@pandas_udf(ArrayType(OUTLINK_TYPE))
def extract_js_knowledgable_udf(base: pd.Series, body: pd.Series) -> pd.Series:
    return pd.Series(
        [
            _extract_js_knowledgable_one(b, j)
            for b, j in zip(base.fillna(""), body.fillna(""))
        ]
    )


# ---------------------------------------------------------------------------
# ExtractorYoutubeFormatStream (+Channel)
# ---------------------------------------------------------------------------

#: itag priority when none is configured
#: (ExtractorYoutubeFormatStream.java:162-242 — format/quality data from
#: the public Wikipedia "Comparison of YouTube media encoding options").
DEFAULT_ITAG_PRIORITY = [
    "37", "22", "43", "18", "5", "36", "17",
    "35", "34",
    "85", "84", "100", "82", "83",
    "6", "13", "38", "44", "45", "46", "101", "102",
    "95", "96", "94", "93", "92", "132", "151",
    "136", "137", "135", "264", "134", "133", "160", "172", "140", "171",
    "120", "141", "139",
]
KNOWN_ITAGS = frozenset(DEFAULT_ITAG_PRIORITY)

_RE_YT_WATCH = re.compile(r"^https?://([^.]+\.)?youtube\.com/watch.*$")
_RE_YT_USER = re.compile(r"^https?://(?:www\.)?youtube\.com/user.*$")
_RE_YT_CONFIG = re.compile(r"(?is)ytplayer\.config = (\{.*?\})(;|</script>|$)")
_RE_YT_SWF_CONFIG = re.compile(r'data-swf-config="(\{.*?\}")>')


def parse_stream_map(stream_map: str) -> dict[str, str]:
    """url_encoded_fmt_stream_map -> ordered {itag: fixed-up url}
    (ExtractorYoutubeFormatStream.java:286-331)."""
    parsed: dict[str, str] = {}
    for raw in stream_map.split(","):
        url_p = itag_p = sig_p = None
        for param in raw.split("&"):
            # Java String.split("=") drops trailing empties: "url=" -> 1 part
            kv = param.split("=")
            while kv and kv[-1] == "":
                kv.pop()
            if len(kv) != 2:
                continue
            if kv[0] == "url":
                url_p = kv[1]
            if kv[0] == "itag":
                itag_p = kv[1]
            if kv[0] in ("sig", "s"):
                sig_p = kv[1]
        if url_p is not None and itag_p is not None:
            fixed = unquote_plus(url_p)  # URLDecoder.decode(..., "UTF-8")
            if sig_p is not None:
                fixed = fixed + "&signature=" + sig_p
            parsed[itag_p] = fixed
    return parsed


def preferred_stream_urls(
    parsed: dict[str, str],
    itag_priority: list[str] | None = None,
    extract_limit: int = 1,
) -> list[str]:
    """Priority-ordered selection (ExtractorYoutubeFormatStream.java:247-284):
    walk the priority list (configured, else the default) up to the limit;
    with no configured list, also sweep unknown itags in map order."""
    pri = itag_priority if itag_priority else DEFAULT_ITAG_PRIORITY
    out: list[str] = []
    for itag in pri:
        if itag in parsed and (extract_limit <= 0 or len(out) < extract_limit):
            out.append(parsed[itag])
    if not itag_priority:
        for itag, url in parsed.items():
            if extract_limit > 0 and len(out) >= extract_limit:
                break
            if itag not in KNOWN_ITAGS:
                out.append(url)
    return out


def _yt_stream_map_from(body: str, channel: bool) -> str | None:
    if channel:
        m = _RE_YT_SWF_CONFIG.search(body)
        if not m:
            return None
        # double HTML-unescape, then lenient parse that ignores the
        # captured trailing quote (org.json stops at the balanced brace;
        # ExtractorYoutubeChannelFormatStream.java:64-70)
        json_str = _html.unescape(_html.unescape(m.group(1)))
        try:
            obj, _ = json.JSONDecoder().raw_decode(json_str)
        except ValueError:
            return None
    else:
        m = _RE_YT_CONFIG.search(body)
        if not m:
            return None
        try:
            obj = json.loads(m.group(1))
        except ValueError:
            return None
    args = obj.get("args") if isinstance(obj, dict) else None
    if not isinstance(args, dict):
        return None
    sm = args.get("url_encoded_fmt_stream_map")
    return sm if isinstance(sm, str) else None


def _extract_youtube_one(
    uri: str,
    body: str,
    itag_priority: list[str] | None,
    extract_limit: int,
    channel: bool,
) -> list[tuple]:
    gate = _RE_YT_USER if channel else _RE_YT_WATCH
    if not body or not uri or not gate.match(uri):
        return []
    sm = _yt_stream_map_from(body, channel)
    if sm is None:
        return []
    # EMBED_MISC / Hop.EMBED (ExtractorYoutubeFormatStream.java:261-263)
    return [
        (u, "yt/stream", "E")
        for u in preferred_stream_urls(parse_stream_map(sm), itag_priority,
                                       extract_limit)
    ][:MAX_OUTLINKS]


def extract_youtube_stream_udf(
    itag_priority: list[str] | None = None,
    extract_limit: int = 1,
    channel: bool = False,
):
    """UDF factory — the itag priority / limit are extractor config, so
    they bind at plan build (broadcast with the serialized lambda), not
    per row."""
    pri = list(itag_priority) if itag_priority else None

    @pandas_udf(ArrayType(OUTLINK_TYPE))
    def _udf(uri: pd.Series, body: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _extract_youtube_one(u, b, pri, extract_limit, channel)
                for u, b in zip(uri.fillna(""), body.fillna(""))
            ]
        )

    return _udf
