"""Content-type model: synthetic-fetch derivation, report truncation, and
the ExtractorHTML extraction gate.

The reference threads a server-reported Content-Type from FetchHTTP through
CrawlURI.setContentType (modules/.../CrawlURI.java:531-545; null coerced to
"unknown") into reporting (StatisticsTracker tallies
``MimetypeUtils.truncate(curi.getContentType())``,
engine/.../reporting/StatisticsTracker.java:754-756) and into extractor /
DecideRule gates (ExtractorHTML.shouldExtract, ExtractorHTML.java:763-790).
DNS lookups are stamped "text/dns" (fetcher/FetchDNS.java:217).

The synthetic fetch has no server, so the engine derives a deterministic
content type at fetch time: an explicit ``content_type`` column on the web
documents table wins; otherwise /robots.txt bodies are text/plain, known
URL extensions map through ``EXT_MIME``, and any other 2xx payload defaults
to text/html (the synthetic span-web is HTML-shaped). Failed fetches with
no payload carry NULL (reported as "no-type", the MimetypeUtils law).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: URL-extension -> mime type (public common registrations; the subset the
#: MatchesFilePatternDecideRule presets in scope.py care about, plus text)
EXT_MIME = {
    "html": "text/html",
    "htm": "text/html",
    "txt": "text/plain",
    "xml": "text/xml",
    "css": "text/css",
    "js": "application/javascript",
    "json": "application/json",
    "pdf": "application/pdf",
    "doc": "application/msword",
    "ppt": "application/vnd.ms-powerpoint",
    "swf": "application/x-shockwave-flash",
    "png": "image/png",
    "gif": "image/gif",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "bmp": "image/bmp",
    "svg": "image/svg+xml",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "mp3": "audio/mpeg",
    "wav": "audio/x-wav",
    "ogg": "audio/ogg",
    "mp4": "video/mp4",
    "mpg": "video/mpeg",
    "mpeg": "video/mpeg",
    "avi": "video/x-msvideo",
    "mov": "video/quicktime",
    "wmv": "video/x-ms-wmv",
    "flv": "video/x-flv",
}


def ext_mime_col(canonical: Column) -> Column:
    """Mime type implied by the URL path's extension (NULL when none/unknown).
    One flat CASE over a lowercased extracted extension — JVM-side, no UDF."""
    path = F.regexp_extract(canonical, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,5})$", 1))
    expr = F.lit(None).cast("string")
    for e, m in EXT_MIME.items():
        expr = F.when(ext == e, F.lit(m)).otherwise(expr)
    return expr


def content_type_col(
    canonical: Column,
    has_payload: Column,
    is_dns: Column,
    web_ct: Column | None = None,
    is_ftp_dir: Column | None = None,
) -> Column:
    """The synthetic fetch's Content-Type (see module docstring for the law).
    NULL means the fetch produced no typed payload (404 / connect failure).
    ftp: directory listings type text/plain, files application/octet-stream
    (FetchFTP.java:453-457) — pass ``is_ftp_dir`` when the FTP model is on."""
    path = F.regexp_extract(canonical, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    derived = F.when(path == "/robots.txt", F.lit("text/plain")).otherwise(
        F.coalesce(ext_mime_col(canonical), F.lit("text/html"))
    )
    if web_ct is not None:
        derived = F.coalesce(web_ct, derived)
    if is_ftp_dir is not None:
        derived = F.when(
            canonical.startswith("ftp://"),
            F.when(is_ftp_dir, F.lit("text/plain")).otherwise(
                F.lit("application/octet-stream")
            ),
        ).otherwise(derived)
    return (
        F.when(is_dns, F.lit("text/dns"))
        .when(has_payload, derived)
        .otherwise(F.lit(None).cast("string"))
    )


def mime_truncate_col(content_type: Column) -> Column:
    """MimetypeUtils.truncate (archive-commons, public): the leading token
    up to whitespace/';'/',', lowercased; NULL/empty -> "no-type". This is
    what StatisticsTracker feeds the mime distribution with
    (StatisticsTracker.java:754)."""
    tok = F.lower(F.regexp_extract(content_type, r"^([^\s;,]+)", 1))
    return F.when(
        content_type.isNotNull() & (F.length(tok) > 0), tok
    ).otherwise(F.lit("no-type"))


def html_extract_gate_col(content_type: Column) -> Column:
    """ExtractorHTML.shouldExtract's mime gate (ExtractorHTML.java:777-784):
    extract outlinks only from html/xhtml/wap-typed pages. (The reference's
    content-sniff fallback for untyped bodies maps here to the NULL case:
    the synthetic web's untyped payloads are HTML-shaped, so NULL passes —
    mirroring ``contentPrefixLC.contains("<html")`` succeeding.)"""
    mime = F.lower(content_type)
    return content_type.isNull() | (
        mime.startswith("text/html")
        | mime.startswith("application/xhtml")
        | mime.startswith("text/vnd.wap.wml")
        | mime.startswith("application/vnd.wap.wml")
        | mime.startswith("application/vnd.wap.xhtml")
    )


# ---------------------------------------------------------------------------
# scalar mirrors (simulator + oracle side)
# ---------------------------------------------------------------------------
def ext_mime(canonical: str) -> str | None:
    import re

    m = re.match(r"^[^:/?#]+://[^/?#]*([^?#]*)", canonical)
    path = m.group(1) if m else ""
    em = re.search(r"\.([A-Za-z0-9]{1,5})$", path)
    return EXT_MIME.get(em.group(1).lower()) if em else None


def content_type(
    canonical: str,
    has_payload: bool,
    is_dns: bool,
    web_ct: str | None = None,
    is_ftp_dir: bool | None = None,
) -> str | None:
    """Scalar twin of :func:`content_type_col` (simulator parity law)."""
    import re

    if is_dns:
        return "text/dns"
    if not has_payload:
        return None
    if is_ftp_dir is not None and canonical.startswith("ftp://"):
        return "text/plain" if is_ftp_dir else "application/octet-stream"
    if web_ct is not None:
        return web_ct
    m = re.match(r"^[^:/?#]+://[^/?#]*([^?#]*)", canonical)
    path = m.group(1) if m else ""
    if path == "/robots.txt":
        return "text/plain"
    return ext_mime(canonical) or "text/html"


def mime_truncate(content_type: str | None) -> str:
    import re

    if content_type is None:
        return "no-type"
    m = re.match(r"^([^\s;,]+)", content_type)
    return m.group(1).lower() if m else "no-type"


def html_extract_gate(content_type: str | None) -> bool:
    if content_type is None:
        return True
    mime = content_type.lower()
    return mime.startswith(
        ("text/html", "application/xhtml", "text/vnd.wap.wml",
         "application/vnd.wap.wml", "application/vnd.wap.xhtml")
    )
