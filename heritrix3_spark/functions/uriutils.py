"""UriUtils — the speculative-URI heuristics behind the JS/XML/Universal
extractors, implemented exactly from the reference
(/root/reference/commons/src/main/java/org/archive/util/UriUtils.java:
94-507; unit vectors: commons/src/test/java/org/archive/util/
UriUtilsTest.java:36-237, ported in tests/test_ref_ports.py).

Laws:

* ``is_data_uri`` — ``(?i)\\s*data:.*`` full match (:94-96).
* ``is_possible_uri`` — the naive pattern (no ``<``/``>``, at least one
  ``.`` or ``/``; :101-105).
* ``is_likely_uri`` — naive AND NOT ``is_likely_false_positive``
  (mimetype / decimal / unusual-char / edge-punctuation / dot-start /
  bare-``//`` rejections; :111-316). Deprecated in the reference but its
  vectors are the named UriUtilsTest suite.
* ``is_very_likely_uri`` — the preferred heuristic (:412-477): absolute /
  protocol-relative accept, then the LIKELY_RELATIVE_URI_PATTERN with
  two-dot-filename, whitespace, mimetype, decimal, and css-class
  (``div.menu``) rejections.
* ``is_likely_uri_javascript_context_legacy`` — ExtractorJS's original
  detector + exception blacklist (:485-507).
* ``speculative_fixup`` — &amp; unescape, %-encoded http prefix decode,
  scheme-less intended-absolute fixup (:320-360).

All are driver/executor scalar twins; the hot path applies them inside the
extractors' Arrow-batched UDFs (operators/extract.py).
"""

from __future__ import annotations

import re
from urllib.parse import unquote

#: AUDIO_VIDEO_IMAGE_MIMETYPES (UriUtils.java:115-254) — the reference's
#: own constant table (public data, restated like the extractor regexes)
AUDIO_VIDEO_IMAGE_MIMETYPES = frozenset((
    "audio/aiff", "audio/asf", "audio/basic", "audio/m4a",
    "audio/mid", "audio/midi", "audio/mp3", "audio/mp4",
    "audio/mp4a-latm", "audio/mpeg", "audio/mpeg3", "audio/mpegurl",
    "audio/mpg", "audio/ogg", "audio/playlist", "audio/unknown",
    "audio/vnd.qcelp", "audio/vnd.rn-realaudio", "audio/wav", "audio/x-aiff",
    "audio/x-m4a", "audio/x-midi", "audio/x-mp3", "audio/x-mpeg",
    "audio/x-mpeg3", "audio/x-mpegurl", "audio/x-ms-wax", "audio/x-ms-wma",
    "audio/x-ms-wmv", "audio/x-pn-realaudio", "audio/x-pn-realaudio-plugin", "audio/x-realaudio",
    "audio/x-scpls", "audio/x-wav", "image/bitmap", "image/bmp",
    "image/BMP", "image/cur", "image/fits", "image/gif",
    "image/GIF", "image/ico", "image/icon", "image/jp2",
    "image/jpeg", "image/JPEG", "image/jpeg-cmyk", "image/jpg",
    "image/JPG", "image/pdf", "image/pict", "image/pjpeg",
    "image/png", "image/PNG", "image/svg+xml", "image/tiff",
    "image/vnd.adobe.photoshop", "image/vnd.djvu", "image/vnd.dwg", "image/vnd.dxf",
    "image/vnd.microsoft.icon", "image/vnd.ms-modi", "image/vnd.ms-photo", "image/vnd.wap.wbmp",
    "image/x-bitmap", "image/x-bmp", "image/x-citrix-pjpeg", "image/x-dcraw",
    "image/x-djvu", "image/x.djvu", "image/x-emf", "image/x-eps",
    "image/x-guffaw", "image/x-ico", "image/xicon", "image/x-icon",
    "image/x-jg", "image/x-ms-bmp", "image/x-MS-bmp", "image/x-pcx",
    "image/x-photoshop", "image/x-pict", "image/x-png", "image/x-portable-anymap",
    "image/x-portable-bitmap", "image/x-portable-graymap", "image/x-portable-pixmap", "image/x-psd",
    "image/x-quicktime", "image/x-rgb", "image/x-windows-bmp", "image/x-wmf",
    "image/x-xbitmap", "image/x-xbm", "image/x-xfig", "image/x-xpixmap",
    "video/3gpp", "video/asx", "video/avi", "video/f4v",
    "video/flv", "video/m4v", "video/mp4", "video/MP4",
    "video/mp4v-es", "video/mpeg", "video/mpeg3", "video/mpeg4",
    "video/mpg4", "video/msvideo", "video/ogg", "video/quicktime",
    "video/swf", "video/unknown", "video/vnd.objectvideo", "video/webm",
    "video/wmv", "video/x-dv", "video/x-flv", "video/x-m4v",
    "video/x-mp4", "video/x-mpeg", "video/x-ms-asf", "video/x-ms-asx",
    "video/x-msvideo", "video/x-ms-wm", "video/x-ms-wma", "video/x-ms-wmv",
    "video/x-ms-wmx", "video/x-ms-wvx", "video/x-pn-realaudio", "video/x-pn-realvideo",
    "video/x-sgi-movie", "video/x-swf",
))

#: HTML_TAGS (UriUtils.java:364-386) — css-class false-positive filter
HTML_TAGS = frozenset((
    "a", "abbr", "acronym", "address", "applet", "area", "article", "aside",
    "audio", "b", "base", "basefont", "bdi", "bdo", "big", "blockquote",
    "body", "br", "button", "canvas", "caption", "center", "cite", "code",
    "col", "colgroup", "command", "datalist", "dd", "del", "details", "dfn",
    "dir", "div", "dl", "dt", "em", "embed", "fieldset", "figcaption",
    "figure", "font", "footer", "form", "frame", "frameset", "head", "header",
    "hgroup", "h1", "h2", "h3", "h4", "h5", "h6", "hr",
    "html", "i", "iframe", "img", "input", "ins", "kbd", "keygen",
    "label", "legend", "li", "link", "map", "mark", "menu", "meta",
    "meter", "nav", "noframes", "noscript", "object", "ol", "optgroup", "option",
    "output", "p", "param", "pre", "progress", "q", "rp", "rt",
    "ruby", "s", "samp", "script", "section", "select", "small", "source",
    "span", "strike", "strong", "style", "sub", "summary", "sup", "table",
    "tbody", "td", "textarea", "tfoot", "th", "thead", "time", "title",
    "tr", "track", "tt", "u", "ul", "var", "video", "wbr",
))

#: KNOWN_GOOD_FILE_EXTENSIONS (UriUtils.java:388-399)
KNOWN_GOOD_FILE_EXTENSIONS = frozenset((
    ".jpg", ".js", ".css", ".png", ".gif", ".swf", ".flv", ".mp4", ".mp3",
    ".jpeg", ".html", ".pdf",
))

_NAIVE = re.compile(r"[^<>]*[./][^<>]*")
_RE_DATA = re.compile(r"(?i)\s*data:.*")
_RE_TEXT_APP = re.compile(r"(?:text|application)/[^/]+")
_RE_DECIMAL = re.compile(r"\d+(?:\.\d+)*")
_RE_UNUSUAL = re.compile(r".*[$()'\"\[\]{}|].*")
_RE_EDGE_PUNCT = re.compile(r"^[,;+:].*|.*[.,;+:]$", re.S)
_RE_DOT_SLASH = re.compile(r"^\.{1,2}/.*")
_RE_BARE_DSLASH = re.compile(r"^.*[^:]//.*$")
_RE_ABS = re.compile(r"^(?i:https?)://[^<>\s/]+\.[^<>\s/]+(?:/[^<>\s]*)?")
_RE_PROTO_REL = re.compile(r"^//[^<>\s/]+\.[^<>\s/]+(?:/[^<>\s]*)?")

# QNV / LIKELY_RELATIVE_URI_PATTERN (UriUtils.java:401-409); group(1) is
# the filename, group(2) its extension with the leading '.'
_QNV = r"[a-zA-Z_]+=(?:[\w\-/.]|%[0-9a-fA-F]{2})*"
_RE_LIKELY_REL = re.compile(
    r"(?:\.?/)?"
    r"(?:(?:[\s\w\-]+|\.\.)(?:/))*"
    r"([\s\w\-]+(?:\.[\w\-]+)??(\.[a-zA-Z0-9]{2,5})?)?"
    r"(?:\?(?:" + _QNV + r")(?:&(?:" + _QNV + r"))*)?"
    r"(?:#[\w\-]+)?"
)
_RE_WS = re.compile(r".*\s+.*", re.S)
_RE_CSS_CLASS = re.compile(r"([^./]+)\.([^./]+)")

# legacy ExtractorJS detector (UriUtils.java:485-496): no whitespace or
# <>, an internal dot or slash, word-char or slash at both ends
_RE_LEGACY_DETECTOR = re.compile(
    r"(?:\w|[.]{0,2}/)[^\s<>]*(?:[./])[^\s<>]*(?:\w|/)"
)
STRING_URI_DETECTOR_EXCEPTIONS = frozenset(("text/javascript",))


def is_data_uri(candidate: str) -> bool:
    return bool(_RE_DATA.fullmatch(candidate))


def is_possible_uri(candidate: str) -> bool:
    return bool(_NAIVE.fullmatch(candidate))


def is_likely_false_positive(candidate: str) -> bool:
    """UriUtils.isLikelyFalsePositive:256-316 — every rejection in the
    reference's order."""
    if _RE_TEXT_APP.fullmatch(candidate):
        return True
    if candidate in AUDIO_VIDEO_IMAGE_MIMETYPES:
        return True
    if _RE_DECIMAL.fullmatch(candidate):
        return True
    if _RE_UNUSUAL.fullmatch(candidate):
        return True
    if _RE_EDGE_PUNCT.fullmatch(candidate):
        return True
    if candidate and candidate[0] == "." and not _RE_DOT_SLASH.match(candidate):
        return True
    if _RE_BARE_DSLASH.fullmatch(candidate):
        return True
    return False


def is_likely_uri(candidate: str) -> bool:
    return is_possible_uri(candidate) and not is_likely_false_positive(candidate)


def is_very_likely_uri(candidate: str) -> bool:
    """UriUtils.isVeryLikelyUri:412-477."""
    if not _NAIVE.fullmatch(candidate):
        return False
    if _RE_ABS.fullmatch(candidate) or _RE_PROTO_REL.fullmatch(candidate):
        return True
    m = _RE_LIKELY_REL.fullmatch(candidate)
    if not m:
        return False
    filename, extension = m.group(1), m.group(2)
    if (
        filename is not None
        and extension is not None
        and filename.find(".") != filename.rfind(".")
        and extension not in KNOWN_GOOD_FILE_EXTENSIONS
    ):
        return False
    if _RE_WS.fullmatch(candidate) and (
        extension is None or extension not in KNOWN_GOOD_FILE_EXTENSIONS
    ):
        return False
    if _RE_TEXT_APP.fullmatch(candidate):
        return False
    if candidate in AUDIO_VIDEO_IMAGE_MIMETYPES:
        return False
    if _RE_DECIMAL.fullmatch(candidate):
        return False
    mc = _RE_CSS_CLASS.fullmatch(candidate)
    if mc and mc.group(1).lower() in HTML_TAGS:
        return False
    return True


def is_likely_uri_javascript_context_legacy(candidate: str) -> bool:
    if not _RE_LEGACY_DETECTOR.fullmatch(candidate):
        return False
    return candidate not in STRING_URI_DETECTOR_EXCEPTIONS


def speculative_fixup(candidate: str, base: str | None = None) -> str:
    """UriUtils.speculativeFixup:320-360 (scheme-less fixup uses the
    base's scheme when the candidate starts with the base's host)."""
    ret = candidate.replace("&amp;", "&")
    if re.match(r"(?i)^https?%3A.*", ret):
        ret = unquote(ret)
    m = re.fullmatch(r"(?:[^./:\s]+\.)+[a-zA-Z]{2,}(?:/.*)?", ret)
    if m and not re.match(r"^[a-zA-Z][\w+\-.]*://", ret):
        scheme = "http"
        if base:
            bm = re.match(r"^([a-zA-Z][\w+\-.]*)://([^/?#]*)", base)
            if bm and ret.startswith(bm.group(2)):
                scheme = bm.group(1)
        ret = f"{scheme}://{ret}"
    return ret


# LIKELY_URI_PATH (UriUtils.java:518-519): the HTML-context legacy law —
# like the javascript detector but quote-free (form VALUE attributes)
_RE_LEGACY_HTML = re.compile(
    r"(\.{0,2}[^.\n\r\s\"']*(\.[^.\n\r\s\"']+)+)"
)


def is_likely_uri_html_context_legacy(candidate: str) -> bool:
    return bool(_RE_LEGACY_HTML.fullmatch(candidate))
