"""Contrib extractor family: ExtractorPDFContent, KnowledgableExtractorJS,
ExtractorYoutube(Channel)FormatStream.

Golden vectors mirror the reference contrib tests
(ExtractorPDFContentTest.java, ExtractorYoutubeFormatStreamTest.java):
the expected URL sets are the reference's own assertions; the input
fixtures are synthesized here in the same shapes (the reference binds
binary resource files we deliberately do not copy).
"""
from __future__ import annotations

import html
import urllib.parse
import zlib

import pyspark.sql.functions as F

from heritrix3_spark.operators import extract_contrib as C


def _mkpdf(*page_texts: str, compress: bool = True) -> bytes:
    """One content stream per page: each text line as `(...) Tj` + `Td`."""
    body = b"%PDF-1.4\n"
    for t in page_texts:
        ops = []
        for line in t.split("\n"):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            ops.append(b"(" + esc.encode("latin-1") + b") Tj\n0 -14 Td\n")
        stream = b"BT\n" + b"".join(ops) + b"ET"
        if compress:
            stream = zlib.compress(stream)
        body += b"stream\n" + stream + b"\nendstream\n"
    return body


def _urls(content: bytes) -> set[str]:
    return {u for u, _, _ in C._extract_pdf_content_one(content)}


# --- ExtractorPDFContent (vectors: ExtractorPDFContentTest.java:42-78) ----


def test_pdf_content_basic():
    pdf = _mkpdf(
        "A supervisor (see "
        "http://www.businessdictionary.com/definition/supervisor.html or\n"
        "http://management.about.com/od/policiesandprocedures/g/supervisor1.html"
        " for detail)"
    )
    got = _urls(pdf)
    assert "http://www.businessdictionary.com/definition/supervisor.html" in got
    assert (
        "http://management.about.com/od/policiesandprocedures/g/supervisor1.html"
        in got
    )


def test_pdf_content_ending_in_dot():
    pdf = _mkpdf(
        "Data at http://www.fec.gov/data/CommitteeSummary.do. Stats at\n"
        "http://www.opensecrets.org/bigpicture/elec_stats.php. See also\n"
        "http://www.opensecrets.org/pacs."
    )
    got = _urls(pdf)
    # the trailing-dot law queues the dot-less twin alongside
    assert "http://www.fec.gov/data/CommitteeSummary.do" in got
    assert "http://www.opensecrets.org/bigpicture/elec_stats.php" in got
    assert "http://www.opensecrets.org/pacs" in got


def test_pdf_content_underscore():
    pdf = _mkpdf(
        "report http://www.dot.gov/sites/dot.dev/files/docs/"
        "2014_February_ATCR.pdf end"
    )
    assert (
        "http://www.dot.gov/sites/dot.dev/files/docs/2014_February_ATCR.pdf"
        in _urls(pdf)
    )


def test_pdf_content_parens_and_newline():
    pdf = _mkpdf(
        "(http://www.unisys.com) and (http://www.example.com/testOpeningParen x",
        "wrapped http://www.example.com/test\ning more "
        "plus http://www.adobe.com/intro?100,200 q",
    )
    got = _urls(pdf)
    assert "http://www.unisys.com" in got  # wrapping parens stripped
    assert "http://www.example.com/testOpeningParen" in got  # opening only
    # newline-continuation: both the joined form and the pre-newline
    # alternate are queued (ExtractorPDFContent.java:114-123)
    assert "http://www.example.com/test\ning" in got
    assert "http://www.example.com/test" in got
    assert "http://www.adobe.com/intro?100,200" in got


def test_pdf_content_tj_array_and_quote_op():
    pdf = (
        b"%PDF-1.4\nstream\n"
        b"BT [(See http:) -200 (//www.w3.org/1999/xhtml)] TJ "
        b"(next http://www.adobe.com/getacro.gif)' ET"
        b"\nendstream"
    )
    got = _urls(pdf)
    # TJ array fragments concatenate; ' starts a new line first
    assert "http://www.w3.org/1999/xhtml" in got
    assert "http://www.adobe.com/getacro.gif" in got


def test_pdf_content_not_a_pdf():
    assert C._extract_pdf_content_one(b"plain http://x.example/ text") == []
    assert C._extract_pdf_content_one(b"") == []


# --- KnowledgableExtractorJS (KnowledgableExtractorJS.java:89-133) --------


def test_knowledgable_js_drupal_basepath():
    js = (
        'jQuery.extend(Drupal.settings, {"basePath": "/drupal/"});\n'
        'var a = "misc/jquery.js";\n'
    )
    got = C._extract_js_knowledgable_one("http://ex.org/node/1", js)
    assert ("http://ex.org/drupal/misc/jquery.js", "js/string", "X") in got


def test_knowledgable_js_basepath_unescape():
    js = (
        "jQuery.extend(Drupal.settings, "
        '{"basePath": "\\u002fsite\\u002f"});\n'
        'var a = "files/x.css";\n'
    )
    got = C._extract_js_knowledgable_one("http://ex.org/a", js)
    assert ("http://ex.org/site/files/x.css", "js/string", "X") in got


def test_knowledgable_js_yt_player():
    js = (
        "var player = new YT.Player('player', {\n"
        "  height: '390', width: '640', videoId: 'dQw4w9WgXcQ',\n"
        "});"
    )
    got = C._extract_js_knowledgable_one("http://ex.org/v", js)
    assert ("https://www.youtube.com/watch?v=dQw4w9WgXcQ", "js/yt-player", "I") in got


def test_knowledgable_js_no_smarts_is_plain_js():
    js = 'var a = "misc/jquery.js";'
    got = C._extract_js_knowledgable_one("http://ex.org/node/1", js)
    # no drupal settings: resolve against the page base (RFC 3986 — the
    # trailing path segment of /node/1 is replaced)
    assert ("http://ex.org/node/misc/jquery.js", "js/string", "X") in got


# --- ExtractorYoutube(Channel)FormatStream --------------------------------


def _enc(u: str) -> str:
    return urllib.parse.quote(u, safe="")


def _stream_map() -> str:
    return ",".join(
        [
            "itag=44&url=" + _enc("http://r3.example/vp?itag=44&id=a") + "&sig=SIG44",
            "url=" + _enc("http://r3.example/vp?itag=35&id=a&signature=IN35")
            + "&itag=35",
            "itag=43&url=" + _enc("http://r3.example/vp?itag=43&id=a") + "&s=S43",
            "itag=34&url=" + _enc("http://r3.example/vp?itag=34&id=a") + "&sig=SIG34",
            "itag=999&url=" + _enc("http://r3.example/vp?itag=999&id=a")
            + "&sig=SIG999",
            "broken&param",  # invalid key=value pairs are skipped
            "itag=18",  # no url param -> dropped
        ]
    )


def _watch_body() -> str:
    sm = _stream_map().replace('"', '\\"')
    return (
        "<html><script>var ytplayer = {};ytplayer.config = "
        '{"args": {"url_encoded_fmt_stream_map": "%s", "x": 1}};'
        "</script></html>" % sm
    )


WATCH = "http://www.youtube.com/watch?v=_BFJN62hZp0"


def test_yt_default_priority_limit_one():
    # testDefaultItag: default list, limit 1 -> first present default itag (43)
    got = C._extract_youtube_one(WATCH, _watch_body(), None, 1, False)
    assert got == [
        ("http://r3.example/vp?itag=43&id=a&signature=S43", "yt/stream", "E")
    ]


def test_yt_priority_order_wins():
    # testPriority: [37,24,34,35] with 37/24 absent -> itag 34, not 35
    got = C._extract_youtube_one(WATCH, _watch_body(), ["37", "24", "34", "35"], 1,
                                 False)
    assert got == [
        ("http://r3.example/vp?itag=34&id=a&signature=SIG34", "yt/stream", "E")
    ]


def test_yt_no_priority_no_limit_includes_unknown():
    # testAllNoPriority: every known itag in default order, then unknowns
    got = [u for u, _, _ in C._extract_youtube_one(WATCH, _watch_body(), None, 0,
                                                   False)]
    assert got == [
        "http://r3.example/vp?itag=43&id=a&signature=S43",
        "http://r3.example/vp?itag=35&id=a&signature=IN35",
        "http://r3.example/vp?itag=34&id=a&signature=SIG34",
        "http://r3.example/vp?itag=44&id=a&signature=SIG44",
        "http://r3.example/vp?itag=999&id=a&signature=SIG999",
    ]


def test_yt_priority_caps_even_with_big_limit():
    # testOnlyInItagPriorityBigLimit: only the 3 prioritized itags
    got = C._extract_youtube_one(WATCH, _watch_body(), ["44", "35", "43"], 10, False)
    assert len(got) == 3


def test_yt_not_watch_page():
    # testDontExtract
    got = C._extract_youtube_one("http://archive.org/watch?w=b", _watch_body(),
                                 None, 0, False)
    assert got == []


def test_yt_sig_appended_and_urldecoded():
    parsed = C.parse_stream_map(_stream_map())
    assert parsed["44"] == "http://r3.example/vp?itag=44&id=a&signature=SIG44"
    assert parsed["35"] == "http://r3.example/vp?itag=35&id=a&signature=IN35"
    assert "18" not in parsed and "broken" not in parsed


def test_yt_channel_swf_config():
    sm = _stream_map().replace('"', '\\"')
    j = '{"args": {"url_encoded_fmt_stream_map": "%s"}}' % sm
    esc = html.escape(html.escape(j, quote=True), quote=True)
    body = '<div data-swf-config="' + esc + '">'
    got = C._extract_youtube_one("http://www.youtube.com/user/foo", body, None, 1,
                                 True)
    assert got == [
        ("http://r3.example/vp?itag=43&id=a&signature=S43", "yt/stream", "E")
    ]
    # watch-page gate does not accept /user pages and vice versa
    assert C._extract_youtube_one(WATCH, body, None, 1, True) == []


def test_contrib_udfs_spark(spark):
    pdf = _mkpdf("see http://spark.example/a.html here")
    df = spark.createDataFrame(
        [(bytearray(pdf),)], "content binary"
    ).select(F.explode(C.extract_pdf_content_udf("content")).alias("l"))
    assert {r.l.url for r in df.collect()} == {"http://spark.example/a.html"}

    yt = spark.createDataFrame(
        [(WATCH, _watch_body()), ("http://other.example/", _watch_body())],
        ["uri", "body"],
    ).select(
        F.explode(
            C.extract_youtube_stream_udf(extract_limit=1)(F.col("uri"),
                                                          F.col("body"))
        ).alias("l")
    )
    rows = yt.collect()
    assert len(rows) == 1 and rows[0].l.hop == "E"

    js = spark.createDataFrame(
        [
            (
                "http://ex.org/node/1",
                'jQuery.extend(Drupal.settings, {"basePath": "/d/"});'
                'var a = "misc/x.js";',
            )
        ],
        ["base", "body"],
    ).select(
        F.explode(C.extract_js_knowledgable_udf("base", "body")).alias("l")
    )
    assert {r.l.url for r in js.collect()} == {"http://ex.org/d/misc/x.js"}
