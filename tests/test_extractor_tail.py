"""Text-extractor tail: ExtractorXML / ExtractorURI / ExtractorImpliedURI /
ExtractorMultipleRegex / TrapSuppressExtractor.

Golden vectors: ExtractorXMLTest.VALID_TEST_DATA is ported verbatim; the
URI/Implied reference tests are empty (`// TODO TESTME!`), so their cases
are derived from the documented laws (ExtractorURI.java:139-163,
ExtractorImpliedURI.java:168-178); MultipleRegex's combination law
(ExtractorMultipleRegex.java:231-268) is exercised synthetically (the
reference test's fixture is a 400KB real-world page)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from heritrix3_spark.operators import extract as EX


# -- ExtractorXML ---------------------------------------------------------
# ExtractorXMLTest.VALID_TEST_DATA (modules/src/test/.../ExtractorXMLTest.java:39-46)
XML_GOLDEN = [
    ("<link>http://conservation.org</link>", ["http://conservation.org"]),
    (
        "<CI:imagePath><![CDATA[http://sp10.conservation.org/CIFMGPhotos/"
        "790x444_skerry_gallery_02.jpg]]></CI:imagePath>",
        [
            "http://sp10.conservation.org/CIFMGPhotos/"
            "790x444_skerry_gallery_02.jpg"
        ],
    ),
    # entity-escaped URI is unescaped before the likely-URI check
    (
        '<url href="http://x.example/a?b=1&amp;c=2"/>',
        ["http://x.example/a?b=1&c=2"],
    ),
    # non-URI-shaped strings (mimetypes, decimals, emails) are filtered
    ('<t a="text/xml"/><v>1.25</v><m>"x@y.com"</m>', []),
]


@pytest.mark.parametrize("body,expected", XML_GOLDEN)
def test_extract_xml_golden(body, expected):
    assert [u for u, _, _ in EX._extract_xml_one(body)] == expected


def test_extract_xml_hop_is_speculative():
    out = EX._extract_xml_one("<link>http://conservation.org</link>")
    assert out == [("http://conservation.org", "xml", "X")]


def test_looks_like_xml_sniff():
    assert EX.looks_like_xml("", content_type="application/rss+xml")
    assert not EX.looks_like_xml("", content_type="application/vnd.openxmlformats-officedocument.wordprocessingml.document")
    assert EX.looks_like_xml("", uri="http://x/feed.rss")
    assert EX.looks_like_xml('<?xml version="1.0"?><a/>')
    assert not EX.looks_like_xml('<?xml version="1.0"?><!DOCTYPE html><html>')
    assert not EX.looks_like_xml("plain text")


# -- ExtractorURI ---------------------------------------------------------
def test_extract_uri_query_whole_and_params():
    # whole decoded query is an http URI
    out = EX._extract_uri_one("http://a.example/r?http://b.example/x")
    assert ("http://b.example/x", "uri/query", "X") in out
    # param values are %-decoded then checked
    out = EX._extract_uri_one(
        "http://a.example/r?u=http%3A%2F%2Fc.example%2Fy&v=plain"
    )
    assert [u for u, _, _ in out] == ["http://c.example/y"]
    # no query -> nothing
    assert EX._extract_uri_one("http://a.example/r") == []


# -- ExtractorImpliedURI --------------------------------------------------
def test_implied_uri_column(spark):
    df = spark.createDataFrame(
        [("http://example.com/page/video123.swf",), ("http://example.com/other",)],
        ["url"],
    )
    col = EX.implied_uri_col(
        F.col("url"), r"http://example\.com/page/video(\d+)\.swf",
        r"http://example.com/video/$1.html",
    )
    got = [r[0] for r in df.select(col).collect()]
    assert got == ["http://example.com/video/123.html", None]


def test_extract_implied_uris_remove_trigger(spark):
    ol = spark.createDataFrame(
        [
            ("d", "http://example.com/page/video9.swf", "a/@href", "L", 0),
            ("d", "http://example.com/keep", "a/@href", "L", 1),
        ],
        ["doc_id", "url", "context", "hop", "outlink_index"],
    )
    out = EX.extract_implied_uris(
        ol,
        r"http://example\.com/page/video(\d+)\.swf",
        r"http://example.com/video/$1.html",
        remove_trigger_uris=True,
    )
    rows = {(r.url, r.hop) for r in out.collect()}
    assert rows == {
        ("http://example.com/keep", "L"),
        ("http://example.com/video/9.html", "I"),
    }


# -- ExtractorMultipleRegex ----------------------------------------------
def test_multiple_regex_combinations():
    # 1 uri match x 2 content-a matches x 2 content-b matches = 4 outlinks,
    # combination order: index i -> a[i%2], b[i//2] (base-mixed-radix law)
    out = EX._extract_multiple_regex_one(
        "http://s.example/show?id=77",
        "A=x A=y B=1 B=2",
        r"http://s\.example/show\?id=(\d+)",
        [("a", r"A=(\w)"), ("b", r"B=(\d)")],
        "http://t.example/${uriRegex[1]}/${a[1]}/${b[1]}",
    )
    assert [u for u, _, _ in out] == [
        "http://t.example/77/x/1",
        "http://t.example/77/y/1",
        "http://t.example/77/x/2",
        "http://t.example/77/y/2",
    ]
    # uri not matching -> nothing
    assert (
        EX._extract_multiple_regex_one(
            "http://other/", "A=x", r"http://s\.example/.*", [("a", "A=(\\w)")], "t"
        )
        == []
    )
    # a content regex with zero matches -> nothing
    assert (
        EX._extract_multiple_regex_one(
            "http://s.example/",
            "nothing here",
            r"http://s\.example/",
            [("a", r"A=(\w)")],
            "t",
        )
        == []
    )


def test_multiple_regex_spark(spark):
    docs = spark.createDataFrame(
        [("http://s.example/show?id=5", "A=q"), ("http://other/", "A=q")],
        ["doc_id", "text"],
    )
    out = EX.extract_multiple_regex(
        docs,
        r"http://s\.example/show\?id=(\d+)",
        {"a": r"A=(\w)"},
        "http://t.example/${uriRegex[1]}/${a[1]}",
    )
    rows = [(r.doc_id, r.url, r.hop) for r in out.collect()]
    assert rows == [("http://s.example/show?id=5", "http://t.example/5/q", "I")]


# -- ExtractorUniversal ---------------------------------------------------
def test_extract_universal():
    out = EX._extract_universal_one(
        "plain text see www.example.com here and junkhttp://foo.org/path end "
        "also http://10.1.2.3 but not example.xyz nor a.b"
    )
    urls = [u for u, _, _ in out]
    assert "www.example.com" in urls
    # garbage before the protocol is stripped (indexOf('http') > 0 law)
    assert "http://foo.org/path" in urls
    # dotted-quad with scheme passes the IP branch
    assert "http://10.1.2.3" in urls
    # unknown TLD and too-short runs are rejected
    assert not any("xyz" in u for u in urls)
    assert "a.b" not in urls
    # trailing sentence dots are not part of a TLD suffix
    out2 = EX._extract_universal_one("end of sentence www.example.com. next")
    assert out2 == []  # the run includes the trailing dot -> TLD check fails
    assert all(h == "X" for _, _, h in out)


# -- engine-wired text-extractor chain ------------------------------------
def test_text_extractor_chain_crawl_parity(spark, tmp_path):
    """CrawlConfig.text_extractors wires the tail into the fetch chain:
    an XML page's CDATA link and a universal-scan link are discovered,
    scheduled after the span links (outlink_index continues from the span
    count) — exact engine-vs-simulator parity."""
    from heritrix3_spark import fixtures as FX
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    # host under a REAL TLD: ExtractorUniversal only accepts its TLD list,
    # and the implied seed prefix is authority-exact (round-1 scope law)
    web = {
        "http://h9.example.com/p0": [
            ("text", "front read h9.example.com/found here", None, 0),
            ("link", "feed", "http://h9.example.com/feed.xml", 1),
        ],
        "http://h9.example.com/feed.xml": [
            (
                "text",
                '<?xml version="1.0"?><rss><link>'
                "http://h9.example.com/from-xml</link></rss>",
                None,
                0,
            ),
        ],
        "http://h9.example.com/from-xml": [("text", "leaf a", None, 0)],
        "http://h9.example.com/found": [("text", "leaf b", None, 0)],
    }
    seeds = ["http://h9.example.com/p0"]
    cfg_kw = dict(text_extractors=("xml", "universal"))
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**cfg_kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "txchain"),
        spark.createDataFrame([(u, s) for u, s in web.items()], FX.DOCUMENTS_SCHEMA),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=30)
    srows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l["fetch_status"], l["disposition"])
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.canonical, r.ordinal, r.fetch_status, r.disposition)
        for r in eng_log.collect()
    )
    assert erows == srows
    fetched = {r[1] for r in erows if r[4] == "success" and r[3] == 200}
    assert "http://h9.example.com/from-xml" in fetched   # via ExtractorXML
    assert "http://h9.example.com/found" in fetched      # via ExtractorUniversal
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


def test_trap_suppress_crawl_parity(spark, tmp_path):
    """CrawlConfig.trap_suppress: a child whose payload is identical to its
    via's archived payload logs trapSuppressExtractor and contributes no
    outlinks — exact parity including annotations."""
    from heritrix3_spark import fixtures as FX
    from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
    from heritrix3_spark.simulator import SimConfig, simulate

    same = [("text", "trap body", None, 0), ("link", "l", "/p1", 1)]
    web = {
        "http://h0.example/p0": list(same),
        # p1 is byte-identical to its via p0 -> trap; its link to /p2 must
        # NOT be followed
        "http://h0.example/p1": list(same),
        "http://h0.example/p2": [("text", "leaf", None, 0)],
    }
    # make p1's (suppressed) outlink point somewhere discoverable
    web["http://h0.example/p1"] = [
        ("text", "trap body", None, 0),
        ("link", "l", "/p1", 1),
    ]
    seeds = ["http://h0.example/p0"]
    cfg_kw = dict(trap_suppress=True)
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**cfg_kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / "trap"),
        spark.createDataFrame([(u, s) for u, s in web.items()], FX.DOCUMENTS_SCHEMA),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **cfg_kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=20)
    srows = sorted(
        (l["round"], l["canonical"], l["ordinal"], l["disposition"], l.get("annotation"))
        for l in sim_log
    )
    erows = sorted(
        (r.round, r.canonical, r.ordinal, r.disposition, r.annotation)
        for r in eng_log.collect()
    )
    assert erows == srows
    traps = [r for r in erows if r[4] == "trapSuppressExtractor"]
    assert [r[1] for r in traps] == ["http://h0.example/p1"]
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen


# -- binary trio: PDF / SWF / DOC -----------------------------------------
def test_extract_pdf_uri_actions():
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Action /S /URI "
        b"/URI (http://x.example/a\\(1\\)) >>\nendobj\n"
        b"2 0 obj\n<< /S /URI /URI (https://y.example/b) >>\nendobj\n"
    )
    got = EX._extract_pdf_one(pdf)
    assert [u for u, _, _ in got] == [
        "http://x.example/a(1)",  # PDF string escapes unescaped
        "https://y.example/b",
    ]
    assert EX._extract_pdf_one(b"not a pdf /URI (http://z)") == []


def test_extract_swf_fws_and_cws():
    import zlib

    body = b"\x01\x02http://x.example/movie.html\x00\x03tail"
    fws = b"FWS\x06" + (len(body) + 8).to_bytes(4, "little") + body
    assert [u for u, _, _ in EX._extract_swf_one(fws)] == [
        "http://x.example/movie.html"
    ]
    cws = b"CWS\x06" + (len(body) + 8).to_bytes(4, "little") + zlib.compress(body)
    assert [u for u, _, _ in EX._extract_swf_one(cws)] == [
        "http://x.example/movie.html"
    ]
    assert EX._extract_swf_one(b"GIF89a....") == []


def test_extract_doc_hyperlinks():
    # the reference's own law: HYPERLINK.*?"(.*?)" over the document text
    # (ExtractorDOC.java:48), text recovered from the UTF-16LE stream
    text = 'some text HYPERLINK "http://x.example/d" more'
    got = EX._extract_doc_one(text.encode("utf-16-le"))
    assert [u for u, _, _ in got] == ["http://x.example/d"]
    got2 = EX._extract_doc_one(text.encode("latin-1"))
    assert [u for u, _, _ in got2] == ["http://x.example/d"]
    assert EX._extract_doc_one(b"plain words, no links") == []


def test_binary_udfs_spark(spark):
    import zlib

    from pyspark.sql import functions as F

    body = b"http://s.example/x\x00"
    rows = [
        (bytearray(b"%PDF-1.4 << /URI (http://p.example/1) >>"),),
        (bytearray(b"CWS\x06\x00\x00\x00\x00" + zlib.compress(body)),),
        (bytearray('HYPERLINK "http://d.example/2"'.encode("utf-16-le")),),
    ]
    df = spark.createDataFrame(rows, "content binary")
    pdf = df.select(F.explode(EX.extract_pdf_udf("content")).alias("l")).collect()
    swf = df.select(F.explode(EX.extract_swf_udf("content")).alias("l")).collect()
    doc = df.select(F.explode(EX.extract_doc_udf("content")).alias("l")).collect()
    assert {r.l.url for r in pdf} == {"http://p.example/1"}
    assert {r.l.url for r in swf} == {"http://s.example/x"}
    assert {r.l.url for r in doc} == {"http://d.example/2"}


# -- TrapSuppressExtractor ------------------------------------------------
def test_trap_suppress_mask(spark):
    pages = spark.createDataFrame(
        [
            ("http://h/child1", "http://h/parent", "DIGA"),
            ("http://h/child2", "http://h/parent", "DIGB"),
            ("http://h/seed", None, "DIGC"),
        ],
        ["page", "via", "__digest"],
    )
    parents = spark.createDataFrame(
        [("http://h/parent", "DIGA")], ["doc_id", "content_digest"]
    )
    got = {
        r["page"]: r["__trap_suppressed"]
        for r in EX.trap_suppress_mask(pages, parents).collect()
    }
    # child1's content is identical to its via -> suppressed; others not
    assert got == {
        "http://h/child1": True,
        "http://h/child2": False,
        "http://h/seed": False,
    }


# -- round-4 fidelity tail: PDF FlateDecode / SWF tag walk / Aggressive ----
def _swf_tag(code, payload):
    if len(payload) >= 0x3F:
        return (
            ((code << 6) | 0x3F).to_bytes(2, "little")
            + len(payload).to_bytes(4, "little")
            + payload
        )
    return ((code << 6) | len(payload)).to_bytes(2, "little") + payload


def _swf_file(tags, compress=False):
    import zlib

    body = b"\x00" + b"\x00\x10\x01\x00" + tags + _swf_tag(0, b"")  # RECT(nbits=0)+rate+frames
    if compress:
        return b"CWS\x06" + (len(body) + 8).to_bytes(4, "little") + zlib.compress(body)
    return b"FWS\x06" + (len(body) + 8).to_bytes(4, "little") + body


def _action(code, payload=b""):
    if code >= 0x80:
        return bytes([code]) + len(payload).to_bytes(2, "little") + payload
    return bytes([code])


def test_pdf_flatedecode_streams():
    """/URI actions inside FlateDecode'd object streams are found
    (PDFParser object-stream handling); raw actions still work and a
    non-Flate stream is skipped, not fatal."""
    import zlib

    inner = b"<< /S /URI /URI (http://deep.example/in-stream) >>"
    pdf = (
        b"%PDF-1.5\n1 0 obj\n<< /S /URI /URI (http://raw.example/top) >>\nendobj\n"
        b"2 0 obj\n<< /Filter /FlateDecode >>\nstream\n"
        + zlib.compress(inner)
        + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< >>\nstream\nnot-compressed-bytes\nendstream\nendobj\n"
    )
    got = [u for u, _, _ in EX._extract_pdf_one(pdf)]
    assert got == ["http://raw.example/top", "http://deep.example/in-stream"]


def test_swf_tag_walk_visitor_laws():
    """DoAction GetURL -> 'E'; ActionPush strings + ConstantPool ->
    speculative 'X' via isVeryLikelyUri; javascript: GetURL goes through
    the JS string scan; DoInitAction and DefineSprite nesting covered."""
    acts = (
        _action(0x83, b"http://a.example/clicked\x00_top\x00")
        + _action(
            0x96,
            b"\x00http://b.example/pushed\x00" + b"\x07\x01\x00\x00\x00"  # string + int
            + b"\x00not a url\x00",
        )
        # pool strings run through the EXACT isVeryLikelyUri: a clean
        # relative path is speculative; a DOTTED path segment
        # ("/c.example/...") fails LIKELY_RELATIVE_URI_PATTERN and is NOT
        # emitted (UriUtils.java:404-431)
        + _action(
            0x88, b"\x03\x00/cpool/pool.html\x00/c.example/pool.html\x00plainword\x00"
        )
        + _action(0x00)
    )
    js = _action(
        0x83, b"javascript:window.open('http://d.example/js.html')\x00\x00"
    )
    sprite_acts = _action(0x83, b"http://e.example/sprite\x00\x00") + _action(0)
    tags = (
        _swf_tag(12, acts)
        + _swf_tag(59, b"\x01\x00" + js + _action(0))
        + _swf_tag(39, b"\x01\x00\x01\x00" + _swf_tag(12, sprite_acts))
        # an image-ish tag whose payload contains URL bytes: the flat scan
        # would emit it, the tag walk must NOT (CustomSWFTags routes only
        # action-bearing tags to the URL visitor)
        + _swf_tag(20, b"junk http://noise.example/in-image-bytes\x00 junk")
    )
    for compress in (False, True):
        got = EX._extract_swf_one(_swf_file(tags, compress=compress))
        urls = [u for u, _, _ in got]
        assert urls == [
            "http://a.example/clicked",
            "http://b.example/pushed",
            "/cpool/pool.html",
            "http://d.example/js.html",
            "http://e.example/sprite",
        ]
        hops = {u: h for u, _, h in got}
        assert hops["http://a.example/clicked"] == "E"
        assert hops["http://b.example/pushed"] == "X"
        assert hops["http://d.example/js.html"] == "X"
    # the flat regex WOULD have surfaced the image-payload noise — the tag
    # walk is strictly more faithful here
    import re as _re

    flat = EX._RE_SWF_URL.findall(
        b"junk http://noise.example/in-image-bytes\x00 junk"
    )
    assert flat  # regex finds it; walk (above) does not


def test_swf_malformed_falls_back_to_flat_scan():
    """A body that is not a coherent tag stream keeps the salvage byte
    scan (backward-compatible with truncated/nonstandard files)."""
    body = b"\x01\x02http://x.example/movie.html\x00\x03tail"
    fws = b"FWS\x06" + (len(body) + 8).to_bytes(4, "little") + body
    assert [u for u, _, _ in EX._extract_swf_one(fws)] == [
        "http://x.example/movie.html"
    ]


def test_aggressive_extractor_html():
    """AggressiveExtractorHTML.processScript (:43-50): script bodies are
    re-scanned as HTML tag innards AFTER the normal JS string scan — an
    href= inside javascript code becomes a real 'L' outlink only in
    aggressive mode."""
    html = (
        '<a href="/normal.html">x</a>'
        "<script>document.write('<iframe src=http://gen.example/built.html >');"
        ' var t = "plain/path.html";</script>'
    )
    base = "http://h.example/p"
    normal = EX._extract_html_one(base, html)
    aggro = EX._extract_html_one(base, html, aggressive=True)
    n_urls = [u for u, _, _ in normal]
    a_urls = [u for u, _, _ in aggro]
    # the JS string scan finds the quoted likely-URI in both modes (the
    # generated markup string itself has <> and spaces -> not URI-likely)
    assert "http://h.example/plain/path.html" in n_urls
    assert "http://h.example/plain/path.html" in a_urls
    # only aggressive mode parses the generated src= out of the script body
    assert "http://gen.example/built.html" not in n_urls
    assert "http://gen.example/built.html" in a_urls
    # and the aggressive re-scan emits it with the SRC-family embed hop
    assert ("http://gen.example/built.html", "script/@src", "E") in aggro
