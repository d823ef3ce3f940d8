"""FetchFTP directory-listing extraction laws (operators/ftp.py) +
engine-vs-simulator crawl parity over a synthetic ftp:// tree.

Reference: modules/src/main/java/org/archive/modules/fetcher/FetchFTP.java
(DIR pattern :74-75, extract :542-551, addExtracted :560-580, addParent
:597-619, content types :453-457, extract.from.dirs / extract.parent
options :107-139).
"""

from __future__ import annotations

from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.operators import ftp as FTP
from heritrix3_spark.simulator import SimConfig, simulate

# ---------------------------------------------------------------------------
# unit laws
# ---------------------------------------------------------------------------


def test_java_urlencode():
    """java.net.URLEncoder.encode(·, UTF-8): space → '+', [a-zA-Z0-9.-*_]
    kept, '~' IS encoded (unlike RFC 3986), UTF-8 %XX elsewhere."""
    assert FTP.java_urlencode("abc09.-*_") == "abc09.-*_"
    assert FTP.java_urlencode("a b") == "a+b"
    assert FTP.java_urlencode("~") == "%7E"
    assert FTP.java_urlencode("/") == "%2F"
    assert FTP.java_urlencode("é") == "%C3%A9"
    assert FTP.java_urlencode("crazy🐒") == "crazy%F0%9F%90%92"


def test_listing_files_line_terminators():
    """DIR = (.+)$ MULTILINE: one filename per non-empty line, CR/LF/CRLF
    all terminate (Java '.' excludes every line terminator)."""
    assert FTP.listing_files("a\nb\r\nc\rd\n\n") == ["a", "b", "c", "d"]
    assert FTP.listing_files("") == []


def test_child_url_trailing_slash():
    """addExtracted strips ONE trailing slash from the base (:570-573)."""
    assert (
        FTP.child_url("ftp://h.example/pub/", "readme.txt")
        == "ftp://h.example/pub/readme.txt"
    )
    assert (
        FTP.child_url("ftp://h.example/pub", "a b")
        == "ftp://h.example/pub/a+b"
    )


def test_parent_url_law():
    """addParent: path minus last segment; root-level files parent at '/';
    '/' itself has no parent (FetchFTP javadoc: parent of
    ftp://foo.com/one/two is ftp://foo.com/one)."""
    assert FTP.parent_url("ftp://foo.com/one/two") == "ftp://foo.com/one"
    assert FTP.parent_url("ftp://foo.com/one/") == "ftp://foo.com/one"
    assert FTP.parent_url("ftp://foo.com/file") == "ftp://foo.com/"
    assert FTP.parent_url("ftp://foo.com/") is None
    assert FTP.parent_url("ftp://foo.com") is None


def test_ftp_extract_order_and_options():
    """Emit order: listing children (listing order), then the parent
    (extract() :470-471 before addParent :478); each option gates its
    half."""
    got = FTP.ftp_extract("ftp://h/pub/", "b.txt\na.txt")
    assert got == ["ftp://h/pub/b.txt", "ftp://h/pub/a.txt", "ftp://h/pub"]
    assert FTP.ftp_extract("ftp://h/pub/", "x", extract_from_dirs=False) == [
        "ftp://h/pub"
    ]
    assert FTP.ftp_extract("ftp://h/pub/", "x", extract_parent=False) == [
        "ftp://h/pub/x"
    ]
    # file fetch (no listing): parent only
    assert FTP.ftp_extract("ftp://h/pub/f.bin", None) == ["ftp://h/pub"]


# ---------------------------------------------------------------------------
# crawl parity
# ---------------------------------------------------------------------------

WEB = {
    # root directory listing
    "ftp://h.example/": [("listing", "pub\nwelcome.msg", None, 0)],
    # /pub resolves as a directory too (the NLST name has no slash; the
    # crawl reaches it as ftp://h.example/pub)
    "ftp://h.example/pub": [
        ("listing", "readme.txt\r\nsub dir name\nmissing.bin", None, 0)
    ],
    "ftp://h.example/pub/readme.txt": [("text", "hello", None, 0)],
    # the space-named entry form-encodes to +
    "ftp://h.example/pub/sub+dir+name": [("listing", "deep.txt", None, 0)],
    "ftp://h.example/pub/sub+dir+name/deep.txt": [("text", "d", None, 0)],
    "ftp://h.example/welcome.msg": [("text", "hi", None, 0)],
    # "missing.bin" has no web entry -> 404-analog; its parent is still
    # discovered (addParent runs even for failed RETRs)
}


def _rows(sim_log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"], l["content_type"])
        for l in sim_log
    )


def _erows(eng_log):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition, r.content_type)
        for r in eng_log.collect()
    )


def _run_pair(spark, tmp_path, name, web, seeds, kw):
    sim_log, sim_seen = simulate(web, seeds, SimConfig(**kw))
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        spark.createDataFrame(
            list(web.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    return sim_log, sim_seen, eng, eng_log


def test_ftp_crawl_parity(spark, tmp_path):
    """Full ftp tree crawl: listing children + parent links + content
    types, engine == simulator row-exactly."""
    kw = dict(ftp="on", k_per_host=3)
    sim_log, sim_seen, eng, eng_log = _run_pair(
        spark, tmp_path, "ftp", WEB, ["ftp://h.example/pub"], kw
    )
    assert _erows(eng_log) == _rows(sim_log)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {r.canonical: r for r in eng_log.collect()}
    # directory -> text/plain; file -> application/octet-stream
    assert by["ftp://h.example/pub"].content_type == "text/plain"
    assert (
        by["ftp://h.example/pub/readme.txt"].content_type
        == "application/octet-stream"
    )
    # space-named listing entry was form-encoded and crawled
    assert by["ftp://h.example/pub/sub+dir+name/deep.txt"].fetch_status == 200
    # the missing child 404s; addParent still walked UP from /pub to /
    assert by["ftp://h.example/pub/missing.bin"].fetch_status == 404
    assert by["ftp://h.example/"].fetch_status == 200
    assert by["ftp://h.example/welcome.msg"].fetch_status == 200


def test_ftp_options_parity(spark, tmp_path):
    """extract.from.dirs=false keeps only parent walking;
    extract.parent=false keeps only listing descent."""
    kw = dict(ftp="on", ftp_extract_from_dirs=False, k_per_host=3)
    sim_log, _seen, _eng, eng_log = _run_pair(
        spark, tmp_path, "nodirs", WEB, ["ftp://h.example/pub"], kw
    )
    assert _erows(eng_log) == _rows(sim_log)
    crawled = {r.canonical for r in eng_log.collect()}
    assert "ftp://h.example/pub/readme.txt" not in crawled  # no descent
    assert "ftp://h.example/" in crawled  # parent walk intact

    kw = dict(ftp="on", ftp_extract_parent=False, k_per_host=3)
    sim_log, _seen, _eng, eng_log = _run_pair(
        spark, tmp_path, "noparent", WEB, ["ftp://h.example/pub"], kw
    )
    assert _erows(eng_log) == _rows(sim_log)
    crawled = {r.canonical for r in eng_log.collect()}
    assert "ftp://h.example/pub/readme.txt" in crawled  # descent intact
    assert "ftp://h.example/" not in crawled  # no parent walk
