"""Content-type model: mime law golden vectors, Column/scalar twins, and
mixed-type crawl parity for the ExtractorHTML mime gate.

Reference laws: CrawlURI.setContentType (modules/.../CrawlURI.java:531-545),
MimetypeUtils.truncate feeding StatisticsTracker's mime distribution
(StatisticsTracker.java:746-757), ExtractorHTML.shouldExtract
(ExtractorHTML.java:763-790), FetchDNS "text/dns" (FetchDNS.java:217).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heritrix3_spark import fixtures as FX
from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.functions import mime as MIME
from heritrix3_spark.simulator import SimConfig, simulate

H, P = 2, 3


# ---------------------------------------------------------------------------
# law golden vectors (scalar side)
# ---------------------------------------------------------------------------
def test_mime_truncate_law():
    # MimetypeUtils.truncate: leading token up to whitespace/';'/',',
    # lowercased; NULL/empty -> "no-type"
    assert MIME.mime_truncate("text/html; charset=UTF-8") == "text/html"
    assert MIME.mime_truncate("Text/HTML") == "text/html"
    assert MIME.mime_truncate("application/pdf,stuff") == "application/pdf"
    assert MIME.mime_truncate("image/png junk") == "image/png"
    assert MIME.mime_truncate(None) == "no-type"
    assert MIME.mime_truncate("") == "no-type"
    assert MIME.mime_truncate(" ; x") == "no-type"


def test_ext_mime_law():
    assert MIME.ext_mime("http://h.example/a/b.pdf") == "application/pdf"
    assert MIME.ext_mime("http://h.example/x.PNG?q=1") == "image/png"
    assert MIME.ext_mime("http://h.example/x.html#frag") == "text/html"
    assert MIME.ext_mime("http://h.example/plain") is None
    assert MIME.ext_mime("http://h.example/odd.zzz9") is None
    # extension lives in the path only, never the query
    assert MIME.ext_mime("http://h.example/dl?file=a.pdf") is None


def test_content_type_law():
    assert MIME.content_type("dns:h.example", False, True) == "text/dns"
    assert MIME.content_type("http://h.example/p0", True, False) == "text/html"
    assert (
        MIME.content_type("http://h.example/robots.txt", True, False)
        == "text/plain"
    )
    assert (
        MIME.content_type("http://h.example/d.pdf", True, False)
        == "application/pdf"
    )
    # explicit server header analog wins over the extension law
    assert (
        MIME.content_type("http://h.example/d.pdf", True, False, "text/html")
        == "text/html"
    )
    # no payload (404 / connect failure / forced status) -> None
    assert MIME.content_type("http://h.example/p0", False, False) is None


def test_html_extract_gate_law():
    assert MIME.html_extract_gate("text/html; charset=utf-8")
    assert MIME.html_extract_gate("application/xhtml+xml")
    assert MIME.html_extract_gate(None)  # content-sniff fallback analog
    assert not MIME.html_extract_gate("application/pdf")
    assert not MIME.html_extract_gate("image/png")
    assert not MIME.html_extract_gate("text/css")


def test_column_scalar_twins(spark):
    """The Column expressions and the scalar twins agree on a vector batch
    covering every branch (dns / robots / extension / override / no-payload)."""
    rows = [
        ("dns:h.example", False, True, None),
        ("http://h.example/p0", True, False, None),
        ("http://h.example/robots.txt", True, False, None),
        ("http://h.example/a.pdf", True, False, None),
        ("http://h.example/a.pdf", True, False, "text/html; charset=x"),
        ("http://h.example/a.css", True, False, None),
        ("http://h.example/i.jpeg?x=1", True, False, None),
        ("http://h.example/none", False, False, None),
        ("http://h.example/x.swf", True, False, None),
    ]
    df = spark.createDataFrame(
        rows, "canonical string, has_payload boolean, is_dns boolean, web_ct string"
    )
    out = df.select(
        "canonical",
        "has_payload",
        "is_dns",
        "web_ct",
        MIME.content_type_col(
            F.col("canonical"), F.col("has_payload"), F.col("is_dns"),
            web_ct=F.col("web_ct"),
        ).alias("ct"),
    ).collect()
    for r in out:
        expect = MIME.content_type(r.canonical, r.has_payload, r.is_dns, r.web_ct)
        assert r.ct == expect, r.canonical
        tr = df.sparkSession.range(1).select(
            MIME.mime_truncate_col(F.lit(r.ct)).alias("t"),
            MIME.html_extract_gate_col(F.lit(r.ct)).alias("g"),
        ).collect()[0]
        assert tr.t == MIME.mime_truncate(r.ct)
        assert tr.g == MIME.html_extract_gate(r.ct)


# ---------------------------------------------------------------------------
# crawl parity on the mixed-type web
# ---------------------------------------------------------------------------
def _sim_rows(log):
    return sorted(
        (
            l["round"], l["class_key"], l["canonical"], l["ordinal"],
            l["fetch_status"], l["disposition"], l["content_type"],
            l["content_length"],
        )
        for l in log
    )


def _eng_rows(log_df):
    return sorted(
        (
            r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
            r.disposition, r.content_type, r.content_length,
        )
        for r in log_df.collect()
    )


#: explicit Content-Type overrides: an html-extension URL declared pdf (gets
#: gated despite extension) and a pdf-extension URL declared html (gets
#: extracted despite extension) — the header-wins law
CT_OVERRIDES = {
    "http://h0.example/p1": "application/pdf",
    "http://h1.example/doc0.pdf": "text/html; charset=utf-8",
}


@pytest.fixture(scope="module", params=["derived", "declared"])
def mixed_crawl(request, spark, tmp_path_factory):
    """Gate-on crawl of the mixed-type web, extension-derived types or with
    explicit content_type overrides (the server-header analog column)."""
    declared = request.param == "declared"
    ct = CT_OVERRIDES if declared else None
    web = {u: s for u, s in FX.mixed_type_web_rows(H, P)}
    seeds = FX.seed_lines(H)
    sim_log, sim_seen = simulate(
        web, seeds, SimConfig(mime_extract_gate=True), web_ct=ct
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp(f"mixed_{request.param}")),
        FX.mixed_type_web_df(spark, H, P, content_types=ct),
        CrawlConfig(
            num_buckets=4, ordinal_partitions=1, bloom=False,
            mime_extract_gate=True,
        ),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    return dict(sim_log=sim_log, eng=eng, eng_log=eng_log, declared=declared)


def test_mime_gate_crawl_parity(mixed_crawl):
    """Exact parity incl. the content_type/content_length columns."""
    assert _eng_rows(mixed_crawl["eng_log"]) == _sim_rows(mixed_crawl["sim_log"])


def test_mime_gate_suppresses_leaks(mixed_crawl):
    """Non-html payloads never contribute content outlinks, while the pdf's
    location (header) span IS followed; explicit Content-Type overrides the
    extension law in both directions."""
    crawled = {l["canonical"] for l in mixed_crawl["sim_log"]}
    assert any("/pdf-moved" in c for c in crawled)
    leaks = {c for c in crawled if "leak" in c}
    if mixed_crawl["declared"]:
        # h1/doc0.pdf declared text/html: its link span IS followed — the
        # one and only leak; h0/p1 declared application/pdf: its next-link
        # target /p2 (reachable only through p1) must NOT be crawled
        assert leaks == {"http://h1.example/pdf-leak0"}
        assert "http://h0.example/p2" not in crawled
    else:
        assert leaks == set()


def test_gate_off_follows_leaks(spark, tmp_path):
    """Sanity: without the gate the same web leaks — the fixture really
    differentiates, and gate-off parity holds too."""
    web = {u: s for u, s in FX.mixed_type_web_rows(1, 2)}
    seeds = FX.seed_lines(1)
    sim_log, _ = simulate(web, seeds, SimConfig())
    eng = CrawlEngine(
        spark,
        str(tmp_path / "off"),
        FX.mixed_type_web_df(spark, 1, 2),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False),
    )
    eng.bootstrap(seeds)
    eng_log = eng.run(max_rounds=40)
    assert _eng_rows(eng_log) == _sim_rows(sim_log)
    crawled = {l["canonical"] for l in sim_log}
    assert any("pdf-leak" in c for c in crawled)


def test_engine_mimetypes_report(mixed_crawl):
    """reports()['mimetypes'] now tallies the REAL content_type column
    (StatisticsTracker.java:746-757), not a text/html placeholder."""
    rep = {
        r.mime_type: (r.n_urls, r.n_bytes)
        for r in mixed_crawl["eng"].reports()["mimetypes"].collect()
    }
    from collections import defaultdict

    expect = defaultdict(lambda: [0, 0])
    for l in mixed_crawl["sim_log"]:
        if l["disposition"] != "success":
            continue
        k = MIME.mime_truncate(l["content_type"])
        expect[k][0] += 1
        expect[k][1] += l["content_length"] or 0
    assert rep == {k: (n, b) for k, (n, b) in expect.items()}
    # the fixture exercises multiple real types
    assert "application/pdf" in rep and "text/css" in rep and "image/png" in rep
