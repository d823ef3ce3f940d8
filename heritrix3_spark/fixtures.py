"""Deterministic synthetic web + fixture tables (FIXTURES.md).

The web is the driver-facing input shape from BASELINE.json ``input_hint``:
an (Iceberg-contract) table of interleaved text+media documents

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

standing in for Heritrix's fetched-WARC record chain
(/root/reference/modules/src/main/java/org/archive/modules/writer/
 WARCWriterChainProcessor.java:59-160) flattened to document-order spans.

Synthesis rule (FIXTURES.md §1, seed-free / fully deterministic):
host ``h{i}.example`` for i in 0..H-1, pages ``/p{j}`` for j in 0..P-1;
page (i, j) contains text spans interleaved with same-host links to
``/p{(j*2+1)%P}`` and ``/p{(j*2+2)%P}``, one cross-host link to
``h{(i+1)%H}.example/p0``, and one ``img`` media span ``/img{j}.gif``.
Optionally one *hot host* with ``hot_factor×P`` pages to exercise salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

SMOKE = dict(hosts=3, pages=8)
CORRECTNESS = dict(hosts=20, pages=50)
BENCH = dict(hosts=200, pages=500, hot_factor=100)


def page_url(host_idx: int, page_idx: int) -> str:
    return f"http://h{host_idx}.example/p{page_idx}"


def page_spans(host_idx: int, page_idx: int, pages: int, hosts: int) -> list[tuple]:
    """Document-order spans of page (i, j): (kind, text, media_ref, offset)."""
    i, j, p = host_idx, page_idx, pages
    return [
        ("text", f"Welcome to host {i} page {j}.", None, 0),
        ("link", f"next-a-{j}", f"/p{(j * 2 + 1) % p}", 1),
        ("text", "Some interleaved body text, ", None, 2),
        ("link", f"next-b-{j}", f"/p{(j * 2 + 2) % p}", 3),
        ("text", "and a neighborly pointer: ", None, 4),
        ("link", f"cross-{i}", f"http://h{(i + 1) % hosts}.example/p0", 5),
        ("img", None, f"/img{j}.gif", 6),
        ("text", "That's all.", None, 7),
    ]


def robots_body(host_idx: int) -> str | None:
    """Deterministic per-host robots.txt (None = no robots.txt -> 404 ->
    NO_ROBOTS allow-all per CrawlServer.updateRobots).

    Coverage: wildcard disallow (precluded pages), crawl-delay raising the
    politeness floor, and the no-robots host.
    """
    k = host_idx % 3
    if k == 0:
        return None
    if k == 1:
        return "User-agent: *\nDisallow: /p1\n"
    return "User-agent: *\nDisallow: /p2\nCrawl-delay: 4.5\n"


def synth_web_rows(
    hosts: int,
    pages: int,
    hot_host: int | None = None,
    hot_factor: int = 1,
    robots: bool = False,
) -> list[tuple]:
    """[(doc_id, spans)] for the whole synthetic web (document order)."""
    rows = []
    for i in range(hosts):
        npages = pages * hot_factor if (hot_host is not None and i == hot_host) else pages
        if robots:
            body = robots_body(i)
            if body is not None:
                rows.append(
                    (f"http://h{i}.example/robots.txt", [("text", body, None, 0)])
                )
        for j in range(npages):
            rows.append((page_url(i, j), page_spans(i, j, npages, hosts)))
    return rows


def synth_web_df(
    spark: SparkSession,
    hosts: int,
    pages: int,
    hot_host: int | None = None,
    hot_factor: int = 1,
    num_partitions: int | None = None,
    robots: bool = False,
) -> DataFrame:
    rows = synth_web_rows(hosts, pages, hot_host, hot_factor, robots)
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


MIXED_CT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
        StructField("content_type", StringType(), True),
    ]
)


def mixed_type_web_rows(hosts: int, pages: int) -> list[tuple]:
    """Mixed-content-type web for the ExtractorHTML mime-gate fixtures:
    each html page links to typed resources (.pdf/.css/.png) that THEMSELVES
    carry outlink spans. With ``mime_extract_gate`` on, only the pdf's
    ``location`` (redirect-header analog) span is followed; the "leak"
    links from non-html payloads are suppressed (ExtractorHTML.java:763-790)."""
    rows = []
    for i in range(hosts):
        for j in range(pages):
            rows.append(
                (
                    page_url(i, j),
                    [
                        ("text", f"host {i} page {j}", None, 0),
                        ("link", f"next-{j}", f"/p{(j + 1) % pages}", 1),
                        ("link", f"doc-{j}", f"/doc{j}.pdf", 2),
                        ("link", f"style-{j}", f"/style{j}.css", 3),
                        ("img", None, f"/img{j}.png", 4),
                    ],
                )
            )
            rows.append(
                (
                    f"http://h{i}.example/doc{j}.pdf",
                    [
                        ("text", "%PDF-1.4 1 0 obj", None, 0),
                        ("link", "leak", f"/pdf-leak{j}", 1),
                        ("location", None, f"/pdf-moved{j}", 2),
                    ],
                )
            )
            rows.append(
                (
                    f"http://h{i}.example/style{j}.css",
                    [
                        ("text", "body{color:#000}", None, 0),
                        ("css", None, f"/css-leak{j}.png", 1),
                    ],
                )
            )
            rows.append(
                (
                    f"http://h{i}.example/img{j}.png",
                    [("media", None, f"/png-leak{j}", 0)],
                )
            )
    return rows


def mixed_type_web_df(
    spark: SparkSession,
    hosts: int,
    pages: int,
    content_types: dict[str, str] | None = None,
) -> DataFrame:
    """The mixed-type web as a documents table, optionally with an explicit
    ``content_type`` column (the server Content-Type header analog; NULL
    rows fall back to the extension law in functions/mime.py)."""
    ct = content_types or {}
    rows = [(u, s, ct.get(u)) for u, s in mixed_type_web_rows(hosts, pages)]
    return spark.createDataFrame(rows, MIXED_CT_SCHEMA)


def redirect_web_rows(hosts: int, pages: int) -> list[tuple]:
    """The synthetic web fronted by per-host redirectors: seed
    ``redir{i}.example/p0`` 301-redirects (a ``location`` span, hop R) to
    ``h{i}.example/p0`` — the seedsRedirectNewSeeds fixture."""
    rows = [
        (
            f"http://redir{i}.example/p0",
            [("location", None, f"http://h{i}.example/p0", 0)],
        )
        for i in range(hosts)
    ]
    return rows + synth_web_rows(hosts, pages)


def redirect_seed_lines(hosts: int) -> list[str]:
    return [f"http://redir{i}.example/p0" for i in range(hosts)]


def redirect_status_overrides(hosts: int) -> dict[str, int]:
    """Redirector pages answer 301 (Location header analog)."""
    return {f"http://redir{i}.example/p0": 301 for i in range(hosts)}


def seed_lines(hosts: int) -> list[str]:
    """Seed-file lines incl. scheme-less + comment/blank + canonical-dup
    (TextSeedModule law, modules/.../seeds/TextSeedModule.java:96-188)."""
    lines = ["# seeds fixture", ""]
    for i in range(hosts):
        if i % 3 == 1:
            lines.append(f"h{i}.example/p0")  # scheme-less -> http:// prefixed
        elif i % 3 == 2:
            lines.append(f"http://H{i}.EXAMPLE/p0")  # dup after canonicalization
            lines.append(f"http://h{i}.example/p0")
        else:
            lines.append(f"http://h{i}.example/p0")
    return lines


def seeds_df(spark: SparkSession, hosts: int) -> DataFrame:
    return spark.createDataFrame([(l,) for l in seed_lines(hosts)], ["line"])
