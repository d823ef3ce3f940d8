"""AMQPUrlReceiver analog: message law + mid-crawl injection parity.

Reference: contrib/src/main/java/org/archive/crawler/frontier/
AMQPUrlReceiver.java (UrlConsumer.handleDelivery :339-375, makeCrawlUri
:397-441, populateHeritableMetadata :447-460, REQUEST_HEADER_BLACKLIST
:324-325).
"""

from __future__ import annotations

import json

from heritrix3_spark.crawler import CrawlConfig, CrawlEngine
from heritrix3_spark.operators import amqp as AMQP
from heritrix3_spark.simulator import SimConfig, simulate


def _msg(**kw):
    base = {
        "url": "http://h.example/injected",
        "method": "GET",
        "headers": {"Referer": "http://h.example/", "Accept": "*/*"},
        "parentUrl": "http://h.example/parent",
        "parentUrlMetadata": {
            "pathFromSeed": "LL",
            "heritableData": {"source": "http://seed.example/", "heritable": ["source"]},
        },
    }
    base.update(kw)
    return json.dumps(base)


# ---------------------------------------------------------------------------
# message law
# ---------------------------------------------------------------------------


def test_parse_message_javadoc_shape():
    m = AMQP.parse_message(_msg())
    assert m["uri"] == "http://h.example/injected"
    assert m["hops_path"] == "LLI"  # pathFromSeed + default INFERRED hop
    assert m["via"] == "http://h.example/parent"
    assert m["via_context"] == "=INFERRED_MISC"
    # 'I' last hop -> HIGH + uriPrecedence 1 (:430-433)
    assert m["sched_directive"] == AMQP.HIGH
    assert m["data"][AMQP.PREC_KEY] == "1"
    assert m["data"][AMQP.AMQP_KEY] == "1"
    # heritableData strings land in the bag; "source" IS the source tag
    # (CoreAttributeConstants.A_SOURCE_TAG == "source")
    assert m["data"]["source_tag"] == "http://seed.example/"
    assert json.loads(m["data"][AMQP.HEADERS_KEY]) == {
        "Referer": "http://h.example/",
        "Accept": "*/*",
    }
    assert m["force"] is False


def test_parse_message_filters_and_defaults():
    # non-GET ignored
    assert AMQP.parse_message(_msg(method="POST")) is None
    # malformed ignored
    assert AMQP.parse_message("not json") is None
    assert AMQP.parse_message('{"method": "GET"}') is None
    # blacklisted + ':'-prefixed headers dropped (case-insensitive)
    m = AMQP.parse_message(
        _msg(headers={
            "Accept-Encoding": "gzip", "Host": "h", ":path": "/x",
            "Connection": "close", "Upgrade-Insecure-Requests": "1",
            "User-Agent": "ua",
        })
    )
    assert json.loads(m["data"][AMQP.HEADERS_KEY]) == {"User-Agent": "ua"}
    # explicit hop overrides the INFERRED default: no HIGH/precedence
    m = AMQP.parse_message(_msg(hop="L"))
    assert m["hops_path"] == "LLL"
    assert m["sched_directive"] == AMQP.NORMAL
    assert AMQP.PREC_KEY not in m["data"]
    # forceFetch: receiver config OR message flag (:435)
    assert AMQP.parse_message(_msg())["force"] is False
    assert AMQP.parse_message(_msg(forceFetch=True))["force"] is True
    assert AMQP.parse_message(_msg(), force_fetch=True)["force"] is True
    # isSeed rides as the seed flag
    assert AMQP.SEED_KEY in AMQP.parse_message(_msg(isSeed=True))["data"]


# ---------------------------------------------------------------------------
# mid-crawl injection parity
# ---------------------------------------------------------------------------

WEB = {
    "http://h.example/p0": [
        ("text", "p0", None, 0),
        ("link", "a", "/p1", 1),
    ],
    "http://h.example/p1": [
        ("text", "p1", None, 0),
        ("link", "b", "/p2", 1),
    ],
    "http://h.example/p2": [("text", "p2", None, 0)],
    "http://h.example/injected": [
        ("text", "injected", None, 0),
        ("link", "c", "/child", 1),
    ],
    "http://h.example/child": [("text", "child", None, 0)],
    # a second, out-of-scope host reachable only via an isSeed injection
    "http://other.example/new": [
        ("text", "new", None, 0),
        ("link", "d", "/sub", 1),
    ],
    "http://other.example/sub": [("text", "sub", None, 0)],
}


def _rows(sim_log):
    return sorted(
        (l["round"], l["class_key"], l["canonical"], l["ordinal"],
         l["fetch_status"], l["disposition"], l.get("annotation"))
        for l in sim_log
    )


def _erows(eng_log):
    return sorted(
        (r.round, r.class_key, r.canonical, r.ordinal, r.fetch_status,
         r.disposition, r.annotation)
        for r in eng_log.collect()
    )


def test_amqp_injection_parity(spark, tmp_path):
    """Inject one plain message + one isSeed message for a new host before
    round 2: exact engine/simulator parity, receivedFromAMQP annotation on
    the injected rows only, heritable source rides to children, headers
    and flags do not."""
    bodies = [
        _msg(),
        _msg(
            url="http://other.example/new",
            parentUrl="http://ctl.example/",
            isSeed=True,
        ),
        _msg(method="HEAD"),  # ignored
    ]
    kw = dict(amqp="on", k_per_host=2)
    seeds = ["http://h.example/p0"]
    sim_log, sim_seen = simulate(
        WEB, seeds, SimConfig(**kw), amqp_messages={2: bodies}
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "amqp"),
        spark.createDataFrame(
            list(WEB.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    for _ in range(2):
        eng.run_round()
    assert eng.receive_urls(bodies) == 2  # HEAD ignored
    eng_log = eng.run(max_rounds=40)
    assert _erows(eng_log) == _rows(sim_log)
    assert {r.fp for r in eng.urlseen.seen(spark).collect()} == sim_seen
    by = {r.canonical: r for r in eng_log.collect()}
    # injected rows fetched, annotated
    assert by["http://h.example/injected"].annotation == "receivedFromAMQP"
    assert by["http://other.example/new"].annotation == "receivedFromAMQP"
    # the isSeed injection announced its prefix: the new host's child is in
    # scope and crawled
    assert by["http://other.example/sub"].fetch_status == 200
    # children are NOT annotated and do not inherit the URI-local keys,
    # but DO inherit heritableData (source)
    assert by["http://h.example/child"].annotation is None
    pend = {r.canonical: r for r in eng.export_pending_uris().collect()}
    assert not pend  # crawl drained
    child_rows = [
        l for l in sim_log if l["canonical"] == "http://h.example/child"
    ]
    assert child_rows and child_rows[0]["source_tag"] == "http://seed.example/"


def test_amqp_plain_injection_out_of_scope_dropped(spark, tmp_path):
    """A non-seed injected URL for an out-of-scope host is dropped by the
    scope chain (runCandidateChain semantics) in both twins.

    Note the default 'I' hop is ACCEPTED by TransclusionDecideRule (the
    inferred hop is a ≤2-non-R-hop tail), exactly like the reference's
    default scope — so the drop case needs an explicit navlink hop, whose
    empty post-'L' tail gets no transclusion grace."""
    bodies = [
        _msg(
            url="http://other.example/new",
            parentUrl="http://ctl.example/",
            hop="L",
        )
    ]
    kw = dict(amqp="on", k_per_host=2)
    seeds = ["http://h.example/p0"]
    sim_log, _ = simulate(
        WEB, seeds, SimConfig(**kw), amqp_messages={1: bodies}
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "oos"),
        spark.createDataFrame(
            list(WEB.items()),
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        ),
        CrawlConfig(num_buckets=4, ordinal_partitions=1, bloom=False, **kw),
    )
    eng.bootstrap(seeds)
    eng.run_round()
    eng.receive_urls(bodies)
    eng_log = eng.run(max_rounds=40)
    assert _erows(eng_log) == _rows(sim_log)
    assert not [
        r for r in eng_log.collect() if r.canonical.startswith("http://other")
    ]
