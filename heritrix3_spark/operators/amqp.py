"""AMQPUrlReceiver analog — mid-crawl external URL injection laws.

Re-expresses contrib/src/main/java/org/archive/crawler/frontier/
AMQPUrlReceiver.java as a pure message law + a driver-side injection
buffer: the AMQP transport itself (exchange/queue plumbing,
StarterRestarter thread) is connection machinery; what is portable is the
*message contract* (UrlConsumer.handleDelivery :339-375 +
makeCrawlUri :397-441):

* body = JSON ``{"url", "method", "headers", "parentUrl",
  "parentUrlMetadata": {"pathFromSeed", "heritableData": {...}},
  "hop"?, "forceFetch"?, "isSeed"?}``;
* only ``method == "GET"`` is processed — anything else is ignored (and
  ACKed), as is malformed JSON (:349-371);
* ``hopPath = parentUrlMetadata.pathFromSeed + hop`` with hop defaulting
  to INFERRED ('I'); via = parentUrl; link context ``=INFERRED_MISC``;
* heritableData's string entries land in the heritable data bag
  (populateHeritableMetadata :447-460 — one level deep; JSON arrays are
  not modeled in the map<string,string> bag and are skipped, documented);
* request headers not starting ':' and not in the blacklist ride as
  ``customHttpRequestHeaders`` (:414-421) — URI-local, NOT heritable;
* an 'I' last hop gets SchedulingConstants.HIGH + uriPrecedence 1
  (:430-433);
* forceFetch = receiver config OR the message flag (:435); isSeed from
  the message (:436) — an injected seed takes the checkForSeedPromotion
  path (forceFetch, MEDIUM-if-NORMAL, addSeed scope announce);
* every processed URI is annotated ``receivedFromAMQP`` (:438).

Engine mapping: ``CrawlEngine.receive_urls(bodies)`` buffers parsed
messages; the next round unions them into the candidate chain (scope →
prepare → uniq → receive — the runCandidateChain analog) ordered before
the round's own outlinks (parent_ordinal −1, message order). The three
URI-local flags ride the data map under reserved non-heritable keys.
"""

from __future__ import annotations

import json

#: crawl-log annotation (AMQPUrlReceiver.A_RECEIVED_FROM_AMQP)
A_RECEIVED_FROM_AMQP = "receivedFromAMQP"

#: reserved (non-heritable) data keys for the injected row itself
AMQP_KEY = "__amqp"  # marks the row for the receivedFromAMQP annotation
SEED_KEY = "__amqp_seed"  # message isSeed -> checkForSeedPromotion path
PREC_KEY = "__amqp_prec"  # 'I'-hop uriPrecedence override (=1)
HEADERS_KEY = "customHttpRequestHeaders"

NON_HERITABLE_KEYS = (AMQP_KEY, SEED_KEY, PREC_KEY, HEADERS_KEY)

INFERRED_MISC = "=INFERRED_MISC"

#: AMQPUrlReceiver.REQUEST_HEADER_BLACKLIST (:324-325)
REQUEST_HEADER_BLACKLIST = frozenset(
    {"accept-encoding", "upgrade-insecure-requests", "host", "connection"}
)

#: SchedulingConstants
HIGH, NORMAL = 1, 3


def parse_message(body: str, force_fetch: bool = False) -> dict | None:
    """UrlConsumer.handleDelivery + makeCrawlUri: one message body ->
    candidate dict, or None when the message is ignored (non-GET) or
    malformed (the reference logs and ACKs both)."""
    try:
        jo = json.loads(body)
        if jo.get("method") != "GET":
            return None
        url = jo["url"]
        via = jo["parentUrl"]
        meta = jo["parentUrlMetadata"]
        parent_hop_path = meta["pathFromSeed"]
        hop = jo.get("hop")
        if hop is None:
            hop = "I"  # optString default: Hop.INFERRED (:406)
        hops_path = parent_hop_path + hop
        data: dict = {AMQP_KEY: "1"}
        for k, v in meta.get("heritableData", {}).items():
            if isinstance(v, str):
                # CoreAttributeConstants.A_SOURCE_TAG == "source": the
                # engine's source-tag bag key is "source_tag"
                data["source_tag" if k == "source" else k] = v
        headers = {
            k: v
            for k, v in jo.get("headers", {}).items()
            if not k.startswith(":")
            and k.lower() not in REQUEST_HEADER_BLACKLIST
            and isinstance(v, str)
        }
        if headers:
            data[HEADERS_KEY] = json.dumps(headers, sort_keys=True)
        sched = NORMAL
        if hops_path.endswith("I"):
            sched = HIGH
            data[PREC_KEY] = "1"
        if jo.get("isSeed"):
            data[SEED_KEY] = "1"
        return dict(
            uri=url,
            hops_path=hops_path,
            via=via,
            via_context=INFERRED_MISC,
            sched_directive=sched,
            force=bool(force_fetch or jo.get("forceFetch")),
            data=data,
        )
    except (KeyError, TypeError, ValueError):
        return None
