"""Pure-Python reference crawl simulator — the golden oracle.

Implements the surveyed Heritrix laws as a tiny event-driven, per-queue
serial crawler (single-ToeThread semantics, SURVEY §7.3) over the synthetic
span web. The Spark engine (:mod:`heritrix3_spark.crawler`) must reproduce
its ``(round, class_key, uri)`` sequence, ordinals, dispositions, and final
url_seen set exactly (BASELINE "frontier-ordering/URL-seen exact-match").

Deterministic macro-batch round contract shared by both implementations:

1. Round r at virtual clock T: queues that are non-empty, not retired and
   have ``wake_time <= T`` (and, when a total budget is set, expenditure
   below it) each emit their top-k URIs in insert-key order
   ``(sched_directive, min(precedence,127), ordinal)``
   (BdbMultipleWorkQueues.java:422-438).
2. Fetch: synthetic web lookup; present -> 200, missing -> 404; fixed
   fetch_duration_ms. Within a round a queue's m-th fetch begins at
   ``T + m*(duration+politeness)`` (serial per host; k=1 is exact Heritrix
   parity, k>1 a documented throughput mode).
3. Extract: outlinks from spans in offset order; error pages (<200 or
   >=400) contribute none (CandidatesProcessor.java:236-260).
4. Scope -> prepare (directive/canonical/classKey/cost/precedence laws).
5. Dedup in discovery order ``(parent_ordinal, outlink_index)``; novel URIs
   get ordinals ``next_ordinal++`` in that order and enter their queues;
   fps of scheduled URIs enter url_seen (schedule -> add,
   WorkQueueFrontier.java:347-379).
6. Disposition: success/disregard/retry per status laws; budget expend
   (cost per final disposition / retries except DEFERRED; error penalty);
   politeness snooze sets queue wake_time (DispositionProcessor law);
   total-budget breach retires the queue (WorkQueueFrontier.java:927-1029).
7. Clock advance: T' = min wake_time over non-empty live queues (> T).

All laws cite the reference files in SURVEY.md §2.5-§2.8.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from heritrix3_spark.fp import create_key
from heritrix3_spark.functions.canonicalize import canonicalize
from heritrix3_spark.functions.surt import surt, surt_authority_class_key
from heritrix3_spark.operators.scope import extend_hops_path as _ehp
from heritrix3_spark.operators.scope import hop_count as _hop_count

# scheduling constants
HIGHEST, HIGH, MEDIUM, NORMAL = 0, 1, 2, 3


@dataclass
class SimConfig:
    k_per_host: int = 1
    max_hops: int = 20
    fetch_duration_ms: int = 100
    delay_factor: float = 5.0
    min_delay_ms: int = 3000
    max_delay_ms: int = 30000
    respect_crawl_delay_up_to_ms: int = 300_000
    session_budget: int = 3000
    error_penalty: int = 100
    total_budget: int = -1
    max_rounds: int = 10_000
    preference_embed_hops: int = 1
    robots: str = "ignore"  # or "obey" (PreconditionEnforcer semantics)
    dns: str = "ignore"  # or "obey" (dns:host prerequisites)
    # DNS/robots expiry laws shared with CrawlConfig (PreconditionEnforcer
    # isIpExpired / CrawlServer.isRobotsExpired): 0 = never expire; a stale
    # entry re-defers triggers and re-injects a FORCED prerequisite
    ip_validity_duration_s: int = 0
    robots_validity_duration_s: int = 0
    user_agent: str = "heritrix3-spark"
    max_retries: int = 30
    # sheet overlays: ({"surt_prefix", "total_budget"?, "k_per_host"?}, ...)
    # first matching prefix wins (see CrawlConfig.overlays)
    overlays: tuple = ()
    # futureUris forced re-visit interval (WorkQueueFrontier.checkFutures
    # :743-760); -1 = off. Law shared with CrawlConfig.recrawl_interval_ms.
    recrawl_interval_ms: int = -1
    # QuotaEnforcer quotas + forceRetire (see CrawlConfig.quotas for the
    # full law; checks run against ROUND-START stats in both engines)
    quotas: tuple = ()
    force_retire: bool = True
    # seedsRedirectNewSeeds / SeedAcceptDecideRule / cost policy — laws
    # shared with CrawlConfig (see crawler.py field docs)
    seeds_redirect_new_seeds: bool = True
    seed_accept: bool = False
    cost_policy: str = "unit"
    # IdenticalPayloadDigestRevisit law shared with CrawlConfig: a success
    # whose payload digest was recorded before gets the reference's
    # "duplicate:digest" annotation on its log row
    digest_history: bool = False
    # heritable data keys / sourceTagSeeds — law shared with CrawlConfig
    source_tag_seeds: bool = False
    # text-extractor tail over joined text spans — law shared with
    # CrawlConfig.text_extractors ("xml", "universal")
    text_extractors: tuple = ()
    # TrapSuppressExtractor law shared with CrawlConfig.trap_suppress
    trap_suppress: bool = False
    # CandidatesProcessor.processErrorOutlinks — law shared with CrawlConfig
    process_error_outlinks: bool = False
    # queue-assignment policy — law shared with CrawlConfig.queue_assignment
    queue_assignment: str = "surt"
    session_budget_cost_law: bool = True  # always on; kept for doc symmetry
    # maxPerHostBandwidthUsageKbSec (DispositionProcessor.java:275-291);
    # 0 = off. Law shared with CrawlConfig.max_per_host_bandwidth_kb.
    max_per_host_bandwidth_kb: int = 0
    # ExtractorHTML.shouldExtract mime gate — law shared with
    # CrawlConfig.mime_extract_gate (functions/mime.py)
    mime_extract_gate: bool = False
    # HTTP auth — laws shared with CrawlConfig.auth_zones/credentials
    # (operators/auth.py: zone 401s, handle401 attach, needsReenqueuing,
    # promoteCredentials with round-batch visibility)
    auth_zones: tuple = ()
    credentials: tuple = ()
    # HtmlFormCredential analogs — law shared with
    # CrawlConfig.form_credentials (credentialPrecondition defer + login
    # prerequisite + domain promotion; operators/auth.py form section)
    form_credentials: tuple = ()
    # CrawlLimitEnforcer family — laws shared with CrawlConfig
    # (max_fetches=maxDocumentsDownload; byte/novel/time limits checked at
    # round end, first match in the reference's order wins)
    max_fetches: int = -1
    max_bytes_download: int = 0
    max_novel_bytes: int = 0
    max_novel_urls: int = 0
    max_time_seconds: int = 0
    # Cookie model — laws shared with CrawlConfig.cookies/cookie_zones/
    # cookies_txt (operators/cookies.py; round-start visibility, later
    # ordinal wins per sortableKey, cookie-zone 403 before the auth 401)
    cookies: str = "ignore"
    cookie_zones: tuple = ()
    cookies_txt: str = ""
    # RuntimeLimitEnforcer — laws shared with CrawlConfig.runtime_limit_s
    # (round-start elapsed check; "pause"/"terminate" stop, "block" fails
    # every emitted URI with -5004 + the Runtime-exceeded annotation)
    runtime_limit_s: int = -1
    runtime_limit_op: str = "pause"
    # CrawlMapper family — laws shared with CrawlConfig.crawl_mapper
    # (operators/mapper.py: hash = std64 fp modulo, lexical = TreeMap
    # tailMap; check_uri diverts due rows to -5002 disregard before
    # preconditions; check_outlinks drops mapped-away candidates pre-seen)
    crawl_mapper: str = "off"  # "off" | "hash" | "lexical"
    mapper_local_name: str = "."
    mapper_crawler_count: int = 1
    mapper_psl_reduce: bool = True
    mapper_map: tuple = ()
    mapper_check_uri: bool = True
    mapper_check_outlinks: bool = True
    # Forms-discovery login machinery — laws shared with CrawlConfig.forms
    # (operators/forms.py: ExtractorHTMLForms over "form" spans +
    # FormLoginProcessor once-per-province 'S' SUBMIT hop)
    forms: str = "off"
    extract_all_forms: bool = False
    form_login: tuple = ()
    # FetchFTP extraction laws (operators/ftp.py twins)
    ftp: str = "off"
    ftp_extract_from_dirs: bool = True
    ftp_extract_parent: bool = True
    # contrib HostQuotaEnforcer / SourceQuotaEnforcer (CrawlConfig twins)
    host_quotas: tuple = ()
    source_quotas: tuple = ()
    # AMQPUrlReceiver analog (CrawlConfig.amqp twins; operators/amqp.py)
    amqp: str = "off"
    amqp_force_fetch: bool = False
    # FetchWhois (CrawlConfig.whois twins; operators/whois.py):
    # () -> DEFAULT_SPECIAL_QUERY_TEMPLATES
    whois: str = "off"
    whois_templates: tuple = ()


@dataclass
class SimURI:
    uri: str
    canonical: str
    class_key: str
    hops_path: str
    via: str | None
    is_seed: bool
    directive: int
    precedence: int
    cost: int
    ordinal: int
    fetch_attempts: int = 0
    # heritable data bag (CrawlURI.inheritFrom law); None = empty
    data: dict | None = None


@dataclass
class Queue:
    pending: list = field(default_factory=list)  # of SimURI
    wake_time: int = 0
    total_expenditure: int = 0
    retired: bool = False


def _sort_key(u: SimURI):
    return (u.directive, min(u.precedence, 127), u.ordinal & ((1 << 48) - 1))


def _scope_ok(uri: str, hops_path: str, prefixes: list[str], max_hops: int) -> bool:
    """Default-scope fold (see operators/scope.py for rule citations)."""
    decision = -1  # RejectDecideRule
    # getCandidateSurt law: candidates compare https-coerced-to-http, the
    # same coordinate the (prefixFromPlainForceHttp) prefixes live in
    s = surt(uri)
    if s.startswith("https://"):
        s = "http://" + s[len("https://"):]
    if any(s.startswith(p) for p in prefixes):
        decision = 1
    if _hop_count(hops_path) > max_hops:
        decision = -1
    # transclusion
    tail = hops_path
    for idx in range(len(hops_path) - 1, -1, -1):
        if hops_path[idx] in "LSM":
            tail = hops_path[idx + 1 :]
            break
    else:
        tail = hops_path
    nonref = sum(1 for c in tail if c != "R")
    spec = sum(1 for c in tail if c == "X")
    if len(tail) > 0 and spec <= 1 and nonref <= 2:
        decision = 1
    import re as _re

    if _re.match(r"^.*?/(.*?/)\1{2,}.*$", uri):
        decision = -1
    slashes = uri.count("/") - (2 if _re.match(r"^[a-zA-Z][\w+\-.]*://", uri) else 0)
    if slashes > 20:
        decision = -1
    if hops_path.endswith("P"):
        decision = 1
    scheme = uri.split(":", 1)[0].lower()
    if scheme not in ("http", "https", "ftp", "dns", "whois", "sftp"):
        decision = -1
    return decision == 1


def _directive(hops_path: str, current: int, pref_embed_hops: int) -> int:
    if hops_path and hops_path[-1] == "R":
        return MEDIUM  # preferenceDepthHops default -1
    trans = 0
    for c in reversed(hops_path):
        if c == "L":
            break
        trans += 1
    if pref_embed_hops > 0 and 0 < trans <= pref_embed_hops and current == NORMAL:
        return MEDIUM
    return current


def simulate(
    web: dict[str, list[tuple]],
    seed_lines: list[str],
    config: SimConfig | None = None,
    status_overrides: dict[str, int] | None = None,
    web_ct: dict[str, str] | None = None,
    diversions: list | None = None,
    amqp_messages: dict[int, list[str]] | None = None,
):
    """Run the golden crawl.

    ``web``: {url: [(kind, text, media_ref, offset), ...]}.
    ``status_overrides``: canonical -> fetch status (e.g. 301 redirects).
    ``web_ct``: canonical -> explicit Content-Type (the server-header
    analog; absent entries derive from path/extension, functions/mime.py).
    Returns (log, seen_fps): log rows are dicts with round/class_key/uri/
    canonical/ordinal/disposition/fetch_status/content_type/content_length.
    """
    import json as _json
    import re as _re

    from heritrix3_spark.functions import mime as _mime
    from heritrix3_spark.operators import auth as _auth
    from heritrix3_spark.operators import forms as _forms
    from heritrix3_spark.operators import amqp as _amqp
    from heritrix3_spark.operators import ftp as _ftp
    from heritrix3_spark.operators import whois as _whois

    cfg = config or SimConfig()
    web_ct = web_ct or {}
    overrides = status_overrides or {}
    queues: dict[str, Queue] = {}
    seen: set[int] = set()
    log: list[dict] = []
    next_ordinal = 1

    def _cost(uri: str, via: str | None) -> int:
        """Cost policies (Unit/AntiCalendar/WagCostAssignmentPolicy laws)."""
        if cfg.cost_policy == "anticalendar":
            pat = (
                r"(calendar)|(year)|(month)|(day)|(date)|(viewcal)"
                r"|(\?m=)|(&m=)|(\?y=)|(&y=)|(\?d=)|(&d=)"
            )
            return 2 if _re.search(pat, uri, _re.I) else 1
        if cfg.cost_policy == "wag":
            c = 1
            if "?" in uri:
                c += 1
                pre_q = uri.split("?", 1)[0]
                if via and via.startswith(pre_q):
                    c += 1
            return c
        return 1

    # --- seeds (TextSeedModule law) -----------------------------------
    seed_uris: list[str] = []
    for line in seed_lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if not _re.match(r"^[a-zA-Z][\w+\-]+:", line):
            line = "http://" + line
        seed_uris.append(line)
    prefixes = []
    for u in seed_uris:
        s = surt(canonicalize(u))
        i = s.find(")")
        if i != -1:
            p = s[: i + 1]
            if p.startswith("https://"):
                p = "http://" + p[len("https://") :]
            if p not in prefixes:
                prefixes.append(p)

    def _class_key_of(canonical: str, hops_path: str, via):
        """Queue key per the configured policy (prereqs ride via's queue)."""
        if cfg.queue_assignment == "surt":
            return surt_authority_class_key(canonical, hops_path, via)
        from heritrix3_spark.functions.surt import (
            assignment_level_class_key,
            bucket_class_key,
            hostname_class_key,
        )

        basis = via if (hops_path.endswith("P") and via) else canonical
        return {
            "hostname": hostname_class_key,
            "assignment_level": assignment_level_class_key,
            "bucket": bucket_class_key,
        }[cfg.queue_assignment](basis)

    # CrawlMapper node-name law (operators/mapper.py scalar twins)
    if cfg.crawl_mapper != "off":
        from heritrix3_spark.fp import std64 as _std64
        from heritrix3_spark.functions.psl import (
            reduce_surt_to_assignment_level as _psl_reduce,
        )
        from heritrix3_spark.operators.mapper import (
            hash_crawler_name as _hash_name,
            lexical_crawler_name as _lex_name,
        )

    def _mapper_target(ck: str) -> str:
        if cfg.crawl_mapper == "hash":
            key = _psl_reduce(ck) if cfg.mapper_psl_reduce else ck
            return _hash_name(key, cfg.mapper_crawler_count)
        return _lex_name(ck, cfg.mapper_map)

    # per-round diversion-line buffer: (target, std64 uri fp) -> min line
    # (the recentlySeen dedup law + the engine's per-round min(line) fold)
    divert_round: dict[tuple, str] = {}

    def _divert(rnd: int, tgt: str, ck: str, uri: str, hops: str, via) -> None:
        if diversions is None:
            return
        line = f"{ck} CrawlURI {uri} {hops or ''} {via or ''}"
        key = (rnd, tgt, _std64.fp(uri))
        prev = divert_round.get(key)
        if prev is None or line < prev:
            divert_round[key] = line

    def _amqp_ann(data, base=None):
        """receivedFromAMQP is the FIRST annotation (added at makeCrawlUri,
        before any fetch-time annotation — AMQPUrlReceiver.java:438)."""
        tagged = cfg.amqp == "on" and data and _amqp.AMQP_KEY in data
        if not tagged:
            return base
        return "receivedFromAMQP" + ("," + base if base else "")

    def schedule(uri, hops_path, via, is_seed, directive, force=False,
                 data=None, keep_amqp=False):
        """schedule->add (or addForce when ``force``): returns True when
        the URI entered the frontier. ``data`` is the inherited heritable
        bag (CrawlURI.inheritFrom) — minus the attached-credential key
        (credentials are not heritable)."""
        nonlocal next_ordinal
        if data:
            # credentials and submit payloads are NOT heritable: the
            # attached-realm key never crosses; A_SUBMIT_DATA/ENCTYPE ride
            # only the submit row itself (hop 'S'); the AMQP flags +
            # customHttpRequestHeaders ride only the injected row itself
            drop = {_auth.AUTH_DATA_KEY}
            if not hops_path.endswith("S"):
                drop |= {_forms.SUBMIT_DATA_KEY, _forms.SUBMIT_ENCTYPE_KEY}
            if cfg.amqp == "on" and not keep_amqp:
                drop |= set(_amqp.NON_HERITABLE_KEYS)
            data = {k: v for k, v in data.items() if k not in drop}
        canonical = canonicalize(uri)
        fp = create_key(canonical)
        if fp in seen and not force:
            return False
        seen.add(fp)
        ck = _class_key_of(canonical, hops_path, via)
        cost = _cost(uri, via)
        prec = cost  # CostUriPrecedencePolicy
        if cfg.amqp == "on" and data and _amqp.PREC_KEY in data:
            prec = 1  # AMQP 'I'-hop uriPrecedence (AMQPUrlReceiver.java:432)
        s = SimURI(
            uri=uri,
            canonical=canonical,
            class_key=ck,
            hops_path=hops_path,
            via=via,
            is_seed=is_seed,
            directive=directive,
            precedence=prec,
            cost=cost,
            ordinal=next_ordinal,
            data=dict(data) if data else None,
        )
        next_ordinal += 1
        queues.setdefault(ck, Queue()).pending.append(s)
        return True

    for u in seed_uris:
        schedule(
            u, "", None, True, MEDIUM,
            data={"source_tag": u} if cfg.source_tag_seeds else None,
        )

    # robots state: server -> (parsed Robotstxt, fetched_at clock);
    # dns state: host -> resolved_at clock (PreconditionEnforcer analog)
    from heritrix3_spark.operators.robots import Robotstxt

    robots_state: dict[str, tuple[Robotstxt, int]] = {}
    dns_state: dict[str, int] = {}

    # FetchWhois knowledge (referralServers + urlProgress, FetchWhois.java
    # :150-152). Progress keys are the RAW uri strings as built/scheduled
    # (urlProgress.put(curi.toString()) :377) — not canonical forms.
    whois_referrals: dict[str, str] = {}
    whois_progress: dict[str, int] = {}
    whois_tpl = cfg.whois_templates or None

    # QuotaEnforcer FetchStats substats: (cat, key) -> metric dict
    quotas = dict(cfg.quotas)
    _QUOTA_METRICS = {
        "MaxFetchSuccesses": ("successes", False),
        "MaxSuccessKb": ("success_bytes", True),
        "MaxFetchResponses": ("responses", False),
        "MaxAllKb": ("all_bytes", True),
        "MaxNovelKb": ("novel_bytes", True),
        "MaxNovelUrls": ("novel_urls", False),
    }
    quota_stats: dict[tuple[str, str], dict[str, int]] = {}
    # contrib HostQuotaEnforcer / SourceQuotaEnforcer laws (engine twins:
    # crawler._contrib_quota_cols): FetchStats keys -> quota_stats columns,
    # CrawledBytesHistotable keys -> source_stats columns
    _FETCHSTATS_KEYS = {
        "fetchSuccesses": "successes", "fetchResponses": "responses",
        "successBytes": "success_bytes", "totalBytes": "all_bytes",
        "novel": "novel_bytes", "novelCount": "novel_urls",
    }
    _HISTOTABLE_KEYS = {
        "novel": "novel", "novelCount": "novel_count",
        "dupByHash": "dup_bytes", "dupByHashCount": "dup_count",
        "notModified": "nm_bytes", "notModifiedCount": "nm_count",
    }
    source_stats: dict[str, dict[str, int]] = {}
    # any quota family accumulates the round-end FetchStats tally
    stats_on = bool(quotas) or bool(cfg.host_quotas) or bool(cfg.source_quotas)
    digests_seen: set = set()
    # server-promoted credentials (promoteCredentials): (server, realm)
    auth_promoted: set = set()
    # form-credential authenticated state: (domain, "#form:login") —
    # promoted at round end like the engine's auth table (the gate reads
    # round-start state; no intra-batch visibility since the check runs
    # at emit time, before any fetch)
    form_auth: set = set()
    # documents-sink analog for TrapSuppressExtractor: canonical -> latest
    # archived payload (content tuple)
    archived: dict[str, tuple] = {}
    # cookie store (operators/cookies.py laws); set-cookies apply at round
    # end in ordinal order — round-start visibility, like the engine table
    from heritrix3_spark.operators.cookies import (
        CookieStore as _CookieStore,
        parse_set_cookie as _parse_set_cookie,
    )

    cookie_store = _CookieStore()
    if cfg.cookies == "obey" and cfg.cookies_txt:
        cookie_store.load_txt(cfg.cookies_txt)
    # FormLoginProcessor province counters (eligibleFormsAttemptsCount /
    # eligibleFormsSeenCount, FormLoginProcessor.java:122-140): live serial
    # counters — the engine reproduces the intra-round ordering with a
    # per-province ordinal window over round-start table state
    form_provinces: dict[str, list] = {}  # province -> [attempts, seen]

    def _cookie_zone_for(server: str, path: str):
        for srv, pfx, cname in cfg.cookie_zones:
            if server == srv and path.startswith(pfx):
                return cname
        return None

    def quota_blocked(snapshot, server, host, group) -> bool:
        for cat, key in (("server", server), ("host", host), ("group", group)):
            if key is None:
                continue
            st = snapshot.get((cat, key), {})
            for qkey, quota in quotas.items():
                if quota < 0 or not qkey.startswith(cat):
                    continue
                col, is_kb = _QUOTA_METRICS[qkey[len(cat):]]
                actual = st.get(col, 0)
                if is_kb:
                    actual //= 1024
                if actual >= quota:
                    return True
        return False

    def _server_path(canonical: str):
        if canonical.startswith("dns:"):
            return "dns", canonical[4:], None
        m = _re.match(r"^([^:/?#]+)://([^/?#]*)(.*)$", canonical)
        if not m:
            return None, None, None
        return m.group(1), m.group(2), m.group(3)

    # --- rounds ---------------------------------------------------------
    T = 0
    futures: list[tuple[int, SimURI]] = []  # (reschedule_time, uri)
    # CrawlLimitEnforcer cumulative stats (engine-parity definitions:
    # bytes over status>=200 rows, novelty = 2xx success w/o
    # duplicate:digest, fetched = every emitted row)
    crawl_stats = dict(fetched=0, bytes=0, novel_urls=0, novel_bytes=0)
    limits_on = (
        cfg.max_fetches >= 0
        or cfg.max_bytes_download > 0
        or cfg.max_novel_bytes > 0
        or cfg.max_novel_urls > 0
        or cfg.max_time_seconds > 0
    )
    for rnd in range(cfg.max_rounds):
        # RuntimeLimitEnforcer at the round-start clock (engine-parity law)
        rt_block = False
        if cfg.runtime_limit_s >= 0 and T > cfg.runtime_limit_s * 1000:
            if cfg.runtime_limit_op in ("pause", "terminate"):
                break
            rt_block = True
        # futureUris maturation at round-start clock (checkFutures law)
        matured = [(t, u) for t, u in futures if t <= T]
        futures = [(t, u) for t, u in futures if t > T]
        for _, u in matured:
            u.fetch_attempts = 0
            queues.setdefault(u.class_key, Queue()).pending.append(u)
        live = {
            ck: q
            for ck, q in queues.items()
            if q.pending and not q.retired
        }
        if not live:
            if futures:
                # only futures remain: jump to the earliest reschedule_time
                T = max(T + 1, min(t for t, _ in futures))
                continue
            break
        eligible = {ck: q for ck, q in live.items() if q.wake_time <= T}
        if not eligible:
            wake_targets = [min(q.wake_time for q in live.values())]
            if futures:
                wake_targets.append(min(t for t, _ in futures))
            T = max(T + 1, min(wake_targets))
            eligible = {ck: q for ck, q in live.items() if q.wake_time <= T}
        def overlay(ck, key, default):
            for ov in cfg.overlays:
                if key in ov and ck.startswith(ov["surt_prefix"]):
                    return ov[key]
            return default

        # quota checks run against ROUND-START stats (engine parity law)
        if stats_on:
            import copy as _copy

            quota_snapshot = _copy.deepcopy(quota_stats)
            source_snapshot = _copy.deepcopy(source_stats)
        # FetchWhois knowledge reads are round-start snapshots (the batch
        # analog of the serial referral walk — engine parity; writes land
        # in the live dicts and become visible next round)
        if cfg.whois == "on":
            w_ref_snap = dict(whois_referrals)
            w_prog_snap = dict(whois_progress)
        round_fetches = []  # (ordinal, server, class_key, status, content, size)
        pending_cookies: list = []  # (ordinal, Cookie) -> applied at round end
        round_log_start = len(log)
        round_taken = 0
        round_promotions: set = set()  # lands in auth_promoted at round end
        round_form_auth: set = set()  # login successes -> form_auth at round end
        round_form_events: list = []  # (curi, row, saved HTMLForms)
        retire_marks: set[str] = set()
        candidates = []  # (parent_ordinal, outlink_index, url, hops, via)
        for ck in sorted(eligible):
            q = eligible[ck]
            q.pending.sort(key=_sort_key)
            promo_batch: set = set()  # same-queue round-batch promotions
            # session budget (expenditureAtLastActivation law): emit while
            # rank <= k AND the spend of earlier emits <= sessionBudget
            k = overlay(ck, "k_per_host", cfg.k_per_host)
            take, spend = [], 0
            for u in q.pending:
                if len(take) >= k or spend > cfg.session_budget:
                    break
                take.append(u)
                spend += u.cost
            q.pending = q.pending[len(take) :]
            round_taken += len(take)
            t_host = T
            bw_next = T  # earliestNextURIEmitTime carry (bandwidth cap)
            requeue = []
            for m, curi in enumerate(take):
                scheme, server, path_q = _server_path(curi.canonical)
                is_dns = scheme == "dns"
                # serverless whois URIs ("whois:foo.org") have no
                # authority, so _server_path yields (None, None, None)
                is_whois = curi.canonical.startswith("whois:")
                is_robots = path_q == "/robots.txt"
                # CrawlServer.getServerKey (CrawlServer.java:259-283): the
                # SERVER-STATE key — https without an explicit port appends
                # ':443' so https robots/quota state never shares a
                # CrawlServer with the http one. dns names key as-is.
                skey = server
                if (
                    scheme == "https"
                    and server
                    and not _re.search(r".+:[0-9]+$", server)
                ):
                    skey = server + ":443"
                forced = None
                reason = None
                prereq_force = False

                # RuntimeLimitEnforcer BLOCK_URIS (RuntimeLimitEnforcer.java
                # :186-190): the kill switch wins over every other gate —
                # -5004 is NOT in isDisregarded, so it disposes as a FAIL
                # (charged like any failure)
                if rt_block:
                    q.total_expenditure += curi.cost + cfg.error_penalty
                    log.append(
                        dict(round=rnd, class_key=ck, uri=curi.uri,
                             canonical=curi.canonical, ordinal=curi.ordinal,
                             fetch_status=-5004, disposition="fail",
                             source_tag=(curi.data or {}).get("source_tag"),
                             content_type=None, content_length=0,
                             annotation=_amqp_ann(
                                 curi.data,
                                 f"Runtime exceeded "
                                 f"{cfg.runtime_limit_s * 1000}ms",
                             ))
                    )
                    continue

                # CrawlMapper check-uri (CrawlMapper.java:201-213): early
                # prefetch position — a mapped-away row diverts BEFORE
                # preconditions/quota: -5002 disregard, never charged
                if cfg.crawl_mapper != "off" and cfg.mapper_check_uri:
                    tgt = _mapper_target(ck)
                    if tgt != cfg.mapper_local_name:
                        _divert(rnd, tgt, ck, curi.uri, curi.hops_path, curi.via)
                        log.append(
                            dict(round=rnd, class_key=ck, uri=curi.uri,
                                 canonical=curi.canonical, ordinal=curi.ordinal,
                                 fetch_status=-5002, disposition="disregard",
                                 source_tag=(curi.data or {}).get("source_tag"),
                                 content_type=None, content_length=0,
                                 annotation=_amqp_ann(curi.data, f"to:{tgt}"))
                        )
                        continue

                def _fresh(at: int, dur_s: int) -> bool:
                    # expired when fetched_at + dur*1000 < round-start clock
                    return dur_s == 0 or at + dur_s * 1000 >= T

                # FetchWhois serverless resolution (deferOrFinishGeneric,
                # FetchWhois.java:257-304) — whois URIs are EXEMPT from the
                # dns precondition (:279-281) and robots only gates
                # http/https (:172), so the whois branch resolves first
                whois_term = None  # terminal serverless status (-62/2002)
                whois_server = None
                whois_q = None
                whois_try = None
                if cfg.whois == "on" and is_whois:
                    whois_server, _wp, whois_q = _whois.parse_whois_uri(
                        curi.canonical
                    )
                    if whois_server is None:
                        outcome, whois_try = _whois.serverless_next(
                            whois_q, w_ref_snap, w_prog_snap, whois_tpl
                        )
                        if outcome == "fail":
                            whois_term = -62  # S_OTHER_PREREQUISITE_FAILURE
                        elif outcome == "finished":
                            whois_term = _whois.S_WHOIS_GENERIC_FINISHED
                        else:
                            # mark -> prerequisite; wait -> bare re-defer
                            forced = -50
                            reason = (
                                "whois" if outcome == "mark" else "whois_wait"
                            )
                if server is not None and not is_dns and not is_whois:
                    dns_known = cfg.dns != "obey" or (
                        server in dns_state
                        and _fresh(dns_state[server], cfg.ip_validity_duration_s)
                    )
                    if not dns_known:
                        forced, reason = -50, "dns"
                        prereq_force = server in dns_state  # stale, not new
                    elif cfg.robots == "obey" and not is_robots:
                        rb = robots_state.get(skey)
                        rb_known = rb is not None and _fresh(
                            rb[1], cfg.robots_validity_duration_s
                        )
                        if not rb_known:
                            forced, reason = -50, "robots"
                            prereq_force = rb is not None  # stale, not new
                        elif not rb[0].allows(cfg.user_agent, path_q):
                            forced = -9998  # S_ROBOTS_PRECLUDED
                # credentialPrecondition (after robots, before quota):
                # guarded rows defer behind their login-URI prerequisite
                # until authenticated; login rows always pass
                if (
                    cfg.form_credentials
                    and forced is None
                    and server is not None
                    and not is_dns
                    and not is_whois
                    and not is_robots
                    and _auth.form_cred_for_login(
                        curi.canonical, cfg.form_credentials
                    )
                    is None
                ):
                    fcred = _auth.form_cred_for_server(
                        server, cfg.form_credentials
                    )
                    if fcred is not None and (fcred[0], fcred[2]) not in form_auth:
                        forced, reason = -50, "form"
                if forced == -50:
                    attempts = curi.fetch_attempts + 1
                    if attempts < cfg.max_retries:
                        disposition = "retry"
                        curi.fetch_attempts = attempts
                        requeue.append(curi)
                        # inject the prerequisite ('P', HIGHEST);
                        # via = trigger's canonical -> same queue
                        if reason == "dns":
                            prereq = f"dns:{server}"
                        elif reason == "form":
                            prereq = next(
                                lu
                                for d, lu in cfg.form_credentials
                                if d == server
                            )
                        elif reason == "whois":
                            # markPrerequisite(tryThis) + IN_PROGRESS
                            # (FetchWhois.java:287-293); never overwrites
                            # an existing entry (DONE wins any interleave)
                            prereq = whois_try
                            whois_progress.setdefault(
                                whois_try, _whois.IN_PROGRESS
                            )
                        elif reason == "whois_wait":
                            # tryThis already IN_PROGRESS elsewhere: bare
                            # re-defer, no new prerequisite (:296-299)
                            prereq = None
                        else:
                            prereq = f"{scheme}://{server}/robots.txt"
                        if prereq is not None:
                            candidates.append(
                                (
                                    curi.ordinal,
                                    -1,
                                    prereq,
                                    _ehp(curi.hops_path, "P"),
                                    curi.canonical,
                                    HIGHEST,
                                    False,
                                    prereq_force,
                                    curi.data,
                                )
                            )
                    else:
                        disposition = "fail"
                        q.total_expenditure += curi.cost + cfg.error_penalty
                    log.append(
                        dict(round=rnd, class_key=ck, uri=curi.uri,
                             canonical=curi.canonical, ordinal=curi.ordinal,
                             fetch_status=-50, disposition=disposition,
                             source_tag=(curi.data or {}).get("source_tag"),
                             content_type=None, content_length=0,
                             annotation=_amqp_ann(curi.data))
                    )
                    continue
                if forced == -9998:
                    # disregarded URIs are never charged (holderCost = 0,
                    # WorkQueueFrontier.java:990)
                    log.append(
                        dict(round=rnd, class_key=ck, uri=curi.uri,
                             canonical=curi.canonical, ordinal=curi.ordinal,
                             fetch_status=-9998, disposition="disregard",
                             source_tag=(curi.data or {}).get("source_tag"),
                             content_type=None, content_length=0,
                             annotation=_amqp_ann(curi.data))
                    )
                    continue
                # QuotaEnforcer gate (after preconditions, before fetch —
                # chain position per profile cxml; dns: URIs exempt)
                if quotas and forced is None and not is_dns and not is_whois:
                    if quota_blocked(
                        quota_snapshot, skey, skey.split(":")[0], ck
                    ):
                        if cfg.force_retire:
                            # retire queue without disposing the URI
                            requeue.append(curi)
                            retire_marks.add(ck)
                        else:
                            q.total_expenditure += curi.cost + cfg.error_penalty
                            log.append(
                                dict(round=rnd, class_key=ck, uri=curi.uri,
                                     canonical=curi.canonical,
                                     ordinal=curi.ordinal,
                                     fetch_status=-5003, disposition="fail",
                                     source_tag=(curi.data or {}).get("source_tag"),
                                     content_type=None, content_length=0,
                                     annotation=_amqp_ann(curi.data))
                            )
                        continue
                # contrib HostQuotaEnforcer / SourceQuotaEnforcer (run after
                # the standard QuotaEnforcer; host-then-source order; never
                # forceRetire — a block disposes as a -5003 fail with the
                # hostQuota:/sourceQuota: annotation; dns rows exempt)
                if (
                    (cfg.host_quotas or cfg.source_quotas)
                    and forced is None
                    and not is_dns
                    and not is_whois
                ):
                    cq_ann = None
                    hq_host = skey.split(":")[0]
                    for hostq, subs, pairs in cfg.host_quotas:
                        if not (
                            hq_host == hostq
                            or (subs and hq_host.endswith("." + hostq))
                        ):
                            continue
                        st = quota_snapshot.get(("host", hq_host))
                        for k, lim in pairs:
                            col = _FETCHSTATS_KEYS[k]
                            if (st[col] if st else 0) >= lim:
                                cq_ann = "hostQuota:" + k
                                break
                        if cq_ann:
                            break
                    if cq_ann is None and cfg.source_quotas:
                        tag_q = (curi.data or {}).get("source_tag")
                        # shouldProcess: only once the source's stats exist
                        if tag_q is not None and tag_q in source_snapshot:
                            for tq, pairs in cfg.source_quotas:
                                if tq != tag_q:
                                    continue
                                for k, lim in pairs:
                                    col = _HISTOTABLE_KEYS[k]
                                    if source_snapshot[tag_q].get(col, 0) >= lim:
                                        cq_ann = "sourceQuota:" + k
                                        break
                                if cq_ann:
                                    break
                    if cq_ann is not None:
                        q.total_expenditure += curi.cost + cfg.error_penalty
                        log.append(
                            dict(round=rnd, class_key=ck, uri=curi.uri,
                                 canonical=curi.canonical,
                                 ordinal=curi.ordinal,
                                 fetch_status=-5003, disposition="fail",
                                 source_tag=(curi.data or {}).get("source_tag"),
                                 content_type=None, content_length=0,
                                 annotation=_amqp_ann(curi.data, cq_ann))
                        )
                        continue
                if is_dns:
                    status = 1  # S_DNS_SUCCESS (synthetic resolution)
                elif whois_term is not None:
                    # serverless whois terminal: no network fetch happens,
                    # so status overrides never apply (FetchWhois.java
                    # :266-268, :294-295)
                    status = whois_term
                elif cfg.whois == "on" and is_whois:
                    # server-ful whois fetch: recorded response -> 2001,
                    # no recorded response -> connect failure (-2,
                    # retryable — FetchWhois.java:359-366)
                    status = overrides.get(
                        curi.canonical,
                        _whois.S_WHOIS_SUCCESS
                        if curi.canonical in web
                        else -2,
                    )
                else:
                    status = overrides.get(
                        curi.canonical, 200 if curi.canonical in web else 404
                    )
                # cookie-zone gate (engine parity: applied before the auth
                # 401, which wins overlap): a zoned row whose round-start
                # request-cookie set lacks the zone cookie answers 403
                if (
                    cfg.cookies == "obey"
                    and cfg.cookie_zones
                    and not is_dns
                    and not is_whois
                    and server is not None
                ):
                    zname = _cookie_zone_for(server, path_q or "")
                    if zname is not None:
                        have = any(
                            c.name == zname
                            for c in cookie_store.request_cookies(
                                server.split(":")[0],
                                path_q if (path_q or "").startswith("/") else "/",
                                secure=scheme == "https",
                                now_s=T // 1000,
                            )
                        )
                        if not have:
                            status = 403
                # --- HTTP auth 401 law (operators/auth.py; engine parity:
                # same-queue earlier-batch promotions are visible, other
                # queues' promotions land at round end) -------------------
                auth_zone = None
                attached = None
                disposition = "success"
                auth_retry = False
                if cfg.auth_zones and not is_dns and not is_whois:
                    auth_zone = _auth.zone_for(
                        server, path_q or "", cfg.auth_zones
                    )
                if auth_zone is not None:
                    store_has, store_ok = _auth.store_flags(
                        auth_zone, cfg.credentials
                    )
                    attached = (curi.data or {}).get(_auth.AUTH_DATA_KEY)
                    attached_ok = attached == auth_zone[2] and store_ok
                    promoted_ok = store_ok and (
                        (server, auth_zone[2]) in auth_promoted
                        or (server, auth_zone[2]) in promo_batch
                    )
                    if not (attached_ok or promoted_ok):
                        status = 401
                        # needsReenqueuing: retry iff handle401 attaches
                        # (store has the realm, not already tried). A 401
                        # WITHOUT loaded creds is isSuccess()==true — it
                        # disposes like any 404 (CrawlURI.java:868-876)
                        if (
                            attached is None
                            and store_has
                            and curi.fetch_attempts + 1 < cfg.max_retries
                        ):
                            disposition = "retry"
                            auth_retry = True
                if auth_retry:
                    # handle401 attach + requeue: real fetch (charged) but
                    # the retry branch snoozes retryDelayFor(401)=0, not
                    # politeness — no host-clock advance
                    curi.fetch_attempts += 1
                    d = dict(curi.data) if curi.data else {}
                    d[_auth.AUTH_DATA_KEY] = auth_zone[2]
                    curi.data = d
                    requeue.append(curi)
                    q.total_expenditure += curi.cost
                    log.append(
                        dict(round=rnd, class_key=ck, uri=curi.uri,
                             canonical=curi.canonical, ordinal=curi.ordinal,
                             fetch_status=401, disposition="retry",
                             source_tag=(curi.data or {}).get("source_tag"),
                             content_type=_mime.content_type(
                                 curi.canonical,
                                 curi.canonical in web,
                                 False,
                                 web_ct.get(curi.canonical),
                             ),
                             content_length=0,
                             annotation=_amqp_ann(curi.data))
                    )
                    if cfg.robots == "obey" and is_robots and server is not None:
                        # non-2xx robots -> NO_ROBOTS allow-all (engine
                        # upserts the 401 body "" the same way)
                        robots_state[skey] = (Robotstxt(""), T)
                    continue
                if attached is not None and status == 401 and curi.data:
                    # tried-and-failed: detach, die a natural 401 death
                    # (isSuccess true once the credential is removed)
                    curi.data = {
                        k: v for k, v in curi.data.items()
                        if k != _auth.AUTH_DATA_KEY
                    }
                if status in (-2, -3, -1):
                    # needsReenqueuing (engine FR.needs_retry_col twin):
                    # connect/DNS failures retry with retryDelayFor's 900 s
                    # queue snooze — not politeness — and the fetch WAS
                    # attempted, so cost is charged and (whois) the url
                    # still marks DONE in the finally (FetchWhois.java:377)
                    if (
                        cfg.whois == "on"
                        and is_whois
                        and whois_server is not None
                    ):
                        whois_progress[curi.uri] = _whois.DONE
                    if curi.fetch_attempts + 1 < cfg.max_retries:
                        curi.fetch_attempts += 1
                        requeue.append(curi)
                        q.total_expenditure += curi.cost
                        t_host += 900_000  # DEFAULT_RETRY_DELAY_MS
                        log.append(
                            dict(round=rnd, class_key=ck, uri=curi.uri,
                                 canonical=curi.canonical,
                                 ordinal=curi.ordinal,
                                 fetch_status=status, disposition="retry",
                                 source_tag=(curi.data or {}).get("source_tag"),
                                 content_type=None, content_length=0,
                                 annotation=_amqp_ann(curi.data))
                        )
                        continue
                if status <= 0:
                    disposition = "fail"  # isSuccess() is status > 0
                duration = cfg.fetch_duration_ms
                delay = int(cfg.delay_factor * duration)
                delay = max(delay, cfg.min_delay_ms)
                delay = min(delay, cfg.max_delay_ms)
                if (
                    cfg.robots == "obey"
                    and skey in robots_state
                    and _fresh(robots_state[skey][1], cfg.robots_validity_duration_s)
                ):
                    cd = robots_state[skey][0].crawl_delay(cfg.user_agent)
                    if delay < cfg.respect_crawl_delay_up_to_ms:
                        cd_ms = min(int(cd * 1000), cfg.respect_crawl_delay_up_to_ms)
                        if cd_ms > delay:
                            delay = cd_ms
                if cfg.max_per_host_bandwidth_kb > 0:
                    # bandwidth floor: wait at least until the previous
                    # fetch's earliestNextURIEmitTime; this fetch sets the
                    # next one from its content bytes
                    c = t_host + duration
                    delay = max(delay, bw_next - c)
                    nbytes = (
                        sum(
                            len(t or "") + len(r or "")
                            for k, t, r, o in web.get(curi.canonical, [])
                        )
                        if 200 <= status < 300
                        else 0
                    )
                    bw_next = c + int(nbytes / (cfg.max_per_host_bandwidth_kb * 1.024))
                t_host += duration + delay
                q.total_expenditure += curi.cost + (
                    cfg.error_penalty if disposition == "fail" else 0
                )
                if 200 <= status < 300 and attached is not None:
                    # promoteCredentials: visible to later fetches in THIS
                    # queue's batch now, to everyone from next round
                    promo_batch.add((server, attached))
                    round_promotions.add((server, attached))
                if 200 <= status < 300 and cfg.form_credentials:
                    fl = _auth.form_cred_for_login(
                        curi.canonical, cfg.form_credentials
                    )
                    if fl is not None:
                        round_form_auth.add((fl[0], fl[2]))
                # content-type model (CrawlURI.setContentType analog; law
                # shared with the engine via functions/mime.py scalars)
                is_ftp_dir = None
                if cfg.ftp == "on" and scheme == "ftp":
                    # FetchFTP.java:453-457: directory (has a listing) ->
                    # text/plain, file -> application/octet-stream
                    is_ftp_dir = any(
                        k == "listing"
                        for k, t, r, o in web.get(curi.canonical, [])
                    )
                ct = _mime.content_type(
                    curi.canonical,
                    has_payload=(curi.canonical in web and status >= 200),
                    is_dns=is_dns,
                    web_ct=web_ct.get(curi.canonical),
                    is_ftp_dir=is_ftp_dir,
                )
                if status == _whois.S_WHOIS_SUCCESS:
                    # fetch() sets text/plain on success (FetchWhois.java
                    # :357) and the recorder size is the body size
                    ct = "text/plain"
                ct_size = (
                    sum(
                        len(t or "") + len(r or "")
                        for k, t, r, o in web.get(curi.canonical, [])
                    )
                    if 200 <= status < 300 or status == _whois.S_WHOIS_SUCCESS
                    else 0
                )
                row = dict(
                    round=rnd,
                    class_key=ck,
                    uri=curi.uri,
                    canonical=curi.canonical,
                    ordinal=curi.ordinal,
                    fetch_status=status,
                    disposition=disposition,
                    source_tag=(curi.data or {}).get("source_tag"),
                    content_type=ct,
                    content_length=ct_size,
                    annotation=_amqp_ann(curi.data),
                )
                log.append(row)
                if (
                    cfg.cookies == "obey"
                    and 200 <= status < 300
                    and not is_dns
                    and server is not None
                ):
                    # Set-Cookie spans of the fetched page (engine parity:
                    # applied at round end, later ordinal wins per key)
                    for k, t, r, o in web.get(curi.canonical, []):
                        if k == "set-cookie" and t:
                            c = _parse_set_cookie(
                                t, server.split(":")[0], now_s=T // 1000
                            )
                            if c is not None:
                                pending_cookies.append((curi.ordinal, c))
                if (stats_on or cfg.digest_history) and not is_dns:
                    content = (
                        tuple(web[curi.canonical])
                        if 200 <= status < 300 and curi.canonical in web
                        else None
                    )
                    size = (
                        sum(len(t or "") + len(r or "") for k, t, r, o in content)
                        if content
                        else 0
                    )
                    round_fetches.append(
                        (curi.ordinal, skey, ck, status, content, size, row)
                    )
                if is_dns and server is not None:
                    dns_state[server] = T  # resolved at round-start clock
                if cfg.robots == "obey" and is_robots and server is not None:
                    if 200 <= status < 300:
                        body = "\n".join(
                            t for k, t, r, o in web.get(curi.canonical, []) if k == "text" and t
                        )
                    else:
                        body = ""  # NO_ROBOTS: allow all
                    robots_state[skey] = (Robotstxt(body), T)
                if cfg.whois == "on" and whois_server is not None:
                    # fetch() finally: DONE even on failure (:370-377);
                    # referral-line scan only on a connected response
                    whois_progress[curi.uri] = _whois.DONE
                    if status == _whois.S_WHOIS_SUCCESS:
                        wbody = "\n".join(
                            t
                            for k, t, r, o in web.get(curi.canonical, [])
                            if k == "text" and t
                        )
                        wref = _whois.referral_from_body(whois_q, wbody)
                        if wref is not None:
                            whois_referrals[wref[0]] = wref[1]
                # futureUris: successful non-prerequisite fetches re-visit
                # at round_start + interval (prereq detection only exists
                # when the precondition gate runs — engine parity)
                gate_active = cfg.robots == "obey" or cfg.dns == "obey"
                if cfg.recrawl_interval_ms >= 0 and disposition == "success" and not (
                    gate_active and (is_dns or is_robots)
                ):
                    from dataclasses import replace as _replace

                    futures.append(
                        (T + cfg.recrawl_interval_ms, _replace(curi, fetch_attempts=0))
                    )
                # TrapSuppressExtractor: payload identical to the via's
                # archived payload -> suppress extraction + annotate.
                # archived state is previous-rounds-only in the engine; a
                # parent can never be fetched in its child's round, so the
                # inline update below is equivalent.
                trap = False
                if cfg.trap_suppress and 200 <= status < 300:
                    content_here = (
                        tuple(web[curi.canonical]) if curi.canonical in web else None
                    )
                    size_here = (
                        sum(len(t or "") + len(r or "") for k, t, r, o in content_here)
                        if content_here
                        else 0
                    )
                    if (
                        content_here is not None
                        and size_here > 0
                        and curi.via is not None
                        and archived.get(canonicalize(curi.via)) == content_here
                    ):
                        trap = True
                        prev_t = row.get("annotation")
                        row["annotation"] = (
                            (prev_t + ",") if prev_t else ""
                        ) + "trapSuppressExtractor"
                    if content_here is not None:
                        archived[curi.canonical] = content_here
                extract_ok = 200 <= status < 400 or (
                    cfg.process_error_outlinks and status >= 100
                )
                if extract_ok and not trap:
                    # ExtractorHTML.shouldExtract mime gate: on non-HTML
                    # pages only 'location' (ExtractorHTTP header) spans
                    # survive — law shared with CrawlConfig.mime_extract_gate
                    spans_src = web.get(curi.canonical, [])
                    if cfg.mime_extract_gate and not _mime.html_extract_gate(ct):
                        spans_src = [s for s in spans_src if s[0] == "location"]
                    if cfg.forms == "on":
                        # ExtractorHTMLForms (ExtractorHTMLForms.java:142-169)
                        # over "form" spans (the A_FORM_OFFSETS regions);
                        # save login-seeming forms (or all). The processor
                        # side runs at round end in ordinal order — engine
                        # window parity.
                        saved = []
                        for k2, t2, r2, o2 in spans_src:
                            if k2 != "form" or t2 is None:
                                continue
                            f = _forms.parse_form(t2)
                            if f.seems_login_form() or cfg.extract_all_forms:
                                saved.append(f)
                        if saved:
                            round_form_events.append((curi, row, saved))
                    for kind, text, ref, offset in spans_src:
                        if kind not in ("link", "img", "script", "css", "media", "location"):
                            continue
                        if ref is None or ref.startswith("data:"):
                            continue
                        hop = (
                            "L" if kind == "link" else "R" if kind == "location" else "E"
                        )
                        url = _resolve(curi.canonical, ref)
                        candidates.append(
                            (
                                curi.ordinal, offset, url,
                                _ehp(curi.hops_path, hop), curi.uri, NORMAL,
                                curi.is_seed, False, curi.data,
                            )
                        )
                    if cfg.text_extractors:
                        # text-extractor tail: chain outputs follow the span
                        # links, outlink_index continuing from the span count
                        from heritrix3_spark.operators.extract import (
                            _extract_universal_one,
                            _extract_xml_one,
                            _py_resolve,
                            _speculative_fixup,
                            looks_like_xml,
                        )

                        # the engine's gate filters pages.spans, which also
                        # feeds the text chain: body + index base shrink
                        spans_here = spans_src
                        body = "\n".join(
                            t for k, t, r, o in spans_here
                            if k == "text" and t is not None
                        )
                        idx2 = len(spans_here)
                        links2: list[tuple] = []
                        for name in cfg.text_extractors:
                            if name == "xml" and looks_like_xml(
                                body, uri=curi.canonical
                            ):
                                links2 += [
                                    (_py_resolve(curi.canonical, x), h)
                                    for x, c, h in _extract_xml_one(body)
                                ]
                            elif name == "universal":
                                links2 += [
                                    (
                                        _py_resolve(
                                            curi.canonical,
                                            _speculative_fixup(x, curi.canonical),
                                        ),
                                        h,
                                    )
                                    for x, c, h in _extract_universal_one(body)
                                ]
                        for url2, hop2 in links2:
                            candidates.append(
                                (
                                    curi.ordinal, idx2, url2,
                                    _ehp(curi.hops_path, hop2), curi.uri, NORMAL,
                                    curi.is_seed, False, curi.data,
                                )
                            )
                            idx2 += 1
                if cfg.ftp == "on" and scheme == "ftp":
                    # FetchFTP link laws (FetchFTP.java:470-478): fetch-side
                    # — no mime gate, no trap suppression, and the parent
                    # link fires on EVERY completed ftp fetch (even a failed
                    # RETR); listing children only from 2xx directories
                    listing = None
                    if 200 <= status < 300:
                        lt = [
                            t for k, t, r, o in web.get(curi.canonical, [])
                            if k == "listing" and t is not None
                        ]
                        if lt:
                            listing = "\n".join(lt)
                    for i, url in enumerate(
                        _ftp.ftp_extract(
                            curi.canonical, listing,
                            cfg.ftp_extract_from_dirs, cfg.ftp_extract_parent,
                        )
                    ):
                        candidates.append(
                            (
                                curi.ordinal, i, url,
                                _ehp(curi.hops_path, "L"), curi.uri, NORMAL,
                                curi.is_seed, False, curi.data,
                            )
                        )
                if (
                    cfg.whois == "on"
                    and not is_dns
                    and not is_whois
                    and server is not None
                    and status >= 100
                ):
                    # addWhoisLinks (FetchWhois.java:437-460): fetch-chain
                    # position (before the extractors) -> negative outlink
                    # indices sort the 0-2 'I' links ahead of every
                    # content-derived link; fires for any completed fetch
                    # (FetchWhois runs before FetchHTTP, so even a 404's
                    # chain pass added them)
                    wip = _whois.host_ip(server, cfg.dns == "obey")
                    for wi, wuri in enumerate(
                        _whois.whois_targets(server, wip)
                    ):
                        candidates.append(
                            (
                                curi.ordinal, -3 + wi, wuri,
                                _ehp(curi.hops_path, "I"), curi.uri, NORMAL,
                                curi.is_seed, False, curi.data,
                            )
                        )
            q.pending.extend(requeue)
            # the last fetch's bandwidth floor carries into the next round
            q.wake_time = max(t_host, bw_next)
            budget = overlay(ck, "total_budget", cfg.total_budget)
            if budget >= 0 and q.total_expenditure >= budget:
                q.retired = True  # isOverTotalBudget -> retireQueue
        # QuotaEnforcer end-of-round: forceRetire marks + FetchStats tally
        # in ordinal order (novelty = first occurrence of a content digest,
        # in-round then cross-round — matches the engine's window law)
        for rk in retire_marks:
            queues[rk].retired = True
        auth_promoted |= round_promotions
        form_auth |= round_form_auth
        # round-end Set-Cookie application: serial add order (ordinal,
        # then span position via the stable sort), replace by key, and
        # the 50/domain cap on NEW keys (BdbCookieStore.java:52,288-304;
        # engine: later-add-wins window + cap-gated merge-on-read upsert)
        for _ord, c in sorted(pending_cookies, key=lambda x: x[0]):
            cookie_store.add(c)
        # FormLoginProcessor (FormLoginProcessor.java:204-296) in serial
        # fetch order (= ordinal order — the engine's per-province window):
        # "form:" annotations for every saved form; when a non-blank-username
        # sheet applies and the page saved a login-seeming form, seen += 1
        # and the FIRST such page per province ever attempts — one 'S'
        # SUBMIT hop candidate with HTTP_POST A_SUBMIT_DATA, HIGH,
        # forceFetch; later eligible pages annotate nosubmit:<status>
        for curi, row, saved in sorted(round_form_events, key=lambda e: e[0].ordinal):
            anns = [f.as_annotation() for f in saved]
            entry = _forms.login_entry_for(surt(curi.canonical), cfg.form_login)
            lform = next((f for f in saved if f.seems_login_form()), None)
            if entry is not None and lform is not None:
                prefix, user, pw = entry
                m_root = _re.match(r"^([^:/?#]+://[^/?#]*)", curi.canonical)
                root_surt = surt(m_root.group(1) + "/") if m_root else ""
                province = _forms.form_province(prefix, root_surt)
                st = form_provinces.setdefault(province, [0, 0])
                st[1] += 1  # eligibleFormsSeenCount BEFORE the attempt check
                if st[0] < 1:
                    st[0] += 1
                    # createFormSubmissionAttempt (:261-282): ACTION (or the
                    # page URI) as an 'S' hop, form/@action context, HIGH,
                    # forceFetch; A_SUBMIT_DATA/ENCTYPE ride the data map
                    submit_url = (
                        _resolve(curi.canonical, lform.action)
                        if lform.action is not None
                        else curi.uri
                    )
                    data = dict(curi.data or {})
                    data.pop(_forms.SUBMIT_DATA_KEY, None)
                    data.pop(_forms.SUBMIT_ENCTYPE_KEY, None)
                    data[_forms.SUBMIT_DATA_KEY] = _json.dumps(
                        lform.form_data(user, pw)
                    )
                    if lform.enctype is not None:
                        data[_forms.SUBMIT_ENCTYPE_KEY] = lform.enctype
                    candidates.append(
                        (
                            curi.ordinal, 10**9, submit_url,
                            _ehp(curi.hops_path, "S"), curi.uri, HIGH,
                            curi.is_seed, True, data,
                        )
                    )
                    anns.append(
                        "submit:"
                        + (lform.action if lform.action is not None else "null")
                    )
                else:
                    anns.append(
                        "nosubmit:" + _forms.submit_status(st[0], st[1], province)
                    )
            if anns:
                prev = row.get("annotation")
                row["annotation"] = ((prev + ",") if prev else "") + ",".join(anns)
        if stats_on or cfg.digest_history:
            for ordinal, server, ck2, status, content, size, row in sorted(
                round_fetches, key=lambda r: r[0]
            ):
                is_succ = row["disposition"] == "success"
                if content is None or size == 0:
                    # payload-less: novel only for successes (engine
                    # FetchStats law: novelty is a success-side split)
                    novel = is_succ
                elif content in digests_seen:
                    novel = False
                else:
                    novel = True
                    digests_seen.add(content)
                # IdenticalPayloadDigestRevisit annotation (duplicate digest
                # with an actual payload -> "duplicate:digest")
                if cfg.digest_history and content is not None and size > 0 and not novel:
                    prev = row.get("annotation")
                    if prev and prev.startswith("receivedFromAMQP"):
                        row["annotation"] = (
                            "receivedFromAMQP,duplicate:digest"
                            + prev[len("receivedFromAMQP"):]
                        )
                    else:
                        row["annotation"] = "duplicate:digest" + (
                            "," + prev if prev else ""
                        )
                if cfg.source_quotas and is_succ:
                    # per-source CrawledBytesHistotable accumulate
                    # (CrawledBytesHistotable.java:55-68, successes only):
                    # notModified=304 first, then dupByHash, else novel
                    tag_s = row.get("source_tag")
                    if tag_s is not None:
                        nm_s = status == 304
                        dup_s = (
                            not nm_s and content is not None and size > 0
                            and not novel
                        )
                        sst = source_stats.setdefault(
                            tag_s,
                            dict(novel=0, novel_count=0, dup_bytes=0,
                                 dup_count=0, nm_bytes=0, nm_count=0),
                        )
                        if nm_s:
                            sst["nm_bytes"] += size
                            sst["nm_count"] += 1
                        elif dup_s:
                            sst["dup_bytes"] += size
                            sst["dup_count"] += 1
                        else:
                            sst["novel"] += size
                            sst["novel_count"] += 1
                if not (quotas or cfg.host_quotas):
                    continue
                for cat, key in (
                    ("server", server),
                    ("host", server.split(":")[0]),
                    ("group", ck2),
                ):
                    st = quota_stats.setdefault(
                        (cat, key),
                        dict(successes=0, responses=0, success_bytes=0,
                             all_bytes=0, novel_bytes=0, novel_urls=0),
                    )
                    counts_resp = is_succ or status > 0
                    st["successes"] += 1 if is_succ else 0
                    st["responses"] += 1 if counts_resp else 0
                    st["success_bytes"] += size if is_succ else 0
                    st["all_bytes"] += size if counts_resp else 0
                    if novel:
                        st["novel_bytes"] += size
                        st["novel_urls"] += 1
        # AMQPUrlReceiver injection (runCandidateChain analog): messages
        # delivered at round rnd enter this round's candidate phase,
        # ordered before every discovered outlink (parent_ordinal -1,
        # message order) — engine parity with receive_urls + run_round
        if cfg.amqp == "on" and amqp_messages:
            for i, body in enumerate(amqp_messages.get(rnd, ())):
                m = _amqp.parse_message(body, cfg.amqp_force_fetch)
                if m is None:
                    continue
                candidates.append(
                    (-1, i, m["uri"], m["hops_path"], m["via"],
                     m["sched_directive"], False, m["force"], m["data"])
                )
        # candidate processing in discovery order (prereqs sort first: -1)
        candidates.sort(key=lambda c: (c[0], c[1]))
        pending_prefixes: list[str] = []
        forced_prereqs_round: set[str] = set()
        for (
            parent_ord, idx, url, hops, via, cur_directive, parent_is_seed,
            force_hint, parent_data,
        ) in candidates:
            # seedsRedirectNewSeeds pre-scope mark (CandidatesProcessor law)
            promoted = (
                cfg.seeds_redirect_new_seeds
                and parent_is_seed
                and hops.endswith("R")
                and len(hops) < 5
            )
            if (
                cfg.amqp == "on"
                and parent_data
                and _amqp.SEED_KEY in parent_data
            ):
                # message isSeed -> checkForSeedPromotion path (forceFetch,
                # MEDIUM-if-NORMAL, addSeed announce)
                promoted = True
            in_scope = _scope_ok(url, hops, prefixes, cfg.max_hops)
            if cfg.seed_accept and promoted:
                in_scope = True  # SeedAcceptDecideRule (late position)
            if not in_scope:
                continue
            directive = _directive(hops, cur_directive, cfg.preference_embed_hops)
            if promoted and directive == NORMAL:
                directive = MEDIUM  # checkForSeedPromotion :270-278
            canonical = canonicalize(url)
            # CrawlMapper check-outlinks (CrawlMapper.java:215-233): a
            # post-scope candidate mapped to another node is removed before
            # the uniq filter (never marked seen — the other node crawls it)
            if cfg.crawl_mapper != "off" and cfg.mapper_check_outlinks:
                ckc = _class_key_of(canonical, hops, via)
                tgtc = _mapper_target(ckc)
                if tgtc != cfg.mapper_local_name:
                    _divert(rnd, tgtc, ckc, url, hops, via)
                    continue
            # forceFetch: promoted seed (HER-1891) or redirect-canonical
            # collision (FrontierPreparer.java:236-256)
            collision = (
                hops.endswith("R")
                and via is not None
                and canonical == canonicalize(via)
                and url != via
            )
            force = (promoted and via is not None) or collision or force_hint
            if force_hint and not hops.endswith("S"):
                # expiry-forced prerequisite: first discovery this round
                # wins (serial one-refetch-per-validity-window analog).
                # Form-submit hops ('S') force WITHOUT the prereq dedup —
                # the engine's is_forced_prereq checks via_context=="prereq"
                if canonical in forced_prereqs_round:
                    continue
                forced_prereqs_round.add(canonical)
            scheduled = schedule(
                url, hops, via, promoted, directive, force=force,
                data=parent_data, keep_amqp=parent_ord < 0,
            )
            if scheduled and promoted:
                s = surt(canonical)
                i = s.find(")")
                if i != -1:
                    p = s[: i + 1]
                    if p.startswith("https://"):
                        p = "http://" + p[len("https://") :]
                    pending_prefixes.append(p)
        # addSeed announce lands at round end (engine-parity law)
        for p in pending_prefixes:
            if p not in prefixes:
                prefixes.append(p)
        # CrawlLimitEnforcer.checkForLimitsExceeded (:145-163) — LAST in
        # the round (the engine finishes the round, then stops): same
        # cumulative definitions and check order. Runs after the digest
        # loop so duplicate:digest annotations are visible.
        if limits_on:
            for lr in log[round_log_start:]:
                st = lr["fetch_status"]
                if st is None or st < 200:
                    continue
                cl = lr.get("content_length") or 0
                crawl_stats["bytes"] += cl
                if lr["disposition"] == "success" and "duplicate:digest" not in (
                    lr.get("annotation") or ""
                ):
                    crawl_stats["novel_urls"] += 1
                    crawl_stats["novel_bytes"] += cl
            crawl_stats["fetched"] += round_taken
            if (
                cfg.max_bytes_download > 0
                and crawl_stats["bytes"] >= cfg.max_bytes_download
            ):
                break
            if (
                cfg.max_novel_bytes > 0
                and crawl_stats["novel_bytes"] >= cfg.max_novel_bytes
            ):
                break
            if cfg.max_fetches >= 0 and crawl_stats["fetched"] >= cfg.max_fetches:
                break
            if (
                cfg.max_novel_urls > 0
                and crawl_stats["novel_urls"] >= cfg.max_novel_urls
            ):
                break
            if cfg.max_time_seconds > 0 and T >= cfg.max_time_seconds * 1000:
                break

    if diversions is not None:
        for (rnd_k, tgt_k, _fpv), line in sorted(divert_round.items()):
            diversions.append((rnd_k, tgt_k, line))
    return log, seen


def _resolve(base: str, ref: str) -> str:
    import re as _re

    if _re.match(r"^[a-zA-Z][\w+\-.]*:", ref):
        return ref
    m = _re.match(r"^([^:/?#]+://[^/?#]*)([^?#]*)", base)
    origin, path = m.group(1), m.group(2)
    if ref.startswith("/"):
        return origin + ref
    d = path.rfind("/")
    dir_part = path[: d + 1] if d >= 0 else "/"
    return origin + dir_part + ref
