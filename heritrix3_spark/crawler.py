"""The crawl engine — a driver-side loop of macro-batch DataFrame rounds.

Replaces Heritrix's ToeThreads + managerThread + BerkeleyDB frontier
(/root/reference/engine/src/main/java/org/archive/crawler/frontier/
 WorkQueueFrontier.java:581-738, 927-1029; framework/ToeThread.java:123-180)
with deterministic set operations over snapshot tables:

  frontier    — pending URIs (FRONTIER_SCHEMA), the per-host queues
  url_seen    — host-bucketed fingerprints (operators/urlseen.py)
  host_state  — per-class_key wake_time / expenditure / retired
  crawl_log   — per-URI disposition rows (crawl.log analog)
  journal     — F+/Fe/Fs/Ff/Fd/Fr event tags (FrontierJournal analog,
                engine/.../frontier/FrontierJournal.java:54-115)

One round = ONE DataFrame DAG: eligibility filter -> per-queue window
head-pick -> synthetic/pluggable fetch -> span extraction (explode) ->
scope fold -> preparation columns -> bloom+anti-join dedup -> deterministic
ordinal assignment -> state merge. The round semantics contract is
documented in :mod:`heritrix3_spark.simulator` and both implementations
must agree exactly.

Scale design (10^10-URL frontier):
* no global sorts: the head-pick window partitions by class_key; ordinal
  assignment is a range-partitioned two-pass rank (per-partition offsets),
  not a single-partition window;
* the frontier and url_seen stay bucketed by host so the per-round joins
  co-partition; AQE splits residual hot-host skew;
* per-round candidate volume is bounded by k × |eligible hosts|;
* every round commits new table snapshots + a checkpoint marker — resume
  reads the last checkpoint and time-travels the tables (CheckpointService
  analog, engine/.../framework/CheckpointService.java:93-310).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from heritrix3_spark.functions import mime as MIME
from heritrix3_spark.operators import auth as AUTH
from heritrix3_spark.functions.canonicalize import canonical_col
from heritrix3_spark.functions.surt import class_key_col, server_key_col
from heritrix3_spark.operators import frontier as FR
from heritrix3_spark.operators import mapper as MAP
from heritrix3_spark.operators import scope as SC
from heritrix3_spark.operators.extract import extract_outlinks_from_spans
from heritrix3_spark.operators.urlseen import UrlSeen, fp_udf
from heritrix3_spark.sources.seeds import seeds_from_lines
from heritrix3_spark.storage import (
    MergeOnReadTable,
    SnapshotCatalog,
    TimeBucketedAppendTable,
)

_TIMING = bool(__import__("os").environ.get("H3S_TIMING"))


class _Timer:
    def __init__(self, sc=None):
        import time as _t

        self._t = _t
        self.last = _t.time()
        self._sc = sc
        self._jobs = self._job_count()

    def _job_count(self) -> int:
        if self._sc is None:
            return 0
        try:
            ids = self._sc.statusTracker().getJobIdsForGroup(None)
            return max(ids) + 1 if ids else 0
        except Exception:
            return 0

    def mark(self, label: str) -> None:
        if _TIMING:
            now = self._t.time()
            jobs = self._job_count()
            dj = f" ({jobs - self._jobs} jobs)" if self._sc is not None else ""
            print(f"    [h3s] {label}: {now - self.last:.2f}s{dj}", flush=True)
            self.last = now
            self._jobs = jobs

HOST_STATE_SCHEMA = StructType(
    [
        StructField("class_key", StringType(), False),
        StructField("wake_time", LongType(), False),
        StructField("total_expenditure", LongType(), False),
        StructField("error_count", LongType(), False),
        StructField("retired", StringType(), False),  # 'y'/'n' (parquet-friendly)
    ]
)


@dataclass
class CrawlConfig:
    k_per_host: int = 1
    max_hops: int = 20
    fetch_duration_ms: int = 100
    delay_factor: float = 5.0
    min_delay_ms: int = 3000
    max_delay_ms: int = 30000
    error_penalty: int = 100
    total_budget: int = -1
    max_rounds: int = 10_000
    preference_embed_hops: int = 1
    num_buckets: int = 32
    bloom: bool = True
    # URL-seen prefilter family (north rule "bloom/cuckoo-filter URL-seen"):
    # "bloom" = per-bucket bloom shards (~1% fp, 10 bits/key);
    # "cuckoo" = per-bucket cuckoo-filter shards (Fan et al. 2014; ~0.01%
    # fp at ~19 bits/key, true deletion on forget). Both probe via the same
    # cogrouped never-broadcast shape; `bloom=False` disables either.
    seen_filter: str = "bloom"
    # engage the prefilter probe only once the seen set is at least this
    # big (below it the exact anti-join alone is cheaper than the extra
    # cogroup stage); tests set 0 to exercise the probe immediately
    prefilter_min_seen: int = 200_000
    ordinal_partitions: int = 8
    # round-end state commits (events / frontier / url_seen / dns / robots /
    # host_state / ...) write DIFFERENT snapshot tables from the SAME
    # materialized round frames, so their Spark jobs are independent:
    # submit up to this many chains concurrently from a driver thread pool
    # (guide §2.6 — a later job's tasks back-fill executors freed by the
    # tail of the current one; at narrow-round scale it collapses the
    # serial sum of per-job latencies). 0/1 = serial (debug escape hatch).
    parallel_commits: int = 4
    # robots policy: "ignore" (IgnoreRobotsPolicy) or "obey" (ObeyRobotsPolicy
    # + PreconditionEnforcer.considerRobotsPreconditions semantics,
    # prefetch/PreconditionEnforcer.java:204-251): unknown robots -> inject a
    # /robots.txt prerequisite ('P' hop, HIGHEST) and DEFER the trigger URI;
    # disallowed -> S_ROBOTS_PRECLUDED disregard; crawl-delay raises politeness
    robots: str = "ignore"
    user_agent: str = "heritrix3-spark"
    # DNS preconditions (PreconditionEnforcer.considerDnsPreconditions,
    # prefetch/PreconditionEnforcer.java:274-305): "obey" -> a URI whose
    # host has no DNS entry is DEFERRED and a `dns:host` prerequisite is
    # injected ('P' hop, HIGHEST, trigger's queue). DNS lookups always
    # succeed in the synthetic fetch (status S_DNS_SUCCESS=1); entry expiry
    # (ipValidityDurationSeconds) is not modeled (no wall clock).
    dns: str = "ignore"
    # session budget (balanceReplenishAmount, WorkQueueFrontier.java:119-127):
    # in the macro-batch model every round re-activates a queue (replenish),
    # so the budget caps a queue's spend per active round: emitted URIs per
    # queue <= min(k_per_host, session_budget/unit_cost)
    session_budget: int = 3000
    metrics: bool = True
    # queue precedence policy (frontier/precedence/*.java): "base" = constant
    # 3 (BaseQueuePrecedencePolicy, the Heritrix default — the floor never
    # binds); "highest_uri" recomputes queue precedence per round as
    # base + min pending URI precedence (HighestUriQueuePrecedencePolicy).
    # Queues at or above precedence_floor are never activated
    # (WorkQueueFrontier.java:165-171, 595-601).
    queue_precedence: str = "base"
    queue_precedence_base: int = 1
    precedence_floor: int = 255
    # CrawlLimitEnforcer (framework/CrawlLimitEnforcer.java): stop the crawl
    # once this many URIs have been fetched (-1 = unlimited).
    # maxDocumentsDownload -> FINISHED_DOCUMENT_LIMIT.
    max_fetches: int = -1
    # the rest of the CrawlLimitEnforcer limit family (CrawlLimitEnforcer
    # .java:145-163; checked at round end against cumulative crawl stats,
    # FIRST matching limit in the reference's order wins):
    # bytesProcessed -> FINISHED_DATA_LIMIT; novelBytes / warcNovelBytes ->
    # FINISHED_DATA_LIMIT; novelUriCount / warcNovelUriCount ->
    # FINISHED_DOCUMENT_LIMIT; elapsed >= max_time_seconds*1000 ->
    # FINISHED_TIME_LIMIT. 0 = off. Novelty is the duplicate:digest split
    # (digest_history off -> every 2xx success is novel); warc counts ride
    # the WARC-writer "response" stats (the warc_limits machinery, which
    # counts non-revisit persisted records).
    max_bytes_download: int = 0
    max_novel_bytes: int = 0
    max_warc_novel_bytes: int = 0
    max_novel_urls: int = 0
    max_warc_novel_urls: int = 0
    max_time_seconds: int = 0
    # WARCLimitEnforcer (contrib postprocessor/WARCLimitEnforcer.java:
    # 88-113): {record_type: {stat_key: limit}} over the WARC-writer
    # running stats, mirroring BaseWARCWriterProcessor.getStats()'s
    # {"response"|"revisit"|"totals": {"numRecords"|"contentBytes"|
    # "totalBytes": n}} shape. Checked at round end against totals
    # accumulated from each round's documents-sink batch; any stat at or
    # past its limit stops the crawl with FINISHED_WRITE_LIMIT. A
    # "revisit" record is a duplicate:digest rewrite (requires
    # digest_history=True; without it every persisted record counts as
    # "response"). Empty dict = off.
    warc_limits: dict = field(default_factory=dict)
    # URIAuthorityBasedQueueAssignmentPolicy parallelQueues: split each
    # authority into N sub-queues keyed by first path segment (hot-host
    # salting, the reference's own skew defeat). 1 = off (exact parity).
    parallel_queues: int = 1
    # futureUris / rescheduleTime (WorkQueueFrontier.checkFutures
    # :743-760, CrawlURI.rescheduleTime :1650-1653): >=0 re-schedules every
    # successful non-prerequisite fetch for a forced re-visit at
    # round_start_clock + interval; matured futures re-enter their queue
    # (same ordinal, attempts reset) at the start of the first round whose
    # clock has reached their reschedule_time. -1 = off.
    recrawl_interval_ms: int = -1
    # QuotaEnforcer (prefetch/QuotaEnforcer.java:62-81, 389-463): the 18
    # {server,host,group} x {MaxFetchSuccesses, MaxSuccessKb,
    # MaxFetchResponses, MaxAllKb, MaxNovelKb, MaxNovelUrls} quota keys,
    # reference camelCase names, e.g. (("serverMaxFetchSuccesses", 3),).
    # (The reference's group novel keys literally alias the server names —
    # a bug we do NOT replicate: use groupMaxNovelKb/groupMaxNovelUrls.)
    # A quota >= 0 binds when the accumulated stat reaches it, evaluated at
    # emit time against ROUND-START stats (the macro-batch analog of the
    # serial prefetch check; documented divergence: a serial crawler sees
    # same-round increments). group == the frontier queue (class_key),
    # matching frontier.getGroup(curi); dns: URIs are exempt (no DNS server
    # model). KB metrics integer-divide accumulated BYTES by 1024 at check
    # time, exactly like QuotaEnforcer.checkQuotas.
    quotas: tuple = ()
    # forceRetire (QuotaEnforcer.java:346-361, default true): an over-quota
    # URI retires its queue WITHOUT being disposed (re-queued, no log row);
    # False marks it S_BLOCKED_BY_QUOTA -> disposed as failure.
    force_retire: bool = True
    # seedsRedirectNewSeeds (CandidatesProcessor.java:88,117,186-194,
    # 270-278, default true): a candidate discovered from a seed via an 'R'
    # hop with hop count < 5 becomes a seed itself — forceFetch (HER-1891,
    # bypasses url-seen), NORMAL->MEDIUM, and its implied SURT prefix joins
    # the scope for subsequent rounds (addSeed announce; in the macro-batch
    # model the prefix lands at round end — documented divergence from the
    # serial in-batch announce).
    seeds_redirect_new_seeds: bool = True
    # SeedAcceptDecideRule (deciderules/SeedAcceptDecideRule.java:42) in the
    # late position: seeds always pass scope (needed for redirect-promoted
    # seeds on brand-new hosts; off = the reference's default chain).
    seed_accept: bool = False
    # cost policy (frontier/UnitCost|AntiCalendar|WagCostAssignmentPolicy):
    # "unit" (default) | "anticalendar" | "wag"
    cost_policy: str = "unit"
    # text-extractor tail in the fetch chain (FetchChain extractor order,
    # profile-crawler-beans.cxml:317-345): extractors to run over each
    # fetched page's joined text spans AFTER span-link extraction.
    # Supported: "xml" (ExtractorXML, gated on looks_like_xml),
    # "universal" (ExtractorUniversal, last-resort scan). Outlink order:
    # span links first (offset order), then chain outputs — index continues
    # from the span count so discovery order stays deterministic.
    text_extractors: tuple = ()
    # heritable data keys (CrawlURI.makeHeritable/inheritFrom,
    # CrawlURI.java:1360-1375, 1469-1483): the frontier carries a
    # ``data`` map<string,string>; every key in it is heritable — children
    # copy the parent's map at candidate creation (non-heritable data
    # never crosses a batch boundary in this engine, so only the heritable
    # subset is materialized). sourceTagSeeds (SeedModule.java:40-46)
    # stamps each seed with data['source_tag'] = its own URI, which then
    # rides to every descendant and feeds the SourceTagsReport.
    source_tag_seeds: bool = False
    # queue-assignment policy (frontier/*QueueAssignmentPolicy.java):
    # "surt" (SurtAuthority, the Heritrix default — supports
    # parallel_queues), "hostname" (HostnameQueueAssignmentPolicy),
    # "assignment_level" (AssignmentLevelSurt over the public-suffix
    # snapshot), "bucket" (BucketQueueAssignmentPolicy no-IP branch).
    # All policies inherit the base-policy law that prerequisites ride
    # their trigger's queue (URIAuthorityBasedQueueAssignmentPolicy
    # getCoreKey-on-basis, :89-145).
    queue_assignment: str = "surt"
    # CandidatesProcessor.processErrorOutlinks (postprocessor/
    # CandidatesProcessor.java:101-112, default false): error responses
    # (<200 or >=400, still real fetches) normally drop their outlinks;
    # true schedules them too
    process_error_outlinks: bool = False
    # TrapSuppressExtractor (TrapSuppressExtractor.java:50-73): a page
    # whose payload digest equals its via's archived digest is a suspected
    # crawler trap — outlink extraction is suppressed and the crawl log
    # row gets the reference's "trapSuppressExtractor" annotation
    trap_suppress: bool = False
    # content-digest history -> revisit dispositions (recrawl/
    # FetchHistoryProcessor + revisit/IdenticalPayloadDigestRevisit.java:
    # a success whose payload digest was already recorded is logged with
    # the reference's "duplicate:digest" annotation and feeds the
    # CrawledBytesHistotable novel/dupByHash split
    # (engine/.../util/CrawledBytesHistotable.java:36-63). Off by default,
    # like the reference's opt-in contentDigestHistory store.
    digest_history: bool = False
    # DNS/robots state expiry against the virtual clock
    # (PreconditionEnforcer.isIpExpired, prefetch/PreconditionEnforcer.java
    # :60, 327-360 — reference default 6h; CrawlServer.isRobotsExpired
    # :300-315 — reference default 24h). 0 = never expire (our default:
    # virtual-clock crawls cover far more than 6h of simulated politeness
    # time, so expiry is opt-in; set the reference defaults for wall-clock
    # deployments). An entry is stale when fetched_at + duration*1000 <
    # round-start clock; a stale entry re-defers its triggers and re-injects
    # the prerequisite with forceFetch (CrawlURI.markPrerequisite
    # :1717-1734 sets forceFetch on every prerequisite — that is what lets
    # an already-seen dns:/robots.txt URI re-enter the frontier).
    ip_validity_duration_s: int = 0
    robots_validity_duration_s: int = 0
    # ExtractorHTML.shouldExtract mime gate (ExtractorHTML.java:763-790):
    # when on, outlink extraction runs only over html/xhtml/wap-typed pages
    # (untyped payloads pass, mirroring the reference's <html content-sniff
    # fallback — the synthetic web's untyped payloads are HTML-shaped).
    # Off by default: the reference ships the gate inside ExtractorHTML,
    # but the parity suites' fixtures predate the content-type model.
    mime_extract_gate: bool = False
    # HTTP auth (operators/auth.py): auth_zones = ((server, path_prefix,
    # realm, login, password), ...) protect synthetic paths (the selftest
    # Jetty-constraint analog); credentials = ((domain, realm, login,
    # password), ...) is the CredentialStore. Empty = off. One realm per
    # server (documented subset — see auth.py docstring).
    auth_zones: tuple = ()
    credentials: tuple = ()
    # HtmlFormCredential analogs: ((domain, login_uri), ...) — pages on
    # ``domain`` defer behind a login-URI prerequisite until it has been
    # fetched successfully (PreconditionEnforcer.credentialPrecondition;
    # see operators/auth.py form section). One credential per domain.
    form_credentials: tuple = ()
    # maxPerHostBandwidthUsageKbSec (DispositionProcessor.java:275-291,
    # default 0 = off): after each fetch the host may not emit again before
    # fetch_end + content_bytes/(cap*1.024) ms; the post-fetch snooze is
    # raised to that floor. The carry into the next round rides in
    # wake_time (= max(serial clock, last earliestNextURIEmitTime)).
    max_per_host_bandwidth_kb: int = 0
    # seed-implied SURT-prefix scope representation (SurtPrefixSet at
    # scale): at or below this many seeds the acceptSurts rule compiles to
    # a plan-embedded InSet hash probe (O(1)/row, no join — the measured
    # winner at bench scale); above it the prefix set lives in a
    # ``seed_prefixes`` table and the rule becomes a broadcast semi-join on
    # the candidate's authority-level SURT, so the plan stays O(1) in seed
    # count (at 10^6 seeds the InSet literal was a ~10^7-byte expression
    # serialized into every task every round, plus an O(seeds) driver
    # collect at bootstrap and an O(seeds) JSON blob in every checkpoint).
    seed_prefix_inset_max: int = 4096
    # sheet overlays (org.archive.spring.Sheet / SheetOverlaysManager,
    # commons/.../spring/Sheet.java:50, profile-crawler-beans.cxml:691):
    # per-SURT-prefix config overrides, applied to a queue when its
    # class_key starts with the given SURT-authority prefix. Supported
    # overlay keys: "total_budget", "k_per_host".
    # e.g. [{"surt_prefix": "example,hot,", "total_budget": 5, "k_per_host": 2}]
    overlays: tuple = ()
    # Cookie model (AbstractCookieStore/BdbCookieStore; operators/
    # cookies.py): "obey" -> fetched pages' "set-cookie" spans (the
    # synthetic web's Set-Cookie header analog) land in a merge-on-read
    # `cookies` state table at round end, keyed by the reference's
    # sortableKey (domain;name;path), later-ordinal-wins within a round.
    # Visibility is round-start (the macro-batch law, like form_auth).
    # cookie_zones = ((server, path_prefix, cookie_name), ...) protect
    # synthetic paths: a non-dns fetch whose request-cookie set (host +
    # parent domains, path/secure/expiry matched — BdbCookieStore
    # .cookieStoreFor + the HTTP client's spec step) lacks cookie_name
    # answers 403 (after the auth gate; 401 wins). cookies_txt seeds the
    # store at bootstrap (Netscape format).
    cookies: str = "ignore"
    cookie_zones: tuple = ()
    cookies_txt: str = ""
    # RuntimeLimitEnforcer (prefetch/RuntimeLimitEnforcer.java:64-197):
    # once the crawl's elapsed virtual-clock runtime exceeds
    # runtime_limit_s (checked at round start — the macro-batch analog of
    # the reference's per-URI elapsed check), the configured operation
    # fires: "pause" stops the round loop resumably (requestCrawlPause —
    # raising the limit and re-running continues; re-running without
    # raising it pauses again immediately, the reference's documented
    # behavior), "terminate" stops with CrawlStatus.FINISHED_TIME_LIMIT,
    # "block" marks every URI emitted from then on
    # S_BLOCKED_BY_RUNTIME_LIMIT (-5004, a FAIL disposition — not in the
    # isDisregarded set) with the reference's "Runtime exceeded {ms}ms"
    # annotation, so queued URIs wind up in the crawl log. -1 = off.
    runtime_limit_s: int = -1
    runtime_limit_op: str = "pause"  # "pause" | "terminate" | "block"
    # CrawlMapper family (processor/CrawlMapper.java:196-296,
    # HashCrawlMapper.java:107-135, LexicalCrawlMapper.java:144-154;
    # operators/mapper.py): split one logical crawl across crawler nodes.
    # "hash" = abs(std64.fp(reduced class_key) % crawler_count) as the node
    # name; "lexical" = nearest mapping key lexically >= class_key (wrapping
    # to the first entry). check_uri: a due URI mapped to a non-local node
    # is S_BLOCKED_BY_CUSTOM_PROCESSOR (-5002, disregard) with the
    # reference's "to:<target>" annotation, BEFORE preconditions (early
    # prefetch position). check_outlinks: post-scope candidates mapped away
    # are dropped pre-url-seen (the other node crawls them). Both paths
    # append `<classKey> CrawlURI <uri> <hopsPath> <via>` lines to the
    # `diversions` table, deduped per round on (target, std64 uri fp) —
    # the recentlySeen law, minus its LRU eviction.
    crawl_mapper: str = "off"  # "off" | "hash" | "lexical"
    mapper_local_name: str = "."
    mapper_crawler_count: int = 1  # hash mode
    mapper_psl_reduce: bool = True  # hash mode usePublicSuffixesRegex default
    mapper_map: tuple = ()  # lexical mode ((key, crawler), ...)
    mapper_check_uri: bool = True
    mapper_check_outlinks: bool = True
    # Forms-discovery login machinery (modules/forms; operators/forms.py):
    # "on" runs the ExtractorHTMLForms analog over spans of kind "form"
    # (raw <form ...>...</form> markup — the A_FORM_OFFSETS region) on
    # extraction-eligible pages, saving login-seeming forms (or all, with
    # extract_all_forms) and adding the "form:P..." annotation. form_login
    # = ((applicable_surt_prefix, username, password), ...) — the
    # FormLoginProcessor sheets; the page's applicable entry is the
    # LONGEST prefix of its SURT form (most-specific sheet overlay). The
    # first login-seeming form in a *form province* (the prefix, or the
    # page's pathless-root SURT) triggers ONE synthesized submission:
    # the form ACTION as an 'S' SUBMIT hop, form/@action context, HIGH
    # directive, forceFetch, A_SUBMIT_DATA riding the frontier data map
    # (non-heritable — stripped at candidate inheritance except on the
    # submit row itself). Later eligible forms annotate
    # "nosubmit:<attempts>,<seen>,<province>". Province counts live in
    # the merge-on-read `form_provinces` table (checkpointable state,
    # FormLoginProcessor.java:298-315).
    forms: str = "off"  # "off" | "on"
    extract_all_forms: bool = False
    form_login: tuple = ()
    # FetchFTP extraction laws (operators/ftp.py; FetchFTP.java): "on"
    # extracts NLST listing children from ftp:// directory fetches (spans
    # of kind "listing"; URLEncoder form-encoding, 'L' NAVLINK hops) and
    # the parent URI from every completed ftp fetch; directory fetches
    # type as text/plain, files as application/octet-stream
    ftp: str = "off"  # "off" | "on"
    ftp_extract_from_dirs: bool = True  # extract.from.dirs
    ftp_extract_parent: bool = True  # extract.parent
    # Contrib HostQuotaEnforcer (contrib/.../prefetch/HostQuotaEnforcer
    # .java:1-135): ((host, apply_to_subdomains, ((fetchstats_key,
    # limit), ...)), ...). Each matched URI checks ITS OWN host's
    # substats (round-start state) against the entry's quotas; a binding
    # key blocks with -5003 + "hostQuota:<key>". Supported FetchStats
    # keys: fetchSuccesses fetchResponses successBytes totalBytes novel
    # novelCount. Entries/keys evaluate in config order (the reference
    # iterates a HashMap keySet — order unspecified there). dns: rows are
    # exempt (chain position, like QuotaEnforcer). Runs AFTER the standard
    # QuotaEnforcer; never forceRetires (ProcessResult.FINISH only).
    host_quotas: tuple = ()
    # AMQPUrlReceiver analog (contrib/.../frontier/AMQPUrlReceiver.java;
    # operators/amqp.py): "on" enables CrawlEngine.receive_urls(bodies) —
    # JSON messages parsed by the UrlConsumer law and unioned into the
    # NEXT round's candidate chain (runCandidateChain analog), ordered
    # before the round's own outlinks. 'I' hops get HIGH + uriPrecedence 1;
    # message isSeed takes the checkForSeedPromotion path; every injected
    # row is annotated receivedFromAMQP. amqp_force_fetch = the receiver's
    # forceFetch property (OR'd with each message's own flag).
    amqp: str = "off"  # "off" | "on"
    amqp_force_fetch: bool = False
    # FetchWhois (modules/fetcher/FetchWhois.java; operators/whois.py):
    # "on" adds the whois fetcher to the chain — every completed non-whois
    # fetch discovers 1-2 serverless whois: 'I'-hop outlinks (host IP +
    # topmost-assigned domain, fetch-chain position so they precede every
    # content link); serverless whois rows walk the referral-server
    # knowledge (deferOrFinishGeneric) via prerequisite whois://server/q
    # fetches whose responses feed the referral table. State lives in two
    # MergeOnReadTables (whois_referrals key->server, whois_progress
    # url->IN_PROGRESS/DONE), read at round start, pruned by the round's
    # bounded key set. whois_templates overrides the per-server special
    # query templates (() -> the reference defaults).
    whois: str = "off"  # "off" | "on"
    whois_templates: tuple = ()
    # Contrib SourceQuotaEnforcer (SourceQuotaEnforcer.java:1-111):
    # ((source_tag, ((histotable_key, limit), ...)), ...) over the
    # per-source CrawledBytesHistotable (StatisticsTracker.tallySourceStats
    # — SUCCESS dispositions only; novel/dupByHash split by payload-digest
    # revisit, notModified = 304). Blocks only once the source's stats
    # exist (shouldProcess: getSourceStats != null). Annotation
    # "sourceQuota:<key>". Host quotas win overlap (host-then-source
    # chain order, documented).
    source_quotas: tuple = ()


class CrawlEngine:
    #: fold merge-on-read deltas / append chains into a fresh base snapshot
    #: after this many chained commits (Iceberg rewrite_data_files cadence):
    #: keeps read-side file counts and delta-merge key sets bounded while
    #: amortizing the O(table) rewrite over COMPACT_EVERY rounds
    COMPACT_EVERY = 32
    #: rebuild the cross-round host view from the parquet table every K
    #: rounds. Spark 4's Dataset.checkpoint copies the ORIGIN plan's
    #: estimated statistics into the LogicalRDD (rewriteStatsAndConstraints,
    #: ExistingRDD.scala:200-264) instead of resetting them to leaf
    #: defaults, so a view carried round-over-round closes a feedback loop:
    #: each round's join estimates MULTIPLY the carried frame's sizeInBytes
    #: into the next carried frame's, the BigInt's bit length grows
    #: geometrically (~2x/round), and by ~round 30 the driver spends
    #: minutes in BigInteger math before java.math.BigInteger overflows
    #: ("BigInteger would overflow supported range" at a localCheckpoint).
    #: A periodic parquet re-read resets the chain to file-based leaf
    #: stats; at K=8 the carried estimate stays ~10^4 bits (microseconds).
    HOSTS_VIEW_RESET_EVERY = 8

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        web: DataFrame,
        config: CrawlConfig | None = None,
        fetch_status_overrides: DataFrame | None = None,
    ):
        """``web``: documents(doc_id, spans) — the synthetic/test fetch
        universe. In production the fetch stage is a pluggable mapInPandas
        over due URIs (async HTTP pool per partition); here it is a join
        against ``web`` (status 200) with missing pages -> 404.
        ``fetch_status_overrides``: optional (canonical, status) to inject
        failures for retry/disregard-path tests.
        """
        self.spark = spark
        self.catalog = SnapshotCatalog(state_dir)
        self.web = web
        self.cfg = config or CrawlConfig()
        self.urlseen = UrlSeen(
            self.catalog,
            num_buckets=self.cfg.num_buckets,
            bloom=self.cfg.bloom,
            bloom_min_seen=self.cfg.prefilter_min_seen,
            kind=self.cfg.seen_filter,
        )
        # frontier is merge-on-read keyed by ordinal (the row's unique id —
        # fp can twin under forceFetch): novel rows ride the insert fast
        # path, emitted rows tombstone, retries/quota-requeues upsert.
        # Per-round write cost is O(delta) not O(table) (round-2 verdict #1
        # scale cost; Iceberg-MERGE analog, see storage.MergeOnReadTable).
        self.frontier_t = MergeOnReadTable(self.catalog, "frontier", "ordinal")
        # host_state is merge-on-read by class_key: a round only touches the
        # queues that emitted, matured futures, or received novel URIs —
        # O(touched)/round writes instead of O(hosts) (at 10^8 hosts the
        # full rewrite was the last remaining O(table)/round cost)
        self.host_t = MergeOnReadTable(self.catalog, "host_state", "class_key")
        # one append-only event table per crawl: journal tags F+/Fs/Fr/Fd/Ff
        # (FrontierJournal analog) + crawl.log disposition fields in one row
        self.events_t = self.catalog.table("events")
        # fetched-payload sink: the WARC-record-chain analog
        # (modules/.../writer/WARCWriterChainProcessor.java:59-160) — one row
        # per successful fetch with the page's ordered span sequence and a
        # sha1 content digest (FetchHTTP digestContent, FetchHTTP.java:121-130)
        self.documents_t = self.catalog.table("documents_out")
        # per-server robots state (CrawlServer.robotsFetched/robotstxt,
        # modules/.../net/CrawlServer.java:157-190): body = "" means a
        # non-2xx robots fetch -> NO_ROBOTS, allow all. Merge-on-read by
        # server: refetches (expiry / rediscovered robots.txt links)
        # upsert; latest body wins at read.
        self.robots_t = MergeOnReadTable(self.catalog, "robots", "server")
        # per-round crawl snapshot rows (StatisticsTracker analog)
        self.metrics_t = self.catalog.table("metrics")
        # resolved hosts (CrawlHost/BdbServerCache analog), merge-on-read
        self.dns_t = MergeOnReadTable(self.catalog, "dns", "host")
        # futureUris held for forced re-visit (WorkQueueFrontier.futureUris
        # sorted map analog): FRONTIER_SCHEMA + reschedule_time. Each round
        # schedules ONE batch (single reschedule_time) and maturation drains
        # whole batches, so the table is time-bucketed append-only:
        # O(scheduled) writes, O(matured) maturation reads, O(1)-metadata
        # drops, min via sidecar metadata — never an O(table) rewrite/scan
        # even with recrawl on at 10^9 URIs (round-3 verdict wrong #1).
        self.futures_t = TimeBucketedAppendTable(
            self.catalog, "futures", "reschedule_time"
        )
        # QuotaEnforcer FetchStats substats per (cat, key): cat in
        # server/host/group (FetchStats.tally law, modules/.../fetcher/
        # FetchStats.java:66-106); bytes stored raw, KB derived at check
        self.quota_t = self.catalog.table("quota_stats")
        # content-digest history (BdbContentDigestHistory analog) — drives
        # the novel-vs-revisit split in quota stats (§2.12 revisit wiring)
        self.digest_t = self.catalog.table("digest_seen")
        # server-promoted credentials (FetchHTTP.promoteCredentials →
        # CrawlServer credential set analog): (server, realm) rows,
        # append-only + distinct-at-read — promotion is monotone and the
        # table is bounded by |servers| x |store realms|
        self.auth_t = self.catalog.table("auth_state")
        # CrawlMapper diversion log (CrawlMapper.divertLog analog): one
        # append per round of (round, target, fp, line) rows
        self.divert_t = self.catalog.table("diversions")
        # cookie store (BdbCookieStore analog): merge-on-read by the
        # sortableKey — a round upserts only the cookies it set (O(delta));
        # reads are semi-join-pruned to the round's host+parent-domain set
        self.cookie_t = MergeOnReadTable(self.catalog, "cookies", "key")
        # seed-implied scope prefixes at 10^6-seed scale: the driver list
        # (InSet mode) is swapped for this table + a broadcast semi-join
        # when the seed count exceeds cfg.seed_prefix_inset_max
        self.seed_prefix_t = self.catalog.table("seed_prefixes")
        # FormLoginProcessor province counts (eligibleFormsSeenCount /
        # eligibleFormsAttemptsCount, FormLoginProcessor.java:122-140):
        # merge-on-read keyed by province — unbounded when the applicable
        # prefix is blank (one province per site root), so O(delta) writes
        self.form_prov_t = MergeOnReadTable(
            self.catalog, "form_provinces", "province"
        )
        # per-source CrawledBytesHistotable (SourceQuotaEnforcer): append
        # + fold-compaction accumulator like quota_stats
        self.source_t = self.catalog.table("source_stats")
        # FetchWhois knowledge (referralServers + urlProgress,
        # FetchWhois.java:150-152). Progress keys are the RAW uri strings
        # as built/scheduled (urlProgress.put(curi.toString()) :377)
        self.whois_ref_t = MergeOnReadTable(
            self.catalog, "whois_referrals", "key"
        )
        self.whois_prog_t = MergeOnReadTable(
            self.catalog, "whois_progress", "url"
        )
        # AMQPUrlReceiver buffer: parsed-but-not-yet-scheduled messages.
        # Driver-held and NOT checkpointed — the reference's unacked AMQP
        # deliveries live in the broker, not in crawler state.
        self._amqp_pending: list[dict] = []
        self.overrides = fetch_status_overrides
        # driver-held scalars (checkpointed)
        self.round = 0
        self.clock = 0
        self.next_ordinal = 1
        self.total_fetched = 0
        # CrawlLimitEnforcer cumulative stats (bytesProcessed / novel*)
        self._crawl_bytes = 0
        self._novel_urls = 0
        self._novel_bytes = 0
        self.seed_prefixes: list[str] = []
        self.prefix_join_mode = False
        # round-scoped cached frames (localCheckpoint/persist), released
        # deterministically at end-of-round — see _free_round_frames
        self._round_frames: list[tuple[str, DataFrame]] = []
        # WARCLimitEnforcer running stats (BaseWARCWriterProcessor.getStats()
        # shape) and the CrawlStatus the crawl stopped with (None = running
        # or finished normally)
        self._warc_stats: dict[str, dict[str, int]] = {}
        self.stop_status: str | None = None
        # frames persisted for the duration of one round (freed at round end)
        self._round_caches: list[DataFrame] = []
        # per-round commit thread pool (parallel_commits); created lazily,
        # always drained before _free_round_frames releases round blocks
        self._commit_pool = None
        self._pending_commits: list = []
        # cross-round host view: the previous round's post-commit merged
        # host state (≡ host_state read), persisted; next round consumes
        # it instead of re-running the MoR merge. Must be invalidated by
        # every host mutation outside run_round.
        self._hosts_cache = None
        # rounds since the view was last rebuilt from the parquet table
        # (see HOSTS_VIEW_RESET_EVERY)
        self._hosts_view_age = 0
        # memo for round-INVARIANT Column trees (pure functions of cfg and
        # the seed list): profiling showed rebuilding the big expression
        # trees (canonicalize chain, scope chain, fetch-law CASEs) cost
        # ~1-2 s of py4j round-trips per round — Column objects are
        # immutable unresolved trees, safe to reuse across rounds. Never
        # memoize an expression embedding self.clock/self.round/ordinals.
        self._col_memo: dict[str, object] = {}

    # ------------------------------------------------------------------
    # bootstrap
    # ------------------------------------------------------------------
    def bootstrap(self, seed_lines: list[str]) -> None:
        """Seeds -> prepared frontier rows with ordinals 1..n (seed order)."""
        lines_df = self.spark.createDataFrame([(l,) for l in seed_lines], ["line"])
        seeds = seeds_from_lines(lines_df)
        prepared = self._prepare(seeds.withColumn("hops_path", F.lit("")))
        # in-batch canonical dedup, first seed wins (file order)
        w = Window.partitionBy("fp").orderBy(F.col("__order"))
        seeds_ord = (
            prepared.withColumn("__order", F.monotonically_increasing_id())
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
        seeds_ord = self._assign_ordinals(seeds_ord, ["__order"]).drop("__order")
        # derive the seed-implied SURT scope prefixes. Small seed lists
        # (the common case, and every parity suite) collect to a driver
        # list -> plan-embedded InSet probe; above the threshold the
        # prefixes are derived DISTRIBUTED and stay in a table consumed by
        # a broadcast semi-join — no O(seeds) collect, no O(seeds) plan.
        n_seeds = self.next_ordinal - 1  # _assign_ordinals already counted
        if n_seeds <= self.cfg.seed_prefix_inset_max:
            canon = [
                r.canonical
                for r in seeds_ord.select("canonical").orderBy("ordinal").collect()
            ]
            self.seed_prefixes = SC.seed_surt_prefixes(canon)
        else:
            self.prefix_join_mode = True
            self.seed_prefix_t.overwrite(
                seeds_ord.select(
                    SC.seed_surt_prefix_col(F.col("canonical")).alias("prefix")
                )
                .filter(F.col("prefix").isNotNull())
                .distinct()
            )
        seed_data = (
            F.create_map(F.lit("source_tag"), F.col("uri"))
            if self.cfg.source_tag_seeds
            else F.lit(None).cast("map<string,string>")
        )
        frontier = seeds_ord.select(
            "uri", "canonical", "fp", "class_key", "is_seed", "hops_path", "via",
            "via_context", "sched_directive", "precedence", "cost", "ordinal",
            F.lit(0).alias("fetch_attempts"), F.lit(False).alias("force_fetch"),
            seed_data.alias("data"),
        )
        # the four seed-state writes read the SAME persisted seeds frame
        # and land in four different tables — overlap them (guide §2.6)
        self._submit_commit(
            "frontier",
            lambda: self.frontier_t.overwrite(
                frontier.repartition(self.cfg.num_buckets, "class_key")
            ),
        )
        self._submit_commit(
            "url_seen", lambda: self.urlseen.add_fps(frontier.select("fp"))
        )
        hosts = frontier.groupBy("class_key").agg(F.count("*").alias("pending")).select(
            "class_key",
            F.col("pending").cast("long"),
            F.lit(0).cast("long").alias("wake_time"),
            F.lit(0).cast("long").alias("total_expenditure"),
            F.lit(0).cast("long").alias("error_count"),
            F.lit("n").alias("retired"),
        )
        self._submit_commit("host_state", lambda: self.host_t.overwrite(hosts))
        self.events_t.append(
            frontier.select(
                F.lit(0).alias("round"),
                F.lit("F+").alias("tag"),
                "class_key",
                "uri",
                "canonical",
                "ordinal",
                F.lit(None).cast("int").alias("fetch_status"),
                F.lit(None).cast("string").alias("disposition"),
                F.lit(True).alias("is_seed"),
                F.lit(None).cast("string").alias("annotation"),
                F.col("data").getItem("source_tag").alias("source_tag"),
                F.lit(None).cast("string").alias("content_type"),
                F.lit(None).cast("long").alias("content_length"),
                F.lit(self.clock).cast("long").alias("clock_ms"),
            )
        )
        if self.cfg.cookies == "obey" and self.cfg.cookies_txt:
            # cookiesLoadFile analog (AbstractCookieStore.loadCookies)
            from heritrix3_spark.operators.cookies import (
                CookieStore,
                normalize_host,
            )

            store = CookieStore()
            store.load_txt(self.cfg.cookies_txt)
            if len(store):
                self.cookie_t.overwrite(
                    self.spark.createDataFrame(
                        [
                            (c.key(), normalize_host(c.domain), c.name,
                             c.path, c.value, c.secure, c.expiry_s)
                            for c in store.cookies()
                        ],
                        "key string, domain string, name string, path string,"
                        " value string, secure boolean, expiry_s long",
                    )
                )
        self._await_commits()
        self._checkpoint()

    # ------------------------------------------------------------------
    # preparation stage (FrontierPreparer.prepare analog)
    # ------------------------------------------------------------------
    def _prepare(self, cand: DataFrame) -> DataFrame:
        """candidates(uri, hops_path, via, is_seed?, sched_directive?) ->
        + canonical, fp, class_key, cost, precedence, final directive."""
        if "is_seed" not in cand.columns:
            cand = cand.withColumn("is_seed", F.lit(False))
        if "sched_directive" not in cand.columns:
            cand = cand.withColumn("sched_directive", F.lit(FR.NORMAL))
        if "via_context" not in cand.columns:
            cand = cand.withColumn("via_context", F.lit(None).cast("string"))
        cols = self._col_memo.get("prepare")
        if cols is None:
            directive = FR.scheduling_directive_col(
                F.col("hops_path"),
                F.col("sched_directive"),
                preference_embed_hops=self.cfg.preference_embed_hops,
            )
            cost = {
                "unit": FR.unit_cost_col,
                "anticalendar": lambda: FR.anti_calendar_cost_col(F.col("uri")),
                "wag": lambda: FR.wag_cost_col(F.col("uri"), F.col("via")),
            }[self.cfg.cost_policy]()
            cols = self._col_memo["prepare"] = {
                "sched_directive": directive,
                "canonical": canonical_col(F.col("uri")),
                "fp": fp_udf(F.col("canonical")),
                "class_key": self._class_key_col(),
                "cost": cost,
                "precedence": FR.cost_uri_precedence_col(F.col("cost")),
            }
        out = cand
        for name, c in cols.items():
            out = out.withColumn(name, c)
        return out

    def _class_key_col(self):
        """Queue key per the configured policy; prerequisites always ride
        their trigger's (via) queue — the base-policy basis law."""
        if self.cfg.queue_assignment == "surt":
            return class_key_col(
                F.col("canonical"),
                F.col("hops_path"),
                F.col("via"),
                parallel_queues=self.cfg.parallel_queues,
            )
        from heritrix3_spark.functions.surt import (
            assignment_level_class_key_col,
            bucket_class_key_col,
            hostname_class_key_col,
        )

        policy = {
            "hostname": hostname_class_key_col,
            "assignment_level": assignment_level_class_key_col,
            "bucket": bucket_class_key_col,
        }[self.cfg.queue_assignment]
        basis = F.when(
            F.col("hops_path").endswith("P")
            & F.col("via").isNotNull()
            & (F.length(F.col("via")) > 0),
            F.col("via"),
        ).otherwise(F.col("canonical"))
        return policy(basis)

    def _mapper_target_col(self, class_key):
        """CrawlMapper node name for a class key (operators/mapper.py):
        HashCrawlMapper.mapString or the LexicalCrawlMapper TreeMap law."""
        cfg = self.cfg
        if cfg.crawl_mapper == "hash":
            return MAP.hash_crawler_name_col(
                class_key,
                cfg.mapper_crawler_count,
                use_psl=cfg.mapper_psl_reduce,
            )
        return MAP.lexical_crawler_name_col(class_key, cfg.mapper_map)

    def _overlay_col(self, key: str, default):
        """Sheet-overlay value for ``key`` by class_key SURT-prefix match
        (first matching overlay wins — the reference applies the
        most-specific sheet; ordering the overlay list most-specific-first
        reproduces that). Returns ``default`` when nothing matches."""
        expr = None
        for ov in self.cfg.overlays:
            if key not in ov:
                continue
            cond = F.col("class_key").startswith(ov["surt_prefix"])
            expr = (
                F.when(cond, F.lit(ov[key]))
                if expr is None
                else expr.when(cond, F.lit(ov[key]))
            )
        return default if expr is None else expr.otherwise(default)

    # ------------------------------------------------------------------
    # QuotaEnforcer (prefetch/QuotaEnforcer.java) — emit-time quota gate +
    # per-round FetchStats accumulation
    # ------------------------------------------------------------------
    #: quota-key suffix -> (stats column, value is KB of the byte column)
    _QUOTA_METRICS = {
        "MaxFetchSuccesses": ("successes", False),
        "MaxSuccessKb": ("success_bytes", True),
        "MaxFetchResponses": ("responses", False),
        "MaxAllKb": ("all_bytes", True),
        "MaxNovelKb": ("novel_bytes", True),
        "MaxNovelUrls": ("novel_urls", False),
    }
    _QUOTA_STAT_COLS = (
        "successes", "responses", "success_bytes", "all_bytes",
        "novel_bytes", "novel_urls",
    )
    #: HostQuotaEnforcer quota keys = raw FetchStats keys (FetchStats.java:
    #: 44-54) -> quota_stats column
    _FETCHSTATS_KEYS = {
        "fetchSuccesses": "successes",
        "fetchResponses": "responses",
        "successBytes": "success_bytes",
        "totalBytes": "all_bytes",
        "novel": "novel_bytes",
        "novelCount": "novel_urls",
    }
    #: SourceQuotaEnforcer quota keys = CrawledBytesHistotable keys
    #: (CrawledBytesHistotable.java:36-48) -> source_stats column
    _HISTOTABLE_KEYS = {
        "novel": "novel",
        "novelCount": "novel_count",
        "dupByHash": "dup_bytes",
        "dupByHashCount": "dup_count",
        "notModified": "nm_bytes",
        "notModifiedCount": "nm_count",
    }
    _SOURCE_STAT_COLS = (
        "novel", "novel_count", "dup_bytes", "dup_count", "nm_bytes",
        "nm_count",
    )

    @staticmethod
    def _content_size_col():
        """Synthetic contentSize: total text+media_ref chars of the spans
        payload (2xx with payload — plus the 2001 whois success, whose
        recorder size is the response body, FetchWhois.java:369)."""
        return F.when(
            F.col("spans").isNotNull()
            & (
                (
                    (F.col("fetch_status") >= 200)
                    & (F.col("fetch_status") < 300)
                )
                | (F.col("fetch_status") == 2001)
            ),
            F.aggregate(
                "spans",
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.coalesce(F.length(s["text"]), F.lit(0)).cast("long")
                + F.coalesce(F.length(s["media_ref"]), F.lit(0)).cast("long"),
            ),
        ).otherwise(F.lit(0).cast("long"))

    @staticmethod
    def _quota_key_cols(emitted: DataFrame) -> DataFrame:
        """The three FetchStats category keys (QuotaEnforcer.getEndCondition
        + the contrib enforcers' host law share them)."""
        return (
            emitted.withColumn(
                # server-category quota keys by CrawlServer.getServerKey
                # (https carries ':443'; QuotaEnforcer.getEndCondition)
                "__q_server", F.when(~F.col("__is_dns"), F.col("__server_key"))
            )
            .withColumn("__q_host", F.substring_index(F.col("__q_server"), ":", 1))
            .withColumn("__q_group", F.when(~F.col("__is_dns"), F.col("class_key")))
        )

    def _quota_blocked_col(self, emitted: DataFrame) -> DataFrame:
        """Join round-start quota stats onto emitted rows (carrying the
        ``__q_*`` key columns) and compute ``__quota_blocked``. Stats
        tables are unbounded (one row per server/host/queue ever seen) so
        — like robots/dns — they are pruned via a semi-join on the round's
        own key set, never broadcast wholesale."""
        quotas = dict(self.cfg.quotas)
        blocked = F.lit(False)
        stats_exist = self.quota_t.exists()
        stats = self.quota_t.read(self.spark) if stats_exist else None
        for cat, key_col in (
            ("server", "__q_server"),
            ("host", "__q_host"),
            ("group", "__q_group"),
        ):
            configured = {
                suffix: q
                for suffix, q in (
                    (k[len(cat):], v) for k, v in quotas.items() if k.startswith(cat)
                )
                if q >= 0
            }
            if not configured:
                continue
            cat_blocked = F.lit(False)
            if stats_exist:
                # quota_stats is append-only per-round deltas (O(delta)
                # writes); totals materialize HERE, after the semi-join
                # prune, so the groupBy aggregates only the round's bounded
                # key set — never the whole accumulated table
                keys = emitted.select(F.col(key_col).alias("__kk")).distinct()
                st = (
                    stats.filter(F.col("cat") == cat)
                    .join(F.broadcast(keys), F.col("key") == F.col("__kk"), "left_semi")
                    .groupBy("key")
                    .agg(*[F.sum(c).alias(c) for c in self._QUOTA_STAT_COLS])
                    .select(
                        F.col("key").alias(f"__{cat}_key"),
                        *[F.col(c).alias(f"__{cat}_{c}") for c in self._QUOTA_STAT_COLS],
                    )
                )
                emitted = emitted.join(
                    st, emitted[key_col] == st[f"__{cat}_key"], "left"
                ).drop(f"__{cat}_key")
                for suffix, q in configured.items():
                    col_name, is_kb = self._QUOTA_METRICS[suffix]
                    actual = F.coalesce(F.col(f"__{cat}_{col_name}"), F.lit(0))
                    if is_kb:
                        actual = F.floor(actual / 1024)
                    cat_blocked = cat_blocked | (actual >= q)
            else:
                # no stats yet: actual = 0; only quota 0 binds
                if any(q == 0 for q in configured.values()):
                    cat_blocked = F.lit(True)
            blocked = blocked | (F.col(key_col).isNotNull() & cat_blocked)
        return emitted.withColumn("__quota_blocked", blocked)

    def _contrib_quota_cols(self, emitted: DataFrame) -> DataFrame:
        """Contrib HostQuotaEnforcer / SourceQuotaEnforcer gate
        (HostQuotaEnforcer.java:87-134, SourceQuotaEnforcer.java:84-110):
        adds ``__cq_ann`` — "hostQuota:<key>" / "sourceQuota:<key>" for the
        first binding (entry, key) in config order, NULL when no contrib
        quota binds. Checks run against ROUND-START stats (the standing
        quota law); state tables are semi-join-pruned to the round's
        bounded key set, never broadcast wholesale."""
        cfg = self.cfg
        host_ann = F.lit(None).cast("string")
        if cfg.host_quotas:
            for _h, _s, pairs in cfg.host_quotas:
                for k, _lim in pairs:
                    if k not in self._FETCHSTATS_KEYS:
                        raise ValueError(f"unsupported FetchStats key: {k}")
            if self.quota_t.exists():
                keys = emitted.select(F.col("__q_host").alias("__kk")).distinct()
                st = (
                    self.quota_t.read(self.spark)
                    .filter(F.col("cat") == "host")
                    .join(
                        F.broadcast(keys), F.col("key") == F.col("__kk"),
                        "left_semi",
                    )
                    .groupBy("key")
                    .agg(*[F.sum(c).alias(c) for c in self._QUOTA_STAT_COLS])
                    .select(
                        F.col("key").alias("__hq_key"),
                        *[
                            F.col(c).alias(f"__hq_{c}")
                            for c in self._QUOTA_STAT_COLS
                        ],
                    )
                )
                emitted = emitted.join(
                    st, emitted["__q_host"] == st["__hq_key"], "left"
                ).drop("__hq_key")
            else:
                for c in self._QUOTA_STAT_COLS:
                    emitted = emitted.withColumn(
                        f"__hq_{c}", F.lit(None).cast("long")
                    )
            # a missing stats row is an all-zero CrawlHost substats
            # (Histotable.get -> 0): quota 0 binds from the first round
            for host, subs, pairs in reversed(cfg.host_quotas):
                match = F.col("__q_host") == host
                if subs:
                    # InternetDomainName ancestor walk == label-boundary
                    # suffix (HostQuotaEnforcer.java:100-115)
                    match = match | F.col("__q_host").endswith("." + host)
                entry = F.lit(None).cast("string")
                for k, lim in reversed(tuple(pairs)):
                    actual = F.coalesce(
                        F.col(f"__hq_{self._FETCHSTATS_KEYS[k]}"), F.lit(0)
                    )
                    entry = F.when(
                        actual >= lim, F.lit("hostQuota:" + k)
                    ).otherwise(entry)
                # a matching entry with no binding key PROCEEDs — it must
                # not mask a later processor's block
                host_ann = F.when(match & entry.isNotNull(), entry).otherwise(
                    host_ann
                )
        src_ann = F.lit(None).cast("string")
        if cfg.source_quotas:
            for _t, pairs in cfg.source_quotas:
                for k, _lim in pairs:
                    if k not in self._HISTOTABLE_KEYS:
                        raise ValueError(f"unsupported histotable key: {k}")
            tag = F.when(
                ~F.col("__is_dns"),
                F.try_element_at(F.col("data"), F.lit("source_tag")),
            )
            emitted = emitted.withColumn("__sq_tag", tag)
            if self.source_t.exists():
                keys = emitted.select(F.col("__sq_tag").alias("__kk")).distinct()
                st = (
                    self.source_t.read(self.spark)
                    .join(
                        F.broadcast(keys), F.col("key") == F.col("__kk"),
                        "left_semi",
                    )
                    .groupBy("key")
                    .agg(*[F.sum(c).alias(c) for c in self._SOURCE_STAT_COLS])
                    .select(
                        F.col("key").alias("__sq_key"),
                        *[
                            F.col(c).alias(f"__sq_{c}")
                            for c in self._SOURCE_STAT_COLS
                        ],
                    )
                )
                emitted = emitted.join(
                    st, emitted["__sq_tag"] == st["__sq_key"], "left"
                )
                # shouldProcess: only once the source's stats EXIST
                # (getSourceStats != null, SourceQuotaEnforcer.java:85-89)
                for t, pairs in reversed(cfg.source_quotas):
                    entry = F.lit(None).cast("string")
                    for k, lim in reversed(tuple(pairs)):
                        actual = F.coalesce(
                            F.col(f"__sq_{self._HISTOTABLE_KEYS[k]}"), F.lit(0)
                        )
                        entry = F.when(
                            actual >= lim, F.lit("sourceQuota:" + k)
                        ).otherwise(entry)
                    src_ann = F.when(
                        (F.col("__sq_tag") == t)
                        & F.col("__sq_key").isNotNull()
                        & entry.isNotNull(),
                        entry,
                    ).otherwise(src_ann)
        # host-then-source chain order: host quotas win overlap
        return emitted.withColumn("__cq_ann", F.coalesce(host_ann, src_ann))

    def _update_quota_stats(self, fetched: DataFrame) -> None:
        """Post-round FetchStats tally (FetchStats.java:66-106): success
        rows count successes+responses+bytes; failed rows with a positive
        status count responses+bytes; novel split by content-digest history
        (first occurrence within the round by ordinal, then cross-round via
        digest_seen — BdbContentDigestHistory analog)."""
        base = fetched.filter(
            ~F.col("__is_dns") & F.col("disposition").isin("success", "fail")
        ).withColumn("__size", self._content_size_col())
        digest = F.when(
            F.col("__size") > 0, F.sha1(F.to_json("spans"))
        ).otherwise(F.lit(None).cast("string"))
        base = base.withColumn("__digest", digest)
        w = Window.partitionBy("__digest").orderBy("ordinal")
        base = base.withColumn("__first_in_round", F.row_number().over(w) == 1)
        if self.digest_t.exists():
            seen_d = self.digest_t.read(self.spark).select(
                F.col("digest").alias("__dseen")
            )
            dkeys = base.select(F.col("__digest").alias("__dk")).distinct()
            seen_d = seen_d.join(
                F.broadcast(dkeys), seen_d["__dseen"] == F.col("__dk"), "left_semi"
            )
            base = base.join(seen_d, base["__digest"] == F.col("__dseen"), "left")
        else:
            base = base.withColumn("__dseen", F.lit(None).cast("string"))
        is_success = F.col("disposition") == "success"
        counts_resp = is_success | (F.col("fetch_status") > 0)
        novel = is_success & (
            F.col("__digest").isNull()
            | (F.col("__first_in_round") & F.col("__dseen").isNull())
        )
        base = (
            base.withColumn("__s", is_success.cast("long"))
            .withColumn("__r", counts_resp.cast("long"))
            .withColumn("__sb", F.when(is_success, F.col("__size")).otherwise(0))
            .withColumn("__ab", F.when(counts_resp, F.col("__size")).otherwise(0))
            .withColumn("__nb", F.when(novel, F.col("__size")).otherwise(0))
            .withColumn("__nu", novel.cast("long"))
            .persist()
        )
        deltas = None
        for cat, key_col in (
            ("server", "__q_server"),
            ("host", "__q_host"),
            ("group", "__q_group"),
        ):
            d = base.groupBy(F.col(key_col).alias("key")).agg(
                F.sum("__s").alias("successes"),
                F.sum("__r").alias("responses"),
                F.sum("__sb").alias("success_bytes"),
                F.sum("__ab").alias("all_bytes"),
                F.sum("__nb").alias("novel_bytes"),
                F.sum("__nu").alias("novel_urls"),
            ).withColumn("cat", F.lit(cat))
            deltas = d if deltas is None else deltas.unionByName(d)
        deltas = deltas.filter(F.col("key").isNotNull()).select(
            "cat", "key", *self._QUOTA_STAT_COLS
        )
        # append-only accumulator: per-round deltas pile up and totals are
        # summed at check time after the key prune; periodic compaction
        # folds the chain so neither file count nor chain length grows
        # unbounded. Write cost O(delta), was O(table) copy-on-write.
        if self.quota_t.exists():
            self.quota_t.append(deltas)
            chain = self.quota_t._parents(self.quota_t.latest_version())
            if len(chain) >= self.COMPACT_EVERY:
                folded = (
                    self.quota_t.read(self.spark)
                    .groupBy("cat", "key")
                    .agg(*[F.sum(c).alias(c) for c in self._QUOTA_STAT_COLS])
                )
                self.quota_t.overwrite(folded)
        else:
            self.quota_t.overwrite(deltas)
        if self.cfg.source_quotas:
            # per-source CrawledBytesHistotable accumulate (StatisticsTracker
            # .tallySourceStats -> CrawledBytesHistotable.accumulate,
            # CrawledBytesHistotable.java:55-68): SUCCESS dispositions only;
            # notModified = 304 revisit, dupByHash = payload-digest revisit,
            # else novel (otherDup profiles are not modeled). Reuses this
            # round's digest/novelty columns — one extra keyed agg, no new
            # digest pass.
            tag = F.try_element_at(F.col("data"), F.lit("source_tag"))
            nm = F.col("fetch_status") == 304
            dup = ~nm & F.col("__digest").isNotNull() & ~novel
            nv = ~nm & ~dup
            src = (
                base.filter(is_success & tag.isNotNull())
                .groupBy(tag.alias("key"))
                .agg(
                    F.sum(F.when(nv, F.col("__size")).otherwise(0)).alias("novel"),
                    F.sum(nv.cast("long")).alias("novel_count"),
                    F.sum(F.when(dup, F.col("__size")).otherwise(0)).alias(
                        "dup_bytes"
                    ),
                    F.sum(dup.cast("long")).alias("dup_count"),
                    F.sum(F.when(nm, F.col("__size")).otherwise(0)).alias(
                        "nm_bytes"
                    ),
                    F.sum(nm.cast("long")).alias("nm_count"),
                )
            )
            if self.source_t.exists():
                self.source_t.append(src)
                chain = self.source_t._parents(self.source_t.latest_version())
                if len(chain) >= self.COMPACT_EVERY:
                    folded = (
                        self.source_t.read(self.spark)
                        .groupBy("key")
                        .agg(
                            *[
                                F.sum(c).alias(c)
                                for c in self._SOURCE_STAT_COLS
                            ]
                        )
                    )
                    self.source_t.overwrite(folded)
            else:
                self.source_t.overwrite(src)
        # every new digest is unseen BY CONSTRUCTION: ``novel`` requires
        # __dseen null, and the pruned seen_d semi-join above covers exactly
        # this round's digests — so no anti-join against the full
        # digest_seen table is needed (round-2 verdict "What's wrong" #4)
        new_digests = (
            base.filter(novel & F.col("__digest").isNotNull())
            .select(F.col("__digest").alias("digest"))
            .distinct()
        )
        self.digest_t.append(new_digests)
        base.unpersist()

    def _update_warc_stats(self, fetched_ok: DataFrame) -> None:
        """WARC-writer running stats (BaseWARCWriterProcessor.addStats,
        BaseWARCWriterProcessor.java:149-167; the key shape is pinned by
        WARCWriterProcessorTest.java:181-188): per record type
        ``{"numRecords", "contentBytes", "totalBytes"}`` plus the
        ``"totals"`` roll-up. The documents sink persists one record per
        2xx fetch; when digest history is on, a fetch whose payload digest
        was seen before becomes a ``revisit`` record (the
        WARCWriterProcessor revisit path), otherwise every record is a
        ``response``. ``totalBytes`` equals ``contentBytes`` here — the
        engine models no request/metadata side-records or WARC header
        overhead. One 2-group aggregate per round; driver cost O(1)."""
        if "__revisit" in fetched_ok.columns:
            rtype = F.when(F.col("__revisit"), F.lit("revisit")).otherwise(
                F.lit("response")
            )
        else:
            rtype = F.lit("response")
        rows = (
            fetched_ok.groupBy(rtype.alias("rtype"))
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum(self._content_size_col()), F.lit(0)).alias(
                    "cb"
                ),
            )
            .collect()
        )
        for r in rows:
            for rt in (r["rtype"], "totals"):
                bucket = self._warc_stats.setdefault(
                    rt, {"numRecords": 0, "contentBytes": 0, "totalBytes": 0}
                )
                bucket["numRecords"] += int(r["n"])
                bucket["contentBytes"] += int(r["cb"])
                bucket["totalBytes"] += int(r["cb"])

    def _warc_limit_hit(self) -> bool:
        """WARCLimitEnforcer.innerProcess (contrib WARCLimitEnforcer.java:
        87-114): any configured ``limits[type][key]`` with accumulated
        ``stats[type][key] >= limit`` requests a crawl stop with
        FINISHED_WRITE_LIMIT. The reference checks after every URI write;
        the macro-batch engine checks the same accumulated stats once per
        round (a round may therefore overshoot by at most one batch, as
        the reference overshoots by the in-flight URI)."""
        for rtype, keys in self.cfg.warc_limits.items():
            bucket = self._warc_stats.get(rtype)
            if not bucket:
                continue
            for key, limit in keys.items():
                if key in bucket and bucket[key] >= limit:
                    return True
        return False

    def _attach_revisit(self, fetched: DataFrame) -> DataFrame:
        """Adds ``__digest`` and ``__revisit``: a success whose payload
        digest appears in digest_seen OR earlier this round (by ordinal)
        is an IdenticalPayloadDigestRevisit (revisit/
        IdenticalPayloadDigestRevisit.java; FetchHistoryProcessor analog).
        Also appends this round's novel digests to digest_seen — unless
        quotas are on, in which case _update_quota_stats owns the append
        (same novelty law, single writer)."""
        is_success = F.col("disposition") == "success"
        size = self._content_size_col()
        digest = F.when(
            is_success & (size > 0), F.sha1(F.to_json("spans"))
        ).otherwise(F.lit(None).cast("string"))
        fetched = fetched.withColumn("__digest", digest)
        w = Window.partitionBy("__digest").orderBy("ordinal")
        fetched = fetched.withColumn(
            "__first_in_round", F.row_number().over(w) == 1
        )
        if self.digest_t.exists():
            seen_d = self.digest_t.read(self.spark).select(
                F.col("digest").alias("__dseen")
            )
            dkeys = fetched.select(F.col("__digest").alias("__dk")).distinct()
            seen_d = seen_d.join(
                F.broadcast(dkeys), seen_d["__dseen"] == F.col("__dk"), "left_semi"
            )
            fetched = fetched.join(
                seen_d, fetched["__digest"] == F.col("__dseen"), "left"
            )
        else:
            fetched = fetched.withColumn("__dseen", F.lit(None).cast("string"))
        fetched = self._ckpt(
            fetched.withColumn(
                "__revisit",
                F.col("__digest").isNotNull()
                & ~(F.col("__first_in_round") & F.col("__dseen").isNull()),
            )
            # __dseen must not leak: _update_quota_stats re-joins its own
            # pruned digest slice and a duplicate column would be ambiguous
            .drop("__dseen", "__first_in_round")
        )
        if not (
            self.cfg.quotas or self.cfg.host_quotas or self.cfg.source_quotas
        ):
            novel_digests = (
                fetched.filter(
                    F.col("__digest").isNotNull() & ~F.col("__revisit")
                )
                .select(F.col("__digest").alias("digest"))
                .distinct()
            )
            self.digest_t.append(novel_digests)
        return fetched

    def _attach_trap(self, fetched: DataFrame) -> DataFrame:
        """Adds ``__trap`` (TrapSuppressExtractor law): the page's payload
        digest equals its via's archived digest. The documents_out lookup
        is pruned to the round's bounded via set (latest archive row per
        via wins), never a full-table join."""
        if "__digest" not in fetched.columns:
            is_success = F.col("disposition") == "success"
            size = self._content_size_col()
            fetched = fetched.withColumn(
                "__digest",
                F.when(is_success & (size > 0), F.sha1(F.to_json("spans"))).otherwise(
                    F.lit(None).cast("string")
                ),
            )
        fetched = fetched.withColumn("__via_canon", canonical_col(F.col("via")))
        if self.documents_t.exists():
            vias = fetched.select(F.col("__via_canon").alias("__vk")).distinct()
            docs = self.documents_t.read(self.spark).select(
                F.col("doc_id").alias("__pd_doc"),
                F.col("content_digest").alias("__pd_digest"),
                "fetch_round",
            )
            docs = docs.join(
                F.broadcast(vias), docs["__pd_doc"] == F.col("__vk"), "left_semi"
            )
            w = Window.partitionBy("__pd_doc").orderBy(F.desc("fetch_round"))
            latest = (
                docs.withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") == 1)
                .select("__pd_doc", "__pd_digest")
            )
            fetched = fetched.join(
                latest, fetched["__via_canon"] == F.col("__pd_doc"), "left"
            ).drop("__pd_doc")
        else:
            fetched = fetched.withColumn("__pd_digest", F.lit(None).cast("string"))
        return self._ckpt(
            fetched.withColumn(
                "__trap",
                F.col("__digest").isNotNull()
                & (F.col("__digest") == F.col("__pd_digest")),
            )
            .drop("__pd_digest", "__via_canon")
        )

    def _attach_forms(self, fetched: DataFrame):
        """ExtractorHTMLForms + FormLoginProcessor (operators/forms.py;
        modules/forms/ExtractorHTMLForms.java:142-171,
        FormLoginProcessor.java:199-296). Parses the round's "form" spans
        Arrow-batched on extraction-eligible pages, computes the "form:"
        + submit/nosubmit annotations, synthesizes the once-per-province
        'S'-hop submission candidates, and stashes the province-count
        upsert for the round-end commit.

        Returns ``(fetched', annotation_column, submits_df_or_None)``.
        The province state table is never broadcast wholesale — it is
        semi-join-pruned to the round's bounded province set; only
        round-bounded sides are broadcast."""
        cfg = self.cfg
        # surt_col_plain, NOT the bound surt_col: user/pw feed the parse
        # UDF's arguments, and lambda-bearing UDF args break
        # ExtractPythonUDFs once a downstream HOF inlines the call (see
        # surt_col_plain's docstring)
        from heritrix3_spark.functions.surt import surt_col, surt_col_plain
        from heritrix3_spark.operators import forms as FORMS
        from heritrix3_spark.operators.extract import resolve_ref_col

        # ExtractorHTMLForms rides the extract chain: same eligibility as
        # outlink extraction (A_FORM_OFFSETS only exists where
        # ExtractorHTML ran — mime gate, trap suppression included)
        page_ok = (F.col("fetch_status") >= 200) & (F.col("fetch_status") < 400)
        if cfg.process_error_outlinks:
            page_ok = page_ok | (
                (F.col("fetch_status") >= 100)
                & ~F.col("__no_fetch")
                & ~F.col("__retry")
            )
        gate = page_ok & F.col("spans").isNotNull()
        if cfg.trap_suppress:
            gate = gate & ~F.coalesce(F.col("__trap"), F.lit(False))
        if cfg.mime_extract_gate:
            gate = gate & MIME.html_extract_gate_col(F.col("content_type"))
        form_texts = F.when(
            gate,
            F.transform(
                F.filter("spans", lambda s: s["kind"] == "form"),
                lambda s: s["text"],
            ),
        )
        # sheet selection: LONGEST applicable SURT prefix wins (the
        # most-specific overlay; scalar twin forms.login_entry_for)
        entries = sorted(cfg.form_login, key=lambda e: len(e[0]), reverse=True)
        surt_form = surt_col_plain(F.col("canonical"))
        user = F.lit(None).cast("string")
        pw = F.lit(None).cast("string")
        pfx = F.lit(None).cast("string")
        for prefix, u, p in reversed(entries):
            hit = surt_form.startswith(prefix)
            user = F.when(hit, F.lit(u)).otherwise(user)
            pw = F.when(hit, F.lit(p)).otherwise(pw)
            pfx = F.when(hit, F.lit(prefix)).otherwise(pfx)
        base = (
            fetched.withColumn(
                "__forms",
                FORMS.parse_forms_col(form_texts, user, pw, cfg.extract_all_forms),
            )
            .withColumn("__fl_user", user)
            .withColumn("__fl_pfx", pfx)
        )
        form_ann = F.when(
            F.size("__forms") > 0,
            F.array_join(F.transform("__forms", lambda f: f["annotation"]), ","),
        )
        login_on = any(u for _p, u, _pw in cfg.form_login)
        if not login_on:
            self._round_form_prov = None
            return base, form_ann, None

        # FormLoginProcessor: eligible = non-blank username sheet applies
        # (shouldProcess :200-202 + the prefix check :206) AND the page
        # saved a login-seeming form (the loop's first, :219-237)
        lform = F.try_element_at(
            F.filter("__forms", lambda f: f["seems_login"]), F.lit(1)
        )
        root_uri = F.concat(
            F.regexp_extract("canonical", r"^([^:/?#]+://[^/?#]*)", 1),
            F.lit("/"),
        )
        province = F.when(
            F.trim(F.col("__fl_pfx")) != "", F.col("__fl_pfx")
        ).otherwise(surt_col(root_uri))
        eligible = (
            F.col("__fl_user").isNotNull()
            & (F.col("__fl_user") != "")
            & lform.isNotNull()
        )
        elig = base.filter(eligible).select(
            "ordinal",
            F.col("uri").alias("__page_uri"),
            "canonical",
            "hops_path",
            "is_seed",
            "data",
            province.alias("province"),
            lform.alias("__lf"),
        )
        if self.form_prov_t.exists():
            provs = elig.select("province").distinct()
            st = (
                self.form_prov_t.read(self.spark)
                .join(F.broadcast(provs), "province", "left_semi")
                .select(
                    "province",
                    F.col("seen").alias("__b_seen"),
                    F.col("attempts").alias("__b_att"),
                )
            )
            j = elig.join(F.broadcast(st), "province", "left")
        else:
            j = elig.withColumn(
                "__b_seen", F.lit(None).cast("long")
            ).withColumn("__b_att", F.lit(None).cast("long"))
        # in-round serial order: the reference's processor-global counters
        # advance in fetch-processing order = ordinal order here
        w = Window.partitionBy("province").orderBy("ordinal")
        j = self._ckpt(
            j.withColumn("__r", F.row_number().over(w))
            .withColumn("__b_seen", F.coalesce("__b_seen", F.lit(0)))
            .withColumn("__b_att", F.coalesce("__b_att", F.lit(0)))
            .withColumn(
                "__attempt", (F.col("__b_att") == 0) & (F.col("__r") == 1)
            )
        )
        # submit:<action> on the attempt; nosubmit:<attempts>,<seen>,<prov>
        # on later eligible forms (attempts is 1 by then — the attempt
        # either pre-dates the round or fired at rank 1)
        fl_ann = F.when(
            F.col("__attempt"),
            F.concat(
                F.lit("submit:"),
                F.coalesce(F.col("__lf.action"), F.lit("null")),
            ),
        ).otherwise(
            F.concat(
                F.lit("nosubmit:1,"),
                (F.col("__b_seen") + F.col("__r")).cast("string"),
                F.lit(","),
                F.col("province"),
            )
        )
        ann_map = j.select("ordinal", fl_ann.alias("__fl_ann"))
        out = base.join(F.broadcast(ann_map), "ordinal", "left")
        raw_ann = F.concat_ws(",", form_ann, F.col("__fl_ann"))
        ann_col = F.when(F.length(raw_ann) > 0, raw_ann)
        # createFormSubmissionAttempt (:261-282): ACTION (or the page URI)
        # as an 'S' SUBMIT hop, form/@action context, HIGH, forceFetch;
        # A_SUBMIT_DATA/A_SUBMIT_ENCTYPE ride the data map (non-heritable)
        empty_map = F.expr("map()").cast("map<string,string>")
        stripped = F.map_filter(
            F.coalesce(F.col("data"), empty_map),
            lambda k, _v: (k != AUTH.AUTH_DATA_KEY)
            & (k != FORMS.SUBMIT_DATA_KEY)
            & (k != FORMS.SUBMIT_ENCTYPE_KEY),
        )
        submit_map = F.create_map(
            F.lit(FORMS.SUBMIT_DATA_KEY), F.col("__lf.data_json")
        )
        enc_map = F.when(
            F.col("__lf.enctype").isNotNull(),
            F.create_map(
                F.lit(FORMS.SUBMIT_ENCTYPE_KEY), F.col("__lf.enctype")
            ),
        ).otherwise(empty_map)
        submit_uri = F.when(
            F.col("__lf.action").isNull(), F.col("__page_uri")
        ).otherwise(resolve_ref_col(F.col("canonical"), F.col("__lf.action")))
        submits = j.filter("__attempt").select(
            submit_uri.alias("uri"),
            SC.extend_hops_path_col(F.col("hops_path"), F.lit("S")).alias(
                "hops_path"
            ),
            F.col("__page_uri").alias("via"),
            F.lit("form/@action").alias("via_context"),
            F.lit(FR.HIGH).alias("sched_directive"),
            F.col("is_seed").alias("parent_is_seed"),
            F.col("ordinal").alias("parent_ordinal"),
            F.lit(10**9).alias("outlink_index"),
            F.map_concat(stripped, submit_map, enc_map).alias("data"),
            F.lit(True).alias("force_hint"),
        )
        # province-count upsert (checkpointable state, :298-315): seen +=
        # round eligibles; attempts is 1 once any eligible row existed
        self._round_form_prov = j.groupBy("province").agg(
            (F.first("__b_seen") + F.count(F.lit(1))).alias("seen"),
            F.lit(1).cast("long").alias("attempts"),
        )
        return out, ann_col, submits

    def _bandwidth_advance(self, fetched: DataFrame) -> DataFrame:
        """(class_key, advance): the serial per-host clock with the
        bandwidth floor (DispositionProcessor.java:275-291). The recurrence
        (each wait = max(politeness, prev earliestNextEmit - now)) is not a
        window sum, so it runs as applyInPandas over each host's <=k
        emitted rows — bounded work per group."""
        import pandas as pd  # noqa: PLC0415
        from pyspark.sql.types import LongType as _L  # noqa: PLC0415
        from pyspark.sql.types import StringType as _S  # noqa: PLC0415
        from pyspark.sql.types import StructField as _F  # noqa: PLC0415
        from pyspark.sql.types import StructType as _T  # noqa: PLC0415

        rate = self.cfg.max_per_host_bandwidth_kb * 1.024  # bytes per ms
        clock = self.clock
        rows = fetched.select(
            "class_key",
            "sched_directive",
            F.least(F.col("precedence"), F.lit(127)).alias("prec"),
            "ordinal",
            F.col("__no_fetch").alias("no_fetch"),
            F.col("__retry").alias("is_retry"),
            FR.retry_delay_col(F.col("fetch_status")).alias("rdelay"),
            F.col("fetch_duration").alias("duration"),
            F.col("__politeness").alias("politeness"),
            self._content_size_col().alias("nbytes"),
        )

        def adv(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["sched_directive", "prec", "ordinal"])
            t = clock
            bw_next = clock
            for r in pdf.itertuples():
                if r.no_fetch:
                    continue
                if r.is_retry:
                    t += int(r.rdelay)
                    continue
                c = t + int(r.duration)
                wait = max(int(r.politeness), bw_next - c)
                bw_next = c + int(int(r.nbytes) / rate)
                t = c + wait
            return pd.DataFrame(
                {"class_key": [key[0]], "advance": [max(t, bw_next) - clock]}
            )

        schema = _T([_F("class_key", _S()), _F("advance", _L())])
        return rows.groupBy("class_key").applyInPandas(adv, schema=schema)

    # ------------------------------------------------------------------
    # deterministic scalable ordinal assignment
    # ------------------------------------------------------------------
    def _assign_ordinals(
        self, df: DataFrame, order_cols: list[str], defer_count: bool = False
    ) -> DataFrame:
        """Global discovery-order rank + next_ordinal offset, without a
        single-partition sort: range-partition on the (unique) order key,
        rank within partitions, add per-partition cumulative offsets
        (collected counts are O(partitions)). Mirrors prepForFrontier's
        ordinal serial (AbstractFrontier.java:821-825) deterministically.

        ``defer_count=True`` (parts==1 fast path only): skip the
        persist+count materialization — the caller checkpoints the result
        anyway, counts the checkpointed frame (cheap), and advances
        ``next_ordinal`` itself. The eager form paid a dedicated pass
        over the whole candidate pipeline just for the bookkeeping count.
        ``self._ordinals_deferred`` reports which contract applied.
        """
        parts = max(1, self.cfg.ordinal_partitions)
        self._ordinals_deferred = defer_count and parts == 1
        if parts == 1:
            # small-round fast path: one window over one partition, no
            # boundary-sampling pass, no offsets join. Use when per-round
            # candidate volume is bounded (the 10^10 path uses parts > 1).
            w1 = Window.orderBy(*order_cols)
            out = df.withColumn(
                "ordinal", (F.lit(self.next_ordinal) + F.row_number().over(w1) - 1).cast("long")
            )
            if self._ordinals_deferred:
                return out
            out = self._round_persist(out)
            self._last_novel_count = out.count()
            self.next_ordinal += self._last_novel_count
            return out
        ranged = (
            df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
            .sortWithinPartitions(*order_cols)
            .withColumn("__pid", F.spark_partition_id())
        )
        ranged = self._round_persist(ranged)
        counts = {
            r["__pid"]: r["cnt"]
            for r in ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
        }
        if not counts:  # empty candidate batch
            return ranged.drop("__pid").withColumn("ordinal", F.lit(0).cast("long"))
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_df = self.spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], ["__pid", "__off"]
        )
        w = Window.partitionBy("__pid").orderBy(*order_cols)
        out = (
            ranged.join(F.broadcast(off_df), "__pid")
            .withColumn(
                "ordinal",
                (F.lit(self.next_ordinal) + F.col("__off") + F.row_number().over(w) - 1).cast(
                    "long"
                ),
            )
            .drop("__pid", "__off")
        )
        self.next_ordinal += acc
        self._last_novel_count = acc
        return out

    # ------------------------------------------------------------------
    # one round
    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # round-scoped block bookkeeping
    # ------------------------------------------------------------------
    def _ckpt(self, df: DataFrame) -> DataFrame:
        """``localCheckpoint`` + register for end-of-round block release.

        Checkpoint blocks are held STRONGLY by the BlockManager until the
        RDD handle is GC'd and the ContextCleaner reaps it. Long-lived
        sessions (a pytest session fixture running hundreds of engine
        rounds; a months-long incremental crawl driver) accumulate orphaned
        round frames faster than driver GC runs, and the driver heap
        eventually dies in a full-GC spiral. Every round frame is dead the
        moment the round's table commits land, so the round end drops the
        blocks deterministically instead of waiting for GC.
        """
        out = df.localCheckpoint()
        self._round_frames.append(("ckpt", out))
        return out

    def _round_persist(self, df: DataFrame) -> DataFrame:
        out = df.persist()
        self._round_frames.append(("persist", out))
        return out

    def _free_round_frames(self) -> None:
        frames, self._round_frames = self._round_frames, []
        for kind, df in frames:
            try:
                if kind == "ckpt":
                    # a localCheckpointed frame's blocks hang off the
                    # LogicalRDD in its analyzed plan; DataFrame.unpersist
                    # wouldn't touch them
                    df._jdf.queryExecution().analyzed().rdd().unpersist(False)
                else:
                    df.unpersist()
            except Exception:
                pass  # best-effort (e.g. session already stopped)

    # ------------------------------------------------------------------
    # parallel round-end commits (guide §2.6: overlap independent jobs)
    # ------------------------------------------------------------------
    def _submit_commit(self, label: str, fn) -> None:
        """Run ``fn`` (one table's commit chain) on the round's thread pool.

        Independence contract: every chain writes its OWN snapshot
        table(s) (per-table version pointers are not thread-safe) and
        reads only materialized round frames (localCheckpoint/persist) or
        immutable snapshot dirs. Serial fallback when parallel_commits<=1.
        """
        if self.cfg.parallel_commits <= 1:
            fn()
            return
        if self._commit_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._commit_pool = ThreadPoolExecutor(
                max_workers=self.cfg.parallel_commits,
                thread_name_prefix="h3s-commit",
            )
        self._pending_commits.append((label, self._commit_pool.submit(fn)))

    def _await_commits(self) -> None:
        """Barrier: every submitted chain finished; first failure raised."""
        pending, self._pending_commits = self._pending_commits, []
        first_err = None
        for label, fut in pending:
            try:
                fut.result()
            except Exception as e:  # drain the rest before raising
                if first_err is None:
                    first_err = RuntimeError(f"commit chain {label!r} failed")
                    first_err.__cause__ = e
        if first_err is not None:
            raise first_err

    def _drain_commit_pool(self) -> None:
        if self._commit_pool is not None:
            self._commit_pool.shutdown(wait=True)
            self._commit_pool = None
        self._pending_commits = []

    def _invalidate_hosts_cache(self) -> None:
        df, self._hosts_cache = self._hosts_cache, None
        if df is None:
            return
        try:
            # localCheckpoint blocks are pinned via the analyzed plan's RDD
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            try:
                df.unpersist()
            except Exception:
                pass

    def run_round(self) -> bool:
        """Execute one macro-batch round. Returns False when crawl is done."""
        ok = False
        more = False
        try:
            more = self._run_round_impl()
            ok = True
            return more
        finally:
            # in-flight commit jobs read round frames — join them BEFORE
            # the blocks are released (also covers the exception path)
            self._drain_commit_pool()
            if not ok or not more:
                # failed round: the cross-round host view may not match
                # what actually committed; finished crawl: don't leave one
                # cached frame per completed engine on a long-lived driver
                self._invalidate_hosts_cache()
            self._free_round_frames()

    def _run_round_impl(self) -> bool:
        cfg = self.cfg
        timer = _Timer(self.spark.sparkContext if _TIMING else None)
        # RuntimeLimitEnforcer (RuntimeLimitEnforcer.java:168-197), checked
        # against the round-start virtual clock: pause/terminate stop the
        # loop; "block" poisons every URI emitted this round (-5004 fail)
        rt_block = False
        if cfg.runtime_limit_s >= 0 and self.clock > cfg.runtime_limit_s * 1000:
            if cfg.runtime_limit_op == "pause":
                self.stop_status = "PAUSED_RUNTIME_LIMIT"
                return False
            if cfg.runtime_limit_op == "terminate":
                self.stop_status = "FINISHED_TIME_LIMIT"
                return False
            rt_block = True
        frontier = self.frontier_t.read(self.spark)
        # the merged host view feeds several independent actions this round
        # (eligibility stats, the fetch pipeline, the round-end host update);
        # without a persist each action re-runs the merge-on-read shuffle.
        # O(hosts) rows — bounded cluster-wide even at 10^10 URLs (hosts is
        # the queue table, orders of magnitude smaller than the frontier).
        # The previous round's `updated` frame IS the post-commit merged
        # host state (the upsert wrote exactly its changed subset), so it
        # carries over as this round's view — skipping one MoR merge
        # (delta aggregate + anti-join stage-jobs) per round. Invalidated
        # by every out-of-round host mutation (_recount_pending, resume).
        if (
            self._hosts_cache is not None
            and self._hosts_view_age >= self.HOSTS_VIEW_RESET_EVERY
        ):
            # break the carried-stats feedback loop (HOSTS_VIEW_RESET_EVERY)
            self._invalidate_hosts_cache()
        if self._hosts_cache is not None:
            hosts = self._hosts_cache
            self._hosts_cache = None
            self._hosts_view_age += 1
            # consumed this round: release with the round's other frames
            # ("ckpt": localCheckpoint blocks hang off the analyzed plan's
            # LogicalRDD — DataFrame.unpersist would not touch them)
            self._round_frames.append(("ckpt", hosts))
        else:
            hosts = self._round_persist(self.host_t.read(self.spark))
            self._hosts_view_age = 0

        # --- futureUris maturation (checkFutures,
        # WorkQueueFrontier.java:743-760): matured rows re-enter their
        # queues (same ordinal — they are already in url_seen and bypass
        # dedup, exactly like the reference's futureUris re-receive) -------
        min_future: int | None = None
        matured_keys: DataFrame | None = None
        if self.futures_t.exists():
            # whole-bucket drain: reads ONLY the due batch dirs (O(matured))
            # and drops them with a metadata-only commit; rounds with
            # nothing due skip the table entirely (min is metadata)
            matured = self.futures_t.mature(self.spark, self.clock)
            if matured is not None:
                matured = matured.drop("reschedule_time").persist()
                frontier = frontier.unionByName(matured)
                # merge-on-read re-entry: the matured ordinal was tombstoned
                # when it was originally disposed; this upsert (maturation
                # phase seq = 2*round, round-end commits use 2*round+1 so a
                # same-round re-dispose outranks it) revives the row
                self.frontier_t.upsert(matured, seq=2 * self.round)
                madd = matured.groupBy("class_key").agg(
                    F.count("*").cast("long").alias("__madd")
                )
                # maturation changes these queues' pending counts, so they
                # belong to the round's touched-host set (O(delta) write)
                matured_keys = madd.select("class_key")
                hosts = (
                    hosts.join(madd, "class_key", "left")
                    .withColumn(
                        "pending",
                        F.col("pending") + F.coalesce(F.col("__madd"), F.lit(0)),
                    )
                    .drop("__madd")
                )
                matured.unpersist()
            min_future = self.futures_t.min_bucket()

        # host_state carries pending counts, so eligibility never scans the
        # frontier — at 10^10 URLs host_state is O(hosts), frontier O(URLs)
        live = hosts.filter((F.col("retired") == "n") & (F.col("pending") > 0))
        # precedence floor: queues at/above the floor are never activated
        # (WorkQueueFrontier.java:165-171, 595-601)
        if cfg.queue_precedence == "highest_uri":
            qp = FR.highest_uri_queue_precedence(frontier, cfg.queue_precedence_base)
            live = live.join(qp, "class_key", "left").filter(
                F.coalesce(F.col("queue_precedence"), F.lit(FR.DEFAULT_QUEUE_PRECEDENCE))
                < cfg.precedence_floor
            )
        elif FR.DEFAULT_QUEUE_PRECEDENCE >= cfg.precedence_floor:
            live = live.limit(0)  # constant base precedence at/above floor
        live_stats = live.agg(
            F.count("*").alias("n_live"),
            F.min("wake_time").alias("min_wake"),
            F.sum(F.when(F.col("wake_time") <= self.clock, 1).otherwise(0)).alias("n_eligible"),
        ).collect()[0]
        if not live_stats.n_live:
            if min_future is not None:
                # only futures remain: jump the clock to the earliest
                # reschedule_time; they mature at the next round's start
                self.clock = max(self.clock + 1, min_future)
                self.round += 1
                self._checkpoint()
                return True
            return False
        timer.mark("eligibility-collect")
        if live_stats.n_eligible == 0:
            wake_targets = [live_stats.min_wake]
            if min_future is not None:
                wake_targets.append(min_future)
            self.clock = max(self.clock + 1, min(wake_targets))

        eligible_keys = live.filter(F.col("wake_time") <= self.clock).select("class_key")
        # sheet overlays may override k per queue (first matching prefix wins)
        k_col = self._overlay_col("k_per_host", F.lit(cfg.k_per_host))
        joined = frontier.join(
            F.broadcast(eligible_keys.withColumn("__k", k_col)), "class_key"
        )
        # session budget (expenditureAtLastActivation law, WorkQueue.java:
        # 233-265): every round re-activates (replenish), so a queue emits
        # while its spend-since-round-start <= sessionBudget. Cost-aware:
        # the running sum of insert-key-ordered costs, one window with the
        # head-pick rank (same partitioning — no extra shuffle).
        w = Window.partitionBy("class_key").orderBy(*FR.insert_key_order())
        # rank-filter FIRST so the row_number window keeps its map-side
        # WindowGroupLimit prune; the cost cumsum then runs over <=k
        # survivors on the same partitioning (exchange reuse, no shuffle)
        ranked = (
            joined.withColumn("queue_rank", F.row_number().over(w))
            .filter(F.col("queue_rank") <= F.col("__k"))
        )
        emitted = (
            ranked.withColumn(
                "__spend_before",
                F.coalesce(
                    F.sum("cost").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .filter(F.col("__spend_before") <= cfg.session_budget)
            .drop("queue_rank", "__k", "__spend_before")
        )

        # --- CrawlMapper check-uri (processor/CrawlMapper.java:196-213):
        # the node name is a pure column law over class_key; mapped-away
        # rows divert BEFORE preconditions (early prefetch position)
        mapper_on = cfg.crawl_mapper != "off"
        map_uri_on = mapper_on and cfg.mapper_check_uri
        map_out_on = mapper_on and cfg.mapper_check_outlinks
        if map_uri_on:
            emitted = emitted.withColumn(
                "__map_target", self._mapper_target_col(F.col("class_key"))
            ).withColumn(
                "__map_divert",
                F.col("__map_target") != F.lit(cfg.mapper_local_name),
            )

        # --- precondition gate: DNS first, then robots, then quotas
        # (chain order: preselector -> preconditions -> quota -> fetchers,
        # profile-crawler-beans.cxml:321-328 + QuotaEnforcer placement) ------
        quotas_on = bool(cfg.quotas)
        contrib_q_on = bool(cfg.host_quotas) or bool(cfg.source_quotas)
        auth_on = bool(cfg.auth_zones)
        form_on = bool(cfg.form_credentials)
        cookies_on = cfg.cookies == "obey"
        cookie_zoned = cookies_on and bool(cfg.cookie_zones)
        whois_on = cfg.whois == "on"
        need_gate = (
            cfg.robots == "obey"
            or cfg.dns == "obey"
            or quotas_on
            or contrib_q_on
            or auth_on
            or form_on
            or cookies_on
            or whois_on
        )
        if need_gate:
            emitted = emitted.withColumn(
                "__is_dns", F.col("canonical").startswith("dns:")
            ).withColumn(
                "__server",
                F.when(
                    F.col("__is_dns"), F.substring(F.col("canonical"), 5, 4096)
                ).otherwise(
                    F.regexp_extract("canonical", r"^[^:/?#]+://([^/?#]*)", 1)
                ),
            ).withColumn(
                "__is_robots",
                F.col("canonical").rlike(r"^[^:/?#]+://[^/?#]*/robots\.txt$"),
            ).withColumn(
                # CrawlServer.getServerKey (CrawlServer.java:259-283): the
                # SERVER-STATE key — https without a port appends ':443' so
                # https robots/quota state never shares a CrawlServer with
                # http. __server (raw authority / dns name) still builds
                # prerequisite URIs and keys dns-by-hostname state.
                "__server_key",
                server_key_col(F.col("canonical")),
            ).withColumn(
                # whois URIs are exempt from the dns precondition
                # (PreconditionEnforcer.java:279-281) and robots only
                # gates http/https (:172) — computed whether or not the
                # whois fetcher is configured, like the reference
                "__is_whois",
                F.col("canonical").startswith("whois:"),
            )
            # The dns/robots state tables are unbounded (one row per server
            # ever seen — 10^6-10^8 at web scale, robots bodies <=500KB
            # each), so they must NEVER be broadcast. Instead: persist the
            # round's emitted set (bounded by k x |eligible hosts|), derive
            # its distinct server list, SEMI-JOIN the state tables down to
            # exactly this round's servers (that prune is what broadcasts —
            # the bounded server-name list, not the tables), then join the
            # pruned remnant back. AQE picks broadcast for the remnant when
            # it is small and a co-partitioned shuffle join when it isn't.
            # eager localCheckpoint: (a) broadcast subtrees run as separate
            # driver jobs BEFORE the main job, so a lazy frame would let each
            # of them re-execute the emitted lineage; (b) it TRUNCATES the
            # logical plan, so the dozen downstream actions this round stop
            # re-analyzing the frontier-scan + head-pick tree (driver-side
            # Catalyst time dominates tiny rounds; measured ~2x round cost)
            emitted = self._ckpt(emitted)
            round_servers = emitted.select(F.col("__server").alias("__srv")).distinct()
            if cfg.dns == "obey" and self.dns_t.exists():
                dns = self.dns_t.read(self.spark).select(
                    F.col("host").alias("__dns_host"),
                    F.col("resolved_at").alias("__dns_at"),
                )
                dns = dns.join(
                    F.broadcast(round_servers),
                    dns["__dns_host"] == F.col("__srv"),
                    "left_semi",
                )
                emitted = emitted.join(
                    dns, emitted["__server"] == F.col("__dns_host"), "left"
                ).drop("__dns_host")
                # isIpExpired law: stale when resolved_at + dur*1000 < clock
                dns_fresh = (
                    F.lit(cfg.ip_validity_duration_s == 0)
                    | (
                        F.col("__dns_at") + F.lit(cfg.ip_validity_duration_s * 1000)
                        >= F.lit(self.clock)
                    )
                )
                emitted = emitted.withColumn(
                    "__dns_known",
                    F.coalesce(F.col("__dns_at").isNotNull() & dns_fresh, F.lit(False)),
                ).withColumn(
                    "__dns_stale",
                    F.coalesce(
                        F.col("__dns_at").isNotNull() & ~dns_fresh, F.lit(False)
                    ),
                ).drop("__dns_at")
            else:
                emitted = emitted.withColumn(
                    "__dns_known", F.lit(cfg.dns != "obey")
                ).withColumn("__dns_stale", F.lit(False))
            if cfg.robots == "obey":
                from heritrix3_spark.operators.robots import (
                    robots_allow_udf,
                    robots_crawl_delay_udf,
                )

                if self.robots_t.exists():
                    # robots state is keyed by the CrawlServer key (https
                    # carries ':443'), so both the prune set and the join
                    # use __server_key, not the raw authority
                    round_skeys = emitted.select(
                        F.col("__server_key").alias("__sk")
                    ).distinct()
                    rb = self.robots_t.read(self.spark).select(
                        F.col("server").alias("__rb_server"),
                        F.col("body").alias("__rb_body"),
                        F.col("fetched_at").alias("__rb_at"),
                    )
                    rb = rb.join(
                        F.broadcast(round_skeys),
                        rb["__rb_server"] == F.col("__sk"),
                        "left_semi",
                    )
                    emitted = emitted.join(
                        rb, emitted["__server_key"] == F.col("__rb_server"), "left"
                    ).drop("__rb_server")
                else:
                    emitted = emitted.withColumn(
                        "__rb_body", F.lit(None).cast("string")
                    ).withColumn("__rb_at", F.lit(None).cast("long"))
                # isRobotsExpired law (CrawlServer.java:300-315): stale when
                # fetched_at + dur*1000 < clock; a stale body is treated as
                # unknown (re-defer + forced prerequisite), not as NO_ROBOTS
                rb_fresh = F.lit(cfg.robots_validity_duration_s == 0) | (
                    F.col("__rb_at") + F.lit(cfg.robots_validity_duration_s * 1000)
                    >= F.lit(self.clock)
                )
                emitted = emitted.withColumn(
                    "__rb_stale",
                    F.coalesce(F.col("__rb_body").isNotNull() & ~rb_fresh, F.lit(False)),
                ).drop("__rb_at")
                rb_known = F.col("__rb_body").isNotNull() & ~F.col("__rb_stale")
                path_q = F.regexp_extract("canonical", r"^[^:/?#]+://[^/?#]*(.*)$", 1)
                allowed = robots_allow_udf(F.col("__rb_body"), F.lit(cfg.user_agent), path_q)
                crawl_delay = (
                    F.when(
                        rb_known,
                        robots_crawl_delay_udf(F.col("__rb_body"), F.lit(cfg.user_agent)),
                    )
                    .otherwise(F.lit(None).cast("float"))
                    .cast("double")
                )
            else:
                rb_known, allowed = F.lit(True), F.lit(True)
                crawl_delay = F.lit(None).cast("double")
                emitted = emitted.withColumn("__rb_stale", F.lit(False))
            if whois_on:
                # FetchWhois serverless resolution (deferOrFinishGeneric,
                # FetchWhois.java:257-304) on round-start state. Both
                # knowledge tables are unbounded (one row per domain/
                # suffix/url ever walked) so — like robots/dns — they are
                # pruned via broadcast semi-joins on the round's bounded
                # key sets, never broadcast wholesale.
                from heritrix3_spark.operators import whois as WH

                wtpl = cfg.whois_templates or None
                wdecode = getattr(F, "try_url_decode", F.url_decode)
                wauth = F.regexp_extract(
                    "canonical", r"^whois://([^/?#]*)", 1
                )
                emitted = emitted.withColumn(
                    "__whois_serverful",
                    F.col("__is_whois")
                    & F.col("canonical").startswith("whois://")
                    & (wauth != ""),
                ).withColumn(
                    # the wire query, form-decoded (getWhoisQuery :382-396)
                    "__whois_q",
                    F.when(
                        F.col("__whois_serverful"),
                        wdecode(
                            F.regexp_extract(
                                "canonical", r"^whois://[^/?#]*/(.*)$", 1
                            )
                        ),
                    ).when(
                        F.col("__is_whois")
                        & ~F.col("canonical").startswith("whois://"),
                        wdecode(F.substring(F.col("canonical"), 7, 1 << 20)),
                    ),
                )
                sl = F.col("__is_whois") & ~F.col("__whois_serverful")
                wq = F.col("__whois_q")
                wsfx = F.lower(F.substring_index(wq, ".", -1))
                # referral lookups: full key + ultra suffix (:259-264)
                if self.whois_ref_t.exists():
                    wkeys = (
                        emitted.filter(sl)
                        .select(F.explode(F.array(wq, wsfx)).alias("__wk"))
                        .distinct()
                    )
                    wr = self.whois_ref_t.read(self.spark).join(
                        F.broadcast(wkeys),
                        F.col("key") == F.col("__wk"),
                        "left_semi",
                    )
                    full = wr.select(
                        F.col("key").alias("__wrf_k"),
                        F.col("server").alias("__w_ref_full"),
                    )
                    sfx = wr.select(
                        F.col("key").alias("__wrs_k"),
                        F.col("server").alias("__w_ref_sfx"),
                    )
                    emitted = (
                        emitted.join(full, wq == F.col("__wrf_k"), "left")
                        .drop("__wrf_k")
                        .join(sfx, wsfx == F.col("__wrs_k"), "left")
                        .drop("__wrs_k")
                    )
                else:
                    emitted = emitted.withColumn(
                        "__w_ref_full", F.lit(None).cast("string")
                    ).withColumn("__w_ref_sfx", F.lit(None).cast("string"))
                iana_url = WH.make_whois_url_col(
                    F.lit(WH.ULTRA_SUFFIX_WHOIS_SERVER), wsfx, wtpl
                )
                arin_url = WH.make_whois_url_col(
                    F.lit(WH.DEFAULT_IP_WHOIS_SERVER), wq, wtpl
                )
                sfx_url = WH.make_whois_url_col(F.col("__w_ref_sfx"), wq, wtpl)
                # the full-key branch is a raw concat — no template, no
                # encoding (:259-260)
                full_url = F.concat(
                    F.lit("whois://"), F.col("__w_ref_full"), F.lit("/"), wq
                )
                emitted = emitted.withColumn(
                    "__w_iana_url", F.when(sl, iana_url)
                )
                prog_exists = self.whois_prog_t.exists()
                if prog_exists:
                    purls = (
                        emitted.filter(sl)
                        .select(
                            F.explode(
                                F.array(
                                    full_url, arin_url, sfx_url,
                                    F.col("__w_iana_url"),
                                )
                            ).alias("__wu")
                        )
                        .filter(F.col("__wu").isNotNull())
                        .distinct()
                    )
                    wp = self.whois_prog_t.read(self.spark).join(
                        F.broadcast(purls),
                        F.col("url") == F.col("__wu"),
                        "left_semi",
                    )
                    p_iana = wp.select(
                        F.col("url").alias("__wpi_k"),
                        F.col("status").alias("__w_prog_iana"),
                    )
                    emitted = emitted.join(
                        p_iana, F.col("__w_iana_url") == F.col("__wpi_k"), "left"
                    ).drop("__wpi_k")
                else:
                    emitted = emitted.withColumn(
                        "__w_prog_iana", F.lit(None).cast("int")
                    )
                emitted = emitted.withColumn(
                    "__whois_try",
                    F.when(~sl, F.lit(None).cast("string"))
                    .when(F.col("__w_ref_full").isNotNull(), full_url)
                    .when(wq.rlike("^" + WH.IP_ADDRESS_REGEX + "$"), arin_url)
                    .when(F.col("__w_ref_sfx").isNotNull(), sfx_url)
                    .when(F.col("__w_prog_iana").isNull(), F.col("__w_iana_url")),
                )
                if prog_exists:
                    p_try = wp.select(
                        F.col("url").alias("__wpt_k"),
                        F.col("status").alias("__w_prog_try"),
                    )
                    emitted = emitted.join(
                        p_try, F.col("__whois_try") == F.col("__wpt_k"), "left"
                    ).drop("__wpt_k")
                else:
                    emitted = emitted.withColumn(
                        "__w_prog_try", F.lit(None).cast("int")
                    )
                emitted = emitted.withColumn(
                    "__whois_defer",
                    F.when(
                        sl
                        & F.col("__whois_try").isNotNull()
                        & F.col("__w_prog_try").isNull(),
                        F.lit("mark"),
                    ).when(
                        sl
                        & F.col("__whois_try").isNotNull()
                        & (F.col("__w_prog_try") == WH.IN_PROGRESS),
                        F.lit("wait"),
                    ),
                ).withColumn(
                    # terminal serverless statuses: no route -> -62; the
                    # walk's tryThis DONE -> 2002 (:266-268, :294-295)
                    "__whois_term",
                    F.when(
                        sl & F.col("__whois_try").isNull(),
                        F.lit(FR.S_OTHER_PREREQUISITE_FAILURE),
                    ).when(
                        sl & (F.col("__w_prog_try") == WH.DONE),
                        F.lit(WH.S_WHOIS_GENERIC_FINISHED),
                    ),
                )
            else:
                emitted = (
                    emitted.withColumn("__whois_serverful", F.lit(False))
                    .withColumn("__whois_q", F.lit(None).cast("string"))
                    .withColumn("__whois_try", F.lit(None).cast("string"))
                    .withColumn("__whois_defer", F.lit(None).cast("string"))
                    .withColumn("__whois_term", F.lit(None).cast("int"))
                )
            if form_on:
                # credentialPrecondition (PreconditionEnforcer.java:379-439):
                # a guarded row defers behind its login-URI prerequisite
                # until the credential is promoted (authenticated); login
                # rows themselves always pass
                for name, colx in AUTH.form_cols(
                    F.col("__server"), F.col("canonical"), cfg.form_credentials
                ).items():
                    emitted = emitted.withColumn(name, colx)
                if self.auth_t.exists():
                    fa = (
                        self.auth_t.read(self.spark)
                        .select("server", "realm")
                        .distinct()
                    )
                    fa = fa.join(
                        F.broadcast(round_servers),
                        fa["server"] == F.col("__srv"),
                        "left_semi",
                    ).select(
                        F.col("server").alias("__fa_server"),
                        F.col("realm").alias("__fa_realm"),
                        F.lit(True).alias("__fa_hit"),
                    )
                    emitted = emitted.join(
                        fa,
                        (emitted["__form_dom"] == F.col("__fa_server"))
                        & (emitted["__form_realm"] == F.col("__fa_realm")),
                        "left",
                    ).drop("__fa_server", "__fa_realm")
                else:
                    emitted = emitted.withColumn(
                        "__fa_hit", F.lit(None).cast("boolean")
                    )
                emitted = emitted.withColumn(
                    "__form_needed",
                    F.coalesce(
                        F.col("__form_dom").isNotNull()
                        & ~F.col("__is_login")
                        & ~F.coalesce(F.col("__fa_hit"), F.lit(False)),
                        F.lit(False),
                    ),
                ).drop("__fa_hit")
            else:
                emitted = emitted.withColumn("__form_needed", F.lit(False))
            if quotas_on or contrib_q_on:
                emitted = self._quota_key_cols(emitted)
            else:
                emitted = (
                    emitted.withColumn("__q_server", F.lit(None).cast("string"))
                    .withColumn("__q_host", F.lit(None).cast("string"))
                    .withColumn("__q_group", F.lit(None).cast("string"))
                )
            if quotas_on:
                emitted = self._quota_blocked_col(emitted)
            else:
                emitted = emitted.withColumn("__quota_blocked", F.lit(False))
            if contrib_q_on:
                emitted = self._contrib_quota_cols(emitted)
            else:
                emitted = emitted.withColumn(
                    "__cq_ann", F.lit(None).cast("string")
                )
            cq_blocked = F.col("__cq_ann").isNotNull()
            quota_status = F.lit(FR.S_BLOCKED_BY_QUOTA)
            emitted = (
                emitted.withColumn(
                    "__forced_status",
                    # the dns: prerequisite itself always proceeds; whois
                    # rows resolve in the whois branch (exempt from every
                    # later gate — PreconditionEnforcer.java:172,279-281);
                    # then the DNS gate; the robots.txt prerequisite passes
                    # once DNS known then hits the quota gate; then the
                    # robots gate; then quota
                    F.when(F.col("__is_dns"), F.lit(None).cast("int"))
                    .when(
                        F.col("__is_whois") & F.col("__whois_defer").isNotNull()
                        if whois_on
                        else F.lit(False),
                        F.lit(FR.S_DEFERRED),
                    )
                    .when(F.col("__is_whois"), F.lit(None).cast("int"))
                    .when(~F.col("__dns_known"), F.lit(FR.S_DEFERRED))
                    .when(
                        F.col("__is_robots")
                        & (F.col("__quota_blocked") | cq_blocked),
                        quota_status,
                    )
                    .when(F.col("__is_robots"), F.lit(None).cast("int"))
                    .when(~rb_known, F.lit(FR.S_DEFERRED))
                    .when(~allowed, F.lit(FR.S_ROBOTS_PRECLUDED))
                    # credentialPrecondition sits after robots, before the
                    # quota processor (PreconditionEnforcer chain position)
                    .when(F.col("__form_needed"), F.lit(FR.S_DEFERRED))
                    .when(F.col("__quota_blocked") | cq_blocked, quota_status)
                    .otherwise(F.lit(None).cast("int")),
                )
                .withColumn(
                    "__quota_retire",
                    # contrib blocks never forceRetire (ProcessResult.FINISH
                    # only); only the standard QuotaEnforcer retires
                    (F.col("__forced_status") == FR.S_BLOCKED_BY_QUOTA)
                    & F.lit(cfg.force_retire)
                    & F.col("__quota_blocked"),
                )
                .withColumn(
                    "__defer_reason",
                    F.when(
                        F.col("__is_whois")
                        & (F.col("__whois_defer") == "mark")
                        if whois_on
                        else F.lit(False),
                        F.lit("whois"),
                    ).when(
                        F.col("__is_whois")
                        & (F.col("__whois_defer") == "wait")
                        if whois_on
                        else F.lit(False),
                        F.lit("whois_wait"),
                    ).when(
                        F.col("__is_whois"), F.lit(None).cast("string")
                    ).when(
                        ~F.col("__is_dns") & ~F.col("__dns_known"), F.lit("dns")
                    ).when(
                        ~F.col("__is_dns") & ~F.col("__is_robots") & ~rb_known,
                        F.lit("robots"),
                    ).when(
                        (F.col("__forced_status") == FR.S_DEFERRED)
                        & F.col("__form_needed"),
                        F.lit("form"),
                    ),
                )
                # expiry-driven prerequisites must re-enter the frontier even
                # though their fp is in url_seen: markPrerequisite's
                # forceFetch (CrawlURI.java:1728). First-time prerequisites
                # keep the seen-dedup path (macro-batch analog of the serial
                # one-in-flight-per-queue guarantee that Heritrix never
                # double-schedules a fresh robots fetch).
                .withColumn(
                    "__prereq_force",
                    F.when(F.col("__defer_reason") == "dns", F.col("__dns_stale"))
                    .when(F.col("__defer_reason") == "robots", F.col("__rb_stale"))
                    .otherwise(F.lit(False)),
                )
                .withColumn("__crawl_delay", crawl_delay)
            )
            if auth_on:
                # zone + store columns (config CASE chains — operators/
                # auth.py) and URI-attached credential (the CrawlURI
                # avatar, riding the data bag under a reserved key)
                path_a = F.regexp_extract(
                    "canonical", r"^[^:/?#]+://[^/?#]*(.*)$", 1
                )
                for name, colx in AUTH.zone_cols(
                    F.col("__server"), path_a, cfg.auth_zones, cfg.credentials
                ).items():
                    emitted = emitted.withColumn(name, colx)
                emitted = emitted.withColumn(
                    "__attached_realm",
                    F.col("data").getItem(AUTH.AUTH_DATA_KEY),
                )
                # server-promoted (every-time) credentials: like robots/dns
                # the state table is never broadcast wholesale — semi-join
                # pruned to the round's bounded server set first
                if self.auth_t.exists():
                    pr = (
                        self.auth_t.read(self.spark)
                        .select("server", "realm")
                        .distinct()
                    )
                    pr = pr.join(
                        F.broadcast(round_servers),
                        pr["server"] == F.col("__srv"),
                        "left_semi",
                    ).select(
                        F.col("server").alias("__pr_server"),
                        F.col("realm").alias("__pr_realm"),
                        F.lit(True).alias("__pr_hit"),
                    )
                    emitted = emitted.join(
                        pr,
                        (emitted["__server"] == F.col("__pr_server"))
                        & (emitted["__zone_realm"] == F.col("__pr_realm")),
                        "left",
                    ).drop("__pr_server", "__pr_realm")
                else:
                    emitted = emitted.withColumn(
                        "__pr_hit", F.lit(None).cast("boolean")
                    )
                emitted = emitted.withColumn(
                    "__promoted_ok",
                    F.coalesce(F.col("__pr_hit"), F.lit(False))
                    & F.col("__store_matches"),
                ).drop("__pr_hit")
            if cookie_zoned:
                # cookie zones (operators/cookies.py): does this row's
                # request-cookie set contain the zone's cookie? The store
                # is unbounded (50/domain x all domains) so — like robots —
                # it is semi-join-pruned to the round's bounded
                # host+parent-domain set (cookieStoreFor's composite walk,
                # BdbCookieStore.java:176-190), then path/secure/expiry
                # matched (the HTTP client's cookie-spec step).
                path_ck = F.regexp_extract(
                    "canonical", r"^[^:/?#]+://[^/?#]*(.*)$", 1
                )
                zone_name = F.lit(None).cast("string")
                for srv, pfx, cname in reversed(cfg.cookie_zones):
                    zone_name = F.when(
                        (F.col("__server") == srv) & path_ck.startswith(pfx),
                        F.lit(cname),
                    ).otherwise(zone_name)
                emitted = emitted.withColumn(
                    "__ck_zone",
                    F.when(~F.col("__is_dns"), zone_name),
                )
                if self.cookie_t.exists():
                    host_ck = F.substring_index(F.col("__server"), ":", 1)
                    labels = F.split(host_ck, r"\.")
                    parents = F.transform(
                        F.sequence(F.lit(1), F.size(labels)),
                        lambda i: F.array_join(
                            F.slice(labels, i, F.size(labels) - i + 1), "."
                        ),
                    )
                    zr = emitted.filter(F.col("__ck_zone").isNotNull()).select(
                        F.col("ordinal").alias("__zr_ord"),
                        F.col("__ck_zone").alias("__zr_name"),
                        (
                            F.when(path_ck.startswith("/"), path_ck)
                            .otherwise(F.lit("/"))
                        ).alias("__zr_path"),
                        (
                            F.lower(
                                F.regexp_extract("canonical", r"^([^:/?#]+)://", 1)
                            )
                            == "https"
                        ).alias("__zr_secure"),
                        F.explode(parents).alias("__zr_dom"),
                    )
                    ckt = self.cookie_t.read(self.spark)
                    doms = zr.select(F.col("__zr_dom").alias("__d")).distinct()
                    ckt = ckt.join(
                        F.broadcast(doms), ckt["domain"] == F.col("__d"), "left_semi"
                    )
                    j = zr.join(
                        ckt,
                        (F.col("__zr_dom") == ckt["domain"])
                        & (F.col("__zr_name") == ckt["name"]),
                        "inner",
                    )
                    cp = F.coalesce(ckt["path"], F.lit("/"))
                    path_ok = (F.col("__zr_path") == cp) | (
                        F.col("__zr_path").startswith(cp)
                        & (
                            cp.endswith("/")
                            | (
                                F.substring(
                                    F.col("__zr_path"), F.length(cp) + 1, 1
                                )
                                == "/"
                            )
                        )
                    )
                    fresh = ckt["expiry_s"].isNull() | (
                        ckt["expiry_s"] >= F.lit(self.clock // 1000)
                    )
                    sec_ok = ~ckt["secure"] | F.col("__zr_secure")
                    matched = (
                        j.filter(path_ok & fresh & sec_ok)
                        .select(F.col("__zr_ord").alias("__ok_ord"))
                        .distinct()
                    )
                    emitted = (
                        emitted.join(
                            matched,
                            emitted["ordinal"] == F.col("__ok_ord"),
                            "left",
                        )
                        .withColumn("__cookie_ok", F.col("__ok_ord").isNotNull())
                        .drop("__ok_ord")
                    )
                else:
                    emitted = emitted.withColumn("__cookie_ok", F.lit(False))
        else:
            emitted = (
                emitted.withColumn("__server", F.lit(""))
                .withColumn("__is_dns", F.lit(False))
                .withColumn("__is_robots", F.lit(False))
                .withColumn("__forced_status", F.lit(None).cast("int"))
                .withColumn("__quota_blocked", F.lit(False))
                .withColumn("__quota_retire", F.lit(False))
                .withColumn("__q_server", F.lit(None).cast("string"))
                .withColumn("__q_host", F.lit(None).cast("string"))
                .withColumn("__q_group", F.lit(None).cast("string"))
                .withColumn("__cq_ann", F.lit(None).cast("string"))
                .withColumn("__defer_reason", F.lit(None).cast("string"))
                .withColumn("__crawl_delay", F.lit(None).cast("double"))
            )
        if map_uri_on:
            # mapper sits before the precondition/quota chain: a diverted
            # row never defers, injects a prerequisite, or charges quota
            # (S_BLOCKED_BY_CUSTOM_PROCESSOR -> disregard disposition)
            emitted = (
                emitted.withColumn(
                    "__forced_status",
                    F.when(
                        F.col("__map_divert"),
                        F.lit(FR.S_BLOCKED_BY_CUSTOM_PROCESSOR),
                    ).otherwise(F.col("__forced_status")),
                )
                .withColumn(
                    "__quota_retire",
                    F.col("__quota_retire") & ~F.col("__map_divert"),
                )
                .withColumn(
                    "__defer_reason",
                    F.when(
                        F.col("__map_divert"), F.lit(None).cast("string")
                    ).otherwise(F.col("__defer_reason")),
                )
            )

        if rt_block:
            # BLOCK_URIS (RuntimeLimitEnforcer.java:186-190): every emitted
            # URI this round is S_BLOCKED_BY_RUNTIME_LIMIT — a global kill
            # switch that wins over every other gate (incl. the mapper)
            emitted = (
                emitted.withColumn(
                    "__forced_status",
                    F.lit(FR.S_BLOCKED_BY_RUNTIME_LIMIT),
                )
                .withColumn("__quota_retire", F.lit(False))
                .withColumn("__defer_reason", F.lit(None).cast("string"))
            )

        # --- fetch (synthetic: join against the web documents table) ----
        # an explicit content_type column on the web table is the synthetic
        # analog of the server's Content-Type header (FetchHTTP); absent
        # that, the type derives from path/extension (functions/mime.py)
        web_has_ct = "content_type" in self.web.columns
        web_cols = [F.col("doc_id"), F.col("spans")]
        if web_has_ct:
            web_cols.append(F.col("content_type").alias("__web_ct"))
        web = self.web.select(*web_cols)
        fetched = emitted.join(web, emitted["canonical"] == web["doc_id"], "left")
        status = F.when(F.col("doc_id").isNotNull(), F.lit(200)).otherwise(F.lit(404))
        if whois_on:
            from heritrix3_spark.operators import whois as WH

            # server-ful whois fetch: recorded response -> 2001 text/plain
            # (FetchWhois.java:357-358), none -> connect failure (-2,
            # retryable :359-366). Overrides still win (the coalesce below).
            status = F.when(
                F.col("__whois_serverful"),
                F.when(
                    F.col("doc_id").isNotNull(), F.lit(WH.S_WHOIS_SUCCESS)
                ).otherwise(F.lit(FR.S_CONNECT_FAILED)),
            ).otherwise(status)
        if self.overrides is not None:
            ov = self.overrides.select(
                F.col("canonical").alias("__ov_canon"), F.col("status").alias("__ov_status")
            )
            fetched = fetched.join(ov, fetched["canonical"] == ov["__ov_canon"], "left")
            status = F.coalesce(F.col("__ov_status"), status)
        if cookie_zoned:
            # cookie-zone gate: a zoned row whose request-cookie set lacks
            # the zone cookie answers 403 (the synthetic server's session
            # check). Applied before the auth law so a 401 wins overlap.
            ck_gate = F.col("__ck_zone").isNotNull() & ~F.col("__cookie_ok")
            if whois_on:
                ck_gate = ck_gate & ~F.col("__is_whois")
            status = F.when(ck_gate, F.lit(403)).otherwise(status)
        if auth_on:
            # 401 law (FetchHTTPRequest.populateTargetCredential +
            # handle401): a zone-protected fetch answers 401 unless creds
            # are presented — URI-attached (this row is the post-attach
            # retry), server-promoted state, or promoted by an earlier
            # attached success in THIS round's same-queue batch (the batch
            # analog of the reference's serial promote-then-fetch-next;
            # single window in insert-key order, auth-only cost)
            attached_ok = F.coalesce(
                (F.col("__attached_realm") == F.col("__zone_realm"))
                & F.col("__store_matches"),
                F.lit(False),
            )
            raw_2xx = (status >= 200) & (status < 300)
            fetched = fetched.withColumn(
                "__promotes",
                F.coalesce(attached_ok & raw_2xx, F.lit(False)),
            )
            w_auth = (
                Window.partitionBy("class_key")
                .orderBy(*FR.insert_key_order())
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            intra_ok = (
                F.coalesce(
                    F.max(F.col("__promotes").cast("int")).over(w_auth),
                    F.lit(0),
                )
                == 1
            ) & F.col("__store_matches")
            fetched = fetched.withColumn(
                "__auth_ok",
                attached_ok | F.col("__promoted_ok") | intra_ok,
            )
            auth_gate = (
                F.col("__zone_realm").isNotNull()
                & ~F.col("__is_dns")
                & ~F.col("__auth_ok")
            )
            if whois_on:
                auth_gate = auth_gate & ~F.col("__is_whois")
            status = F.when(
                auth_gate, F.lit(AUTH.HTTP_UNAUTHORIZED)
            ).otherwise(status)
        # deferred / robots-precluded URIs never reach the fetcher; dns:
        # lookups resolve synthetically (S_DNS_SUCCESS, FetchStatusCodes:113)
        # whois serverless terminals (-62/2002) never fetch at all, so they
        # beat the web join AND the overrides (no network happened)
        status = F.coalesce(
            F.col("__forced_status"),
            F.when(F.col("__is_dns"), F.lit(FR.S_DNS_SUCCESS)),
            F.col("__whois_term") if whois_on else F.lit(None).cast("int"),
            status,
        )
        fetched = (
            # cast pins the column to int even when an overrides DataFrame
            # supplies long statuses (mixed parquet types would break the
            # events table's delta-append reads)
            fetched.withColumn("fetch_status", status.cast("int"))
            .withColumn("__no_fetch", F.col("__forced_status").isNotNull())
            .withColumn("fetch_duration", F.lit(cfg.fetch_duration_ms).cast("long"))
        )
        # content-type model (CrawlURI.setContentType threading): NULL for
        # never-fetched / payload-less rows; "text/dns" for dns lookups;
        # else web-provided header analog -> extension -> text/html default
        has_listing = (
            F.coalesce(
                F.exists("spans", lambda s: s["kind"] == "listing"),
                F.lit(False),
            )
            if cfg.ftp == "on"
            else None
        )
        ct_col = MIME.content_type_col(
            F.col("canonical"),
            F.col("doc_id").isNotNull()
            & (F.col("fetch_status") >= 200)
            & ~F.col("__no_fetch"),
            F.col("__is_dns") & ~F.col("__no_fetch"),
            web_ct=F.col("__web_ct") if web_has_ct else None,
            is_ftp_dir=has_listing,
        )
        if whois_on:
            from heritrix3_spark.operators import whois as WH

            # fetch() sets text/plain on a whois success (FetchWhois:357)
            ct_col = F.when(
                F.col("fetch_status") == WH.S_WHOIS_SUCCESS,
                F.lit("text/plain"),
            ).otherwise(ct_col)
        fetched = fetched.withColumn("content_type", ct_col).withColumn(
            "content_bytes", self._content_size_col()
        )
        if web_has_ct:
            fetched = fetched.drop("__web_ct")

        timer.mark("fetch-plan")
        # disposition law columns
        creds_loaded = None
        if auth_on:
            # handle401 would attach a store credential: zone-protected,
            # not already tried (attached), and the store has the realm.
            # Already-attached 401s "die a natural 401 death" (detach is
            # implicit — the failed row tombstones out of the frontier).
            creds_loaded = (
                F.col("__zone_realm").isNotNull()
                & F.col("__attached_realm").isNull()
                & F.col("__store_has")
            )
        fetched = (
            fetched.withColumn("__attempts", F.col("fetch_attempts") + 1)
            .withColumn(
                "__retry",
                FR.needs_retry_col(
                    F.col("fetch_status"),
                    F.col("__attempts"),
                    creds_loaded=creds_loaded,
                ),
            )
            .withColumn("__disregard", FR.is_disregarded_col(F.col("fetch_status")))
            .withColumn("__success", FR.is_success_col(F.col("fetch_status")))
            .withColumn(
                "__politeness",
                FR.politeness_delay_col(
                    F.col("fetch_duration"),
                    F.col("__crawl_delay"),
                    cfg.delay_factor,
                    cfg.min_delay_ms,
                    cfg.max_delay_ms,
                ),
            )
            .withColumn(
                "disposition",
                # forceRetire'd over-quota URIs are never disposed
                # (QuotaEnforcer.applyQuota: "retire queue without
                # disposing URI") — they re-queue and the queue retires
                F.when(F.col("__quota_retire"), F.lit("blocked"))
                .when(F.col("__retry"), F.lit("retry"))
                .when(F.col("__success"), F.lit("success"))
                .when(F.col("__disregard"), F.lit("disregard"))
                .otherwise(F.lit("fail")),
            )
        )
        # localCheckpoint, not persist: every downstream action (journal,
        # documents sink, candidates, host/quota updates) re-plans from this
        # frame; truncating lineage keeps those plans shallow
        fetched = self._ckpt(fetched)
        timer.mark("fetch-barrier")

        # --- revisit detection (IdenticalPayloadDigestRevisit law) --------
        # a success whose payload digest was recorded before (earlier round
        # via digest_seen, or an earlier ordinal this round) logs the
        # reference's "duplicate:digest" annotation
        if cfg.digest_history:
            fetched = self._attach_revisit(fetched)
            rev_ann = F.when(F.col("__revisit"), F.lit("duplicate:digest"))
        else:
            rev_ann = F.lit(None).cast("string")
        if cfg.trap_suppress:
            fetched = self._attach_trap(fetched)
            trap_ann = F.when(F.col("__trap"), F.lit("trapSuppressExtractor"))
        else:
            trap_ann = F.lit(None).cast("string")
        map_ann = (
            F.when(
                F.col("__map_divert"),
                F.concat(F.lit("to:"), F.col("__map_target")),
            )
            if (map_uri_on and not rt_block)
            else F.lit(None).cast("string")
        )
        rt_ann = (
            F.lit(f"Runtime exceeded {cfg.runtime_limit_s * 1000}ms")
            if rt_block
            else F.lit(None).cast("string")
        )
        # ExtractorHTMLForms + FormLoginProcessor (operators/forms.py):
        # "form:" annotations, submit/nosubmit annotations, and the round's
        # synthesized 'S'-hop submission candidates
        forms_on = cfg.forms == "on"
        amqp_on = cfg.amqp == "on"
        form_submits = None
        if forms_on:
            fetched, form_ann, form_submits = self._attach_forms(fetched)
        else:
            form_ann = F.lit(None).cast("string")
        # contrib quota annotation only when the contrib gate actually
        # blocked this row (the standard QuotaEnforcer ran first: its block
        # — retire or bare -5003 — suppresses the contrib FINISH)
        cq_ann = F.when(
            (F.col("__forced_status") == FR.S_BLOCKED_BY_QUOTA)
            & ~F.col("__quota_blocked"),
            F.col("__cq_ann"),
        )
        # receivedFromAMQP rides the injected row's data map and is the
        # FIRST annotation (added at makeCrawlUri, before any fetch-time
        # annotation — AMQPUrlReceiver.java:438)
        if amqp_on:
            from heritrix3_spark.operators import amqp as AMQP

            amqp_ann = F.when(
                F.try_element_at(
                    F.col("data"), F.lit(AMQP.AMQP_KEY)
                ).isNotNull(),
                F.lit(AMQP.A_RECEIVED_FROM_AMQP),
            )
        else:
            amqp_ann = F.lit(None).cast("string")
        joined_ann = F.concat_ws(
            ",", amqp_ann, rt_ann, map_ann, cq_ann, rev_ann, trap_ann, form_ann
        )
        annotation = F.when(F.length(joined_ann) > 0, joined_ann).otherwise(
            F.lit(None).cast("string")
        )

        # --- crawl log / journal rows (one combined events append) --------
        log_rows = fetched.filter(F.col("disposition") != "blocked").select(
            F.lit(self.round).alias("round"),
            F.when(F.col("disposition") == "success", "Fs")
            .when(F.col("disposition") == "retry", "Fr")
            .when(F.col("disposition") == "disregard", "Fd")
            .otherwise("Ff")
            .alias("tag"),
            "class_key",
            "uri",
            "canonical",
            "ordinal",
            "fetch_status",
            "disposition",
            "is_seed",
            annotation.alias("annotation"),
            F.col("data").getItem("source_tag").alias("source_tag"),
            "content_type",
            F.col("content_bytes").alias("content_length"),
            # event time for streaming consumers: the round's virtual clock
            # (windowed aggs + watermarks key on this, journal_stream.py)
            F.lit(self.clock).cast("long").alias("clock_ms"),
        )

        # --- documents sink (WARC analog): span payload + content digest ---
        fetched_ok = fetched.filter(
            (F.col("fetch_status") >= 200) & (F.col("fetch_status") < 300)
            & F.col("spans").isNotNull()
        )
        docs_rows = fetched_ok.select(
            F.col("canonical").alias("doc_id"),
            "spans",
            F.sha1(F.to_json("spans")).alias("content_digest"),
            F.lit(self.round).alias("fetch_round"),
            "content_type",
        )
        warc_stats_on = (
            cfg.warc_limits or cfg.max_warc_novel_bytes > 0 or cfg.max_warc_novel_urls > 0
        )

        def _commit_documents() -> None:
            # reads only the checkpointed `fetched` frame; sole writer of
            # documents_out — safe to overlap with the extract/prepare
            # stage and the other round-end chains
            self.documents_t.append(docs_rows)
            if warc_stats_on:
                self._update_warc_stats(fetched_ok)

        self._submit_commit("documents", _commit_documents)
        timer.mark("documents-append")

        # --- outlink extraction -> scope -> prepare -> dedup -------------
        page_ok = (F.col("fetch_status") >= 200) & (F.col("fetch_status") < 400)
        if cfg.process_error_outlinks:
            # error responses are real fetches (never the gate's synthetic
            # forced statuses), so >=100 & ~no_fetch bounds them; a
            # 401-with-creds RETRY is not finished — its final visit
            # extracts (simulator-parity law)
            page_ok = page_ok | (
                (F.col("fetch_status") >= 100)
                & ~F.col("__no_fetch")
                & ~F.col("__retry")
            )
        if cfg.trap_suppress:
            page_ok = page_ok & ~F.coalesce(F.col("__trap"), F.lit(False))
        span_src = F.col("spans")
        if cfg.mime_extract_gate:
            # ExtractorHTML.shouldExtract mime gate (ExtractorHTML.java:
            # 777-790): non-HTML pages yield no content-derived outlinks.
            # Redirect 'location' spans survive — they model ExtractorHTTP
            # (header-based), which the reference never mime-gates.
            span_src = F.when(
                MIME.html_extract_gate_col(F.col("content_type")),
                F.col("spans"),
            ).otherwise(F.filter("spans", lambda s: s["kind"] == "location"))
        pages = fetched.filter(page_ok).select(
            F.col("canonical").alias("page"),
            F.col("uri").alias("parent_uri"),
            F.col("hops_path").alias("parent_hops"),
            F.col("ordinal").alias("parent_ordinal"),
            F.col("is_seed").alias("parent_is_seed"),
            F.col("data").alias("parent_data"),
            span_src.alias("spans"),
        )
        outlinks = extract_outlinks_from_spans(pages, doc_id="page", spans="spans").join(
            pages.drop("spans"), F.col("doc_id") == F.col("page")
        )
        cand = outlinks.select(
            F.col("url").alias("uri"),
            SC.extend_hops_path_col(F.col("parent_hops"), F.col("hop")).alias("hops_path"),
            F.col("parent_uri").alias("via"),
            F.col("context").alias("via_context"),
            F.lit(FR.NORMAL).alias("sched_directive"),
            "parent_is_seed",
            "parent_ordinal",
            "outlink_index",
            # inheritFrom (CrawlURI.java:1469-1483): children copy the
            # parent's heritable data map at candidate creation
            F.col("parent_data").alias("data"),
        )
        if cfg.text_extractors:
            from heritrix3_spark.operators.extract import text_extractor_chain_udf

            chain = text_extractor_chain_udf(cfg.text_extractors)
            body = F.array_join(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == "text"),
                    lambda s: s["text"],
                ),
                "\n",
            )
            tx = pages.select(
                "parent_uri", "parent_hops", "parent_ordinal", "parent_is_seed",
                "parent_data",
                F.size("spans").alias("__nspans"),
                F.posexplode(chain(F.col("page"), body)).alias("pos", "l"),
            )
            extra = tx.select(
                F.col("l.url").alias("uri"),
                SC.extend_hops_path_col(F.col("parent_hops"), F.col("l.hop")).alias("hops_path"),
                F.col("parent_uri").alias("via"),
                F.col("l.context").alias("via_context"),
                F.lit(FR.NORMAL).alias("sched_directive"),
                "parent_is_seed",
                "parent_ordinal",
                (F.col("__nspans") + F.col("pos")).alias("outlink_index"),
                F.col("parent_data").alias("data"),
            )
            cand = cand.unionByName(extra)
        if cfg.ftp == "on":
            # FetchFTP link laws (operators/ftp.py; FetchFTP.java:470-478):
            # fetch-side, so neither the mime gate nor TrapSuppressExtractor
            # applies, and the parent link fires on EVERY completed ftp
            # fetch (even a failed RETR — the reference's addParent runs
            # after the data-socket block unconditionally). Children of a
            # 2xx directory = non-empty NLST lines, form-encoded
            # (F.url_encode IS java.net.URLEncoder — the exact law).
            from heritrix3_spark.operators.ftp import NAVLINK_MISC

            is_ftp = F.col("canonical").startswith("ftp://")
            real = (
                (F.col("fetch_status") >= 100)
                & ~F.col("__no_fetch")
                & ~F.col("__retry")
            )
            listing_txt = F.array_join(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == "listing"),
                    lambda s: s["text"],
                ),
                "\n",
            )
            is_dir = (
                F.coalesce(
                    F.exists("spans", lambda s: s["kind"] == "listing"),
                    F.lit(False),
                )
                & (F.col("fetch_status") >= 200)
                & (F.col("fetch_status") < 300)
            )
            files = (
                F.when(
                    is_dir,
                    F.filter(
                        F.split(listing_txt, r"\r\n|\r|\n"),
                        lambda ln: F.length(ln) > 0,
                    ),
                ).otherwise(F.array().cast("array<string>"))
                if cfg.ftp_extract_from_dirs
                else F.array().cast("array<string>")
            )
            ftp_pages = fetched.filter(is_ftp & real).select(
                F.col("uri").alias("parent_uri"),
                "canonical",
                F.col("hops_path").alias("parent_hops"),
                F.col("ordinal").alias("parent_ordinal"),
                F.col("is_seed").alias("parent_is_seed"),
                F.col("data").alias("parent_data"),
                files.alias("__files"),
            )
            base = F.regexp_replace(F.col("canonical"), "/$", "")
            children = ftp_pages.select(
                "*", F.posexplode("__files").alias("pos", "__fname")
            ).select(
                F.concat(base, F.lit("/"), F.url_encode("__fname")).alias("uri"),
                SC.extend_hops_path_col(F.col("parent_hops"), F.lit("L")).alias(
                    "hops_path"
                ),
                F.col("parent_uri").alias("via"),
                F.lit(NAVLINK_MISC).alias("via_context"),
                F.lit(FR.NORMAL).alias("sched_directive"),
                "parent_is_seed",
                "parent_ordinal",
                F.col("pos").alias("outlink_index"),
                F.col("parent_data").alias("data"),
            )
            cand = cand.unionByName(children)
            if cfg.ftp_extract_parent:
                # currentHierPath law (ftp.parent_url scalar twin): path
                # minus its last segment; root-level files parent at "/"
                path = F.regexp_extract(
                    "canonical", r"^[^:/?#]+://[^/?#]*([^?#]*)", 1
                )
                sa = F.regexp_extract("canonical", r"^([^:/?#]+://[^/?#]*)", 1)
                cut = (
                    F.length(path)
                    - F.length(F.substring_index(path, "/", -1))
                    - 1
                )
                ppath = F.when(cut <= 0, F.lit("/")).otherwise(
                    F.substring(path, F.lit(1), cut)
                )
                parents = ftp_pages.filter(
                    ~F.col("canonical").rlike(r"^[^:/?#]+://[^/?#]*(/)?([?#]|$)")
                ).select(
                    F.concat(sa, ppath).alias("uri"),
                    SC.extend_hops_path_col(
                        F.col("parent_hops"), F.lit("L")
                    ).alias("hops_path"),
                    F.col("parent_uri").alias("via"),
                    F.lit(NAVLINK_MISC).alias("via_context"),
                    F.lit(FR.NORMAL).alias("sched_directive"),
                    "parent_is_seed",
                    "parent_ordinal",
                    F.size("__files").alias("outlink_index"),
                    F.col("parent_data").alias("data"),
                )
                cand = cand.unionByName(parents)
        if whois_on:
            # addWhoisLinks (FetchWhois.java:437-460): fetch-chain position
            # (fetchWhois sits between fetchDns and fetchHttp in the
            # profile), so the 0-2 'I' links precede every content link
            # (negative outlink indices) and fire for ANY completed fetch —
            # even a 404's chain pass added them before FetchHTTP ran.
            # Retry passes (401 re-attach) extract nothing, like spans.
            from heritrix3_spark.functions import psl as PSL
            from heritrix3_spark.functions.surt import synthetic_ip_col
            from heritrix3_spark.operators import whois as WH

            w_real = (
                (F.col("fetch_status") >= 100)
                & ~F.col("__no_fetch")
                & ~F.col("__retry")
                & ~F.col("__is_dns")
                & ~F.col("__is_whois")
                & (F.col("__server") != "")
            )
            w_host = F.substring_index(F.col("__server"), ":", 1)
            w_lit = w_host.rlike("^" + WH.IP_ADDRESS_REGEX + "$")
            # CrawlHost.getIP(): IPv4 literals resolve at construction
            # (CrawlHost.java:97-99); otherwise the IP exists exactly when
            # dns ran (the precondition guarantees it for fetch-chain rows)
            w_ip = F.when(w_lit, w_host).when(
                F.lit(cfg.dns == "obey"), synthetic_ip_col(w_host)
            )
            w_targets = F.filter(
                F.array(
                    F.when(
                        w_ip.isNotNull(), F.concat(F.lit("whois:"), w_ip)
                    ),
                    F.when(
                        WH.is_valid_domain_col(w_host),
                        F.concat(
                            F.lit("whois:"),
                            PSL.assignment_level_domain_col(w_host),
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
            wcand = (
                fetched.filter(w_real)
                .select(
                    F.col("uri").alias("parent_uri"),
                    F.col("hops_path").alias("parent_hops"),
                    F.col("ordinal").alias("parent_ordinal"),
                    F.col("is_seed").alias("parent_is_seed"),
                    F.col("data").alias("parent_data"),
                    F.posexplode(w_targets).alias("pos", "__wuri"),
                )
                .select(
                    F.col("__wuri").alias("uri"),
                    SC.extend_hops_path_col(
                        F.col("parent_hops"), F.lit("I")
                    ).alias("hops_path"),
                    F.col("parent_uri").alias("via"),
                    F.lit(WH.INFERRED_MISC).alias("via_context"),
                    F.lit(FR.NORMAL).alias("sched_directive"),
                    "parent_is_seed",
                    "parent_ordinal",
                    (F.col("pos") - 3).alias("outlink_index"),
                    F.col("parent_data").alias("data"),
                )
            )
            cand = cand.unionByName(wcand)
        if cfg.robots == "obey" or cfg.dns == "obey" or form_on or whois_on:
            # deferred triggers inject their prerequisite (dns:host,
            # /robots.txt, or the form-credential login URI): 'P' hop,
            # HIGHEST directive, rides the trigger's queue
            # (CrawlURI.markPrerequisite, CrawlURI.java:1717-1735);
            # ordered before the trigger round's outlinks via
            # outlink_index=-1. via = the trigger's CANONICAL so the
            # prerequisite provably lands in the trigger's queue (Heritrix's
            # UURI layer lowercases hosts before the queue policy sees them;
            # canonical is our equivalent normalization).
            prereq_uri = F.when(
                F.col("__defer_reason") == "dns",
                F.concat(F.lit("dns:"), F.col("__server")),
            ).otherwise(
                F.concat(
                    F.regexp_extract("canonical", r"^([^:/?#]+)://", 1),
                    F.lit("://"),
                    F.col("__server"),
                    F.lit("/robots.txt"),
                )
            )
            if form_on:
                login_uri = F.lit(None).cast("string")
                for dom, lu in reversed(cfg.form_credentials):
                    login_uri = F.when(
                        F.col("__server") == dom, F.lit(lu)
                    ).otherwise(login_uri)
                prereq_uri = F.when(
                    F.col("__defer_reason") == "form", login_uri
                ).otherwise(prereq_uri)
            if whois_on:
                # markPrerequisite(tryThis) — FetchWhois.java:287-289; the
                # "wait" re-defer (:296-299) injects NO prerequisite
                prereq_uri = F.when(
                    F.col("__defer_reason") == "whois", F.col("__whois_try")
                ).otherwise(prereq_uri)
            prereq_rows = F.col("fetch_status") == FR.S_DEFERRED
            if whois_on:
                prereq_rows = prereq_rows & F.coalesce(
                    F.col("__defer_reason") != "whois_wait", F.lit(True)
                )
            prereqs = fetched.filter(prereq_rows).select(
                prereq_uri.alias("uri"),
                SC.extend_hops_path_col(F.col("hops_path"), F.lit("P")).alias("hops_path"),
                F.col("canonical").alias("via"),
                F.lit("prereq").alias("via_context"),
                F.lit(FR.HIGHEST).alias("sched_directive"),
                F.lit(False).alias("parent_is_seed"),
                F.col("ordinal").alias("parent_ordinal"),
                F.lit(-1).alias("outlink_index"),
                F.col("data"),
                F.col("__prereq_force").alias("force_hint"),
            )
            cand = prereqs.unionByName(cand.withColumn("force_hint", F.lit(False)))
        else:
            cand = cand.withColumn("force_hint", F.lit(False))
        if form_submits is not None:
            # FormLoginProcessor submission CrawlURIs enter the candidate
            # chain like any outCandidate (scope runs; forceFetch bypasses
            # url-seen — via_context != "prereq" so no prereq dedup)
            cand = cand.unionByName(form_submits)
        if amqp_on and self._amqp_pending:
            # AMQPUrlReceiver injection (runCandidateChain analog): parsed
            # messages enter THIS round's candidate chain, ordered before
            # the round's own outlinks (parent_ordinal -1, message order)
            from heritrix3_spark.operators import amqp as AMQP

            inj = self.spark.createDataFrame(
                [
                    (
                        m["uri"], m["hops_path"], m["via"], m["via_context"],
                        m["sched_directive"], False, -1, i, m["data"],
                        m["force"],
                    )
                    for i, m in enumerate(self._amqp_pending)
                ],
                "uri string, hops_path string, via string, via_context "
                "string, sched_directive int, parent_is_seed boolean, "
                "parent_ordinal long, outlink_index long, "
                "data map<string,string>, force_hint boolean",
            )
            cand = cand.unionByName(inj)
            self._amqp_pending = []
        # seedsRedirectNewSeeds (CandidatesProcessor.java:186-194): a seed's
        # 'R'-hop discovery within 5 hops is itself a seed (pre-scope mark)
        promoted = (
            F.lit(cfg.seeds_redirect_new_seeds)
            & F.col("parent_is_seed")
            & (F.substring(F.col("hops_path"), -1, 1) == "R")
            & (F.length(F.col("hops_path")) < 5)
        )
        if amqp_on:
            # message isSeed -> the checkForSeedPromotion path (forceFetch,
            # MEDIUM-if-NORMAL, addSeed announce), AMQPUrlReceiver.java:436
            from heritrix3_spark.operators import amqp as AMQP

            promoted = promoted | F.try_element_at(
                F.col("data"), F.lit(AMQP.SEED_KEY)
            ).isNotNull()
        cand = cand.withColumn("is_seed", promoted).drop("parent_is_seed")
        surt_hit = None
        if self.prefix_join_mode:
            # 10^6-seed path: the acceptSurts membership test is a broadcast
            # left join on the candidate's authority-level SURT (identical
            # comparison key to the InSet path — scope.surt_auth_level_col)
            # against the distinct seed-prefix table. The plan stays O(1)
            # in seed count; equality-join against a distinct right side
            # cannot duplicate candidate rows.
            pref = F.broadcast(
                self.seed_prefix_t.read(self.spark)
                .distinct()
                .withColumnRenamed("prefix", "__seed_prefix")
            )
            cand = cand.join(
                pref,
                SC.surt_auth_level_col(F.col("uri")) == F.col("__seed_prefix"),
                "left",
            )
            surt_hit = F.col("__seed_prefix").isNotNull()
        # the scope chain is a large Column tree; memo keyed on the prefix
        # count because discovered-seed promotion APPENDS prefixes mid-crawl
        # (the list's only mutation) — any growth rebuilds the tree
        sk = ("scope", len(self.seed_prefixes))
        scope_ok = self._col_memo.get(sk)
        if scope_ok is None:
            scope_ok = SC.default_scope(
                F.col("uri"), F.col("hops_path"), self.seed_prefixes,
                cfg.max_hops, surt_hit=surt_hit,
            )
            if cfg.seed_accept:
                # SeedAcceptDecideRule late position: seeds always pass
                scope_ok = scope_ok | F.col("is_seed")
            self._col_memo[sk] = scope_ok
        in_scope = cand.filter(scope_ok)
        if self.prefix_join_mode:
            in_scope = in_scope.drop("__seed_prefix")
        prepared = self._prepare(in_scope)
        if amqp_on:
            # AMQP 'I'-hop rows carry uriPrecedence 1
            # (AMQPUrlReceiver.java:430-433), overriding the cost policy
            from heritrix3_spark.operators import amqp as AMQP

            prepared = prepared.withColumn(
                "precedence",
                F.when(
                    F.try_element_at(
                        F.col("data"), F.lit(AMQP.PREC_KEY)
                    ).isNotNull(),
                    F.lit(1),
                ).otherwise(F.col("precedence")),
            )
        # checkForSeedPromotion (:270-278): discovered seeds get MEDIUM +
        # forceFetch (HER-1891); plus the redirect-canonical-collision
        # forceFetch law (FrontierPreparer.java:236-256)
        last_hop = F.substring(F.col("hops_path"), -1, 1)
        collision = (
            (last_hop == "R")
            & F.col("via").isNotNull()
            & (F.col("canonical") == canonical_col(F.col("via")))
            & (F.col("uri") != F.col("via"))
        )
        prepared = prepared.withColumn(
            "sched_directive",
            F.when(
                F.col("is_seed")
                & F.col("via").isNotNull()
                & (F.col("sched_directive") == FR.NORMAL),
                F.lit(FR.MEDIUM),
            ).otherwise(F.col("sched_directive")),
        ).withColumn(
            "force_fetch",
            (F.col("is_seed") & F.col("via").isNotNull())
            | collision
            | F.col("force_hint"),
        )
        # forceFetch rows bypass BOTH the in-batch dedup and the url-seen
        # anti-join (processScheduleAlways / addForce,
        # WorkQueueFrontier.java:347-379). In-batch first-discovery wins for
        # normal rows, and an EARLIER forced discovery claims the fp too
        # (serial addForce marks it seen) — so rank over normal+forced and
        # keep a normal row only when it is its fp's first discovery.
        w = Window.partitionBy("fp").orderBy("parent_ordinal", "outlink_index")
        # localCheckpoint: the forced/normal split reads this frame twice —
        # without the barrier each branch re-executes the whole extract ->
        # scope -> prepare (pandas-UDF) subtree
        ranked_cand = self._ckpt(
            prepared.withColumn("__rk", F.row_number().over(w))
        )
        timer.mark("extract-prepare-barrier")
        # --- CrawlMapper check-outlinks (CrawlMapper.java:215-233): post-
        # scope candidates mapped to another node are removed pre-url-seen
        # (the other node crawls them — they are never marked seen here).
        # Filtering AFTER the __rk window is safe: same-fp rows share a
        # canonical, hence a class_key, hence a target.
        divert_cand = None
        if map_out_on:
            ranked_cand = ranked_cand.withColumn(
                "__map_target", self._mapper_target_col(F.col("class_key"))
            )
            divert_cand = ranked_cand.filter(
                F.col("__map_target") != F.lit(cfg.mapper_local_name)
            )
            ranked_cand = ranked_cand.filter(
                F.col("__map_target") == F.lit(cfg.mapper_local_name)
            ).drop("__map_target")
        # forced rows bypass dedup wholesale EXCEPT expiry-forced
        # prerequisites, which dedup first-wins per fp within the batch
        # (serial Heritrix emits one refetch per validity window; k>1 rounds
        # would otherwise schedule one robots refetch per deferred trigger)
        is_forced_prereq = F.col("force_fetch") & (
            F.col("via_context") == F.lit("prereq")
        )
        w_pre = Window.partitionBy("fp").orderBy("parent_ordinal", "outlink_index")
        pre_first = (
            ranked_cand.filter(is_forced_prereq)
            .withColumn("__pk", F.row_number().over(w_pre))
            .filter(F.col("__pk") == 1)
            .drop("__pk", "__rk")
        )
        forced = (
            ranked_cand.filter(F.col("force_fetch") & ~is_forced_prereq)
            .drop("__rk")
            .unionByName(pre_first)
        )
        first = (
            ranked_cand.filter(~F.col("force_fetch") & (F.col("__rk") == 1))
            .drop("__rk")
        )
        novel = self.urlseen.filter_novel(first).unionByName(forced)
        novel = self._assign_ordinals(
            novel, ["parent_ordinal", "outlink_index"], defer_count=True
        )
        timer.mark("ordinal-assign")
        cand_data = F.col("data")
        if auth_on:
            # credentials are NOT heritable: children/prerequisites never
            # inherit the parent's attached-realm key (the reference keeps
            # credential avatars outside the heritable data bag)
            cand_data = F.when(
                F.col("data").isNotNull(),
                F.map_filter("data", lambda k, _v: k != AUTH.AUTH_DATA_KEY),
            )
        if forms_on:
            # A_SUBMIT_DATA/A_SUBMIT_ENCTYPE are NOT heritable either —
            # only the submit row itself (hop 'S') carries them; its
            # children never inherit (the keys are URI-local state)
            from heritrix3_spark.operators import forms as FORMS

            cand_data = F.when(
                F.substring(F.col("hops_path"), -1, 1) == "S", cand_data
            ).otherwise(
                F.when(
                    cand_data.isNotNull(),
                    F.map_filter(
                        cand_data,
                        lambda k, _v: (k != FORMS.SUBMIT_DATA_KEY)
                        & (k != FORMS.SUBMIT_ENCTYPE_KEY),
                    ),
                )
            )
        if amqp_on:
            # the AMQP flags + customHttpRequestHeaders are URI-local
            # (CrawlURI.getData is not heritable in the reference): only
            # the injected row itself (context =INFERRED_MISC) keeps them
            from heritrix3_spark.operators import amqp as AMQP

            cand_data = F.when(
                F.col("via_context") == AMQP.INFERRED_MISC, cand_data
            ).otherwise(
                F.when(
                    cand_data.isNotNull(),
                    F.map_filter(
                        cand_data,
                        lambda k, _v: ~k.isin(*AMQP.NON_HERITABLE_KEYS),
                    ),
                )
            )
        novel_rows = self._ckpt(
            novel.select(
                "uri", "canonical", "fp", "class_key", "is_seed",
                "hops_path", "via", "via_context", "sched_directive",
                "precedence", "cost", "ordinal",
                F.lit(0).alias("fetch_attempts"), "force_fetch",
                cand_data.alias("data"),
            )
        )
        if getattr(self, "_ordinals_deferred", False):
            # deferred-ordinal bookkeeping: count the checkpointed frame
            # (reads materialized blocks — no pipeline re-execution)
            self._last_novel_count = novel_rows.count()
            self.next_ordinal += self._last_novel_count
            self._ordinals_deferred = False
        # forced rows are rare and round-bounded: collect them (tiny) to
        # drive the exact-path seen insert + the addSeed scope announce
        forced_rows = novel_rows.filter(F.col("force_fetch")).select(
            "canonical", "is_seed", "via", "fp"
        ).collect()
        timer.mark("dedup+ordinals")
        ev_rows = log_rows.unionByName(
            novel_rows.select(
                F.lit(self.round).alias("round"),
                F.lit("F+").alias("tag"),
                "class_key",
                "uri",
                "canonical",
                "ordinal",
                F.lit(None).cast("int").alias("fetch_status"),
                F.lit(None).cast("string").alias("disposition"),
                "is_seed",
                F.lit(None).cast("string").alias("annotation"),
                F.col("data").getItem("source_tag").alias("source_tag"),
                F.lit(None).cast("string").alias("content_type"),
                F.lit(None).cast("long").alias("content_length"),
                F.lit(self.clock).cast("long").alias("clock_ms"),
            )
        )

        # addSeed announce: promoted seeds extend the scope's SURT-prefix
        # set for subsequent rounds (SurtPrefixedDecideRule.addedSeed)
        new_prefixes = SC.seed_surt_prefixes(
            [r.canonical for r in forced_rows if r.is_seed and r.via is not None]
        )
        if self.prefix_join_mode:
            # announce lands in the prefix table (tiny append; reads
            # distinct() so a re-announced prefix is harmless)
            if new_prefixes:
                self.seed_prefix_t.append(
                    self.spark.createDataFrame(
                        [(p,) for p in new_prefixes], "prefix string"
                    )
                )
        else:
            for p in new_prefixes:
                if p not in self.seed_prefixes:
                    self.seed_prefixes.append(p)

        timer.mark("events-append")
        # --- CrawlMapper diversion log: one append per round of
        # (target, fp, line, round), deduped on (target, std64 uri fp) —
        # the recentlySeen law (CrawlMapper.java:280-306) without its LRU
        # eviction (cross-round repeats of a rediscovered-and-rediverted
        # URI can recur, as the reference's lossy cache also allows)
        if mapper_on:
            parts = []
            # under a runtime-limit block the mapper never ran (the kill
            # switch FINISHes first), so check-uri rows are not divert-logged
            if map_uri_on and not rt_block:
                parts.append(
                    fetched.filter(F.col("__map_divert")).select(
                        "uri", "class_key", "hops_path", "via", "__map_target"
                    )
                )
            if map_out_on:
                parts.append(
                    divert_cand.select(
                        "uri", "class_key", "hops_path", "via", "__map_target"
                    )
                )
            if parts:
                dv = parts[0]
                for p in parts[1:]:
                    dv = dv.unionByName(p)
                dv_rows = MAP.divert_log(
                    dv, uri_col="uri", target_col="__map_target"
                ).withColumn("round", F.lit(self.round))
                self._submit_commit(
                    "divert", lambda: self.divert_t.append(dv_rows)
                )

        # --- futureUris scheduling (rescheduleTime, CrawlURI.java:1650-1653):
        # every successful non-prerequisite fetch re-visits at
        # round_start + interval. Tag 'Fu' in the journal (the reference
        # journals the eventual re-receive via its normal tags).
        fut_rows = None
        fut_due_at = 0
        if cfg.recrawl_interval_ms >= 0:
            fut_due_at = self.clock + cfg.recrawl_interval_ms
            fut_rows = fetched.filter(
                (F.col("disposition") == "success")
                & ~F.col("__is_dns")
                & ~F.col("__is_robots")
            ).select(
                "uri", "canonical", "fp", "class_key", "is_seed", "hops_path",
                "via", "via_context", "sched_directive", "precedence", "cost",
                "ordinal",
                F.lit(0).alias("fetch_attempts"),
                F.lit(False).alias("force_fetch"),
                "data",
                F.lit(fut_due_at).cast("long").alias("reschedule_time"),
            )

        def _commit_events() -> None:
            # one chain owns every events_t append this round (per-table
            # snapshot pointers need serialized commits); futures_t is
            # written nowhere else
            self.events_t.append(ev_rows)
            if fut_rows is None:
                return
            # the batch count gates the bucket commit: an empty batch must
            # not register a phantom min_bucket (count is cheap — fetched
            # is cached for the round)
            if fut_rows.count():
                self.futures_t.schedule(fut_rows, bucket=fut_due_at)
                self.events_t.append(
                    fut_rows.select(
                        F.lit(self.round).alias("round"),
                        F.lit("Fu").alias("tag"),
                        "class_key",
                        "uri",
                        "canonical",
                        "ordinal",
                        F.lit(None).cast("int").alias("fetch_status"),
                        F.lit(None).cast("string").alias("disposition"),
                        "is_seed",
                        F.lit(None).cast("string").alias("annotation"),
                        F.col("data").getItem("source_tag").alias("source_tag"),
                        F.lit(None).cast("string").alias("content_type"),
                        F.lit(None).cast("long").alias("content_length"),
                        F.lit(self.clock).cast("long").alias("clock_ms"),
                    )
                )

        self._submit_commit("events", _commit_events)

        # --- frontier update (merge-on-read, O(delta) per round) ----------
        # removal is by ordinal (unique per row) not fp: forceFetch can put
        # two rows with one fp in the frontier, and an fp-keyed delete
        # would drop the unemitted twin. Finished emits tombstone; retried /
        # quota-requeued emits upsert (at most one delta row per ordinal per
        # seq — finished/retried/requeued are disjoint); novel rows carry
        # fresh globally-unique ordinals so they ride the insert fast path.
        # The unemitted remainder is never rewritten — that was the
        # O(table)-per-round copy-on-write cost this scheme removes.
        retry_data = F.col("data")
        if auth_on:
            # handle401 attach: the 401-retry re-enters the frontier
            # carrying the credential realm (CrawlURI avatar analog)
            retry_data = F.when(
                F.col("fetch_status") == AUTH.HTTP_UNAUTHORIZED,
                F.map_concat(
                    F.coalesce(
                        F.col("data"),
                        F.create_map().cast("map<string,string>"),
                    ),
                    F.create_map(
                        F.lit(AUTH.AUTH_DATA_KEY), F.col("__zone_realm")
                    ),
                ),
            ).otherwise(F.col("data"))
        retries = (
            fetched.filter(F.col("__retry"))
            .select(
                "uri", "canonical", "fp", "class_key", "is_seed", "hops_path", "via",
                "via_context", "sched_directive", "precedence", "cost", "ordinal",
                F.col("__attempts").alias("fetch_attempts"), "force_fetch",
                retry_data.alias("data"),
            )
        )
        # forceRetire'd over-quota URIs re-queue undisposed, attempts intact
        quota_requeued = fetched.filter(F.col("__quota_retire")).select(
            "uri", "canonical", "fp", "class_key", "is_seed", "hops_path", "via",
            "via_context", "sched_directive", "precedence", "cost", "ordinal",
            "fetch_attempts", "force_fetch", "data",
        )
        # NULL-safe: __quota_retire is NULL (not False) when __forced_status
        # is NULL — a bare ~col() would drop the row from the tombstone set
        finished_keys = fetched.filter(
            ~F.coalesce(F.col("__retry"), F.lit(False))
            & ~F.coalesce(F.col("__quota_retire"), F.lit(False))
        ).select("ordinal")
        frontier_delta = retries.unionByName(quota_requeued)
        frontier_seq = 2 * self.round + 1

        def _commit_frontier() -> None:
            self.frontier_t.commit_delta(frontier_delta, finished_keys, seq=frontier_seq)
            self.frontier_t.insert(novel_rows)
            self.frontier_t.maybe_compact(
                self.spark,
                every=self.COMPACT_EVERY,
                repartition_by="class_key",
                num_parts=cfg.num_buckets,
            )

        self._submit_commit("frontier", _commit_frontier)
        timer.mark("frontier-write")

        # --- url_seen update (fast delta append; already anti-joined) ------
        novel_fp_hint = getattr(self, "_last_novel_count", None)

        def _commit_urlseen() -> None:
            self.urlseen.add_fps(
                novel_rows.filter(~F.col("force_fetch")).select("fp"),
                assume_novel=True,
                n_hint=novel_fp_hint,
            )
            if forced_rows:
                # forced fps were NOT anti-joined; insert via the exact path
                # so the seen table stays duplicate-free (tiny driver batch)
                self.urlseen.add_fps(
                    self.spark.createDataFrame(
                        [(int(r.fp),) for r in forced_rows], "fp long"
                    )
                )

        self._submit_commit("url_seen", _commit_urlseen)
        timer.mark("urlseen-append")
        # --- host_state update ---------------------------------------------
        # serial-per-host politeness: m fetches advance the host clock by
        # sum(duration + delay); budget expend per disposition (DEFERRED
        # retries excluded per WorkQueueFrontier.java:947-963)
        # dns lookups update the resolved-host table (CrawlHost analog)
        if cfg.dns == "obey":
            # O(delta) upsert: at most one dns: prerequisite per host per
            # validity window reaches the fetcher, so per-round rows are
            # unique; cross-round repeats (forget / expiry refetch) resolve
            # latest-wins at read. Rows carry the CrawlHost IP model
            # (synthetic deterministic resolution, functions/surt.py) and
            # the resolution clock that drives isIpExpired.
            from heritrix3_spark.functions.surt import synthetic_ip_col

            dns_new = fetched.filter(
                F.col("__is_dns") & (F.col("fetch_status") == FR.S_DNS_SUCCESS)
            ).select(
                F.col("__server").alias("host"),
                synthetic_ip_col(F.col("__server")).alias("ip"),
                F.lit(self.clock).cast("long").alias("resolved_at"),
            )
            def _commit_dns() -> None:
                if self.dns_t.exists():
                    self.dns_t.upsert(dns_new, seq=2 * self.round + 1)
                    self.dns_t.maybe_compact(self.spark, every=self.COMPACT_EVERY)
                else:
                    self.dns_t.overwrite(dns_new)

            self._submit_commit("dns", _commit_dns)

        # robots.txt fetch results update per-server robots state
        # (DispositionProcessor.innerProcess robots update :174-219)
        if cfg.robots == "obey":
            rb_new = fetched.filter(F.col("__is_robots") & ~F.col("__no_fetch")).select(
                F.col("__server_key").alias("server"),
                F.when(
                    (F.col("fetch_status") >= 200)
                    & (F.col("fetch_status") < 300)
                    & F.col("spans").isNotNull(),
                    F.array_join(
                        F.transform(
                            F.filter("spans", lambda s: s["kind"] == "text"),
                            lambda s: s["text"],
                        ),
                        "\n",
                    ),
                ).otherwise(F.lit(""))  # non-2xx -> NO_ROBOTS (allow all)
                .alias("body"),
                F.lit(self.clock).cast("long").alias("fetched_at"),
            )
            # O(delta) upsert; a refetched robots.txt (e.g. rediscovered as a
            # normal link, or expiry) wins latest-at-read — same semantics
            # the old anti-join-then-overwrite had, without the O(table) write
            def _commit_robots() -> None:
                if self.robots_t.exists():
                    self.robots_t.upsert(rb_new, seq=2 * self.round + 1)
                    self.robots_t.maybe_compact(self.spark, every=self.COMPACT_EVERY)
                else:
                    self.robots_t.overwrite(rb_new)

            self._submit_commit("robots", _commit_robots)

        if whois_on:
            # FetchWhois knowledge updates (fetch :342-377): every
            # server-ful whois fetch marks DONE (the finally — even a
            # connect failure); 2001 responses scan each line for
            # WHOIS_SERVER_REGEX and record the LAST match under the
            # token-stripped lowercased query. IN_PROGRESS marks come from
            # this round's markPrerequisite rows and never overwrite an
            # existing entry (DONE wins any serial interleave). All O(delta).
            from heritrix3_spark.operators import whois as WH

            w_fetched = fetched.filter(
                F.col("__whois_serverful") & ~F.col("__no_fetch")
            )
            w_done = w_fetched.select(F.col("uri").alias("url")).distinct()
            w_marks = (
                fetched.filter(F.col("__defer_reason") == "whois")
                .select(F.col("__whois_try").alias("url"))
                .distinct()
                .join(w_done, "url", "left_anti")
            )
            if self.whois_prog_t.exists():
                # anti-join against EXISTING keys: prune the table down to
                # the round's bounded mark set first (broadcast the marks,
                # never the table), then drop already-present marks
                pruned = self.whois_prog_t.read(self.spark).join(
                    F.broadcast(w_marks),
                    on="url",
                    how="left_semi",
                )
                w_marks = w_marks.join(pruned, "url", "left_anti")
            w_prog_new = w_done.withColumn(
                "status", F.lit(WH.DONE)
            ).unionByName(
                w_marks.withColumn("status", F.lit(WH.IN_PROGRESS))
            )
            def _commit_whois_prog() -> None:
                if self.whois_prog_t.exists():
                    self.whois_prog_t.upsert(w_prog_new, seq=2 * self.round + 1)
                    self.whois_prog_t.maybe_compact(
                        self.spark, every=self.COMPACT_EVERY
                    )
                else:
                    self.whois_prog_t.overwrite(w_prog_new)

            self._submit_commit("whois_progress", _commit_whois_prog)
            w_body = F.array_join(
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == "text"),
                    lambda s: s["text"],
                ),
                "\n",
            )
            w_lines = F.split(w_body, r"\r\n|\r|\n")
            w_hits = F.filter(
                w_lines, lambda ln: ln.rlike(WH.WHOIS_SERVER_REGEX)
            )
            w_refs = (
                w_fetched.filter(
                    (F.col("fetch_status") == WH.S_WHOIS_SUCCESS)
                    & F.col("spans").isNotNull()
                )
                .select(
                    F.lower(
                        F.regexp_replace(
                            F.col("__whois_q"), r"(\S+\s+)+", ""
                        )
                    ).alias("key"),
                    F.lower(
                        F.regexp_extract(
                            # try_: a response with no referral line has an
                            # empty hits array -> NULL, filtered below
                            F.coalesce(
                                F.try_element_at(w_hits, F.lit(-1)),
                                F.lit(""),
                            ),
                            WH.WHOIS_SERVER_REGEX,
                            1,
                        )
                    ).alias("server"),
                    F.col("ordinal"),
                )
                .filter(F.col("server") != "")
                .groupBy("key")
                .agg(F.max_by("server", "ordinal").alias("server"))
            )
            def _commit_whois_refs() -> None:
                if self.whois_ref_t.exists():
                    self.whois_ref_t.upsert(w_refs, seq=2 * self.round + 1)
                    self.whois_ref_t.maybe_compact(
                        self.spark, every=self.COMPACT_EVERY
                    )
                else:
                    self.whois_ref_t.overwrite(w_refs)

            self._submit_commit("whois_referrals", _commit_whois_refs)

        if cookies_on:
            # Set-Cookie application (AbstractCookieStore.addCookie at
            # round end): every 2xx page's "set-cookie" spans parse
            # Arrow-batched (never via the driver — a round can set 10^6
            # cookies at scale); later ordinal wins per sortableKey within
            # the round (the serial fetch-order law), then one O(delta)
            # merge-on-read upsert. Visibility is next round (macro-batch
            # law, same as form_auth promotion).
            from heritrix3_spark.operators.cookies import (
                MAX_COOKIES_FOR_DOMAIN,
                set_cookie_parse_col,
            )

            sc_src = fetched.filter(
                (F.col("fetch_status") >= 200)
                & (F.col("fetch_status") < 300)
                & ~F.col("__no_fetch")
                & F.col("spans").isNotNull()
            ).select(
                F.col("ordinal"),
                F.substring_index(F.col("__server"), ":", 1).alias("__host"),
                F.posexplode(
                    F.filter("spans", lambda s: s["kind"] == "set-cookie")
                ).alias("__pos", "__sc"),
            )
            parsed = sc_src.select(
                "ordinal",
                "__pos",
                set_cookie_parse_col(
                    F.col("__sc.text"), F.col("__host"), self.clock // 1000
                ).alias("c"),
            ).filter(F.col("c.key").isNotNull())
            # Per-key VALUE winner is the last serial add (ordinal, then
            # span position within the page); per-key cap CLAIM is the
            # first serial add — the add that would have claimed the
            # domain's slot in the reference's serial addCookie order
            # (BdbCookieStore.java:288-304).
            w_ck = Window.partitionBy("c.key").orderBy(
                F.col("ordinal").desc(), F.col("__pos").desc()
            )
            ck_new = (
                parsed.withColumn("__r", F.row_number().over(w_ck))
                .withColumn(
                    "__claim",
                    F.min(F.struct("ordinal", "__pos")).over(
                        Window.partitionBy("c.key")
                    ),
                )
                .filter(F.col("__r") == 1)
                .select("c.*", "__claim")
            )
            # 50-cookies/domain cap (BdbCookieStore.java:52,288-304): a
            # NEW key on a domain already holding the cap is dropped;
            # replacements of existing keys always apply. Admission runs
            # in serial add order (__claim). The state table is never
            # broadcast: it is semi-join-pruned to the round's bounded
            # domain set, and only round-bounded sides are broadcast.
            if self.cookie_t.exists():
                doms = ck_new.select("domain").distinct()
                existing = (
                    self.cookie_t.read(self.spark)
                    .join(F.broadcast(doms), "domain", "left_semi")
                    .select("key", "domain")
                )
                ex_keys = existing.join(
                    F.broadcast(ck_new.select("key")), "key", "left_semi"
                ).withColumn("__ex", F.lit(True))
                ex_counts = existing.groupBy("domain").agg(
                    F.count(F.lit(1)).alias("__live")
                )
                flagged = ck_new.join(
                    F.broadcast(ex_keys.select("key", "__ex")), "key", "left"
                )
                w_dom = Window.partitionBy("domain").orderBy(
                    F.col("__claim.ordinal"), F.col("__claim.__pos")
                )
                admitted_new = (
                    flagged.filter(F.col("__ex").isNull())
                    .withColumn("__rk", F.row_number().over(w_dom))
                    .join(F.broadcast(ex_counts), "domain", "left")
                    .filter(
                        F.col("__rk")
                        <= MAX_COOKIES_FOR_DOMAIN
                        - F.coalesce(F.col("__live"), F.lit(0))
                    )
                )
                cols = [c for c in ck_new.columns if c != "__claim"]
                ck_commit = (
                    flagged.filter(F.col("__ex").isNotNull())
                    .select(*cols)
                    .unionByName(admitted_new.select(*cols))
                )
                def _commit_cookies() -> None:
                    self.cookie_t.upsert(ck_commit, seq=2 * self.round + 1)
                    self.cookie_t.maybe_compact(
                        self.spark, every=self.COMPACT_EVERY
                    )

                self._submit_commit("cookies", _commit_cookies)
            else:
                w_dom = Window.partitionBy("domain").orderBy(
                    F.col("__claim.ordinal"), F.col("__claim.__pos")
                )
                first = (
                    ck_new.withColumn("__rk", F.row_number().over(w_dom))
                    .filter(F.col("__rk") <= MAX_COOKIES_FOR_DOMAIN)
                    .drop("__rk", "__claim")
                )
                self._submit_commit(
                    "cookies", lambda: self.cookie_t.overwrite(first)
                )

        if forms_on and self._round_form_prov is not None:
            # FormLoginProcessor province counts (checkpointable state,
            # FormLoginProcessor.java:298-315): one O(delta) upsert of the
            # round's touched provinces
            round_form_prov = self._round_form_prov
            self._round_form_prov = None

            def _commit_form_prov() -> None:
                if self.form_prov_t.exists():
                    self.form_prov_t.upsert(
                        round_form_prov, seq=2 * self.round + 1
                    )
                    self.form_prov_t.maybe_compact(
                        self.spark, every=self.COMPACT_EVERY
                    )
                else:
                    self.form_prov_t.overwrite(round_form_prov)

            self._submit_commit("form_provinces", _commit_form_prov)

        # promoteCredentials (FetchHTTP.java:766-817): a 2xx whose creds
        # came from the URI promotes them to the server — every later
        # fetch on that server presents them preemptively
        if auth_on:
            promoted_new = (
                fetched.filter(
                    (F.col("fetch_status") >= 200)
                    & (F.col("fetch_status") < 300)
                    & F.col("__attached_realm").isNotNull()
                )
                .select(
                    F.col("__server").alias("server"),
                    F.col("__attached_realm").alias("realm"),
                )
                .distinct()
            )
            promoted_auth = promoted_new
        else:
            promoted_auth = None
        # form-credential authentication: a successful login fetch promotes
        # the credential to its DOMAIN's server (cross-domain capable,
        # FetchHTTP.promoteCredentials keys by credential domain)
        if form_on:
            logins_ok = (
                fetched.filter(
                    F.col("__login_dom").isNotNull()
                    & (F.col("fetch_status") >= 200)
                    & (F.col("fetch_status") < 300)
                )
                .select(
                    F.col("__login_dom").alias("server"),
                    F.col("__login_realm").alias("realm"),
                )
                .distinct()
            )
        else:
            logins_ok = None
        if promoted_auth is not None or logins_ok is not None:
            # both promotion flavors append auth_state — one chain keeps
            # the table's commits serialized
            def _commit_auth() -> None:
                if promoted_auth is not None and promoted_auth.count():
                    self.auth_t.append(promoted_auth)
                if logins_ok is not None and logins_ok.count():
                    self.auth_t.append(logins_ok)

            self._submit_commit("auth_state", _commit_auth)

        # queue clock law (WorkQueueFrontier.processFinish :947-1029):
        # deferred/precluded never fetched -> no advance; retried fetches
        # snooze the queue by retryDelay (900s connect/DNS, not politeness —
        # the retry branch returns before the politeness snooze); final
        # dispositions snooze by duration+politeness. Disregarded URIs are
        # never charged (holderCost = 0, :990).
        row_advance = (
            F.when(F.col("__no_fetch"), F.lit(0))
            .when(F.col("__retry"), FR.retry_delay_col(F.col("fetch_status")))
            .otherwise(F.col("fetch_duration") + F.col("__politeness"))
        )
        per_host = fetched.groupBy("class_key").agg(
            F.sum(row_advance).alias("advance"),
            F.sum(
                F.when(
                    F.col("disposition").isin("disregard", "blocked"), F.lit(0)
                )
                .when(
                    (F.col("disposition") == "retry")
                    & (F.col("fetch_status") == FR.S_DEFERRED),
                    F.lit(0),
                )
                .otherwise(F.col("cost"))
            ).alias("expend"),
            F.sum(
                F.when(F.col("disposition") == "fail", cfg.error_penalty).otherwise(0)
            ).alias("penalty"),
            F.count("*").alias("emitted_n"),
            F.sum(
                F.when(
                    F.col("__retry") | (F.col("disposition") == "blocked"), 1
                ).otherwise(0)
            ).alias("retry_n"),
            F.sum(F.when(F.col("disposition") == "fail", 1).otherwise(0)).alias("fail_n"),
            F.max(F.when(F.col("__quota_retire"), 1).otherwise(0)).alias("quota_retire"),
        )
        if cfg.max_per_host_bandwidth_kb > 0:
            # replace the additive advance with the serial bandwidth-floor
            # recurrence (can't be a window sum — see _bandwidth_advance)
            per_host = per_host.drop("advance").join(
                self._bandwidth_advance(fetched), "class_key", "left"
            )
        novel_per_host = novel_rows.groupBy("class_key").agg(F.count("*").alias("novel_n"))
        hosts_all = hosts.join(novel_per_host, "class_key", "full").select(
            "class_key",
            F.coalesce(F.col("pending"), F.lit(0)).alias("pending"),
            F.coalesce(F.col("novel_n"), F.lit(0)).alias("novel_n"),
            F.coalesce(F.col("wake_time"), F.lit(0)).alias("wake_time"),
            F.coalesce(F.col("total_expenditure"), F.lit(0)).alias("total_expenditure"),
            F.coalesce(F.col("error_count"), F.lit(0)).alias("error_count"),
            F.coalesce(F.col("retired"), F.lit("n")).alias("retired"),
        )
        ph = per_host.select(
            F.col("class_key").alias("__ck"),
            "advance", "expend", "penalty", "emitted_n", "retry_n", "fail_n",
            "quota_retire",
        )
        updated = (
            hosts_all.join(ph, hosts_all["class_key"] == ph["__ck"], "left")
            .select(
                "class_key",
                (
                    F.col("pending")
                    + F.col("novel_n")
                    - F.coalesce(F.col("emitted_n"), F.lit(0))
                    + F.coalesce(F.col("retry_n"), F.lit(0))
                ).alias("pending"),
                F.when(
                    F.col("advance").isNotNull(), F.lit(self.clock) + F.col("advance")
                )
                .otherwise(F.col("wake_time"))
                .alias("wake_time"),
                (
                    F.col("total_expenditure")
                    + F.coalesce(F.col("expend"), F.lit(0))
                    + F.coalesce(F.col("penalty"), F.lit(0))
                ).alias("total_expenditure"),
                (F.col("error_count") + F.coalesce(F.col("fail_n"), F.lit(0))).alias(
                    "error_count"
                ),
                F.col("retired"),
                F.coalesce(F.col("quota_retire"), F.lit(0)).alias("__quota_retire"),
            )
            .withColumn("__budget", self._overlay_col("total_budget", F.lit(cfg.total_budget)))
            .withColumn(
                "retired",
                F.when(
                    (F.col("__budget") >= 0)
                    & (F.col("total_expenditure") >= F.col("__budget")),
                    F.lit("y"),
                )
                # QuotaEnforcer forceRetire: an over-quota URI retires its
                # whole queue (QuotaEnforcer.java:352-361)
                .when(F.col("__quota_retire") >= 1, F.lit("y"))
                .otherwise(F.col("retired")),
            )
            .drop("__budget", "__quota_retire")
        )
        # one materialization serves the host upsert below, the metrics
        # depth aggregate AND the next round's host view (updated ≡ the
        # post-round merged host state: untouched hosts keep identical
        # values through the null branches above). LAZY localCheckpoint:
        # the host-chain upsert is the first action and materializes the
        # blocks in the same job, and the checkpoint TRUNCATES LINEAGE —
        # a plain persist chained every round's plan onto the previous
        # round's view and the analyzed tree grew without bound (driver
        # heap death on long expiry/recrawl loops). Kept OUTSIDE the
        # round-frame registry: it lives until the next round consumes it
        # (which registers it for that round's cleanup).
        updated = updated.localCheckpoint(eager=False)
        self._hosts_cache = updated
        # O(touched)/round: only queues that emitted, matured, or received
        # novel URIs changed this round — upsert exactly those; untouched
        # hosts keep their base/delta rows (merge-on-read)
        touched = per_host.select("class_key").unionByName(
            novel_per_host.select("class_key")
        )
        if matured_keys is not None:
            touched = touched.unionByName(matured_keys)
        changed = updated.join(
            F.broadcast(touched.distinct()), "class_key", "left_semi"
        )
        # --- CrawlLimitEnforcer stats (ONE aggregate over the checkpointed
        # fetched frame when any extended limit is configured, else the
        # cached count). Runs BEFORE the host chain is submitted so the
        # metrics snapshot below can ride that chain off the hot path.
        if (
            cfg.max_bytes_download > 0
            or cfg.max_novel_bytes > 0
            or cfg.max_novel_urls > 0
        ):
            rev = (
                F.coalesce(F.col("__revisit"), F.lit(False))
                if cfg.digest_history
                else F.lit(False)
            )
            novel = (
                (F.col("disposition") == "success")
                & (F.col("fetch_status") >= 200)
                & ~rev
            )
            lim = fetched.agg(
                F.count("*").alias("n"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("fetch_status") >= 200, F.col("content_bytes"))
                    ),
                    F.lit(0),
                ).alias("b"),
                F.coalesce(F.sum(novel.cast("long")), F.lit(0)).alias("nu"),
                F.coalesce(
                    F.sum(F.when(novel, F.col("content_bytes"))), F.lit(0)
                ).alias("nb"),
            ).collect()[0]
            n_fetched = int(lim.n)
            self._crawl_bytes += int(lim.b)
            self._novel_urls += int(lim.nu)
            self._novel_bytes += int(lim.nb)
        else:
            n_fetched = fetched.count()  # cached
        self.total_fetched += n_fetched
        timer.mark("limit-agg")
        n_live = int(live_stats.n_live or 0)
        n_eligible = int(live_stats.n_eligible or 0)
        round_no, round_clock = self.round, self.clock
        novel_n = int(getattr(self, "_last_novel_count", 0))

        def _commit_hosts() -> None:
            self.host_t.upsert(changed, seq=2 * self.round + 1)
            self.host_t.maybe_compact(self.spark, every=self.COMPACT_EVERY)
            if not cfg.metrics:
                return
            # per-round metrics snapshot (CrawlStatSnapshot analog) rides
            # the host chain: the depth aggregate reuses the `updated`
            # persist the upsert just materialized (no second thread races
            # the cache fill), and the 1-row metrics append leaves the
            # driver's critical path
            depth = (
                updated.filter(F.col("pending") > 0)
                .agg(
                    F.count("*").alias("n_queues"),
                    F.coalesce(F.sum("pending"), F.lit(0)).alias("queued"),
                    F.coalesce(F.max("pending"), F.lit(0)).alias("deepest"),
                )
                .collect()[0]
            )
            metrics_row = self.spark.createDataFrame(
                [
                    (
                        round_no,
                        round_clock,
                        n_fetched,
                        novel_n,
                        n_live,
                        n_eligible,
                        int(depth.n_queues or 0),
                        int(depth.queued or 0),
                        int(depth.deepest or 0),
                        # congestionRatio analog (WorkQueueFrontier.java:
                        # 1583-1593): demand over service capacity this round
                        float(n_eligible) / max(n_live, 1),
                    )
                ],
                "round int, clock long, fetched int, novel int, live_queues int, "
                "eligible_queues int, nonempty_queues int, queued_uri_count long, "
                "deepest_queue long, congestion_ratio double",
            )
            self.metrics_t.append(metrics_row)

        self._submit_commit("host_state", _commit_hosts)
        timer.mark("host-write")
        # --- QuotaEnforcer stats accumulation (for next round's checks) ----
        if quotas_on or contrib_q_on:
            self._submit_commit(
                "quota_stats", lambda: self._update_quota_stats(fetched)
            )
            timer.mark("quota-stats")
        # barrier: every commit chain (incl. the metrics snapshot riding
        # host_state) must land before the fold-tail maintenance and the
        # checkpoint read table versions
        self._await_commits()
        timer.mark("commit-join")
        # append-only log maintenance (round-3 verdict wrong #4): LSM tail
        # folds keep reader fan-in at O(rounds/COMPACT_EVERY) dirs instead
        # of one dir per append; O(recent) I/O, amortized O(1)/round, and
        # folded dirs are never re-folded (no O(table) rewrite creep).
        # quota_stats has its own aggregate-fold in _update_quota_stats.
        for t in (
            self.events_t, self.documents_t, self.metrics_t, self.digest_t,
            self.auth_t,
        ):
            t.fold_tail(self.spark, every=self.COMPACT_EVERY)
        timer.mark("fold-tail")
        for df in self._round_caches:
            df.unpersist()
        self._round_caches.clear()
        self.round += 1
        self._checkpoint()
        timer.mark("checkpoint")
        if cfg.warc_limits and self._warc_limit_hit():
            # WARCLimitEnforcer: stop crawl (CrawlStatus.FINISHED_WRITE_LIMIT)
            self.stop_status = "FINISHED_WRITE_LIMIT"
            return False
        # CrawlLimitEnforcer.checkForLimitsExceeded (:145-163) — the
        # reference's if/else-if chain: FIRST matching limit wins
        warc_resp = self._warc_stats.get("response", {})
        if cfg.max_bytes_download > 0 and self._crawl_bytes >= cfg.max_bytes_download:
            self.stop_status = "FINISHED_DATA_LIMIT"
            return False
        if cfg.max_novel_bytes > 0 and self._novel_bytes >= cfg.max_novel_bytes:
            self.stop_status = "FINISHED_DATA_LIMIT"
            return False
        if (
            cfg.max_warc_novel_bytes > 0
            and warc_resp.get("contentBytes", 0) >= cfg.max_warc_novel_bytes
        ):
            self.stop_status = "FINISHED_DATA_LIMIT"
            return False
        if cfg.max_fetches >= 0 and self.total_fetched >= cfg.max_fetches:
            # maxDocumentsDownload (CrawlStatus.FINISHED_DOCUMENT_LIMIT)
            self.stop_status = "FINISHED_DOCUMENT_LIMIT"
            return False
        if cfg.max_novel_urls > 0 and self._novel_urls >= cfg.max_novel_urls:
            self.stop_status = "FINISHED_DOCUMENT_LIMIT"
            return False
        if (
            cfg.max_warc_novel_urls > 0
            and warc_resp.get("numRecords", 0) >= cfg.max_warc_novel_urls
        ):
            self.stop_status = "FINISHED_DOCUMENT_LIMIT"
            return False
        if cfg.max_time_seconds > 0 and self.clock >= cfg.max_time_seconds * 1000:
            self.stop_status = "FINISHED_TIME_LIMIT"
            return False
        return True

    def run(self, max_rounds: int | None = None) -> DataFrame:
        limit = max_rounds if max_rounds is not None else self.cfg.max_rounds
        for _ in range(limit):
            if not self.run_round():
                break
        return self.crawl_log()

    # ------------------------------------------------------------------
    # outputs & checkpointing
    # ------------------------------------------------------------------
    def crawl_log(self) -> DataFrame:
        """Disposition rows only (crawl.log analog) — schedule events (F+)
        and future-reschedule events (Fu) are journal-only."""
        ev = self.events_t.read(self.spark)
        return ev.filter(~F.col("tag").isin("F+", "Fu")).drop("tag", "is_seed")

    def journal(self) -> DataFrame:
        """Full event journal incl. F+ schedule events (recover.gz analog)."""
        return self.events_t.read(self.spark).select(
            "round", "tag", "canonical", "ordinal", "is_seed"
        )

    def seen_count(self) -> int:
        return self.urlseen.count(self.spark)

    def documents(self) -> DataFrame:
        """Fetched payloads: (doc_id, spans, content_digest, fetch_round)."""
        return self.documents_t.read(self.spark)

    def metrics(self) -> DataFrame:
        """Per-round crawl snapshots (StatisticsTracker analog)."""
        return self.metrics_t.read(self.spark)

    def reports(self) -> dict[str, DataFrame]:
        """Heritrix report set: fetch stats, response codes, seeds, depth,
        digest history (reporting/*.java analogs)."""
        from heritrix3_spark.operators import stats as ST

        log = self.crawl_log()
        return {
            "host_fetch_stats": ST.host_fetch_stats(log),
            "response_codes": ST.response_code_report(log),
            "seeds": ST.seeds_report(log, self.journal()),
            "queue_depth": ST.queue_depth_stats(self.host_t.read(self.spark)),
            "digest_history": ST.digest_history(self.documents()),
            "crawled_bytes": ST.crawled_bytes_histotable(self.documents(), log),
            "fetch_history": ST.fetch_history(log, self.documents()),
            # SourceTagsReport over the crawl log's heritable source_tag
            # (host analog = the frontier queue key)
            "source_tags": ST.source_tags_report(
                log.withColumn("host", F.col("class_key"))
            ),
            # real Content-Type threading (StatisticsTracker.java:746-757:
            # mime + bytes tallied per successfully-crawled URI through
            # MimetypeUtils.truncate)
            "mimetypes": ST.mimetypes_report(
                log.filter(F.col("disposition") == "success").select(
                    MIME.mime_truncate_col(F.col("content_type")).alias(
                        "content_type"
                    ),
                    F.coalesce(F.col("content_length"), F.lit(0)).alias(
                        "content_length"
                    ),
                )
            ),
        }

    def frontier_report(self) -> DataFrame:
        """One-row frontier report (WorkQueueFrontier.reportTo,
        WorkQueueFrontier.java:1253-1345 + shortReportLineTo :1161-1199):
        queue-state counts (total/active = ready+snoozed / inactive /
        retired / exhausted — in-process is structurally 0 between
        macro-batch rounds), the AbstractFrontier URI tallies (succeeded /
        failed / disregarded / finished), ``queued`` =
        queuedUriCount (sum of pending over all queues), and
        ``discovered`` == ``already_included`` == the uriUniqFilter count
        (WorkQueueFrontier.discoveredUriCount :1089-1091). O(queues) +
        O(log-agg) — never scans the frontier rows themselves (queue
        precedence joins them only in highest_uri mode, same as
        activation)."""
        from heritrix3_spark.operators import stats as ST

        hosts = self.host_t.read(self.spark)
        qp = None
        if self.cfg.queue_precedence == "highest_uri":
            qp = FR.highest_uri_queue_precedence(
                self.frontier_t.read(self.spark), self.cfg.queue_precedence_base
            )
        qstates = ST.frontier_summary(
            hosts,
            self.clock,
            self.cfg.precedence_floor,
            FR.DEFAULT_QUEUE_PRECEDENCE,
            qp,
        )
        totals = ST.frontier_uri_totals(self.crawl_log())
        queued = hosts.agg(
            F.coalesce(F.sum("pending"), F.lit(0)).alias("queued")
        )
        seen_n = self.urlseen.count(self.spark)
        return (
            qstates.crossJoin(totals)
            .crossJoin(queued)
            .withColumn("discovered", F.lit(seen_n).cast("long"))
            .withColumn("already_included", F.lit(seen_n).cast("long"))
        )

    def receive_urls(self, bodies: list[str]) -> int:
        """AMQPUrlReceiver.UrlConsumer analog: parse JSON message bodies
        (AMQPUrlReceiver.java:339-441) and buffer the resulting candidates
        for the NEXT round's candidate chain. Non-GET and malformed
        messages are ignored (the reference logs and ACKs them). Returns
        the number of accepted messages."""
        if self.cfg.amqp != "on":
            raise ValueError("receive_urls requires CrawlConfig(amqp='on')")
        from heritrix3_spark.operators import amqp as AMQP

        accepted = [
            m
            for m in (
                AMQP.parse_message(b, self.cfg.amqp_force_fetch)
                for b in bodies
            )
            if m is not None
        ]
        self._amqp_pending.extend(accepted)
        return len(accepted)

    def export_pending_uris(self) -> DataFrame:
        """Full dump of the pending frontier
        (BdbMultipleWorkQueues.exportPendingUris analog, :568-587)."""
        return self.frontier_t.read(self.spark)

    def diversions(self) -> DataFrame:
        """CrawlMapper diversion log: (round, target, fp, line) — the
        per-target ``.divert`` files analog (CrawlMapper.java:246-263),
        partitionable by target for per-node export."""
        if not self.divert_t.exists():
            return self.spark.createDataFrame(
                [], "target string, fp long, line string, round int"
            )
        return self.divert_t.read(self.spark)

    # ------------------------------------------------------------------
    # operator-facing frontier management
    # ------------------------------------------------------------------
    def delete_uris(self, queue_regex: str, uri_regex: str) -> None:
        """Regex-delete across queues (WorkQueueFrontier.deleteURIs
        :1100-1118; BdbMultipleWorkQueues.deleteMatchingFromQueue :105-139).
        Host pending counters are recomputed for affected queues."""
        frontier = self.frontier_t.read(self.spark)
        doomed = frontier.filter(
            F.col("class_key").rlike(queue_regex) & F.col("uri").rlike(uri_regex)
        ).select("ordinal", "class_key").persist()
        # O(matched) tombstones, not an O(table) rewrite (the regex scan
        # itself is inherently O(table) — a read, amortized by the merge)
        self.frontier_t.delete_keys(
            doomed.select("ordinal"), seq=2 * self.round + 1, template=frontier
        )
        self._recount_pending(affected=doomed.select("class_key").distinct())
        doomed.unpersist()

    def forget_uri(self, canonical: str) -> None:
        """Remove from the seen set so the URI can be rediscovered
        (WorkQueueFrontier.forget :1081-1084, UriUniqFilter.forget)."""
        from heritrix3_spark.fp import create_key

        fps = self.spark.createDataFrame([(create_key(canonical),)], "fp long")
        self.urlseen.forget_fps(fps)

    def consider_included(self, canonical: str) -> None:
        """Mark seen + never schedule (WorkQueueFrontier.considerIncluded
        :1534-1552): the seen-set mutation without the frontier insert."""
        from heritrix3_spark.fp import create_key

        fps = self.spark.createDataFrame([(create_key(canonical),)], "fp long")
        self.urlseen.add_fps(fps)

    def _recount_pending(self, affected: DataFrame | None = None) -> None:
        """Recompute host pending counters; with ``affected`` (a class_key
        frame) only those queues are recounted and upserted — O(touched)
        writes, matching the round path's merge-on-read discipline."""
        frontier = self.frontier_t.read(self.spark)
        hosts = self.host_t.read(self.spark)
        if affected is not None:
            keys = affected.distinct()
            hosts = hosts.join(F.broadcast(keys), "class_key", "left_semi")
            frontier = frontier.join(F.broadcast(keys), "class_key", "left_semi")
        counts = frontier.groupBy("class_key").agg(F.count("*").alias("__n"))
        updated = hosts.join(counts, "class_key", "left").select(
            "class_key",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("pending"),
            "wake_time",
            "total_expenditure",
            "error_count",
            "retired",
        )
        if affected is None:
            self.host_t.overwrite(updated)
        else:
            self.host_t.upsert(updated, seq=2 * self.round + 1)
        # the cached cross-round host view no longer matches the table
        self._invalidate_hosts_cache()

    # ------------------------------------------------------------------
    # journal import (recovery without checkpoint)
    # ------------------------------------------------------------------
    def import_recover_journal(self, events: DataFrame) -> None:
        """Rebuild the seen set from a journal: include-only pass over
        Fi/Fs/F+ tags (AbstractFrontier.importRecoverFormat :909-967,
        FrontierJournal.importRecoverLog :166-280). The schedule pass is
        the caller re-seeding; here we replay 'considerIncluded' semantics
        so finished URIs are not re-crawled."""
        included = events.filter(F.col("tag").isin("Fs", "Fi", "F+")).select("canonical")
        self.urlseen.add_fps(included.withColumn("fp", fp_udf(F.col("canonical"))).select("fp"))

    def _checkpoint(self) -> None:
        self.catalog.write_checkpoint(
            f"r{self.round:06d}",
            table_versions={
                "frontier": self.frontier_t.latest_version(),
                "frontier__delta": self.frontier_t.delta.latest_version(),
                "host_state": self.host_t.latest_version(),
                "host_state__delta": self.host_t.delta.latest_version(),
                "events": self.events_t.latest_version(),
                "documents_out": self.documents_t.latest_version(),
                "robots": self.robots_t.latest_version(),
                "robots__delta": self.robots_t.delta.latest_version(),
                "dns": self.dns_t.latest_version(),
                "dns__delta": self.dns_t.delta.latest_version(),
                "metrics": self.metrics_t.latest_version(),
                "url_seen": self.urlseen.table.latest_version(),
                "url_seen_bloom": self.urlseen.bloom_table.latest_version(),
                "url_seen_cuckoo": self.urlseen.cuckoo_table.latest_version(),
                "url_seen_forgot": self.urlseen.forgot_t.latest_version(),
                "futures": self.futures_t.latest_version(),
                "quota_stats": self.quota_t.latest_version(),
                "digest_seen": self.digest_t.latest_version(),
                "auth_state": self.auth_t.latest_version(),
                "seed_prefixes": self.seed_prefix_t.latest_version(),
                "diversions": self.divert_t.latest_version(),
                "cookies": self.cookie_t.latest_version(),
                "cookies__delta": self.cookie_t.delta.latest_version(),
                "form_provinces": self.form_prov_t.latest_version(),
                "form_provinces__delta": self.form_prov_t.delta.latest_version(),
                "source_stats": self.source_t.latest_version(),
                "whois_referrals": self.whois_ref_t.latest_version(),
                "whois_referrals__delta": self.whois_ref_t.delta.latest_version(),
                "whois_progress": self.whois_prog_t.latest_version(),
                "whois_progress__delta": self.whois_prog_t.delta.latest_version(),
            },
            state={
                "round": self.round,
                "clock": self.clock,
                "next_ordinal": self.next_ordinal,
                "seed_prefixes": self.seed_prefixes,
                "prefix_join_mode": self.prefix_join_mode,
                "approx_seen": self.urlseen.approx_seen,
                "total_fetched": self.total_fetched,
                "warc_stats": self._warc_stats,
                "crawl_bytes": self._crawl_bytes,
                "novel_urls": self._novel_urls,
                "novel_bytes": self._novel_bytes,
            },
        )

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        state_dir: str,
        web: DataFrame,
        config: CrawlConfig | None = None,
        tag: str | None = None,
    ) -> "CrawlEngine":
        """Relaunch from the last (or a named) checkpoint: restore driver
        scalars and time-travel every table to its recorded snapshot
        (BdbFrontier.initAllQueues analog, BdbFrontier.java:290-332)."""
        eng = cls(spark, state_dir, web, config)
        tags = eng.catalog.list_checkpoints()
        if not tags:
            raise FileNotFoundError("no checkpoints to resume from")
        ck = eng.catalog.read_checkpoint(tag or tags[-1])
        st = ck["state"]
        eng.round = st["round"]
        eng.clock = st["clock"]
        eng.next_ordinal = st["next_ordinal"]
        eng.seed_prefixes = st["seed_prefixes"]
        eng.prefix_join_mode = st.get("prefix_join_mode", False)
        eng.urlseen.approx_seen = st.get("approx_seen", 0)
        eng.total_fetched = st.get("total_fetched", 0)
        eng._warc_stats = st.get("warc_stats", {})
        eng._crawl_bytes = st.get("crawl_bytes", 0)
        eng._novel_urls = st.get("novel_urls", 0)
        eng._novel_bytes = st.get("novel_bytes", 0)
        # roll tables back to the checkpointed snapshot (time-travel) by
        # re-committing those versions as latest when newer ones exist.
        # ver == 0 is a valid target (table/delta did not exist yet): the
        # pointer rolls to 0 so stale post-checkpoint deltas stop shadowing
        for name, ver in ck["tables"].items():
            t = eng.catalog.table(name)
            if t.latest_version() != ver:
                t._commit(ver)
        return eng
