"""Frontier scheduling algebra — ordering, preparation, disposition laws.

Re-expresses the heart of Heritrix's WorkQueueFrontier/BdbMultipleWorkQueues
as Spark column algebra:

* within-queue total order — the 48-bit-ordinal insert key
  (/root/reference/engine/src/main/java/org/archive/crawler/frontier/
   BdbMultipleWorkQueues.java:401-438): order within a class_key is
  ``(sched_directive ASC, min(precedence,127) ASC, ordinal&2^48-1 ASC)``;
  the per-queue head is a ``row_number()`` window over exactly that order.
  The window partitions by class_key, so no global sort ever happens —
  each partition sorts only its own hosts' queues (bounded work at 10^10).
* preparation (FrontierPreparer.prepare, prefetch/FrontierPreparer.java:161-220):
  scheduling directive, canonical, class key, cost, uri precedence — one
  ``withColumns`` stage of pure expressions.
* disposition predicates (AbstractFrontier.java:1069-1126, 851-856;
  WorkQueueFrontier.java:927-1029): retry / disregard / fail branching and
  retry delays as boolean/numeric columns.
* politeness delay (postprocessor/DispositionProcessor.java:230-294):
  ``clamp(delay_factor×duration, min, max)`` raised to robots crawl-delay
  under the respect threshold.

Everything here is JVM-side Column algebra inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# SchedulingConstants.java:32-47
HIGHEST, HIGH, MEDIUM, NORMAL = 0, 1, 2, 3

# FetchStatusCodes.java (subset used by scheduling laws)
S_UNATTEMPTED = 0
S_DOMAIN_UNRESOLVABLE = -1
S_CONNECT_FAILED = -2
S_CONNECT_LOST = -3
S_TIMEOUT = -4
S_DEFERRED = -50
S_ROBOTS_PREREQUISITE_FAILURE = -61
S_OTHER_PREREQUISITE_FAILURE = -62
S_TOO_MANY_LINK_HOPS = -4001
S_TOO_MANY_EMBED_HOPS = -4002
S_OUT_OF_SCOPE = -5000
S_BLOCKED_BY_USER = -5001
S_BLOCKED_BY_CUSTOM_PROCESSOR = -5002
S_BLOCKED_BY_QUOTA = -5003
S_BLOCKED_BY_RUNTIME_LIMIT = -5004
S_DELETED_BY_USER = -6000
S_ROBOTS_PRECLUDED = -9998
S_DNS_SUCCESS = 1
HTTP_UNAUTHORIZED = 401

#: statuses that make isDisregarded true (AbstractFrontier.java:1069-1082)
DISREGARD_STATUSES = (
    S_ROBOTS_PRECLUDED,
    S_BLOCKED_BY_CUSTOM_PROCESSOR,
    S_OUT_OF_SCOPE,
    S_BLOCKED_BY_USER,
    S_TOO_MANY_EMBED_HOPS,
    S_TOO_MANY_LINK_HOPS,
    S_DELETED_BY_USER,
)

#: statuses eligible for retry (AbstractFrontier.needsReenqueuing :1093-1126)
RETRY_STATUSES = (S_DEFERRED, S_CONNECT_FAILED, S_CONNECT_LOST, S_DOMAIN_UNRESOLVABLE)

# defaults (AbstractFrontier.java:104,115; WorkQueueFrontier.java:120,132,143,165;
# DispositionProcessor.java:72-122)
DEFAULT_MAX_RETRIES = 30
DEFAULT_RETRY_DELAY_MS = 900_000
DEFAULT_DELAY_FACTOR = 5.0
DEFAULT_MIN_DELAY_MS = 3_000
DEFAULT_MAX_DELAY_MS = 30_000
DEFAULT_RESPECT_CRAWL_DELAY_UP_TO_MS = 300_000
DEFAULT_SESSION_BUDGET = 3_000  # balanceReplenishAmount
DEFAULT_ERROR_PENALTY = 100
DEFAULT_TOTAL_BUDGET = -1  # unlimited
PRECEDENCE_FLOOR = 255
DEFAULT_QUEUE_PRECEDENCE = 3  # BaseQueuePrecedencePolicy basePrecedence

ORDINAL_MASK = (1 << 48) - 1

FRONTIER_SCHEMA = StructType(
    [
        StructField("uri", StringType(), False),
        StructField("canonical", StringType(), False),
        StructField("fp", LongType(), False),
        StructField("class_key", StringType(), False),
        StructField("is_seed", BooleanType(), False),
        StructField("hops_path", StringType(), False),
        StructField("via", StringType(), True),
        StructField("via_context", StringType(), True),
        StructField("sched_directive", IntegerType(), False),
        StructField("precedence", IntegerType(), False),
        StructField("cost", IntegerType(), False),
        StructField("ordinal", LongType(), False),
        StructField("fetch_attempts", IntegerType(), False),
        StructField("force_fetch", BooleanType(), False),
    ]
)


# ---------------------------------------------------------------------------
# ordering law
# ---------------------------------------------------------------------------
def insert_key_order() -> list[Column]:
    """ORDER BY columns of the within-queue insert key.

    Byte-exact analog of calculateInsertKey: directive byte, precedence
    byte clamped to 127, 48-bit ordinal (BdbMultipleWorkQueues.java:422-438).
    """
    return [
        F.col("sched_directive").asc(),
        F.least(F.col("precedence"), F.lit(127)).asc(),
        (F.col("ordinal").bitwiseAND(F.lit(ORDINAL_MASK))).asc(),
    ]


def queue_rank(df: DataFrame, rank_col: str = "queue_rank") -> DataFrame:
    """row_number over each class_key queue in insert-key order."""
    w = Window.partitionBy("class_key").orderBy(*insert_key_order())
    return df.withColumn(rank_col, F.row_number().over(w))


def head_pick(df: DataFrame, k: int = 1) -> DataFrame:
    """The next ≤k URIs per queue (findEligibleURI's readyQ.peek, per-round).

    Round-based rotation gives Heritrix's host-fairness for free: every
    eligible queue surfaces at most k URIs per round
    (WorkQueueFrontier.java:581-738 collapses to this under macro-batches).
    """
    return queue_rank(df).filter(F.col("queue_rank") <= k).drop("queue_rank")


# ---------------------------------------------------------------------------
# preparation laws (FrontierPreparer)
# ---------------------------------------------------------------------------
def trans_hops_col(hops_path: Column) -> Column:
    """Trailing non-NAVLINK hop count (CrawlURI.getTransHops, :1451-1461)."""
    # chars after the last 'L'; if no 'L', the whole path
    return F.length(hops_path) - F.when(
        F.locate("L", F.reverse(hops_path)) > 0,
        F.length(hops_path) - F.locate("L", F.reverse(hops_path)) + 1,
    ).otherwise(F.lit(0))


def scheduling_directive_col(
    hops_path: Column,
    current_directive: Column,
    preference_depth_hops: int = -1,
    preference_embed_hops: int = 1,
) -> Column:
    """FrontierPreparer.getSchedulingDirective (:187-220), defaults applied."""
    last_hop = F.substring(hops_path, -1, 1)
    redirect = F.when(
        (F.length(hops_path) > 0) & (last_hop == "R"),
        F.lit(HIGH if preference_depth_hops >= 0 else MEDIUM),
    )
    if preference_depth_hops == 0:
        base = F.lit(HIGH)
    elif preference_depth_hops > 0:
        base = F.when(
            F.length(hops_path) + 1 <= preference_depth_hops, F.lit(HIGH)
        ).otherwise(current_directive)
    else:
        trans = trans_hops_col(hops_path)
        embed_promote = (
            (F.lit(preference_embed_hops) > 0)
            & (trans > 0)
            & (trans <= preference_embed_hops)
            & (current_directive == NORMAL)
        )
        base = F.when(embed_promote, F.lit(MEDIUM)).otherwise(current_directive)
    return F.coalesce(redirect, base)


def unit_cost_col() -> Column:
    """UnitCostAssignmentPolicy.java:34-36."""
    return F.lit(1)


def anti_calendar_cost_col(uri: Column) -> Column:
    """AntiCalendarCostAssignmentPolicy.java:41-58: calendar-ish URIs cost 2."""
    pat = r"(?i)(calendar)|(year)|(month)|(day)|(date)|(viewcal)|(\?m=)|(&m=)|(\?y=)|(&y=)|(\?d=)|(&d=)"
    return F.when(uri.rlike(pat), F.lit(2)).otherwise(F.lit(1))


def wag_cost_col(uri: Column, via: Column) -> Column:
    """WagCostAssignmentPolicy.java:41-60: +1 query string, +1 same-page via."""
    base = F.lit(1)
    has_q = F.locate("?", uri) > 0
    pre_q = F.substring_index(uri, "?", 1)
    via_same = via.isNotNull() & F.substring(via, 1, F.length(pre_q).cast("int")).eqNullSafe(pre_q)
    return base + F.when(has_q, F.lit(1)).otherwise(F.lit(0)) + F.when(
        has_q & via_same, F.lit(1)
    ).otherwise(F.lit(0))


def zero_cost_col() -> Column:
    """ZeroCostAssignmentPolicy.java: every URI costs 0."""
    return F.lit(0)


def cost_uri_precedence_col(cost: Column) -> Column:
    """CostUriPrecedencePolicy.java:36-39: uri precedence = holder cost."""
    return cost


def base_uri_precedence_col(base_precedence: int = 1) -> Column:
    """BaseUriPrecedencePolicy.java:40-52: constant basePrecedence."""
    return F.lit(base_precedence)


def preloaded_uri_precedence(
    candidates: DataFrame,
    history: DataFrame,
    default_precedence: int = 1,
    uri_col: str = "canonical",
) -> DataFrame:
    """PreloadedUriPrecedencePolicy (frontier/precedence/
    PreloadedUriPrecedencePolicy.java): precedence preloaded from a prior
    crawl's history table (canonical -> precedence); absent -> default.
    The history side is a normal table join (prune/broadcast by AQE)."""
    h = history.select(
        F.col(uri_col).alias("__h_uri"), F.col("precedence").alias("__h_prec")
    )
    return (
        candidates.join(h, candidates[uri_col] == F.col("__h_uri"), "left")
        .withColumn(
            "precedence", F.coalesce(F.col("__h_prec"), F.lit(default_precedence))
        )
        .drop("__h_uri", "__h_prec")
    )


def hops_uri_precedence_col(hops_path: Column, base_precedence: int = 1) -> Column:
    """HopsUriPrecedencePolicy: base + link-hop ('L') count."""
    return F.lit(base_precedence) + F.length(
        F.regexp_replace(hops_path, "[^L]", "")
    ).cast("int")


# ---------------------------------------------------------------------------
# queue precedence policies (frontier/precedence/*.java)
# ---------------------------------------------------------------------------
def base_queue_precedence() -> Column:
    """BaseQueuePrecedencePolicy.java:42-76: constant basePrecedence(3)."""
    return F.lit(DEFAULT_QUEUE_PRECEDENCE)


def highest_uri_queue_precedence(frontier: DataFrame, base_precedence: int = 1) -> DataFrame:
    """HighestUriQueuePrecedencePolicy.java:39-90: queue precedence = base +
    the minimum precedence among the queue's enqueued URIs (the reference
    maintains this as an incremental histogram; per-round it is one grouped
    min over pending rows). Returns (class_key, queue_precedence)."""
    return frontier.groupBy("class_key").agg(
        (F.lit(base_precedence) + F.min("precedence")).cast("int").alias("queue_precedence")
    )


def success_counts_queue_precedence(
    crawl_log: DataFrame, thresholds: tuple[int, ...] = (100, 1000), base_precedence: int = 3
) -> DataFrame:
    """SuccessCountsQueuePrecedencePolicy.java:69-100: precedence grows one
    step per crossed success-count threshold. Returns
    (class_key, queue_precedence)."""
    successes = (
        crawl_log.filter(F.col("disposition") == "success")
        .groupBy("class_key")
        .agg(F.count("*").alias("__n"))
    )
    prec = F.lit(base_precedence)
    for t in thresholds:
        prec = prec + F.when(F.col("__n") >= t, 1).otherwise(0)
    return successes.select("class_key", prec.cast("int").alias("queue_precedence"))


# ---------------------------------------------------------------------------
# disposition laws
# ---------------------------------------------------------------------------
def is_success_col(fetch_status: Column) -> Column:
    """CrawlURI.isSuccess analog: positive status (2xx http, dns=1, ...)."""
    return fetch_status > 0


def is_disregarded_col(fetch_status: Column) -> Column:
    return fetch_status.isin(*DISREGARD_STATUSES)


def needs_retry_col(
    fetch_status: Column,
    fetch_attempts: Column,
    max_retries: int = DEFAULT_MAX_RETRIES,
    creds_loaded: Column | None = None,
) -> Column:
    """needsReenqueuing (AbstractFrontier.java:1093-1126): connect/DNS
    failures and deferrals retry; a 401 retries iff an rfc2617 credential
    was loaded onto the URI by handle401 (``creds_loaded``; None = the
    no-credential-store default, where a 401 is a terminal failure)."""
    retryable = fetch_status.isin(*RETRY_STATUSES)
    if creds_loaded is not None:
        retryable = retryable | (
            (fetch_status == HTTP_UNAUTHORIZED) & creds_loaded
        )
    return (fetch_attempts < max_retries) & retryable


def retry_delay_col(fetch_status: Column, retry_delay_ms: int = DEFAULT_RETRY_DELAY_MS) -> Column:
    """retryDelayFor (AbstractFrontier.java:851-856): long delay only for
    connection/DNS failures; immediate for deferred prerequisites."""
    return F.when(
        fetch_status.isin(S_CONNECT_FAILED, S_CONNECT_LOST, S_DOMAIN_UNRESOLVABLE),
        F.lit(retry_delay_ms),
    ).otherwise(F.lit(0))


def politeness_delay_col(
    fetch_duration_ms: Column,
    crawl_delay_s: Column | None = None,
    delay_factor: float = DEFAULT_DELAY_FACTOR,
    min_delay_ms: int = DEFAULT_MIN_DELAY_MS,
    max_delay_ms: int = DEFAULT_MAX_DELAY_MS,
    respect_crawl_delay_up_to_ms: int = DEFAULT_RESPECT_CRAWL_DELAY_UP_TO_MS,
) -> Column:
    """DispositionProcessor.politenessDelayFor (:230-294) as column math."""
    d = F.least(
        F.greatest(
            (fetch_duration_ms * delay_factor).cast("long"), F.lit(min_delay_ms).cast("long")
        ),
        F.lit(max_delay_ms).cast("long"),
    )
    if crawl_delay_s is None:
        return d
    cd_ms = F.least(
        (crawl_delay_s * 1000).cast("long"), F.lit(respect_crawl_delay_up_to_ms).cast("long")
    )
    raised = F.when(
        (d < respect_crawl_delay_up_to_ms) & crawl_delay_s.isNotNull() & (cd_ms > d), cd_ms
    ).otherwise(d)
    return raised
