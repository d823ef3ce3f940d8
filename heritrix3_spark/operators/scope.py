"""Scoping predicates — the DecideRule algebra as tri-state columns.

DecideRuleSequence.innerDecide folds rules in order; the LAST non-NONE
ACCEPT/REJECT wins, and a final NONE counts as out-of-scope
(/root/reference/modules/src/main/java/org/archive/modules/deciderules/
 DecideRuleSequence.java:103-132; Scoper.java:105-126).

Each rule here is a Column producing +1 (ACCEPT) / -1 (REJECT) / 0 (NONE);
the fold is a reversed ``coalesce`` of nullified tri-states — one flat
JVM expression, no Python, fully pushdown-friendly.

Default scope chain re-stated from profile-crawler-beans.cxml:133-186 with
each rule's cited law:

  Reject -> acceptSurts -> TooManyHops(20) -> Transclusion(2,1) ->
  PathologicalPath(2) -> TooManyPathSegments(20) -> PrerequisiteAccept ->
  SchemeNotInSet(reject)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from heritrix3_spark.functions.surt import surt_col

ACCEPT, REJECT, NONE = 1, -1, 0

#: SchemeNotInSetDecideRule.java:46-66 default scheme set
DEFAULT_SCHEMES = ("http", "https", "ftp", "dns", "whois", "sftp")


def reject_all() -> Column:
    """RejectDecideRule: unconditional REJECT (chain starter)."""
    return F.lit(REJECT)


def candidate_surt_col(uri: Column) -> Column:
    """SurtPrefixSet.getCandidateSurt: the candidate's SURT form with https
    coerced to http for comparison — seed-implied prefixes are stored
    http-forced (prefixFromPlainForceHttp), so https candidates must
    compare in the same coordinate or no https URI would ever be in scope
    (SurtPrefixedDecideRule.java:186-190)."""
    return F.regexp_replace(surt_col(uri), "^https://", "http://")


def surt_auth_level_col(uri: Column) -> Column:
    """The URI's authority-level SURT (scheme + '(authority)' — cut at the
    first ')', inclusive), https coerced to http (getCandidateSurt law):
    the candidate-side key of every seed-implied prefix test. Shared by
    the InSet path below and the crawler's broadcast-join path so both
    compare identical strings."""
    s = candidate_surt_col(uri)
    return F.concat(F.substring_index(s, ")", 1), F.lit(")"))


def seed_surt_prefix_col(uri: Column) -> Column:
    """Column form of :func:`seed_surt_prefixes`' per-seed law (SurtPrefixSet
    .prefixFromPlainForceHttp): authority-level SURT with https unified to
    http; NULL when the SURT has no ')' (non-URL). Lets a 10^6-seed
    bootstrap derive its scope prefixes distributed instead of collecting
    every seed canonical to the driver."""
    s = surt_col(uri)
    auth = F.concat(F.substring_index(s, ")", 1), F.lit(")"))
    return F.when(
        s.contains(")"), F.regexp_replace(auth, "^https://", "http://")
    )


def surt_prefixed(uri: Column, prefixes: list[str], decision: int = ACCEPT) -> Column:
    """SurtPrefixedDecideRule (deciderules/surt/SurtPrefixedDecideRule.java:74-182).

    ACCEPT when the URI's SURT form starts with any prefix in the set.

    Two evaluation paths, split like SurtPrefixSet.containsPrefixOf's
    sorted-set shortcut:

    * **authority-level prefixes** (end at the SURT ``)`` — what seeds
      imply) match iff the candidate's own authority-level SURT equals
      one of them, so they compile to a hash-set probe (Catalyst
      ``InSet``): O(1) per row regardless of seed count. The naive
      ``exists(startswith)`` scan was ~1 ms/row at 400 seeds — the
      dominant cost of the whole candidate pipeline — and O(seeds)/row
      would be fatal at 10^6-seed scale.
    * **path-carrying prefixes** (custom surts files) fall back to the
      scan, with the SURT string bound ONCE through a transform lambda
      (Catalyst re-evaluates captured subtrees inside HOF lambdas — the
      known expression-duplication pitfall, see canonicalize.py).

    Both paths compare the getCandidateSurt form (https coerced to http).
    """
    s = candidate_surt_col(uri)
    auth_level = [p for p in prefixes if p.endswith(")") and p.count(")") == 1]
    general = [p for p in prefixes if not (p.endswith(")") and p.count(")") == 1)]
    hit = None
    if auth_level:
        hit = surt_auth_level_col(uri).isin(auth_level)
    if general:
        arr = F.array(*[F.lit(p) for p in general])
        scan = F.transform(
            F.array(s), lambda ss: F.exists(arr, lambda p: ss.startswith(p))
        )[0]
        hit = scan if hit is None else (hit | scan)
    if hit is None:
        return F.lit(NONE)
    return F.when(hit, F.lit(decision)).otherwise(F.lit(NONE))


# --- hops-path display truncation (CrawlURI.extendHopsPath :1519-1526 +
# getHopCount :625-638): past MAX_HOPS_DISPLAYED symbols the path becomes
# "<overflow>+<last MAX-1 symbols><new>", a sliding window with a count
# prefix; hop count = overflow + symbols after '+'.
MAX_HOPS_DISPLAYED = 50


def extend_hops_path(path: str, hop: str) -> str:
    """Scalar extendHopsPath (byte-exact Java law)."""
    if len(path) < MAX_HOPS_DISPLAYED:
        return path + hop
    plus = path.find("+")
    prev = 0 if plus < 0 else int(path[:plus])
    return f"{prev + 1}+{path[plus + 2:]}{hop}"


def extend_hops_path_col(path: Column, hop: Column) -> Column:
    """Column twin of :func:`extend_hops_path`. ``instr`` is 1-based (0 =
    absent): Java ``substring(plusIndex+2)`` maps to ``substr(instr+2)``
    for both the absent (-1 -> drop first symbol) and present cases."""
    plus = F.instr(path, "+")
    prev = F.when(
        plus > 0, F.substring_index(path, "+", 1).cast("int")
    ).otherwise(F.lit(0))
    slid = F.concat(
        (prev + 1).cast("string"),
        F.lit("+"),
        path.substr(plus + F.lit(2), F.lit(1 << 20)),
        hop,
    )
    return F.when(
        F.length(path) < MAX_HOPS_DISPLAYED, F.concat(path, hop)
    ).otherwise(slid)


def hop_count(path: str) -> int:
    """Scalar getHopCount."""
    if len(path) <= MAX_HOPS_DISPLAYED:
        return len(path)
    plus = path.find("+")
    if plus < 0:
        return len(path)
    return int(path[:plus]) + len(path) - (plus + 1)


def hop_count_col(path: Column) -> Column:
    plus = F.instr(path, "+")
    prev = F.when(
        plus > 0, F.substring_index(path, "+", 1).cast("int")
    ).otherwise(F.lit(0))
    return F.when(
        (F.length(path) <= MAX_HOPS_DISPLAYED) | (plus == 0), F.length(path)
    ).otherwise(prev + F.length(path) - plus)


def too_many_hops(hops_path: Column, max_hops: int = 20) -> Column:
    """TooManyHopsDecideRule.java:69: REJECT if hop count > maxHops, where
    hop count honors the '+'-overflow display form (getHopCount law)."""
    return F.when(hop_count_col(hops_path) > max_hops, F.lit(REJECT)).otherwise(
        F.lit(NONE)
    )


def transclusion(
    hops_path: Column, max_trans_hops: int = 2, max_speculative_hops: int = 1
) -> Column:
    """TransclusionDecideRule.java:86-120: ACCEPT a trailing run of
    non-navlink hops when 0 < non-R-count <= maxTrans and X-count <= maxSpec.

    The trailing run ends at the last L, S or M hop.
    """
    tail = F.regexp_extract(hops_path, "([^LSM]*)$", 1)
    all_count = F.length(tail)
    nonref = F.length(F.regexp_replace(tail, "R", ""))
    spec = F.length(tail) - F.length(F.regexp_replace(tail, "X", ""))
    ok = (all_count > 0) & (spec <= max_speculative_hops) & (nonref <= max_trans_hops)
    return F.when(ok, F.lit(ACCEPT)).otherwise(F.lit(NONE))


def pathological_path(uri: Column, max_repetitions: int = 2) -> Column:
    """PathologicalPathDecideRule.java:60-78: REJECT when any path segment
    repeats consecutively more than maxRepetitions times
    (regex ``.*?/(.*?/)\\1{N,}.*``).

    The backreference regex backtracks heavily, so it only runs on URIs
    with enough slashes to possibly contain maxRepetitions+1 consecutive
    repeats (cheap count guard — a big win at 10^10 URLs where the rule
    almost never fires).
    """
    pat = r".*?/(.*?/)\1{" + str(max_repetitions) + r",}.*"
    slashes = F.length(uri) - F.length(F.regexp_replace(uri, "/", ""))
    plausible = slashes >= (max_repetitions + 2)
    return F.when(plausible & uri.rlike("^" + pat + "$"), F.lit(REJECT)).otherwise(F.lit(NONE))


def too_many_path_segments(uri: Column, max_segments: int = 20) -> Column:
    """TooManyPathSegmentsDecideRule: REJECT when '/' count (after scheme)
    exceeds maxSegments."""
    slashes = F.length(uri) - F.length(F.regexp_replace(uri, "/", ""))
    # discount the two scheme slashes when present
    adj = F.when(uri.rlike("^[a-zA-Z][\\w+\\-.]*://"), slashes - 2).otherwise(slashes)
    return F.when(adj > max_segments, F.lit(REJECT)).otherwise(F.lit(NONE))


def prerequisite_accept(hops_path: Column) -> Column:
    """PrerequisiteAcceptDecideRule: always ACCEPT a 'P' last hop."""
    return F.when(F.substring(hops_path, -1, 1) == "P", F.lit(ACCEPT)).otherwise(F.lit(NONE))


def scheme_not_in_set(uri: Column, schemes: tuple[str, ...] = DEFAULT_SCHEMES) -> Column:
    """SchemeNotInSetDecideRule.java:65: REJECT unknown schemes."""
    scheme = F.regexp_extract(uri, r"^([a-zA-Z][\w+\-.]*):", 1)
    return F.when(~F.lower(scheme).isin(*schemes), F.lit(REJECT)).otherwise(F.lit(NONE))


def matches_list_regex(uri: Column, patterns: list[str], decision: int = REJECT) -> Column:
    """MatchesListRegexDecideRule: decision when URI matches any regex."""
    if not patterns:
        return F.lit(NONE)
    cond = None
    for p in patterns:
        c = uri.rlike(p)
        cond = c if cond is None else (cond | c)
    return F.when(cond, F.lit(decision)).otherwise(F.lit(NONE))


# ---------------------------------------------------------------------------
# DecideRule tail (deciderules/*.java) — each a tri-state Column
# ---------------------------------------------------------------------------
def not_surt_prefixed(uri: Column, prefixes: list[str], decision: int = REJECT) -> Column:
    """NotSurtPrefixedDecideRule (deciderules/surt/NotSurtPrefixedDecideRule
    .java): decision when the SURT form (getCandidateSurt coordinates) does
    NOT start with any prefix."""
    s = candidate_surt_col(uri)
    arr = F.array(*[F.lit(p) for p in prefixes])
    hit = F.exists(arr, lambda p: s.startswith(p))
    return F.when(~hit, F.lit(decision)).otherwise(F.lit(NONE))


def _host_of(uri: Column) -> Column:
    return F.lower(
        F.regexp_extract(uri, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )


def on_domains(uri: Column, domains: list[str], decision: int = ACCEPT) -> Column:
    """MatchesOnDomainsDecideRule semantics (deciderules/surt/
    OnDomainsDecideRule.java): host equals a domain or is a subdomain."""
    h = _host_of(uri)
    arr = F.array(*[F.lit(d.lower()) for d in domains])
    hit = F.exists(arr, lambda d: (h == d) | h.endswith(F.concat(F.lit("."), d)))
    return F.when(hit, F.lit(decision)).otherwise(F.lit(NONE))


def not_on_domains(uri: Column, domains: list[str], decision: int = REJECT) -> Column:
    """NotOnDomainsDecideRule: decision when host is NOT on any domain."""
    h = _host_of(uri)
    arr = F.array(*[F.lit(d.lower()) for d in domains])
    hit = F.exists(arr, lambda d: (h == d) | h.endswith(F.concat(F.lit("."), d)))
    return F.when(~hit, F.lit(decision)).otherwise(F.lit(NONE))


def on_hosts(uri: Column, hosts: list[str], decision: int = ACCEPT) -> Column:
    """OnHostsDecideRule: exact host membership."""
    return F.when(_host_of(uri).isin(*[h.lower() for h in hosts]), F.lit(decision)).otherwise(
        F.lit(NONE)
    )


def not_on_hosts(uri: Column, hosts: list[str], decision: int = REJECT) -> Column:
    """NotOnHostsDecideRule: decision when host is NOT in the set."""
    return F.when(
        ~_host_of(uri).isin(*[h.lower() for h in hosts]), F.lit(decision)
    ).otherwise(F.lit(NONE))


def has_via(via: Column, decision: int = ACCEPT) -> Column:
    """HasViaDecideRule (deciderules/HasViaDecideRule.java): decision when
    the URI was discovered via another (non-seed)."""
    return F.when(via.isNotNull() & (F.length(via) > 0), F.lit(decision)).otherwise(
        F.lit(NONE)
    )


def via_surt_prefixed(via: Column, prefixes: list[str], decision: int = ACCEPT) -> Column:
    """ViaSurtPrefixedDecideRule: SURT-prefix test applied to the via."""
    s = surt_col(via)
    arr = F.array(*[F.lit(p) for p in prefixes])
    hit = via.isNotNull() & F.exists(arr, lambda p: s.startswith(p))
    return F.when(hit, F.lit(decision)).otherwise(F.lit(NONE))


def hops_path_matches_regex(
    hops_path: Column, pattern: str, decision: int = ACCEPT
) -> Column:
    """HopsPathMatchesRegexDecideRule: regex over the hop-char path."""
    return F.when(hops_path.rlike(pattern), F.lit(decision)).otherwise(F.lit(NONE))


def source_seed(source_tag: Column, seeds: list[str], decision: int = ACCEPT) -> Column:
    """SourceSeedDecideRule (deciderules/SourceSeedDecideRule.java): decision
    when the URI's source seed (sourceTag) is one of the given seeds. Takes
    the source-tag column explicitly (enable source tagging to populate)."""
    return F.when(source_tag.isin(*seeds), F.lit(decision)).otherwise(F.lit(NONE))


def hop_crosses_assignment_level_domain(uri: Column, via: Column) -> Column:
    """HopCrossesAssignmentLevelDomainDecideRule: decision (REJECT form here)
    when uri and via live in different assignment-level domains."""
    from heritrix3_spark.functions.surt import assignment_level_class_key_col

    a = assignment_level_class_key_col(uri)
    b = assignment_level_class_key_col(via)
    crossed = via.isNotNull() & (a != b)
    return F.when(crossed, F.lit(REJECT)).otherwise(F.lit(NONE))


#: MatchesFilePatternDecideRule presets (deciderules/
#: MatchesFilePatternDecideRule.java:34-49 — the published regexes)
FILE_PATTERN_PRESETS = {
    "ALL": (
        r".*(?i)(\.(bmp|gif|jpe?g|png|svg|tiff?|aac|aiff?|m3u|m4a|midi?"
        r"|mp2|mp3|mp4|mpa|ogg|ra|ram|wav|wma|asf|asx|avi|flv|mov|mp4"
        r"|mpeg|mpg|qt|ram|rm|smil|wmv|doc|pdf|ppt|swf))$"
    ),
    "IMAGES": r".*(?i)(\.(bmp|gif|jpe?g|png|svg|tiff?))$",
    "AUDIO": r".*(?i)(\.(aac|aiff?|m3u|m4a|midi?|mp2|mp3|mp4|mpa|ogg|ra|ram|wav|wma))$",
    "VIDEO": r".*(?i)(\.(asf|asx|avi|flv|mov|mp4|mpeg|mpg|qt|ram|rm|smil|wmv))$",
    "MISC": r".*(?i)(\.(doc|pdf|ppt|swf))$",
}


def matches_file_pattern(
    uri: Column, preset: str = "ALL", decision: int = ACCEPT
) -> Column:
    """MatchesFilePatternDecideRule with the reference's preset regexes."""
    # Java embeds (?i) mid-pattern; Spark's RE2-like engine wants it leading
    pat = "(?i)" + FILE_PATTERN_PRESETS[preset].replace("(?i)", "")
    return F.when(uri.rlike(pat), F.lit(decision)).otherwise(F.lit(NONE))


# --- post-fetch rules (read response columns) ------------------------------
def fetch_status_matches_regex(
    fetch_status: Column, pattern: str, decision: int = ACCEPT
) -> Column:
    """FetchStatusMatchesRegexDecideRule: regex over the stringified code."""
    return F.when(fetch_status.cast("string").rlike(pattern), F.lit(decision)).otherwise(
        F.lit(NONE)
    )


def fetch_status_not_matches_regex(
    fetch_status: Column, pattern: str, decision: int = REJECT
) -> Column:
    return F.when(
        ~fetch_status.cast("string").rlike(pattern), F.lit(decision)
    ).otherwise(F.lit(NONE))


def content_type_matches_regex(
    content_type: Column, pattern: str, decision: int = ACCEPT
) -> Column:
    """ContentTypeMatchesRegexDecideRule (needs a content_type column)."""
    return F.when(
        content_type.isNotNull() & content_type.rlike(pattern), F.lit(decision)
    ).otherwise(F.lit(NONE))


def content_type_not_matches_regex(
    content_type: Column, pattern: str, decision: int = REJECT
) -> Column:
    return F.when(
        content_type.isNotNull() & ~content_type.rlike(pattern), F.lit(decision)
    ).otherwise(F.lit(NONE))


def content_length_at_most(
    content_length: Column, threshold: int, decision: int = ACCEPT
) -> Column:
    """ContentLengthDecideRule: decision when content-length <= threshold
    (deciderules/ContentLengthDecideRule.java)."""
    return F.when(content_length <= threshold, F.lit(decision)).otherwise(F.lit(NONE))


def resource_longer_than(
    content_length: Column, threshold: int, decision: int = REJECT
) -> Column:
    """ResourceLongerThanDecideRule / (with decision=ACCEPT the NoLongerThan
    complement inverts the comparison at the call site)."""
    return F.when(content_length > threshold, F.lit(decision)).otherwise(F.lit(NONE))


def scripted(predicate: Column, decision: int = ACCEPT) -> Column:
    """ScriptedDecideRule's pluggable hook: any boolean Column (or a
    pandas-UDF-backed one) becomes a tri-state rule."""
    return F.when(predicate, F.lit(decision)).otherwise(F.lit(NONE))


def expression_rule(expression: str, decision: int = ACCEPT) -> Column:
    """ExpressionDecideRule (contrib deciderules/ExpressionDecideRule.java:
    38-76): the reference templates a Groovy expression over ``curi`` and
    matches when it renders exactly "true". The Spark-native equivalent of
    a user-supplied expression over the candidate is an ANSI-SQL boolean
    expression over the candidate columns — the reference's own documented
    example

        curi.via == null && curi ==~ "^https?://(?:www\\.)?...$"

    is written here as

        via IS NULL AND uri RLIKE '^https?://(?:www\\.)?...$'

    Catalyst parses it into the same codegen'd predicate a hand-built
    Column would produce, so the rule is free at scan time (and still
    benefits from pushdown). A NULL result renders as not-"true" -> NONE,
    mirroring ``String.valueOf(true).equals(...)``.
    """
    pred = F.coalesce(F.expr(expression).cast("boolean"), F.lit(False))
    return F.when(pred, F.lit(decision)).otherwise(F.lit(NONE))


def decide_sequence(*rules: Column) -> Column:
    """Fold: last non-NONE wins; all-NONE -> REJECT (out of scope).

    NB (r6 measurement): binding each rule through a transform-lambda
    before the NONE test looks like it should help (``when(r != NONE,
    r)`` references each rule twice) but measured 2x WORSE on the 2M-row
    scope bench — the HOF wrapper knocks the whole fold out of
    whole-stage codegen, which costs more than the duplicate predicate
    evaluation codegen CSE already absorbs. Keep the plain fold."""
    nullified = [F.when(r != NONE, r) for r in reversed(rules)]
    return F.coalesce(*nullified, F.lit(REJECT))


def default_scope(
    uri: Column,
    hops_path: Column,
    seed_surt_prefixes: list[str],
    max_hops: int = 20,
    reject_regexes: list[str] | None = None,
    surt_hit: Column | None = None,
) -> Column:
    """The default crawl scope as one boolean Column (True = in scope).

    ``surt_hit``: optional precomputed boolean for the acceptSurts rule —
    the crawler passes a broadcast-join-produced column here when the
    seed-prefix set is too large to embed in the plan as an InSet literal
    (10^6-seed scale); the fold semantics are identical."""
    seq = decide_sequence(
        reject_all(),
        (
            F.when(surt_hit, F.lit(ACCEPT)).otherwise(F.lit(NONE))
            if surt_hit is not None
            else surt_prefixed(uri, seed_surt_prefixes)
        ),
        too_many_hops(hops_path, max_hops),
        transclusion(hops_path),
        matches_list_regex(uri, reject_regexes or []),
        pathological_path(uri),
        too_many_path_segments(uri),
        prerequisite_accept(hops_path),
        scheme_not_in_set(uri),
    )
    return seq == ACCEPT


def seed_surt_prefixes(seed_uris: list[str]) -> list[str]:
    """SURT prefixes implied by seeds (SurtPrefixSet.prefixFromPlainForceHttp
    semantics: scheme+authority of each seed; http(s) unified to http).

    Heritrix derives 'implied prefixes' from seeds — the authority-level
    SURT up to and including the ')' (so any path on the seed's host
    matches); https seeds imply the http-form prefix too.
    """
    from heritrix3_spark.functions.surt import surt

    out = []
    for u in seed_uris:
        s = surt(u)
        i = s.find(")")
        if i == -1:
            continue
        prefix = s[: i + 1]
        if prefix.startswith("https://"):
            prefix = "http://" + prefix[len("https://") :]
        if prefix not in out:
            out.append(prefix)
    return out
