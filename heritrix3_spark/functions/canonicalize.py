"""URL canonicalization — Heritrix's default rule chain, Spark-first.

Reference semantics (re-implemented, not ported):
/root/reference/modules/src/main/java/org/archive/modules/canonicalize/
  RulesCanonicalizationPolicy.java:63-95 (chain + default rule order),
  LowercaseRule.java, StripUserinfoRule.java, StripWWWNRule.java,
  StripSessionIDs.java, StripSessionCFIDs.java, FixupQueryString.java,
  StripExtraSlashes.java, StripWWWRule.java,
  BaseRule.java:73 (doStripRegexMatch = group1+group2, null group -> "").

Two implementations, kept law-identical and cross-checked by tests:

* ``canonicalize(url)``: plain-Python scalar, used by the golden-crawl
  simulator and unit vectors.
* ``canonical_col(col)``: a pure Spark ``Column`` expression — a chain of
  ``lower``/``regexp_replace``/``when`` that runs entirely JVM-side inside
  whole-stage codegen. No Python UDF in the hot path: at 10^10 URLs this
  is the difference between an Arrow round-trip per batch and free codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# regex law (identical strings used by both paths; Java + Spark both use
# java.util.regex, Python's `re` is compatible for these patterns)
# ---------------------------------------------------------------------------
RE_USERINFO = r"^((?:(?:https?)|(?:ftps?))://)(?:[^/]+@)(.*)$"
RE_WWWN = r"^(https?://)(?:www[0-9]*\.)([^/]*/.+)$"
RE_SESSIONID_BASE = r"^(.+)(?:(?:(?:jsessionid)|(?:phpsessid))=[0-9a-zA-Z]{32})(?:&(.*))?$"
RE_SESSIONID_SID = r"^(.+)(?:sid=[0-9a-zA-Z]{32})(?:&(.*))?$"
RE_SESSIONID_ASP = r"^(.+)(?:ASPSESSIONID[a-zA-Z]{8}=[a-zA-Z]{24})(?:&(.*))?$"
RE_CFID = r"^(.+)(?:cfid=[^&]+&cftoken=[^&]+(?:jsession=[^&]+)?)(?:&(.*))?$"
RE_WWW = r"^(https?://)(?:www\.)([^/]*/.+)$"
RE_EXTRA_SLASHES = r"^(https?://.*?)//+(.*)$"


def _strip_match(url: str, pattern: str, flags: int = 0) -> str:
    """group1+group2 if the whole string matches, else unchanged."""
    m = re.match(pattern + r"\Z", url, flags)
    if not m:
        return url
    g1, g2 = m.group(1) or "", (m.group(2) if m.lastindex and m.lastindex >= 2 else "") or ""
    return g1 + g2


def lowercase(url: str) -> str:
    return url.lower()


def strip_userinfo(url: str) -> str:
    return _strip_match(url, RE_USERINFO, re.IGNORECASE)


def strip_wwwn(url: str) -> str:
    return _strip_match(url, RE_WWWN, re.IGNORECASE)


def strip_session_ids(url: str) -> str:
    url = _strip_match(url, RE_SESSIONID_BASE, re.IGNORECASE)
    url = _strip_match(url, RE_SESSIONID_SID, re.IGNORECASE)
    url = _strip_match(url, RE_SESSIONID_ASP, re.IGNORECASE)
    return url


def strip_session_cfids(url: str) -> str:
    return _strip_match(url, RE_CFID, re.IGNORECASE)


def fixup_query_string(url: str) -> str:
    """Exact positional law of FixupQueryString.canonicalize (if/else-if)."""
    if not url:
        return url
    index = url.rfind("?")
    if index > 0:
        if index == len(url) - 1:
            url = url[:-1]
        elif url[index + 1] == "&":
            if len(url) == index + 2:
                url = url[:-2]
            else:
                url = url[: index + 1] + url[index + 2 :]
        elif url[-1] == "&":
            url = url[:-1]
    return url


def strip_extra_slashes(url: str) -> str:
    while True:
        m = re.match(RE_EXTRA_SLASHES + r"\Z", url)
        if not m:
            return url
        url = m.group(1) + "/" + m.group(2)


def strip_www(url: str) -> str:
    return _strip_match(url, RE_WWW, re.IGNORECASE)


#: default chain order, RulesCanonicalizationPolicy.java:86-95
DEFAULT_CHAIN = (
    lowercase,
    strip_userinfo,
    strip_wwwn,
    strip_session_ids,
    strip_session_cfids,
    fixup_query_string,
)


def canonicalize(url: str) -> str:
    """Default Heritrix canonicalization chain (scalar reference)."""
    for rule in DEFAULT_CHAIN:
        url = rule(url)
    return url


# ---------------------------------------------------------------------------
# Spark Column expressions (JVM regex, whole-stage codegen, zero Python)
# ---------------------------------------------------------------------------
def _bind(value: Column, fn) -> Column:
    """Evaluate ``value`` once and pass it to ``fn`` as a lambda variable
    (transform over a 1-element array). Catalyst duplicates multiply-
    referenced subtrees and codegen CSE cannot hoist them out of CASE
    branches, so every chain stage below binds its input."""
    return F.transform(F.array(value), fn)[0]


def _strip_col(col: Column, pattern: str, guard_fn=None) -> Column:
    # regexp_replace with an anchored full-match pattern replaces the whole
    # string with $1$2; non-participating optional groups substitute "".
    # ``guard_fn`` is a cheap containment pre-filter: the `^(.+)...$` session
    # patterns backtrack O(len²) on every NON-matching URL, so skipping rows
    # that can't match is a ~10× throughput win on the hot path. The stage
    # input is BOUND once — the guarded CASE references it three times
    # (guard, replace input, fall-through), and six chained stages
    # otherwise re-evaluate the whole upstream chain per reference.
    if guard_fn is None:
        return F.regexp_replace(col, "(?i)" + pattern, "$1$2")
    return _bind(
        col,
        lambda x: F.when(
            guard_fn(x), F.regexp_replace(x, "(?i)" + pattern, "$1$2")
        ).otherwise(x),
    )


def canonical_col(col: Column) -> Column:
    """Default canonicalization chain as one JVM-side Column expression."""
    c = F.lower(col)
    # guards reference the already-lowercased value, so plain contains() is
    # equivalent to the patterns' (?i)
    c = _strip_col(c, RE_USERINFO, lambda x: F.contains(x, F.lit("@")))
    c = _strip_col(c, RE_WWWN, lambda x: F.contains(x, F.lit("www")))
    c = _strip_col(
        c,
        RE_SESSIONID_BASE,
        lambda x: F.contains(x, F.lit("jsessionid="))
        | F.contains(x, F.lit("phpsessid=")),
    )
    c = _strip_col(c, RE_SESSIONID_SID, lambda x: F.contains(x, F.lit("sid=")))
    c = _strip_col(
        c, RE_SESSIONID_ASP, lambda x: F.contains(x, F.lit("aspsessionid"))
    )
    c = _strip_col(c, RE_CFID, lambda x: F.contains(x, F.lit("cfid=")))
    # FixupQueryString: exact if/else-if branching over last-'?' position,
    # over the bound stripped value.
    return _bind(c, _fixup_query_string_expr)


def _fixup_query_string_expr(c: Column) -> Column:
    """FixupQueryString branching over an already-bound value ``c``."""
    length = F.length(c)
    rq = F.locate("?", F.reverse(c))  # distance of last '?' from end (0 = none)
    qpos = F.when(rq > 0, length - rq + 1).otherwise(F.lit(0))
    char_after = F.substring(c, (qpos + 1).cast("int"), 1)
    last_char = F.substring(c, (-1), 1)
    return (
        F.when(qpos <= 1, c)
        # trailing '?': strip it
        .when(qpos == length, F.substring(c, 1, (length - 1).cast("int")))
        # '?&' : drop both if at end, else drop just the '&'
        .when(
            char_after == "&",
            F.when(length == qpos + 1, F.substring(c, 1, (length - 2).cast("int"))).otherwise(
                F.concat(
                    F.substring(c, 1, qpos.cast("int")),
                    F.substring(c, (qpos + 2).cast("int"), (length - qpos - 1).cast("int")),
                )
            ),
        )
        # trailing '&' after a query: strip it
        .when(last_char == "&", F.substring(c, 1, (length - 1).cast("int")))
        .otherwise(c)
    )


def strip_extra_slashes_col(col: Column) -> Column:
    """StripExtraSlashes (non-default rule) as a Column expression.

    The reference loops the first-match replacement to a fixed point; for
    http(s) URLs that equals collapsing every post-authority slash-run, so
    we split at '://' and collapse runs in the remainder.
    """
    is_http = col.rlike("^https?://")
    head = F.substring_index(col, "://", 1)
    sep = F.locate("://", col)
    rest = F.substring(col, (sep + 3).cast("int"), F.length(col).cast("int"))
    collapsed = F.regexp_replace(rest, "//+", "/")
    return F.when(is_http, F.concat(head, F.lit("://"), collapsed)).otherwise(col)
