"""FetchWhois analog — WHOIS lookup laws (RFC 3912 fetcher).

Re-expresses /root/reference/modules/src/main/java/org/archive/modules/
fetcher/FetchWhois.java as pure data laws; the socket I/O itself is
modeled by the synthetic web (a ``whois://server/query`` doc is the
recorded response).  The portable laws:

* **URI shape** (javadoc :61-96): ``whois:`` [``//host[:port]/``] query.
  ``getWhoisServer`` (:398-411) = the authority host (None when
  serverless); ``getWhoisQuery`` (:382-396) = path+query, minus the
  leading '/' when an authority is present, form-decoded (the javadoc's
  "send the query url-decoded" contract — verisign's ``domain %s``
  template only strips back out of the key law if the space survives).
* **addWhoisLinks** (:427-460): every non-whois URI with a CrawlHost
  gets 1-2 serverless ``whois:`` INFERRED outlinks added in the FETCH
  chain (before the extractors — profile-crawler-beans.cxml places
  fetchWhois between fetchDns and fetchHttp): ``whois:{ip}`` when the
  host's IP is known (dns-resolved, or the hostname is an IPv4 literal
  — CrawlHost.java:97-99), and ``whois:{topmostAssignedDomain}`` when
  the hostname is a valid InternetDomainName, falling back to the plain
  hostname when it is not under a public suffix (:449-457).  dns: and
  whois: rows resolve to the scheme-wide CrawlHost ("dns:"/"whois:",
  ServerCache.java:56-70) — never valid, so they add no links.
* **serverless resolution** (deferOrFinishGeneric :257-304): consult
  the referral-server knowledge table and the url-progress table —
  full-key referral (raw concat, no template/encoding — :259-260), IPv4
  (:261-262 -> whois.arin.net), suffix referral (:263-264), first visit
  to ``whois://whois.iana.org/{suffix}`` (:265-266), else
  S_OTHER_PREREQUISITE_FAILURE (-62).  A DONE tryThis finishes 2002
  (S_WHOIS_GENERIC_FINISHED); an unseen tryThis is marked IN_PROGRESS
  and becomes a prerequisite with ``setForceFetch(false)`` (:287-289);
  an IN_PROGRESS tryThis re-defers (:296-299).
* **makeWhoisUrl** (:306-321): per-server special query templates
  (verisign ``domain %s``, arin ``z + %s``, denic ``-T dn %s``),
  ``URLEncoder.encode(query, "UTF-8")``.
* **referral extraction** (fetch :342-356): every response line is
  scanned with WHOIS_SERVER_REGEX; each match records
  ``referralServers[strip-leading-tokens(query).lower()] =
  group(1).lower()`` (the strip undoes the ``domain `` / ``z + ``
  template prefixes) — the LAST matching line wins.  ``urlProgress[url]
  = DONE`` is written in the ``finally`` — even on a connect failure
  (:370-377).
* **statuses**: S_WHOIS_SUCCESS=2001, S_WHOIS_GENERIC_FINISHED=2002
  (FetchStatusCodes.java:116-119), connect failure -2, no-server -62.
  Success bodies are ``text/plain`` (:357).

Engine mapping: referral/progress state lives in two MergeOnReadTables
(bounded by distinct domains+suffixes seen — like the dns table, pruned
via a broadcast semi-join on the round's key set, never broadcast
wholesale).  Both twins read ROUND-START state (the macro-round batch
analog of the serial walk; all whois URIs share one "whois..." queue so
the reference, too, advances this state one fetch at a time).
IN_PROGRESS marks never overwrite an existing entry; DONE always wins —
the only orders a serial execution could produce.

Divergences (documented): quota enforcement skips whois rows (our
precondition CASE resolves the whois branch first; the reference would
tally them under the whois CrawlServer, which no real config quotas);
the topmost-assigned-domain law uses the repo's PSL snapshot
(functions/psl.py — unknown TLDs count as 1-label suffixes, so the
Guava not-under-public-suffix fallback (:452-456) only fires for
single-label or syntactically invalid hosts).
"""

from __future__ import annotations

import re

#: FetchWhois.java:135-137
DEFAULT_IP_WHOIS_SERVER = "whois.arin.net"
ULTRA_SUFFIX_WHOIS_SERVER = "whois.iana.org"

#: FetchWhois.java:130
IP_ADDRESS_REGEX = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

#: FetchWhois.java:146
WHOIS_SERVER_REGEX = (
    r"(?i)^\s*(?:whois server|ReferralServer|whois)[^:]*:"
    r".*?([a-zA-Z0-9-]+\.[a-zA-Z0-9.:-]+)/*$"
)

#: FetchWhois.java:160-166 (kept in sync with profile-crawler-beans.cxml)
DEFAULT_SPECIAL_QUERY_TEMPLATES = (
    ("whois.verisign-grs.com", "domain %s"),
    ("whois.arin.net", "z + %s"),
    ("whois.denic.de", "-T dn %s"),
)

#: FetchStatusCodes.java:116-119
S_WHOIS_SUCCESS = 2001
S_WHOIS_GENERIC_FINISHED = 2002

#: UrlStatus ordinals (FetchWhois.java:148)
IN_PROGRESS, DONE = 0, 1

INFERRED_MISC = "=INFERRED_MISC"

_JAVA_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789.-*_"
)


def form_encode(s: str) -> str:
    """java.net.URLEncoder.encode(s, "UTF-8") — identical law to
    operators/ftp.java_urlencode (space -> '+', ``[a-zA-Z0-9.\\-*_]``
    kept, else %XX per UTF-8 byte)."""
    out = []
    for ch in s:
        if ch in _JAVA_SAFE:
            out.append(ch)
        elif ch == " ":
            out.append("+")
        else:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
    return "".join(out)


def form_decode(s: str) -> str:
    """java.net.URLDecoder.decode(s, "UTF-8"): '+' -> space, %XX bytes
    decoded as UTF-8 (lax: malformed escapes pass through)."""
    import urllib.parse

    return urllib.parse.unquote_plus(s, errors="replace")


def parse_whois_uri(uri: str) -> tuple[str | None, int | None, str] | None:
    """getWhoisServer (:398-411) + getWhoisQuery (:382-396): ->
    ``(server, port, query)`` with server None for serverless URIs, or
    None when the URI is not a whois: URI."""
    if not uri.startswith("whois:"):
        return None
    rest = uri[len("whois:"):]
    if rest.startswith("//"):
        m = re.match(r"^//([^/?#:]*)(?::(\d+))?/?(.*)$", rest)
        if m is None:  # pragma: no cover - the regex always matches
            return None, None, form_decode(rest)
        server = m.group(1) or None  # empty host -> serverless (:404-406)
        port = int(m.group(2)) if m.group(2) else None
        return server, port, form_decode(m.group(3))
    return None, None, form_decode(rest)


def make_whois_url(server: str, principal: str, templates=None) -> str:
    """makeWhoisUrl (:306-321): apply the server's special query
    template, then form-encode."""
    tpl = dict(
        DEFAULT_SPECIAL_QUERY_TEMPLATES if templates is None else templates
    ).get(server.lower())
    query = tpl.replace("%s", principal) if tpl is not None else principal
    return "whois://" + server + "/" + form_encode(query)


def ultra_suffix(domain_or_ip: str) -> str:
    """:258 — the part after the last '.' (the whole string when there
    is no '.'), lowercased."""
    return domain_or_ip[domain_or_ip.rfind(".") + 1:].lower()


def referral_key(query: str) -> str:
    """fetch() :350 — ``whoisQuery.replaceFirst("(\\S+\\s+)+", "")``
    lowercased: strips the ``domain `` / ``z + `` template prefixes back
    off the wire query."""
    return re.sub(r"(\S+\s+)+", "", query, count=1).lower()


def referral_from_body(query: str, body: str) -> tuple[str, str] | None:
    """Scan a whois response for referral-server lines (:342-356): the
    LAST matching line wins (each match overwrites the same key)."""
    hit = None
    for line in body.splitlines():
        m = re.search(WHOIS_SERVER_REGEX, line)
        if m:
            hit = m.group(1).lower()
    if hit is None:
        return None
    return referral_key(query), hit


def serverless_next(
    query: str, referrals, progress, templates=None
) -> tuple[str, str | None]:
    """deferOrFinishGeneric (:257-304) on round-start state snapshots:
    -> ``(outcome, try_this)`` with outcome one of

    * ``"fail"``      — no known route (-62), try_this None;
    * ``"finished"``  — try_this already DONE (2002);
    * ``"mark"``      — mark try_this IN_PROGRESS + prerequisite;
    * ``"wait"``      — try_this IN_PROGRESS elsewhere: re-defer (:296).
    """
    suffix = ultra_suffix(query)
    if query in referrals:
        # raw concat — the full-key branch skips makeWhoisUrl (:259-260)
        try_this = "whois://" + referrals[query] + "/" + query
    elif re.fullmatch(IP_ADDRESS_REGEX, query):
        try_this = make_whois_url(DEFAULT_IP_WHOIS_SERVER, query, templates)
    elif suffix in referrals:
        try_this = make_whois_url(referrals[suffix], query, templates)
    elif progress.get(make_whois_url(ULTRA_SUFFIX_WHOIS_SERVER, suffix,
                                     templates)) is None:
        try_this = make_whois_url(ULTRA_SUFFIX_WHOIS_SERVER, suffix, templates)
    else:
        return "fail", None
    state = progress.get(try_this)
    if state == DONE:
        return "finished", try_this
    if state is None:
        return "mark", try_this
    return "wait", try_this


# ---------------------------------------------------------------------------
# addWhoisLinks host laws
# ---------------------------------------------------------------------------

_PART_RE = re.compile(r"^[a-zA-Z0-9_-]{1,63}$")


def is_valid_domain(host: str) -> bool:
    """Guava InternetDomainName.isValid syntax law (the :449 gate):
    dot-split parts of ``[a-zA-Z0-9_-]``, 1-63 chars, never starting or
    ending with '-', total <= 253, and the FINAL part not all-numeric
    (which is what keeps IPv4 literals out of the domain branch)."""
    if not host or len(host) > 253:
        return False
    parts = host.split(".")
    for p in parts:
        if not _PART_RE.match(p) or p.startswith("-") or p.endswith("-"):
            return False
    return not parts[-1].isdigit()


def topmost_assigned(host: str) -> str:
    """InternetDomainName.topPrivateDomain (:452) via the repo PSL
    snapshot, with the reference's plain-hostname fallback (:453-456)
    folded in (see module docstring for the snapshot divergence)."""
    from heritrix3_spark.functions.psl import assignment_level_domain

    return assignment_level_domain(host)


def host_ip(host: str, dns_resolved: bool) -> str | None:
    """CrawlHost.getIP() at fetch time: IPv4 literals resolve at
    construction (CrawlHost.java:97-99); otherwise the IP exists exactly
    when the dns lookup has run (which the dns precondition guarantees
    for every fetch-chain row when dns is obeyed) — the engine's
    deterministic resolver is functions/surt.synthetic_ip."""
    bare = host.split(":")[0]
    if re.fullmatch(IP_ADDRESS_REGEX, bare):
        return bare
    if dns_resolved:
        from heritrix3_spark.functions.surt import synthetic_ip

        return synthetic_ip(bare)
    return None


def whois_targets(host: str, ip: str | None) -> list[str]:
    """addWhoisLinks (:437-460): the 0-2 serverless whois URIs for a
    fetched URI's host — IP first, then domain (discovery order fixes
    the outlink ordinals)."""
    bare = host.split(":")[0]
    out = []
    if ip is not None:
        out.append("whois:" + ip)
    if is_valid_domain(bare):
        out.append("whois:" + topmost_assigned(bare))
    return out


# ---------------------------------------------------------------------------
# Column twins (engine side — all JVM-evaluable, no Python in the hot path)
# ---------------------------------------------------------------------------

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: one-part-per-dot syntax (the '-' edge law lives in the part pattern)
_VALID_DOMAIN_RE = (
    r"^[a-zA-Z0-9_]([a-zA-Z0-9_-]{0,61}[a-zA-Z0-9_])?"
    r"(\.[a-zA-Z0-9_]([a-zA-Z0-9_-]{0,61}[a-zA-Z0-9_])?)*$"
)


def is_valid_domain_col(host: Column) -> Column:
    """Column twin of :func:`is_valid_domain`."""
    return (
        (F.length(host) <= 253)
        & host.rlike(_VALID_DOMAIN_RE)
        & ~F.substring_index(host, ".", -1).rlike(r"^[0-9]+$")
    )


def _template_col(tpl: str, principal: Column) -> Column:
    """``tpl.replaceAll("%s", principal)`` with a Column principal."""
    args: list = []
    for i, part in enumerate(tpl.split("%s")):
        if i:
            args.append(principal)
        if part:
            args.append(F.lit(part))
    return F.concat(*args) if args else F.lit("")


def make_whois_url_col(server: Column, principal: Column, templates=None) -> Column:
    """Column twin of :func:`make_whois_url` (the template CASE compiles
    over the small config list; F.url_encode IS URLEncoder.encode)."""
    query = principal
    for srv, tpl in reversed(
        tuple(DEFAULT_SPECIAL_QUERY_TEMPLATES if templates is None else templates)
    ):
        query = F.when(
            F.lower(server) == srv.lower(), _template_col(tpl, principal)
        ).otherwise(query)
    return F.concat(F.lit("whois://"), server, F.lit("/"), F.url_encode(query))
