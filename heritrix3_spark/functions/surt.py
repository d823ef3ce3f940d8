"""SURT form + queue (class_key) assignment, Spark-first.

Reference semantics (re-implemented from scratch):

* SURT form — host labels reversed and comma-joined inside
  ``scheme://(...)``, port as ``:port`` and userinfo as ``@user:pass``
  appended inside the parens, dotted-quad IPv4 hosts NOT reversed.
  Law pinned by /root/reference/commons/src/test/java/org/archive/util/SURTTest.java:62-105
  (the implementation itself lives in the external webarchive-commons dep).
* class_key — SurtAuthorityQueueAssignmentPolicy: the text between
  ``://(`` and ``)`` with ``:`` replaced by ``#``
  (/root/reference/engine/src/main/java/org/archive/crawler/frontier/SurtAuthorityQueueAssignmentPolicy.java:32-44);
  base-policy edge cases — whois scheme -> one ``whois...`` queue, empty ->
  ``default...``, prerequisite URIs use their *via*'s key
  (URIAuthorityBasedQueueAssignmentPolicy.java:89-145, CrawlURI.java:1576-1587);
  optional parallel sub-queues ``key+n`` hashed on the first path segment —
  that is the reference's own hot-host salting, which we reuse as the
  skew-defeat at 10^10-URL scale (north rule).

All of this is pure Spark Column algebra (split/reverse/array_join/
regexp_extract) — JVM-side, codegen-friendly, no Python in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_CLASS_KEY = "default..."
WHOIS_CLASS_KEY = "whois..."

_RE_URL = re.compile(
    r"^([^:/?#]+)://(?:([^/?#]*)@)?([^/?#:@]*)(?::([0-9]*))?([/?#].*)?$", re.DOTALL
)
_RE_IPV4 = re.compile(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")


# ---------------------------------------------------------------------------
# scalar reference (simulator + vectors)
# ---------------------------------------------------------------------------
def surt(url: str) -> str:
    """SURT form of a URL; URLs without ``://`` are returned unchanged."""
    m = _RE_URL.match(url)
    if not m:
        return url
    scheme, userinfo, host, port, rest = m.groups()
    if _RE_IPV4.match(host):
        surt_host = host
    else:
        surt_host = ",".join(reversed(host.split("."))) + "," if host else ""
    out = scheme + "://(" + surt_host
    if port:
        out += ":" + port
    if userinfo:
        out += "@" + userinfo
    out += ")" + (rest or "")
    return out


def surt_authority_class_key(url: str, hops_path: str = "", via: str | None = None) -> str:
    """class_key per SurtAuthorityQueueAssignmentPolicy + base-policy edges."""
    scheme = url.split(":", 1)[0] if ":" in url else ""
    if scheme == "whois":
        return WHOIS_CLASS_KEY
    basis = url
    if hops_path.endswith("P") and via:
        basis = via  # prerequisites ride their trigger URI's queue
    s = surt(basis)
    i, j = s.find("://("), s.find(")")
    if i == -1 or j == -1 or i + 4 >= j:
        return DEFAULT_CLASS_KEY
    return s[i + 4 : j].replace(":", "#")


# ---------------------------------------------------------------------------
# Spark Column expressions
# ---------------------------------------------------------------------------
def _bind(value: Column, fn) -> Column:
    """Evaluate ``value`` once, pass it to ``fn`` as a lambda variable.

    Catalyst duplicates expression subtrees referenced more than once,
    and codegen's subexpression elimination cannot hoist subtrees that
    sit inside different CASE branches — the regex-parse intermediates
    below were re-executed up to ~10x per row without this (the
    class_key stage was the #1 cost of the 2M-row schedule bench)."""
    return F.transform(F.array(value), fn)[0]


def surt_col_plain(col: Column) -> Column:
    """SURT form WITHOUT the transform-array binds (the pre-r6 expression,
    golden-vector equivalent to :func:`surt_col`).

    Use this variant when the result feeds a **Python UDF argument**: the
    bound form embeds LambdaFunctions, and Spark's ExtractPythonUDFs will
    not extract a UDF whose argument tree ends up nested under another
    higher-order function after projection collapsing (e.g. a downstream
    ``F.filter(udf_result, ...)`` inlining the call) — the UDF is then
    interpreted-eval'd and dies with
    ``[INTERNAL_ERROR] Cannot evaluate expression: _parse(...)``
    (caught by test_forms crawl parity). Per-row cost does not matter at
    such sites; extraction correctness does."""
    scheme = F.regexp_extract(col, r"^([^:/?#]+)://", 1)
    authority = F.regexp_extract(col, r"^[^:/?#]+://([^/?#]*)", 1)
    rest = F.regexp_extract(col, r"^[^:/?#]+://[^/?#]*(.*)$", 1)
    userinfo = F.regexp_extract(authority, r"^(.*)@", 1)
    hostport = F.regexp_extract(authority, r"^(?:.*@)?(.*)$", 1)
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]*)$", 1)
    is_ipv4 = host.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    surt_host = F.when(is_ipv4, host).otherwise(
        F.when(
            F.length(host) > 0,
            F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(",")),
        ).otherwise(F.lit(""))
    )
    return F.when(
        col.rlike(r"^[^:/?#]+://"),
        F.concat(
            scheme,
            F.lit("://("),
            surt_host,
            F.when(F.length(port) > 0, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            F.when(F.length(userinfo) > 0, F.concat(F.lit("@"), userinfo)).otherwise(F.lit("")),
            F.lit(")"),
            rest,
        ),
    ).otherwise(col)


def surt_col(col: Column) -> Column:
    """SURT form as a pure Column expression (parse-once bound form)."""

    def _build(parsed: Column) -> Column:
        def _hp(hp: Column) -> Column:
            host = F.regexp_extract(hp, r"^([^:]*)", 1)
            port = F.regexp_extract(hp, r":([0-9]*)$", 1)

            def _mk(hp2: Column) -> Column:
                h, p = hp2["host"], hp2["port"]
                is_ipv4 = h.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
                surt_host = F.when(is_ipv4, h).otherwise(
                    F.when(
                        F.length(h) > 0,
                        F.concat(
                            F.array_join(F.reverse(F.split(h, r"\.")), ","),
                            F.lit(","),
                        ),
                    ).otherwise(F.lit(""))
                )
                userinfo = parsed["userinfo"]
                return F.concat(
                    parsed["scheme"],
                    F.lit("://("),
                    surt_host,
                    F.when(
                        F.length(p) > 0, F.concat(F.lit(":"), p)
                    ).otherwise(F.lit("")),
                    F.when(
                        F.length(userinfo) > 0, F.concat(F.lit("@"), userinfo)
                    ).otherwise(F.lit("")),
                    F.lit(")"),
                    parsed["rest"],
                )

            return _bind(
                F.struct(host.alias("host"), port.alias("port")), _mk
            )

        return _hp(parsed["hostport"])

    def _top(c: Column) -> Column:
        authority = F.regexp_extract(c, r"^[^:/?#]+://([^/?#]*)", 1)
        parsed = _bind(
            authority,
            lambda a: F.struct(
                F.regexp_extract(c, r"^([^:/?#]+)://", 1).alias("scheme"),
                F.regexp_extract(c, r"^[^:/?#]+://[^/?#]*(.*)$", 1).alias("rest"),
                F.regexp_extract(a, r"^(.*)@", 1).alias("userinfo"),
                F.regexp_extract(a, r"^(?:.*@)?(.*)$", 1).alias("hostport"),
            ),
        )
        return F.when(
            c.rlike(r"^[^:/?#]+://"), _bind(parsed, _build)
        ).otherwise(c)

    return _bind(col, _top)


def class_key_col(
    uri: Column,
    hops_path: Column | None = None,
    via: Column | None = None,
    parallel_queues: int = 1,
) -> Column:
    """class_key Column: SURT authority with ``:``->``#`` + edge cases.

    ``parallel_queues > 1`` appends ``+n`` (n in 1..N-1, 0 omitted) hashed
    from the first path segment — the reference's consistent-hash sub-queue
    split (URIAuthorityBasedQueueAssignmentPolicy.java:118-145). We hash
    with xxhash64 (documented divergence: the reference uses a Ketama-style
    consistent hash; any stable hash satisfies the law "same first segment
    -> same sub-queue").
    """
    basis = uri
    if hops_path is not None and via is not None:
        basis = F.when(
            hops_path.endswith("P") & via.isNotNull() & (F.length(via) > 0), via
        ).otherwise(uri)
    core = _bind(
        F.regexp_extract(surt_col(basis), r"://\((.*?)\)", 1),
        lambda inner: F.when(
            F.length(inner) > 0, F.translate(inner, ":", "#")
        ).otherwise(F.lit(DEFAULT_CLASS_KEY)),
    )
    scheme = F.regexp_extract(uri, r"^([^:/?#]+):", 1)
    key = F.when(scheme == "whois", F.lit(WHOIS_CLASS_KEY)).otherwise(core)
    if parallel_queues > 1:
        first_seg = F.regexp_extract(basis, r"^[^:/?#]+://[^/?#]*/([^/?#]+)/", 1)
        sub = F.pmod(F.xxhash64(first_seg), F.lit(parallel_queues))
        key = F.when(
            (F.length(first_seg) > 0) & (sub > 0),
            F.concat(key, F.lit("+"), sub.cast("string")),
        ).otherwise(key)
    return key


def hostname_class_key_col(uri: Column) -> Column:
    """HostnameQueueAssignmentPolicy (engine/.../frontier/
    HostnameQueueAssignmentPolicy.java:38-55): authority minus userinfo,
    https-without-port gets ':443' appended, ':' -> '#'."""
    scheme = F.lower(F.regexp_extract(uri, r"^([^:/?#]+)://", 1))
    authority = F.regexp_extract(uri, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#]*)", 1)
    https_no_port = (scheme == "https") & ~authority.rlike(r".+:[0-9]+$")
    candidate = F.when(https_no_port, F.concat(authority, F.lit(":443"))).otherwise(authority)
    return F.when(F.length(authority) > 0, F.translate(candidate, ":", "#")).otherwise(
        F.lit(DEFAULT_CLASS_KEY)
    )


def java_string_hash_col(s: Column) -> Column:
    """Java String.hashCode as a column expression (31·h + c with int32
    wraparound) — needed for BucketQueueAssignmentPolicy parity."""
    wrapped = F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * 31 + F.coalesce(F.ascii(ch), F.lit(0)), F.lit(1 << 32)),
    )
    # interpret as signed 32-bit
    return F.when(wrapped >= (1 << 31), wrapped - (1 << 32)).otherwise(wrapped).cast("long")


def bucket_class_key_col(uri: Column, num_buckets: int = 1024) -> Column:
    """BucketQueueAssignmentPolicy.java:43-63 no-IP branch:
    ``abs(hash(hostname)) & (buckets-1)`` over Java String.hashCode."""
    host = F.lower(
        F.regexp_extract(uri, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )
    h = java_string_hash_col(host)
    return (F.abs(h).bitwiseAND(F.lit(num_buckets - 1))).cast("string")


def assignment_level_class_key_col(uri: Column) -> Column:
    """AssignmentLevelSurtQueueAssignmentPolicy.java:44: reduce the SURT
    authority to the topmost assignable domain (public-suffix plus one).
    Heritrix delegates to PublicSuffixes.reduceSurtToAssignmentLevel over
    the publicsuffix.org list; :mod:`heritrix3_spark.functions.psl`
    carries a trimmed snapshot of that public data (registry + private
    sections) with the same reduction law."""
    from heritrix3_spark.functions.psl import assignment_level_domain_col

    host = F.lower(F.regexp_extract(uri, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", 1))
    assignable = assignment_level_domain_col(host)
    surt_form = F.concat(
        F.array_join(F.reverse(F.split(assignable, r"\.")), ","), F.lit(",")
    )
    return F.when(F.size(F.split(host, r"\.")) >= 2, surt_form).otherwise(
        F.lit(DEFAULT_CLASS_KEY)
    )


def server_key_col(uri: Column) -> Column:
    """CrawlServer.getServerKey (modules/.../net/CrawlServer.java:259-283):
    the server-state lookup key — authority minus userinfo; ``dns:`` URIs
    key by the looked-up name; https WITHOUT an explicit port appends
    ':443' so https state never shares a CrawlServer with http. This is
    the key for robots-state and server-category quota lookups."""
    scheme = F.lower(F.regexp_extract(uri, r"^([^:/?#]+)://", 1))
    authority = F.regexp_extract(uri, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#]*)", 1)
    # dns: names carry the reference's validity filter (CrawlServer.java:
    # 269-274: "[-_\\w\\.:]+" or the key is thrown away). Java \w is ASCII,
    # and rlike compiles to Java regex, so Column and scalar twins agree
    # byte-for-byte on hostile names.
    dns_name = F.substring(uri, 5, 4096)
    dns_key = F.when(dns_name.rlike(r"^[-_\w\.:]+$"), dns_name)
    https_no_port = (scheme == "https") & ~authority.rlike(r".+:[0-9]+$")
    keyed = F.when(https_no_port, F.concat(authority, F.lit(":443"))).otherwise(
        authority
    )
    return F.when(uri.startswith("dns:"), dns_key).otherwise(
        F.when(authority != "", keyed)
    )


def server_key(url: str) -> str | None:
    """Scalar twin of :func:`server_key_col` (CrawlServerTest.testGetServerKey
    vector: https://www.example.com -> www.example.com:443)."""
    if url.startswith("dns:"):
        name = url[4:]
        # re.ASCII: Java's \w is [a-zA-Z0-9_] — keep the twins identical
        # on unicode word characters too
        return name if re.fullmatch(r"[-_\w\.:]+", name, re.ASCII) else None
    m = re.match(r"^([^:/?#]+)://(?:[^/?#@]*@)?([^/?#]*)", url)
    if not m or not m.group(2):
        return None
    scheme, authority = m.group(1).lower(), m.group(2)
    if scheme == "https" and not re.search(r".+:[0-9]+$", authority):
        authority += ":443"
    return authority


# ---------------------------------------------------------------------------
# scalar twins of the alternate queue policies (simulator / oracle use)
# ---------------------------------------------------------------------------
def hostname_class_key(url: str) -> str:
    """Scalar twin of :func:`hostname_class_key_col`."""
    m = re.match(r"^([^:/?#]+)://(?:[^/?#@]*@)?([^/?#]*)", url)
    if not m or not m.group(2):
        return DEFAULT_CLASS_KEY
    scheme, authority = m.group(1).lower(), m.group(2)
    if scheme == "https" and not re.search(r".+:[0-9]+$", authority):
        authority += ":443"
    return authority.replace(":", "#")


def bucket_class_key(url: str, num_buckets: int = 1024) -> str:
    """Scalar twin of :func:`bucket_class_key_col` (no-IP branch)."""
    m = re.match(r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", url)
    host = (m.group(1) if m else "").lower()
    return str(abs(java_string_hashcode(host)) & (num_buckets - 1))


def assignment_level_class_key(url: str) -> str:
    """Scalar twin of :func:`assignment_level_class_key_col`."""
    from heritrix3_spark.functions.psl import assignment_level_domain

    m = re.match(r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", url)
    host = (m.group(1) if m else "").lower()
    if len(host.split(".")) < 2:
        return DEFAULT_CLASS_KEY
    d = assignment_level_domain(host)
    return ",".join(reversed(d.split("."))) + ","


# ---------------------------------------------------------------------------
# IP model (CrawlHost analog) + IP-based queue assignment
# ---------------------------------------------------------------------------
def java_string_hashcode(s: str) -> int:
    """Scalar Java String.hashCode (31·h + c, int32 wrap) — the pyref twin
    of :func:`java_string_hash_col` for simulator/oracle use."""
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def synthetic_ip(host: str) -> str:
    """Deterministic synthetic IPv4 for a hostname — the sandbox's DNS
    resolution model (FetchDNS real lookups are out of scope; CrawlHost.setIP
    modules/.../net/CrawlHost.java:95-108 only needs *an* address). The
    10.x.y.z mapping is stable across rounds/restarts so IP-keyed queues
    stay stable (relocation-free), mirroring a well-behaved resolver."""
    u = java_string_hashcode(host) & 0xFFFFFFFF
    return f"10.{(u >> 16) & 255}.{(u >> 8) & 255}.{u & 255}"


def synthetic_ip_col(host: Column) -> Column:
    """Column twin of :func:`synthetic_ip`."""
    u = F.pmod(java_string_hash_col(host), F.lit(1 << 32))
    return F.concat(
        F.lit("10."),
        F.shiftrightunsigned(u, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.lit("."),
        F.shiftrightunsigned(u, 8).bitwiseAND(F.lit(255)).cast("string"),
        F.lit("."),
        u.bitwiseAND(F.lit(255)).cast("string"),
    )


def _ipv4_hashcode_col(ip: Column) -> Column:
    """Java Inet4Address.hashCode = the address bytes as a signed int32."""
    parts = F.split(ip, r"\.")
    raw = (
        F.element_at(parts, 1).cast("long") * F.lit(1 << 24)
        + F.element_at(parts, 2).cast("long") * F.lit(1 << 16)
        + F.element_at(parts, 3).cast("long") * F.lit(1 << 8)
        + F.element_at(parts, 4).cast("long")
    )
    return F.when(raw >= (1 << 31), raw - (1 << 32)).otherwise(raw)


def ip_class_key_col(uri: Column, ip: Column) -> Column:
    """IPQueueAssignmentPolicy (engine/.../frontier/
    IPQueueAssignmentPolicy.java:45-53): the dotted-decimal IP when the
    host has one resolved, else the HostnameQueueAssignmentPolicy key.
    ``ip`` is the dns-table column (null when not yet resolved)."""
    return F.when(ip.isNotNull() & (F.length(ip) > 0), ip).otherwise(
        hostname_class_key_col(uri)
    )


def bucket_ip_class_key_col(uri: Column, ip: Column) -> Column:
    """BucketQueueAssignmentPolicy.java:43-63, ALL THREE branches:
    no host -> 'NO-HOST'; host without IP ->
    'NO-IP-' + (abs(hash(hostname)) & 1023); resolved ->
    abs(InetAddress.hashCode) % 1021 (hashCode = the IPv4 as int32)."""
    host = F.lower(
        F.regexp_extract(uri, r"^[^:/?#]+://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )
    no_ip = F.concat(
        F.lit("NO-IP-"),
        F.abs(java_string_hash_col(host)).bitwiseAND(F.lit(1023)).cast("string"),
    )
    with_ip = F.pmod(F.abs(_ipv4_hashcode_col(ip)), F.lit(1021)).cast("string")
    return (
        F.when(F.length(host) == 0, F.lit("NO-HOST"))
        .when(ip.isNotNull() & (F.length(ip) > 0), with_ip)
        .otherwise(no_ip)
    )


def salted_partition_col(class_key: Column, num_salts: int) -> Column:
    """Salt sub-key for shuffle-partitioning hot hosts.

    Distinct from parallel-queue splitting (which changes crawl semantics):
    this only spreads a single queue's *rows* across ``num_salts`` shuffle
    partitions for skew-free aggregation, then results are re-merged by
    class_key. Used by the frontier head-pick at scale.
    """
    return F.pmod(F.xxhash64(class_key), F.lit(num_salts))
