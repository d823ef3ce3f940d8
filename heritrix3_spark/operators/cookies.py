"""Cookie store — the FetchHTTP session-state model.

Re-expresses the reference's cookie machinery
(/root/reference/modules/src/main/java/org/archive/modules/fetcher/
 AbstractCookieStore.java:99-308, BdbCookieStore.java:51-190):

* **identity key** — ``normalizedDomain;name;path`` (sortableKey,
  AbstractCookieStore.java:259-269): domain lowercased with a leading
  ``.`` stripped (normalizeHost :271-281), path defaulting to ``/``.
  addCookie replaces by key.
* **per-domain cap** — a domain holds at most
  ``MAX_COOKIES_FOR_DOMAIN`` (=50) cookies; adds beyond the cap are
  dropped (BdbCookieStore.java:52,288-304; CookieStoreTest
  .testMaxCookieDomain).
* **fetch-time subset** — ``cookieStoreFor(host)`` composes the host's
  own cookies with every parent domain's (BdbCookieStore.java:176-190,
  HER-2070), after which the HTTP client's cookie spec applies
  path/secure matching; ``request_cookies`` folds both steps.
* **cookies.txt** — Netscape 7-field tab format: domain, flag, path,
  secure, expiry-epoch-seconds (-1 = session), name, value
  (AbstractCookieStore.java:122-199).

The store itself is driver-side config/state (bounded: 50/domain); the
engine keeps it in a snapshot table keyed by the sortable key and — like
robots/dns — NEVER broadcasts it wholesale: each round's lookup is
semi-join-pruned to the round's bounded host+parent-domain key set
(crawler.py cookie gate).

CookieStoreTest (engine/src/test/java/org/archive/modules/fetcher/
CookieStoreTest.java:104-266) asserts BdbCookieStore matches Apache's
BasicCookieStore; tests/test_cookies.py ports its law assertions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

MAX_COOKIES_FOR_DOMAIN = 50  # BdbCookieStore.java:52


def normalize_host(host: str | None) -> str:
    """AbstractCookieStore.normalizeHost:271-281."""
    if host is None:
        host = ""
    if host.startswith("."):
        host = host[1:]
    return host.lower()


@dataclass(frozen=True)
class Cookie:
    name: str
    value: str
    domain: str = ""
    path: str | None = None
    secure: bool = False
    #: expiry as epoch seconds; None = session cookie (never expires here)
    expiry_s: int | None = None

    def key(self) -> str:
        """sortableKey: normalizedDomain;name;path (';' can't appear in
        any of these — it delimits the Cookie header itself)."""
        return (
            normalize_host(self.domain)
            + ";" + self.name
            + ";" + (self.path if self.path is not None else "/")
        )

    def expired(self, now_s: int) -> bool:
        return self.expiry_s is not None and self.expiry_s < now_s


def _parent_domains(host: str) -> list[str]:
    """host + every parent domain (cookieStoreFor's composite walk)."""
    host = normalize_host(host)
    labels = host.split(".")
    return [".".join(labels[i:]) for i in range(len(labels))]


def _path_matches(cookie_path: str | None, req_path: str) -> bool:
    """RFC 6265 §5.1.4 path-match (the HTTP client's spec step)."""
    cp = cookie_path if cookie_path else "/"
    if not req_path.startswith("/"):
        req_path = "/"
    if req_path == cp:
        return True
    if req_path.startswith(cp):
        return cp.endswith("/") or req_path[len(cp)] == "/"
    return False


class CookieStore:
    """Sorted keyed store with the addCookie/cap/subset laws."""

    def __init__(self) -> None:
        self._by_key: dict[str, Cookie] = {}

    # -- mutation ------------------------------------------------------
    def add(self, cookie: Cookie) -> bool:
        """addCookie (AbstractCookieStore.java:293-304): replace by key;
        a NEW key on a domain already at its 50-cookie cap is dropped.
        Returns True when stored."""
        k = cookie.key()
        if k not in self._by_key:
            dom = normalize_host(cookie.domain)
            if self._domain_count(dom) >= MAX_COOKIES_FOR_DOMAIN:
                return False
        self._by_key[k] = cookie
        return True

    def put(self, cookie: Cookie) -> None:
        """Cap-less replace-by-key (bootstrap/testing helper — the crawl
        law is :meth:`add`, and since round 5 the engine's distributed
        cookie table enforces the same 50/domain cap at its round-end
        upsert, in serial add order)."""
        self._by_key[cookie.key()] = cookie

    def _domain_count(self, normalized_domain: str) -> int:
        prefix = normalized_domain + ";"
        return sum(1 for k in self._by_key if k.startswith(prefix))

    def clear(self) -> None:
        self._by_key.clear()

    def clear_expired(self, now_s: int) -> int:
        stale = [k for k, c in self._by_key.items() if c.expired(now_s)]
        for k in stale:
            del self._by_key[k]
        return len(stale)

    # -- reads ----------------------------------------------------------
    def cookies(self) -> list[Cookie]:
        """All cookies in sortable-key order (the Bdb iteration order)."""
        return [self._by_key[k] for k in sorted(self._by_key)]

    def __len__(self) -> int:
        return len(self._by_key)

    def cookies_for_host(self, host: str) -> list[Cookie]:
        """cookieStoreFor: the host's own + every parent domain's cookies
        (BdbCookieStore.java:176-190), key-ordered."""
        out = []
        for dom in _parent_domains(host):
            prefix = dom + ";"
            out.extend(
                self._by_key[k] for k in sorted(self._by_key)
                if k.startswith(prefix)
            )
        return out

    def request_cookies(
        self, host: str, path: str, secure: bool = False, now_s: int = 0
    ) -> list[Cookie]:
        """The Cookie-header set: host/parent-domain subset, then the HTTP
        client's path/secure/expiry matching."""
        return [
            c for c in self.cookies_for_host(host)
            if _path_matches(c.path, path)
            and (secure or not c.secure)
            and not c.expired(now_s)
        ]

    # -- cookies.txt (Netscape format) ----------------------------------
    def save_txt(self) -> str:
        """AbstractCookieStore.saveCookies:122-152 (7 tab-joined fields)."""
        lines = [
            "# Heritrix Cookie File",
            "# This file is the Netscape cookies.txt format",
            "",
        ]
        for c in self.cookies():
            lines.append(
                "\t".join(
                    [
                        c.domain,
                        "TRUE",
                        c.path if c.path is not None else "/",
                        "TRUE" if c.secure else "FALSE",
                        str(c.expiry_s if c.expiry_s is not None else -1),
                        c.name,
                        c.value,
                    ]
                )
            )
        return "\n".join(lines) + "\n"

    def load_txt(self, text: str) -> int:
        """AbstractCookieStore.readCookies:181-199: 7 tab-split tokens per
        non-comment line; expiry < 0 = session cookie."""
        n = 0
        for line in text.splitlines():
            if not line or line.startswith("#"):
                continue
            tokens = line.split("\t")
            if len(tokens) != 7:
                continue
            epoch = int(tokens[4])
            if self.add(
                Cookie(
                    name=tokens[5],
                    value=tokens[6],
                    domain=tokens[0],
                    path=tokens[2],
                    secure=tokens[3].upper() == "TRUE",
                    expiry_s=epoch if epoch >= 0 else None,
                )
            ):
                n += 1
        return n


# ---------------------------------------------------------------------------
# Set-Cookie parsing (the synthetic web's server-side half: a page span of
# kind "set-cookie" carries one Set-Cookie header value)
# ---------------------------------------------------------------------------
def parse_set_cookie(header: str, origin_host: str, now_s: int = 0) -> Cookie | None:
    """Minimal RFC 6265 §5.2 parse: name=value plus Path / Domain /
    Max-Age / Secure attributes. Domain defaults to the origin host;
    Max-Age is relative to ``now_s`` (the virtual clock at set time)."""
    parts = [p.strip() for p in header.split(";")]
    if not parts or "=" not in parts[0]:
        return None
    name, value = parts[0].split("=", 1)
    domain, path, secure, expiry = origin_host, None, False, None
    for attr in parts[1:]:
        k, _, v = attr.partition("=")
        lk = k.strip().lower()
        if lk == "path":
            path = v.strip() or None
        elif lk == "domain":
            domain = v.strip() or origin_host
        elif lk == "secure":
            secure = True
        elif lk == "max-age":
            try:
                expiry = now_s + int(v.strip())
            except ValueError:
                pass
    return Cookie(
        name=name.strip(),
        value=value.strip(),
        domain=domain,
        path=path,
        secure=secure,
        expiry_s=expiry,
    )


# ---------------------------------------------------------------------------
# Spark-side parse (Arrow-batched; a round may set 10^6 cookies at scale,
# so parsing never funnels through the driver)
# ---------------------------------------------------------------------------
COOKIE_ROW_SCHEMA = (
    "key string, domain string, name string, path string, value string,"
    " secure boolean, expiry_s long"
)


def set_cookie_parse_col(header, host, now_s: int):
    """Column: (Set-Cookie header, origin host) -> cookie-row struct (NULL
    for unparseable headers). A string pandas UDF emits the parse as JSON
    (struct-returning scalar pandas UDFs are not supported on this Spark
    build); ``from_json`` rebuilds the struct JVM-side."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _parse(header_s: pd.Series, host_s: pd.Series) -> pd.Series:
        out = []
        for h, o in zip(header_s.fillna(""), host_s.fillna("")):
            c = parse_set_cookie(h, o, now_s=now_s)
            if c is None:
                out.append(None)
            else:
                out.append(
                    json.dumps(
                        {
                            "key": c.key(),
                            "domain": normalize_host(c.domain),
                            "name": c.name,
                            "path": c.path,
                            "value": c.value,
                            "secure": c.secure,
                            "expiry_s": c.expiry_s,
                        }
                    )
                )
        return pd.Series(out)

    return F.from_json(_parse(header, host), COOKIE_ROW_SCHEMA)
