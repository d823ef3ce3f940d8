"""HTTP Basic/Digest (RFC2617) credential law: CredentialStore lookup,
handle401 attach, needsReenqueuing retry, and success-promotion.

Reference laws re-expressed:

- ``HttpAuthenticationCredential`` — a (domain, realm, login, password)
  record; domain matches the URI's server name exactly (the reference's
  ``CredentialStore.subset(curi, type, server.getName())`` +
  ``rootUriMatch``, modules/.../credential/CredentialStore.java:189-218,
  Credential.java:170-199).
- ``FetchHTTP.handle401`` (modules/.../fetcher/FetchHTTP.java:830-887):
  on a 401, find the store credential for (server, challenge realm); if
  the URI *already carried* that credential the auth failed — detach and
  let it "die a natural 401 death"; else attach it to the URI so the
  frontier retries.
- ``AbstractFrontier.needsReenqueuing`` (engine/.../frontier/
  AbstractFrontier.java:1093-1126): 401 retries iff an rfc2617 credential
  is loaded on the URI (and retries remain).
- ``FetchHTTPRequest.populateTargetCredential`` (modules/.../fetcher/
  FetchHTTPRequest.java:489-523): server-promoted credentials are
  presented on EVERY request to that server; URI-attached credentials on
  the retry itself.
- ``FetchHTTP.promoteCredentials`` (FetchHTTP.java:766-817): a successful
  fetch whose credentials came from the URI promotes them to the server.

The synthetic web's protection model is ``auth_zones``: (server,
path_prefix, realm, login, password) — the analog of the selftest's Jetty
``ConstraintMapping`` on ``/basic/*`` with a ``HashLoginService`` realm
(engine/src/test/java/.../selftest/HttpAuthSelfTest.java:66-103). A fetch
matching a zone without satisfying credentials answers 401. One realm per
server (the reference supports several; multi-realm maps to distinct
servers here — documented subset).

Because zones and the credential store are both config constants, the
per-zone "store has a credential" / "store credential satisfies the
zone" predicates fold to Python booleans at plan-build time: the Column
expressions below are CASE chains over (server, path-prefix) only — no
per-row credential comparison ships to executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: reserved heritable-bag key carrying the URI-attached credential realm
#: (the CrawlURI credential-avatar analog). Stripped at candidate
#: inheritance: credentials are NOT part of the heritable data keys.
AUTH_DATA_KEY = "__auth_realm"

HTTP_UNAUTHORIZED = 401


def _store_flags(zone: tuple, credentials: tuple) -> tuple[bool, bool]:
    """(store_has, store_matches) for one zone — plan-time constants."""
    server, _prefix, realm, login, password = zone
    has = any(d == server and r == realm for d, r, _l, _p in credentials)
    ok = any(
        d == server and r == realm and l == login and p == password
        for d, r, l, p in credentials
    )
    return has, ok


def zone_cols(
    server: Column, path: Column, auth_zones: tuple, credentials: tuple
) -> dict[str, Column]:
    """First-matching-zone columns: ``__zone_realm`` (NULL = unprotected),
    ``__store_has`` (a credential for the zone's realm exists) and
    ``__store_matches`` (that credential satisfies the zone's login/
    password — False models a wrong password in the store)."""
    realm_expr = F.lit(None).cast("string")
    has_expr = F.lit(False)
    ok_expr = F.lit(False)
    for z in reversed(auth_zones):
        z_server, z_prefix = z[0], z[1]
        hit = (server == z_server) & path.startswith(z_prefix)
        has, ok = _store_flags(z, credentials)
        realm_expr = F.when(hit, F.lit(z[2])).otherwise(realm_expr)
        has_expr = F.when(hit, F.lit(has)).otherwise(has_expr)
        ok_expr = F.when(hit, F.lit(ok)).otherwise(ok_expr)
    return {
        "__zone_realm": realm_expr,
        "__store_has": has_expr,
        "__store_matches": ok_expr,
    }


# ---------------------------------------------------------------------------
# HtmlFormCredential (modules/.../credential/HtmlFormCredential.java +
# PreconditionEnforcer.credentialPrecondition, engine/.../prefetch/
# PreconditionEnforcer.java:379-439): a page on the credential's domain may
# not fetch until the login URI has been fetched successfully; the login
# fetch promotes the credential to the DOMAIN's server (cross-domain logins
# supported — FetchHTTP.promoteCredentials keys by credential domain, not
# the fetched server, FetchHTTP.java:799-818). One form credential per
# domain (documented subset). Authenticated state rides the same promoted-
# credential table as RFC2617, under a reserved "#form:" realm.
# ---------------------------------------------------------------------------
FORM_REALM_PREFIX = "#form:"


def form_realm(login_canonical: str) -> str:
    return FORM_REALM_PREFIX + login_canonical


def _form_entries(form_credentials: tuple) -> list[tuple[str, str, str]]:
    """(domain, login_canonical, realm) rows — canonicalized once."""
    from heritrix3_spark.functions.canonicalize import canonicalize

    out = []
    for dom, login_uri in form_credentials:
        lc = canonicalize(login_uri)
        out.append((dom, lc, form_realm(lc)))
    return out


def form_cols(
    server: Column, canonical: Column, form_credentials: tuple
) -> dict[str, Column]:
    """Per-row form-credential columns (config CASE chains):

    * ``__form_dom`` / ``__form_realm`` — the credential guarding this
      row's server (NULL = unguarded);
    * ``__is_login`` — this row IS a login URI (never self-deferred);
    * ``__login_dom`` / ``__login_realm`` — set on login rows only: the
      domain+realm a successful fetch promotes (cross-domain capable).
    """
    entries = _form_entries(form_credentials)
    fd = F.lit(None).cast("string")
    fr = F.lit(None).cast("string")
    ld = F.lit(None).cast("string")
    lr = F.lit(None).cast("string")
    for dom, lc, realm in reversed(entries):
        fd = F.when(server == dom, F.lit(dom)).otherwise(fd)
        fr = F.when(server == dom, F.lit(realm)).otherwise(fr)
        ld = F.when(canonical == lc, F.lit(dom)).otherwise(ld)
        lr = F.when(canonical == lc, F.lit(realm)).otherwise(lr)
    return {
        "__form_dom": fd,
        "__form_realm": fr,
        "__is_login": canonical.isin(*[lc for _, lc, _ in entries]),
        "__login_dom": ld,
        "__login_realm": lr,
    }


def form_cred_for_server(server: str, form_credentials: tuple):
    """Scalar twin: (domain, login_canonical, realm) guarding ``server``."""
    for e in _form_entries(form_credentials):
        if e[0] == server:
            return e
    return None


def form_cred_for_login(canonical: str, form_credentials: tuple):
    """Scalar twin: the credential whose login URI IS ``canonical``."""
    for e in _form_entries(form_credentials):
        if e[1] == canonical:
            return e
    return None


# ---------------------------------------------------------------------------
# scalar twins (simulator side — one law, two executions)
# ---------------------------------------------------------------------------
def zone_for(server: str, path: str, auth_zones: tuple) -> tuple | None:
    """First zone whose (server, path_prefix) matches, else None."""
    for z in auth_zones:
        if server == z[0] and path.startswith(z[1]):
            return z
    return None


def store_flags(zone: tuple, credentials: tuple) -> tuple[bool, bool]:
    """Scalar twin of :func:`_store_flags`."""
    return _store_flags(zone, credentials)
