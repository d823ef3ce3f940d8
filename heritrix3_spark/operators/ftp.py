"""FetchFTP directory-listing link extraction (pure data laws).

Re-expresses the extraction half of the reference's FTP fetcher
(/root/reference/modules/src/main/java/org/archive/modules/fetcher/
FetchFTP.java) — the fetch I/O itself is out of scope (the synthetic web
models transfer), but the *link laws* are portable:

* **Directory listings** (FetchFTP.java:74-75,470-471,542-551): a
  directory fetch records the NLST listing; the ``DIR`` pattern
  ``(.+)$`` (MULTILINE) yields one filename per non-empty line.
* **addExtracted** (:560-580): each filename is
  ``URLEncoder.encode(file, "UTF-8")`` (Java form-encoding: space → '+',
  ``[a-zA-Z0-9.\\-*_]`` kept, everything else %XX on the UTF-8 bytes)
  appended to the page URI minus ONE trailing slash, as a NAVLINK ('L')
  hop with the ``=NAVLINK_MISC`` context.
* **addParent** (:597-619, ``extract.parent``, default true): every
  completed ftp fetch (directory or file — even a failed RETR: the
  reference calls addParent after the data-socket block regardless)
  also discovers ``scheme://authority + currentHierPath`` — the path
  minus its last segment (``/one/two`` → ``/one``, ``/one/`` → ``/one``,
  ``/file`` → ``/``), skipped when the path is ``/``.
* **Content type** (:453-457): directory → ``text/plain``, file →
  ``application/octet-stream`` (wired into functions/mime.py).

Engine mapping: a synthetic-web ftp directory carries its NLST text as a
span of kind ``"listing"``; the Column twins below stay JVM-side
(``F.url_encode`` is java.net.URLEncoder.encode(·, "UTF-8") — the exact
reference law).
"""

from __future__ import annotations

NAVLINK_MISC = "=NAVLINK_MISC"

_JAVA_SAFE = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789.-*_"
)


def java_urlencode(s: str) -> str:
    """java.net.URLEncoder.encode(s, "UTF-8"): space → '+',
    ``[a-zA-Z0-9.\\-*_]`` kept, else %XX per UTF-8 byte. (Differs from
    RFC-3986 quoting: '~' IS encoded, '*' is NOT.)"""
    out = []
    for ch in s:
        if ch in _JAVA_SAFE:
            out.append(ch)
        elif ch == " ":
            out.append("+")
        else:
            out.extend("%%%02X" % b for b in ch.encode("utf-8"))
    return "".join(out)


def listing_files(listing: str) -> list[str]:
    """The DIR pattern ``(.+)$`` MULTILINE (FetchFTP.java:74-75): one
    filename per non-empty listing line (CR/LF/CRLF all terminate — Java
    ``.`` excludes every line terminator)."""
    return [ln for ln in listing.splitlines() if ln]


def child_url(base_uri: str, filename: str) -> str:
    """addExtracted (:560-580): base minus ONE trailing slash + '/' +
    form-encoded filename."""
    base = base_uri[:-1] if base_uri.endswith("/") else base_uri
    return base + "/" + java_urlencode(filename)


def parent_url(uri: str) -> str | None:
    """addParent (:597-619): scheme://authority + the path minus its last
    segment (httpclient URI.getRawCurrentHierPath: lastIndexOf('/')==0 →
    the root path "/"); None when the path is '/' (or absent)."""
    import re

    m = re.match(r"^([^:/?#]+://[^/?#]*)([^?#]*)", uri)
    if not m:
        return None
    schemeauth, path = m.group(1), m.group(2)
    if path in ("", "/"):
        return None
    i = path.rfind("/")
    return schemeauth + ("/" if i == 0 else path[:i])


def ftp_extract(
    uri: str,
    listing: str | None,
    extract_from_dirs: bool = True,
    extract_parent: bool = True,
) -> list[str]:
    """The full per-URI discovery sequence, in the reference's emit order:
    listing children first (extract(), FetchFTP.java:470-471), then the
    parent (addParent, :478). ``listing`` is None for file fetches (and
    for failed directory fetches — no recorded payload)."""
    out = []
    if listing is not None and extract_from_dirs:
        out.extend(child_url(uri, f) for f in listing_files(listing))
    if extract_parent:
        p = parent_url(uri)
        if p is not None:
            out.append(p)
    return out
