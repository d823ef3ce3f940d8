"""SurtPrefixSet / PrefixFinder analogs — the seed-scope prefix algebra.

The reference's SurtPrefixSet class lives in the external
webarchive-commons dependency; its in-repo unit test
(/root/reference/commons/src/test/java/org/archive/util/
 SurtPrefixSetTest.java:34-162) documents the laws this module
implements:

* **importFrom** — one SURT prefix per line, ``#`` comments stripped; the
  set keeps only a prefix-free minimum: an entry prefixed by another
  member is redundant and absent (``http://(is,bok,`` and
  ``http://(is,bok,www`` both collapse into ``http://(is,``).
* **importFromUris** — each seed URI implies a prefix (testImportFromUris
  vectors): SURT form with https forced to http; a URI with a path keeps
  the directory part only (everything after the last ``/`` is trimmed);
  a bare host with NO path opens the authority (the closing ``)`` is
  dropped, so subdomains match: ``https://one.two.three`` ->
  ``http://(three,two,one,``).
* **containsPrefixOf** — true iff some member is a prefix of the probe
  string (the scope membership test).

PrefixFinder (commons/src/main/java/org/archive/util/PrefixFinder.java:
53-76) is the sorted-set skip-scan behind that membership test: walk the
head-set from the largest key <= input, push matches, and jump by the
longest common prefix otherwise — O(matches * log n) probes instead of a
full scan. Its enabled unit tests (PrefixFinderTest.java:51-107; the
random doTest is disabled as ``xtestFind`` in the reference) are ported
in tests/test_ref_ports.py.

At engine scale this class is driver-side config parsing only (surts
files are small); the per-row membership tests stay in
operators/scope.py's InSet / broadcast-join paths.
"""

from __future__ import annotations

import bisect

from .surt import surt

__all__ = ["SurtPrefixSet", "find_prefixes"]


def _common_prefix_len(a: str, b: str) -> int:
    """StringUtils.indexOfDifference: index of first differing char."""
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


def find_prefixes(sorted_keys: list[str], input_str: str) -> list[str]:
    """PrefixFinder.find (PrefixFinder.java:53-76): every returned element
    satisfies ``input_str.startswith(element)``, longest first.

    Skip-scan over the sorted list: start at the largest key <= input
    (headSetInclusive + last); a match restricts the head-set below it;
    a miss jumps to the longest common prefix of (input, miss) — far-away
    regions of the set are never touched.
    """
    result: list[str] = []
    hi = bisect.bisect_right(sorted_keys, input_str)
    while hi > 0:
        last = sorted_keys[hi - 1]
        if input_str.startswith(last):
            result.append(last)
            hi -= 1
        else:
            p = _common_prefix_len(input_str, last)
            if p <= 0:
                break
            hi = bisect.bisect_right(sorted_keys, input_str[:p], 0, hi)
    return result


class SurtPrefixSet:
    """Prefix-free sorted set of SURT prefixes (SurtPrefixSetTest laws)."""

    def __init__(self) -> None:
        self._keys: list[str] = []

    # -- set algebra --------------------------------------------------
    def add(self, prefix: str) -> bool:
        """maybeAdd: no-op when an existing member already prefixes
        ``prefix``; adding a shorter member evicts the longer ones it
        covers. Returns True when the set changed."""
        if self.contains_prefix_of(prefix):
            return False
        lo = bisect.bisect_left(self._keys, prefix)
        hi = lo
        while hi < len(self._keys) and self._keys[hi].startswith(prefix):
            hi += 1
        self._keys[lo:hi] = [prefix]
        return True

    def contains(self, prefix: str) -> bool:
        i = bisect.bisect_left(self._keys, prefix)
        return i < len(self._keys) and self._keys[i] == prefix

    def contains_prefix_of(self, s: str) -> bool:
        return bool(find_prefixes(self._keys, s))

    def __iter__(self):
        return iter(self._keys)

    def __len__(self) -> int:
        return len(self._keys)

    # -- imports ------------------------------------------------------
    def import_from(self, text: str) -> None:
        """One SURT prefix per line; '#' starts a comment; blanks skipped."""
        for line in text.splitlines():
            line = line.split("#", 1)[0].strip()
            if line:
                self.add(line)

    @staticmethod
    def prefix_from_seed(seed: str) -> str | None:
        """The implied prefix of one seed URI (testImportFromUris vectors):
        force-http SURT; directory-trimmed path; bare host (no path) drops
        the closing ')' so subdomains match."""
        s = surt(seed.strip())
        if s.startswith("https://"):
            s = "http://" + s[len("https://"):]
        i = s.find(")")
        if i == -1:
            return s if s.startswith("http://(") else None
        path = s[i + 1:]
        if not path:
            return s[:i]  # domain-open prefix
        cut = path.rfind("/")
        return s[: i + 1] + path[: cut + 1]

    def import_from_uris(self, text: str) -> None:
        for line in text.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            p = self.prefix_from_seed(line)
            if p:
                self.add(p)

    def as_decide_prefixes(self) -> list[str]:
        """Members in sorted order — feed operators/scope.surt_prefixed
        (authority-level entries compile to the InSet probe, path entries
        to the bound scan)."""
        return list(self._keys)
