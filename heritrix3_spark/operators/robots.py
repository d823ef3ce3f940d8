"""robots.txt parsing + allow/crawl-delay law.

Re-implements (from behavioral study, no code copied):
- parser: /root/reference/modules/src/main/java/org/archive/modules/net/Robotstxt.java:48-198
  (500KB cap dropping the partial trailing line, \\r\\n|\\r|\\n splitting,
  html-markup and trailing-comment stripping, User-agent group sharing,
  trailing '*' tolerance, empty-Disallow-ignored, Crawl-delay float parse)
- directive lookup: Robotstxt.getDirectivesFor (:230-256) — first *named*
  UA that is a substring of our UA, else wildcard, else NO_DIRECTIVES
- allow law: RobotsDirectives.allows (:40-57) — allowed iff the FLOOR
  (greatest entry <= path in the sorted set) prefix-length of disallows is
  not greater than that of allows. NOTE: this is floor-based, not a true
  longest-prefix scan — e.g. disallows {"/a","/a/b"} do NOT block "/a/c"
  because floor("/a/c")="/a/b" is not a prefix. We reproduce that exactly.

Engine integration: robots bodies live in a per-server table; the allow
check is a vectorized pandas UDF over (body, ua, path) — parses each
distinct body once per Arrow batch via an LRU cache.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from functools import lru_cache

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, FloatType

MAX_SIZE = 500 * 1024
_LINE_SEP = re.compile(r"\r\n|\r|\n")
_MARKUP = re.compile(r"<[^>]+>")


class Directives:
    __slots__ = ("disallows", "allows", "crawl_delay", "has_directives")

    def __init__(self):
        self.disallows: list[str] = []
        self.allows: list[str] = []
        self.crawl_delay = -1.0
        self.has_directives = False

    def _sorted(self):
        self.disallows.sort()
        self.allows.sort()

    def allows_path(self, path: str) -> bool:
        return not (
            _floor_prefix_len(self.disallows, path) > _floor_prefix_len(self.allows, path)
        )


NO_DIRECTIVES = Directives()


def _floor_prefix_len(sorted_set: list[str], s: str) -> int:
    """len(floor(s)) if floor(s) prefixes s else 0 (ConcurrentSkipListSet.floor)."""
    i = bisect_right(sorted_set, s)
    if i == 0:
        return 0
    cand = sorted_set[i - 1]
    return len(cand) if s.startswith(cand) else 0


class Robotstxt:
    def __init__(self, body: str):
        self.named_uas: list[str] = []
        self.agents: dict[str, Directives] = {}
        self.wildcard: Directives | None = None
        if body is None:
            body = ""
        if len(body) > MAX_SIZE:
            body = body[:MAX_SIZE]
            lines = _LINE_SEP.split(body)
            if lines:
                lines[-1] = ""  # drop truncated partial line
        else:
            lines = _LINE_SEP.split(body)
        current: Directives | None = None
        for read in lines:
            read = read.strip()
            if not read or read.startswith("#"):
                continue
            read = _MARKUP.sub("", read)
            ci = read.find("#")
            if ci > -1:
                read = read[:ci]
            read = read.strip()
            low = read.lower()
            if low.startswith("user-agent:"):
                ua = read[11:].strip().lower()
                preexisting = self.wildcard if ua == "*" else self.agents.get(ua)
                if preexisting is not None and preexisting.has_directives:
                    current = preexisting
                elif current is None or current.has_directives:
                    current = Directives()
                if ua == "*":
                    self.wildcard = current
                else:
                    self.named_uas.append(ua)
                    self.agents[ua] = current
                continue
            if low.startswith("disallow:"):
                if current is None:
                    continue
                path = read[9:].strip()
                if path.endswith("*"):
                    path = path[:-1]
                current.has_directives = True
                if path:
                    current.disallows.append(path)
                continue
            if low.startswith("crawl-delay:"):
                if current is None:
                    continue
                val = read[12:].strip()
                parts = re.split(r"[^\d.]+", val)
                try:
                    current.crawl_delay = float(parts[0])
                    current.has_directives = True
                except (IndexError, ValueError):
                    pass
                continue
            if low.startswith("allow:"):
                if current is None:
                    continue
                path = read[6:].strip()
                if path.endswith("*"):
                    path = path[:-1]
                current.has_directives = True
                current.allows.append(path)
                continue
        for d in list(self.agents.values()) + ([self.wildcard] if self.wildcard else []):
            d._sorted()

    def directives_for(self, ua: str) -> Directives:
        ua = (ua or "").lower()
        for listed in self.named_uas:
            if listed in ua:
                return self.agents[listed]
        if self.wildcard is not None:
            return self.wildcard
        return NO_DIRECTIVES

    def directives_for_named(self, ua: str) -> Directives | None:
        """getDirectivesFor(ua, false) — named match only, no wildcard
        fallback (Robotstxt.java:230-256)."""
        ua = (ua or "").lower()
        for listed in self.named_uas:
            if listed in ua:
                return self.agents[listed]
        return None

    def allows(self, ua: str, path: str) -> bool:
        return self.directives_for(ua).allows_path(path)

    def crawl_delay(self, ua: str) -> float:
        return self.directives_for(ua).crawl_delay


# ---------------------------------------------------------------------------
# RobotsPolicy variants (modules/.../net/RobotsPolicy.java:34-40 registry:
# obey/classic, ignore, robotsTxtOnly, firstNamed, mostFavored, custom)
# ---------------------------------------------------------------------------
def policy_allows(
    policy: str,
    robots: "Robotstxt",
    ua: str,
    path: str,
    candidates: tuple[str, ...] = (),
    custom_fn=None,
) -> bool:
    """allows() under a named RobotsPolicy.

    * obey / classic / robotsTxtOnly — ObeyRobotsPolicy.allows (the
      robotsTxtOnly variant differs only in meta-robots handling, see
      :func:`obeys_meta_robots_nofollow`);
    * firstNamed — FirstNamedRobotsPolicy.allows (:79-96): our UA's NAMED
      group if present, else the first candidate UA with a named group,
      else the full wildcard-falling lookup;
    * mostFavored — MostFavoredRobotsPolicy.allows (:74-90): allowed if our
      UA or ANY candidate UA is allowed;
    * ignore — IgnoreRobotsPolicy: always allowed;
    * custom — CustomRobotsPolicy: delegate to ``custom_fn``.
    """
    if policy == "ignore":
        return True
    if policy == "custom":
        if custom_fn is None:
            raise ValueError("custom robots policy needs custom_fn")
        return bool(custom_fn(robots, ua, path))
    if policy == "firstNamed":
        d = robots.directives_for_named(ua)
        if d is not None:
            return d.allows_path(path)
        for cand in candidates:
            d = robots.directives_for_named(cand)
            if d is not None:
                return d.allows_path(path)
        return robots.allows(ua, path)
    if policy == "mostFavored":
        if robots.allows(ua, path):
            return True
        return any(robots.allows(cand, path) for cand in candidates)
    # obey / classic / robotsTxtOnly
    return robots.allows(ua, path)


def obeys_meta_robots_nofollow(policy: str) -> bool:
    """Whether HTML meta-robots nofollow aborts extraction under a policy
    (ObeyRobotsPolicy yes; RobotsTxtOnlyPolicy.java:34-38 overrides to no;
    Ignore/Custom no)."""
    return policy in ("obey", "classic", "firstNamed", "mostFavored")


def make_policy_allow_udf(policy: str, candidates: tuple[str, ...] = ()):
    """Pandas-UDF factory: vectorized allow check under a named policy."""

    @pandas_udf(BooleanType())
    def _udf(body: pd.Series, ua: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [
                policy_allows(policy, _parse_cached(b or ""), u or "", p or "", candidates)
                for b, u, p in zip(body, ua, path)
            ]
        )

    return _udf


@lru_cache(maxsize=4096)
def _parse_cached(body: str) -> Robotstxt:
    return Robotstxt(body)


@pandas_udf(BooleanType())
def robots_allow_udf(body: pd.Series, ua: pd.Series, path: pd.Series) -> pd.Series:
    """Vectorized allow check; distinct bodies parsed once (LRU)."""
    return pd.Series(
        [
            _parse_cached(b or "").allows(u or "", p or "")
            for b, u, p in zip(body, ua, path)
        ]
    )


@pandas_udf(FloatType())
def robots_crawl_delay_udf(body: pd.Series, ua: pd.Series) -> pd.Series:
    return pd.Series(
        [_parse_cached(b or "").crawl_delay(u or "") for b, u in zip(body, ua)],
        dtype="float32",
    )


def first_named_matched_agent(
    robots: "Robotstxt", ua: str, candidates: tuple[str, ...] = ()
) -> str | None:
    """FirstNamedRobotsPolicy's curi.setUserAgent side effect
    (FirstNamedRobotsPolicy.java:79-96): when a CANDIDATE user-agent's
    named group decides (the primary UA had none), the fetch adopts that
    candidate as its user-agent; returns None when the primary UA matched
    a named group or the wildcard decided."""
    if robots.directives_for_named(ua) is not None:
        return None
    for cand in candidates:
        if robots.directives_for_named(cand) is not None:
            return cand
    return None
