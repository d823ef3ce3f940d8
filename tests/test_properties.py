"""Property-based robustness tests (hypothesis) for the pure law layers.

Derandomized + bounded so the suite stays fast and deterministic.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from heritrix3_spark import fp
from heritrix3_spark.functions.canonicalize import canonicalize
from heritrix3_spark.functions.surt import surt, surt_authority_class_key
from heritrix3_spark.operators.robots import Robotstxt
from heritrix3_spark.simulator import _scope_ok

SETTINGS = settings(max_examples=60, derandomize=True, deadline=None)

url_ish = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=120,
)
hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{0,8}){1,3}", fullmatch=True)
paths = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,12}){0,5}(\?[a-zA-Z0-9=&]{0,20})?", fullmatch=True)
# the FP24 authority clustering law only applies when a path slash exists:
# calcSchemeAuthorityKeyBytes fingerprints the WHOLE url when no '/' follows
# the authority (BdbUriUniqFilter.java:308-315)
slash_paths = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,12}){1,5}(\?[a-zA-Z0-9=&]{0,20})?", fullmatch=True)


@SETTINGS
@given(url_ish)
def test_fp_scalar_batch_agree_on_anything(s):
    assert fp.create_key(s) == fp.create_key_batch([s])[0]


@SETTINGS
@given(hosts, slash_paths, slash_paths)
def test_fp_authority_clustering(host, p1, p2):
    """Two URLs on one host share the key's 24-bit authority prefix."""
    a = fp.create_key(f"http://{host}{p1}")
    b = fp.create_key(f"http://{host}{p2}")
    assert fp.authority_prefix24(a) == fp.authority_prefix24(b)


@SETTINGS
@given(url_ish)
def test_canonicalize_total_and_never_grows(s):
    out = canonicalize(s)
    assert isinstance(out, str)
    assert len(out) <= len(s)  # every rule only strips or lowercases


@SETTINGS
@given(hosts, paths)
def test_canonicalize_fixpoint_on_clean_urls(host, path):
    """URLs with no strippable artifacts canonicalize to a fixpoint."""
    u = canonicalize(f"http://{host}{path}")
    assert canonicalize(u) == u


@SETTINGS
@given(hosts, paths)
def test_surt_structure(host, path):
    u = f"http://{host}{path}"
    s = surt(u)
    assert s.startswith("http://(")
    # all host labels present, reversed with trailing comma
    inner = s[len("http://(") : s.index(")")]
    assert inner == ",".join(reversed(host.split("."))) + ","
    ck = surt_authority_class_key(u)
    assert ck == inner


@SETTINGS
@given(st.text(max_size=400))
def test_robots_parser_total(body):
    """Arbitrary text never crashes the parser; law invariants hold."""
    r = Robotstxt(body)
    assert isinstance(r.allows("any-agent", "/x"), bool)
    assert isinstance(r.crawl_delay("any-agent"), float)


@SETTINGS
@given(paths)
def test_robots_allow_all_and_deny_all(path):
    path = path or "/"
    assert Robotstxt("").allows("ua", path)
    assert Robotstxt("User-agent: *\nDisallow:\n").allows("ua", path)
    denied = Robotstxt("User-agent: *\nDisallow: /\n")
    if path.startswith("/"):
        assert not denied.allows("ua", path)


@SETTINGS
@given(url_ish, st.from_regex(r"[LPREXIMS]{0,25}", fullmatch=True))
def test_scope_total(uri, hops):
    assert _scope_ok(uri, hops, ["http://(example,"], 20) in (True, False)


# --- cuckoo filter laws (operators/cuckoo.py, Fan et al. 2014) -------------
fp_arrays = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=400
)


@SETTINGS
@given(fp_arrays)
def test_cuckoo_membership_total(vals):
    """Build over ANY fp multiset: every inserted key is found (no false
    negatives), determinism holds, and the alt-index stays an involution."""
    import numpy as np

    from heritrix3_spark.operators import cuckoo as CK

    fps = np.unique(np.asarray(vals, dtype=np.int64))
    t1, m1 = CK.build(fps)
    t2, m2 = CK.build(fps)
    assert m1 == m2 and (t1 == t2).all()
    assert CK.contains(fps, t1, m1).all()
    tags = CK._tags(fps)
    i1 = CK._index1(fps, m1)
    assert (CK._alt_index(CK._alt_index(i1, tags, m1), tags, m1) == i1).all()


@SETTINGS
@given(fp_arrays, st.integers(min_value=0, max_value=399))
def test_cuckoo_delete_preserves_others(vals, split):
    """Deleting any inserted subset never produces a false negative for
    the keys that remain (the one-copy-per-inserted-key contract)."""
    import numpy as np

    from heritrix3_spark.operators import cuckoo as CK

    fps = np.unique(np.asarray(vals, dtype=np.int64))
    if len(fps) == 0:
        return
    split = split % len(fps)
    t, m = CK.build(fps)
    assert CK.delete(fps[:split], t, m).all()
    assert CK.contains(fps[split:], t, m).all()
