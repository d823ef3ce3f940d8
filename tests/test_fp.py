"""URL-seen fingerprint law (BdbUriUniqFilterTest.java:89-111 port)."""

from __future__ import annotations

import numpy as np
import pytest

from heritrix3_spark import fp
from heritrix3_spark.vectors import FP_GOLDEN, FP_NONCOLLIDING


@pytest.mark.parametrize("url,expected", FP_GOLDEN)
def test_create_key_golden(url, expected):
    assert fp.create_key(url) == expected


def test_known_pair_does_not_collide():
    a, b = FP_NONCOLLIDING
    assert fp.create_key(a) != fp.create_key(b)


def test_batch_matches_scalar():
    urls = [
        "dns:archive.org",
        "http://archive.org/index.html",
        "http://example.com/" + "x" * 200,
        "x://",
        "://leading",
        "plain-string",
        "http://h0.example/p0",
        "",
    ]
    batch = fp.create_key_batch(urls)
    assert list(batch) == [fp.create_key(u) for u in urls]
    assert batch.dtype == np.int64


def test_scheme_authority_prefix_clusters_hosts():
    """Keys of one scheme+authority share their top 24 bits (host locality)."""
    keys = [fp.create_key(f"http://archive.org/p{i}") for i in range(50)]
    prefixes = {fp.authority_prefix24(k) for k in keys}
    assert len(prefixes) == 1
    other = fp.authority_prefix24(fp.create_key("http://example.com/p0"))
    assert other not in prefixes


def test_fp_batch_empty():
    assert fp.create_key_batch([]).shape == (0,)


def test_fused_batch_matches_scalar_on_authority_edges():
    """The fused codepoint-matrix kernel must reproduce the scalar
    _scheme_authority law on its edge cases: '://' at position 0 (empty
    authority), no '://' (whole-url fp24), no path slash, and embedded
    NULs; non-BMP code points take the per-string UTF-16 fallback."""
    urls = [
        "://x/y",          # find('://') == 0 -> authority is url[:0]
        "://",
        "a://b://c/d",     # second '://' is path content
        "no-scheme/with/slash",
        "http://hostonly",
        "http://h/",
        "http://host/\u0000weird",   # NUL inside the path
        "\U0001F600://emoji.example/x",  # astral -> utf-16 fallback
        "bmp\uFFFFmax://h/p",
        "",
    ]
    batch = fp.create_key_batch(urls)
    assert [int(v) for v in batch] == [fp.create_key(u) for u in urls]


def test_fp_batch_utf16_fallback_matches_fast_path():
    """BMP-only inputs must produce identical fps through both kernels."""
    texts = ["hello world", "", "x" * 120, "\uFFFF\u0001", "dns:archive.org"]
    fast = fp.std64.fp_batch(texts)
    slow = fp.std64._fp_batch_utf16(texts)
    assert (fast == slow).all()
