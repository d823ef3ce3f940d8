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
