"""Rabin (GF(2^d)) fingerprints reproducing Heritrix's URL-seen key law.

Reference semantics (studied, re-implemented from scratch for vectorized
NumPy execution — no code copied):

- polynomial fingerprint generator: /root/reference/commons/src/main/java/st/ata/util/FPGenerator.java
  (degree-d GF(2) polynomial fingerprints, least-significant exponent kept in
  the MOST significant bit; standard generators std24/std40/std64 use the
  first irreducible polynomial of each degree from its `polynomials` table)
- composite URL-seen key: /root/reference/engine/src/main/java/org/archive/crawler/util/BdbUriUniqFilter.java:302-315
  key = fp24(scheme+authority)  |  (fp40(url) >>> 24)
  i.e. a host-clustered 64-bit fingerprint: high 24 bits identify the
  scheme+authority (so one host's keys are adjacent), low 40 bits
  fingerprint the full URL.

Golden vectors (from the reference's own unit test,
/root/reference/engine/src/test/java/org/archive/crawler/util/BdbUriUniqFilterTest.java:89-111):
  create_key("dns:archive.org")               == 8812917769287344085
  create_key("http://archive.org/index.html") == 6613237167064754714
and the pair dns:mail.daps.dla.mil / dns:militaryreview.army.mil must NOT
collide.

At 10^10-URL scale this fingerprint is the only thing the url_seen table
stores; the 24-bit authority prefix doubles as the bucketing key so that
one host's dedup lookups land in one bucket (storage-partitioned anti-join).
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1

# First irreducible polynomial of each degree we need, from the public
# FPGenerator polynomial table (degree -> polynomial, bit-reversed repr).
_POLY = {
    24: 0x8E375B8000000000,
    40: 0x8643FFF621800000,
    64: 0xD74307D3FD3382DB,
}


class FPGenerator:
    """Degree-d GF(2) polynomial fingerprints (pure-python + numpy tables)."""

    def __init__(self, degree: int):
        poly = _POLY[degree]
        self.degree = degree
        self.polynomial = poly
        one = 0x8000000000000000
        top = one >> (degree - 1)
        power = [0] * 128
        x = one
        for i in range(128):
            power[i] = x
            overflow = (x & top) != 0
            x >>= 1
            if overflow:
                x ^= poly
        self.empty = power[64]
        table = [[0] * 256 for _ in range(16)]
        for i in range(16):
            for j in range(256):
                v = 0
                for k in range(8):
                    if j & (1 << k):
                        v ^= power[127 - i * 8 - k]
                table[i][j] = v
        self._table = table
        # numpy copies for the vectorized path
        self._np_table = np.array(table, dtype=np.uint64)

    # ---- scalar (reference) path -------------------------------------
    def _extend_char(self, f: int, v: int) -> int:
        f ^= v & 0xFFFF
        t = self._table
        return (f >> 16) ^ t[6][f & 0xFF] ^ t[7][(f >> 8) & 0xFF]

    def _reduce(self, f: int) -> int:
        n = 8 - self.degree // 8
        local = 0 if n == 8 else f & ((_MASK64 << (8 * n)) & _MASK64)
        temp = 0
        for i in range(n):
            temp ^= self._table[8 + i][f & 0xFF]
            f >>= 8
        return local ^ temp

    def fp(self, s: str) -> int:
        """Fingerprint of the UTF-16 code units of ``s`` (unsigned 64-bit)."""
        f = self.empty
        for unit in np.frombuffer(s.encode("utf-16-be"), dtype=">u2"):
            f = self._extend_char(f, int(unit))
        return self._reduce(f)

    # ---- vectorized path ---------------------------------------------
    def fp_batch(self, strings) -> np.ndarray:
        """Fingerprints for a batch of strings.

        Vectorized across the batch: one numpy pass per character position
        (URLs are short, so ~60-80 fully-vectorized steps per Arrow batch).
        Returns uint64 array.
        """
        n = len(strings)
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        mat = _unicode_matrix(strings)
        if mat is None:  # non-BMP char present: exact UTF-16 unit law
            return self._fp_batch_utf16(strings)
        units, lens = mat
        return self._fp_units(units, lens)

    def _fp_units(self, units: np.ndarray, lens: np.ndarray) -> np.ndarray:
        f = np.full(len(lens), self.empty, dtype=np.uint64)
        t6 = self._np_table[6]
        t7 = self._np_table[7]
        m8 = np.uint64(0xFF)
        s8, s16 = np.uint64(8), np.uint64(16)
        maxlen = int(lens.max()) if len(lens) else 0
        for p in range(maxlen):
            active = lens > p
            g = f ^ units[:, p].astype(np.uint64)
            nf = (g >> s16) ^ t6[g & m8] ^ t7[(g >> s8) & m8]
            f = np.where(active, nf, f)
        return self._reduce_batch(f)

    def _fp_batch_utf16(self, strings) -> np.ndarray:
        """Per-string UTF-16 encode fallback (rare: non-BMP code points
        need surrogate-pair units, which the codepoint matrix can't model)."""
        n = len(strings)
        encoded = [s.encode("utf-16-be") for s in strings]
        lens = np.array([len(b) // 2 for b in encoded], dtype=np.int64)
        maxlen = int(lens.max()) if n else 0
        units = np.zeros((n, maxlen), dtype=np.uint16)
        for i, b in enumerate(encoded):
            if b:
                units[i, : lens[i]] = np.frombuffer(b, dtype=">u2")
        return self._fp_units(units, lens)

    def _reduce_batch(self, f: np.ndarray) -> np.ndarray:
        n = 8 - self.degree // 8
        if n == 8:
            local = np.zeros_like(f)
        else:
            local = f & np.uint64((_MASK64 << (8 * n)) & _MASK64)
        temp = np.zeros_like(f)
        m8 = np.uint64(0xFF)
        s8 = np.uint64(8)
        for i in range(n):
            temp ^= self._np_table[8 + i][(f & m8).astype(np.int64)]
            f = f >> s8
        return local ^ temp


std24 = FPGenerator(24)
std40 = FPGenerator(40)
std64 = FPGenerator(64)


def _unicode_matrix(strings) -> tuple[np.ndarray, np.ndarray] | None:
    """(codepoint_matrix[uint32 n x maxlen], lens) for a batch of strings.

    One C-level conversion replaces the former per-row encode +
    matrix-fill Python loop (it was the dominant cost of fp_udf batches).
    For BMP-only text a UTF-16 code unit equals the code point, so the
    matrix feeds the fingerprint loop directly; returns None when any
    non-BMP code point (surrogate pair in UTF-16) is present — callers
    fall back to the exact per-string encode path.
    """
    arr = np.asarray(strings, dtype="U")
    n = len(arr)
    maxlen = arr.dtype.itemsize // 4
    if maxlen == 0:
        return np.zeros((n, 0), dtype=np.uint32), np.zeros(n, dtype=np.int64)
    units = np.ascontiguousarray(arr).view(np.uint32).reshape(n, maxlen)
    if int(units.max(initial=0)) >= 0x10000:
        return None
    lens = np.char.str_len(arr).astype(np.int64)
    return units, lens


def _scheme_authority(url: str) -> str:
    """Scheme+authority prefix per BdbUriUniqFilter.calcSchemeAuthorityKeyBytes.

    indexOf("://") -> if >0, indexOf('/', idx+3); whole url when no match.
    """
    idx = url.find("://")
    if idx > 0:
        idx = url.find("/", idx + 3)
    return url if idx == -1 else url[:idx]


def create_key(url: str) -> int:
    """64-bit host-clustered URL-seen key (signed, as stored in bigint)."""
    hi = std24.fp(_scheme_authority(url))
    lo = std40.fp(url) >> 24
    return _to_signed(hi | lo)


def create_key_batch(urls) -> np.ndarray:
    """Vectorized create_key over a batch; returns int64 (signed) array.

    Fused kernel: ONE codepoint-matrix conversion and ONE position loop
    compute both fingerprints (std40 over the whole URL, std24 over the
    scheme+authority prefix — just a shorter active length on the same
    matrix). The authority boundary (find "://" then the next "/",
    BdbUriUniqFilter.calcSchemeAuthorityKeyBytes) is located vectorized.
    The former shape paid a per-row Python _scheme_authority + two
    separate encode/fill passes; this was the top per-row cost of the
    candidate pipeline's only Python stage.
    """
    urls = list(urls)
    n = len(urls)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    mat = _unicode_matrix(urls)
    if mat is None:  # rare non-BMP fallback: the exact per-string law
        hi = std24._fp_batch_utf16([_scheme_authority(u) for u in urls])
        lo = std40._fp_batch_utf16(urls) >> np.uint64(24)
        return (hi | lo).view(np.int64)
    units, lens = mat
    maxlen = units.shape[1]
    # authority end: idx = find("://"); if idx > 0: idx = find("/", idx+3);
    # whole url when idx == -1, else url[:idx]. Padding is NUL so matches
    # can't extend past a row's length.
    if maxlen >= 3:
        css = (
            (units[:, :-2] == ord(":"))
            & (units[:, 1:-1] == ord("/"))
            & (units[:, 2:] == ord("/"))
        )
        idx1 = np.where(css.any(axis=1), css.argmax(axis=1), -1)
    else:
        idx1 = np.full(n, -1, dtype=np.int64)
    slash = units == ord("/")
    pos = np.arange(maxlen, dtype=np.int64)
    m2 = slash & (pos[None, :] >= (idx1 + 3)[:, None])
    idx2 = np.where(m2.any(axis=1), m2.argmax(axis=1), -1)
    final_idx = np.where(idx1 > 0, idx2, idx1)
    auth_len = np.where(final_idx == -1, lens, final_idx)

    f24 = np.full(n, std24.empty, dtype=np.uint64)
    f40 = np.full(n, std40.empty, dtype=np.uint64)
    t24_6, t24_7 = std24._np_table[6], std24._np_table[7]
    t40_6, t40_7 = std40._np_table[6], std40._np_table[7]
    m8 = np.uint64(0xFF)
    s8, s16 = np.uint64(8), np.uint64(16)
    auth_max = int(auth_len.max(initial=0))
    for p in range(int(lens.max(initial=0))):
        c = units[:, p].astype(np.uint64)
        g = f40 ^ c
        nf = (g >> s16) ^ t40_6[g & m8] ^ t40_7[(g >> s8) & m8]
        f40 = np.where(lens > p, nf, f40)
        if p < auth_max:
            g = f24 ^ c
            nf = (g >> s16) ^ t24_6[g & m8] ^ t24_7[(g >> s8) & m8]
            f24 = np.where(auth_len > p, nf, f24)
    hi = std24._reduce_batch(f24)
    lo = std40._reduce_batch(f40) >> np.uint64(24)
    return (hi | lo).view(np.int64)


def _to_signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def authority_prefix24(key: int) -> int:
    """High 24 bits of a url_seen key = the scheme+authority cluster id.

    Used as the bucketing key for the url_seen table so that one host's
    dedup probes land in one bucket (mirrors the reference's host-clustered
    B-tree locality, BdbUriUniqFilter.java:58-64).
    """
    return (key & _MASK64) >> 40
