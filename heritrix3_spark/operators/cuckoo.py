"""Cuckoo-filter primitives for the URL-seen prefilter.

The north rule names a "bloom/cuckoo-filter URL-seen set" as the
replacement for the reference's BdbUriUniqFilter (engine/.../util/
BdbUriUniqFilter.java) / BloomUriUniqFilter (BloomUriUniqFilter.java:81-98).
This module supplies the cuckoo half, following the public algorithm of
Fan, Andersen, Kaminsky & Mitzenmacher, "Cuckoo Filter: Practically Better
Than Bloom" (CoNEXT 2014):

* a table of ``m`` buckets (``m`` a power of two) × ``SLOTS`` 16-bit tag
  slots; tag 0 means empty, so real tags are remapped to 1..65535;
* item placement by *partial-key cuckoo hashing*: candidate buckets
  ``i1 = h(fp)`` and ``i2 = i1 XOR h'(tag)`` — the xor form makes the
  alternate computable from (index, tag) alone, which is what lets
  relocation (the "kick" loop) and deletion work without the original key;
* **deletion is supported** (the property blooms lack): removing one
  stored copy of an item's tag from either of its two buckets. The
  standard guarantee applies: deletion is safe only for items actually
  inserted (each inserted fp contributes exactly one tag copy, so copy
  counts never go negative and no other item loses its cover — two
  different fps sharing (bucket, tag) hold two copies).

Space/accuracy vs the bloom shards (urlseen.py): 16-bit tags at 4 slots
and ~0.84 target load cost ~19 bits/key (vs bloom's 10) but push the
false-positive rate to ~2·SLOTS/2^16 ≈ 0.012% (vs ~1%) — at 10^10 URLs
that is the difference between ~10^6 and ~10^8 wasted exact-check rows
per full-frontier probe — and forgotten URLs can be *really deleted* from
the filter instead of haunting it as permanent maybe-seen hits.

All probe/build/delete entry points take numpy arrays and run inside
Arrow-batched ``applyInPandas`` tasks (one bucket's shard per task) —
never per-row Python over a DataFrame.
"""

from __future__ import annotations

import numpy as np

#: slots per cuckoo bucket (b=4 sustains ~95% load per the paper; we size
#: for 0.84 so the kick loop almost never degenerates)
SLOTS = 4
#: tag width — stored as uint16, 0 reserved for "empty"
TAG_BITS = 16
_TAG_MASK = np.uint64((1 << TAG_BITS) - 1)
#: give up relocating after this many evictions and grow the table
MAX_KICKS = 500
#: target load factor used when sizing a table for n keys
TARGET_LOAD = 0.84

_MIX1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio Fibonacci mix for i1
_MIX2 = np.uint64(0xFF51AFD7ED558CCD)  # Murmur3 finalizer constant for tag
_TAGH = np.uint64(0x5BD1E995)  # MurmurHash2 constant for the alt-index hash


def table_size_for(n: int) -> int:
    """Power-of-two bucket count holding ``n`` keys at TARGET_LOAD."""
    need = max(1, int(np.ceil(n / (SLOTS * TARGET_LOAD))))
    return max(64, 1 << (need - 1).bit_length())


def _tags(fps: np.ndarray) -> np.ndarray:
    """16-bit nonzero tag per fingerprint (uint16)."""
    u = fps.astype(np.uint64)
    h = (u ^ (u >> np.uint64(33))) * _MIX2
    t = (h >> np.uint64(32)) & _TAG_MASK
    return np.where(t == 0, np.uint64(1), t).astype(np.uint16)


def _index1(fps: np.ndarray, m: int) -> np.ndarray:
    u = fps.astype(np.uint64) * _MIX1
    return ((u >> np.uint64(17)) & np.uint64(m - 1)).astype(np.int64)


def _alt_index(idx: np.ndarray, tags: np.ndarray, m: int) -> np.ndarray:
    """i2 = i1 XOR h'(tag) — an involution, so alt(alt(i)) == i."""
    h = (tags.astype(np.uint64) * _TAGH) & np.uint64(m - 1)
    return (idx.astype(np.uint64) ^ h).astype(np.int64)


def build(fps: np.ndarray, m: int | None = None) -> tuple[np.ndarray, int]:
    """Build a cuckoo table over ``fps``; returns (table[m, SLOTS], m).

    Deterministic: insertion order is input order, the eviction victim
    cycles ``kick % SLOTS`` — same input always yields the same table
    (required for reproducible shard snapshots). If the kick loop fails
    (pathological collisions past MAX_KICKS) the table doubles and
    rebuilds — vanishingly rare at TARGET_LOAD sizing.
    """
    if m is None:
        m = table_size_for(len(fps))
    while True:
        table = np.zeros((m, SLOTS), dtype=np.uint16)
        if _insert_all(fps, table, m):
            return table, m
        m *= 2


def _insert_all(fps: np.ndarray, table: np.ndarray, m: int) -> bool:
    """Bulk insert into an EMPTY table: a vectorized first pass places
    every key whose primary bucket still has room (the overwhelming
    majority below target load — numpy group-cumcount, no Python loop),
    then only the overflow runs the per-key kick path. ~20x faster than
    key-at-a-time at TARGET_LOAD; same determinism (input order is the
    tiebreak in both phases)."""
    tags = _tags(fps)
    i1s = _index1(fps, m)
    order = np.argsort(i1s, kind="stable")
    si = i1s[order]
    if len(si):
        run_start = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
        run_len = np.diff(np.r_[run_start, len(si)])
        pos = np.arange(len(si)) - np.repeat(run_start, run_len)
        fit = pos < SLOTS
        table[si[fit], pos[fit]] = tags[order][fit]
        rest = order[~fit]
    else:
        rest = order
    if len(rest):
        i2s = _alt_index(i1s[rest], tags[rest], m)
        for j, k in enumerate(rest):
            if not _insert_one(table, m, int(tags[k]), int(i1s[k]), int(i2s[j])):
                return False
    return True


def _insert_one(table: np.ndarray, m: int, tag: int, i1: int, i2: int) -> bool:
    for i in (i1, i2):
        row = table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = tag
            return True
    # both full: evict deterministically and relocate (partial-key kicking)
    i = i1
    for kick in range(MAX_KICKS):
        victim_slot = kick % SLOTS
        victim = int(table[i, victim_slot])
        table[i, victim_slot] = tag
        tag = victim
        i = int(
            _alt_index(
                np.asarray([i], dtype=np.int64),
                np.asarray([tag], dtype=np.uint16),
                m,
            )[0]
        )
        row = table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = tag
            return True
    return False


def contains(fps: np.ndarray, table: np.ndarray, m: int) -> np.ndarray:
    """Vectorized membership probe: tag present in either candidate bucket.

    No false negatives for inserted-and-not-deleted keys; false positives
    ~2·SLOTS/2^TAG_BITS.
    """
    if len(fps) == 0:
        return np.zeros(0, dtype=bool)
    tags = _tags(fps)
    i1 = _index1(fps, m)
    i2 = _alt_index(i1, tags, m)
    t = tags[:, None]
    return (table[i1] == t).any(axis=1) | (table[i2] == t).any(axis=1)


def delete(fps: np.ndarray, table: np.ndarray, m: int) -> np.ndarray:
    """Remove ONE stored copy of each fp's tag (mutates ``table``).

    Returns a bool mask of which deletions found a copy. Callers must only
    delete previously-inserted keys (the standard cuckoo-filter deletion
    contract) — the url_seen layer enforces this by semi-joining forgets
    against the live seen set first.
    """
    tags = _tags(fps)
    i1s = _index1(fps, m)
    i2s = _alt_index(i1s, tags, m)
    out = np.zeros(len(fps), dtype=bool)
    for k in range(len(fps)):
        tag = tags[k]
        for i in (int(i1s[k]), int(i2s[k])):
            row = table[i]
            hit = np.flatnonzero(row == tag)
            if len(hit):
                row[hit[0]] = 0
                out[k] = True
                break
    return out
