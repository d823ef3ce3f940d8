"""Independent reference implementations for correctness oracles.

These re-derive the datapipe operators' published laws (MinHash banding,
SimHash bit-voting, random-hyperplane LSH, the deterministic media-feature
stand-in) as straight-line Python/numpy, sharing NO code path with the
Spark engine in ``dedup.py`` / ``similarity.py`` / ``multimodal.py``.
The algorithm *parameters* (hash constants, plane seed, band layout) are
repeated here because they ARE the algorithm spec; the control flow,
set algebra, and clustering are re-implemented from scratch (union-find
instead of iterative label propagation, dict buckets instead of joins).

Used only by ``__spark_entry__.oracle_sql`` to emit VALUES oracles and by
tests; never imported by the engine.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

MASK64 = (1 << 64) - 1
MERSENNE = (1 << 61) - 1
N_HASHES = 64
ROWS_PER_BAND = 4
N_BANDS = 16
# same published parameterization as dedup.py (the spec, not the code)
A = [((2654435761 * (2 * i + 1)) & MERSENNE) or 1 for i in range(N_HASHES)]
B = [(40503 * (i + 1) ** 2 + 7) & MERSENNE for i in range(N_HASHES)]


def spark_round(x: float, digits: int = 6) -> float:
    """Replicates Spark's ROUND (BigDecimal HALF_UP on the shortest
    decimal repr of the double)."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & MASK64
    return h


def shingle_hashes(text: str, k: int = 5) -> list[int]:
    words = (text or "").lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return [0]
    return [fnv1a64(g) for g in grams]


def minhash_signature(text: str) -> list[int]:
    sh = shingle_hashes(text)
    sig = []
    for a, b in zip(A, B):
        sig.append(min(((s * a + b) & MASK64) % MERSENNE for s in sh))
    return sig


def minhash_pairs(docs: dict[int, str]) -> set[tuple[int, int]]:
    """Candidate pairs sharing >= 1 of 16 four-row MinHash bands."""
    buckets: dict[tuple, list[int]] = {}
    for doc_id in sorted(docs):
        sig = minhash_signature(docs[doc_id])
        for band in range(N_BANDS):
            key = (band, tuple(sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]))
            buckets.setdefault(key, []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return pairs


def minhash_clusters(docs: dict[int, str]) -> list[tuple[int, int]]:
    """(id, cluster_id) with cluster_id = min id of the connected component
    over the candidate-pair graph (union-find; the fixpoint of min-label
    propagation)."""
    parent = {i: i for i in docs}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in minhash_pairs(docs):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return [(i, find(i)) for i in sorted(docs)]


def simhash(text: str) -> int:
    words = (text or "").lower().split()
    if not words:
        return 0
    hashes = [fnv1a64(w) for w in words]
    sig = 0
    for bit in range(64):
        ones = sum((h >> bit) & 1 for h in hashes)
        if 2 * ones - len(words) > 0:
            sig |= 1 << bit
    return sig


def simhash_pairs(docs: dict[int, str], max_hamming: int = 3) -> list[tuple[int, int, int]]:
    """(a, b, hamming) for pairs sharing >= 1 of 4 exact 16-bit bands with
    Hamming distance <= max_hamming."""
    sigs = {i: simhash(t) for i, t in docs.items()}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id in sorted(sigs):
        for band in range(4):
            key = (band, (sigs[doc_id] >> (16 * band)) & 0xFFFF)
            buckets.setdefault(key, []).append(doc_id)
    seen: set[tuple[int, int]] = set()
    out = []
    for ids in buckets.values():
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = min(ids[i], ids[j]), max(ids[i], ids[j])
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                d = bin(sigs[a] ^ sigs[b]).count("1")
                if d <= max_hamming:
                    out.append((a, b, d))
    return sorted(out)


# --------------------------------------------------------------------------
# random-hyperplane LSH (plane seed 42 is the published parameter)
# --------------------------------------------------------------------------
def planes(dim: int, bits: int) -> np.ndarray:
    return np.random.RandomState(42).standard_normal((bits, dim))


def _norm(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    return v / n if n else v


def bucket_of(vec, p: np.ndarray) -> int:
    v = np.asarray(vec, dtype=np.float64)
    signs = (p @ v) > 0
    return int(sum(1 << i for i, s in enumerate(signs) if s))


def lsh_topk(
    embeddings: dict[int, list[float]],
    query: list[float],
    dim: int,
    k: int,
    bits: int,
    multiprobe: int = 1,
) -> list[tuple[int, int, int]]:
    """(query_id=0, rank, vec_id) of the bucketed-ANN law: candidates share
    the query's bucket or a 1-bit-flip probe; exact cosine rank inside."""
    p = planes(dim, bits)
    qn = _norm(np.asarray(query, dtype=np.float64))
    qb = bucket_of(qn, p)
    probes = {qb}
    if multiprobe > 0:
        probes |= {qb ^ (1 << bit) for bit in range(bits)}
    scored = []
    for vid in sorted(embeddings):
        if bucket_of(embeddings[vid], p) in probes:
            vn = _norm(np.asarray(embeddings[vid], dtype=np.float64))
            scored.append((-float(qn @ vn), vid))
    scored.sort()
    return [(0, r + 1, vid) for r, (_, vid) in enumerate(scored[:k])]


def ivf_centroids(dim: int, n_cells: int) -> np.ndarray:
    rng = np.random.RandomState(7)
    c = rng.standard_normal((n_cells, dim))
    return np.array([row / (np.linalg.norm(row) or 1.0) for row in c])


def ivf_topk(
    embeddings: dict[int, list[float]],
    query: list[float],
    dim: int,
    k: int,
    n_cells: int,
    nprobe: int,
) -> list[tuple[int, int, int]]:
    """(query_id=0, rank, vec_id) of the IVF-ANN law: candidates live in
    the query's top-nprobe coarse cells; exact cosine rank inside."""
    c = ivf_centroids(dim, n_cells)
    qn = _norm(np.asarray(query, dtype=np.float64))
    probe = set(int(i) for i in np.argsort(-(c @ qn))[:nprobe])
    scored = []
    for vid in sorted(embeddings):
        vn = _norm(np.asarray(embeddings[vid], dtype=np.float64))
        if int(np.argmax(c @ vn)) in probe:
            scored.append((-float(qn @ vn), vid))
    scored.sort()
    return [(0, r + 1, vid) for r, (_, vid) in enumerate(scored[:k])]


def near_dup_pairs(
    embeddings: dict[int, list[float]], dim: int, threshold: float, bits: int
) -> list[tuple[int, int]]:
    """(a, b) pairs in the same hyperplane bucket with cosine >= threshold."""
    p = planes(dim, bits)
    buckets: dict[int, list[int]] = {}
    for vid in sorted(embeddings):
        buckets.setdefault(bucket_of(embeddings[vid], p), []).append(vid)
    out = []
    for ids in buckets.values():
        for i in range(len(ids)):
            va = _norm(np.asarray(embeddings[ids[i]], dtype=np.float64))
            for j in range(i + 1, len(ids)):
                vb = _norm(np.asarray(embeddings[ids[j]], dtype=np.float64))
                if float(va @ vb) >= threshold:
                    out.append((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return sorted(out)


def media_feature_f0(n: int = 60) -> list[tuple[str, str, float]]:
    """(media_id, kind, round(feature[0], 6)) of the deterministic media
    fixture + hash-expanded feature stand-in (multimodal.py law)."""
    kinds = ["image", "audio", "video"]
    out = []
    feature_dim = 64
    for i in range(n):
        payload = bytes((i * 7 + j) % 256 for j in range(64 + i % 32))
        b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        reps = int(np.ceil(feature_dim / max(len(b), 1)))
        v = np.tile(b, reps)[:feature_dim]
        norm = float(np.linalg.norm(v)) or 1.0
        f0 = float((v / norm)[0])
        out.append((f"m{i:05d}", kinds[i % 3], spark_round(f0, 6)))
    return out
