"""Vectorized XXH64 (seed 42) over short byte strings — bit-identical to
Spark's ``xxhash64`` expression (org.apache.spark.sql.catalyst.expressions.
XxHash64, default seed 42), so driver-side kernels can reproduce JVM hash
values exactly.  Validated against Spark in tests/test_operators.py.

Only the short-input path (< 32 bytes) is implemented — enough for character
n-grams; longer inputs raise so a mismatch can never pass silently.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)
_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_fixed(byte_cols: list[np.ndarray], length: int) -> np.ndarray:
    """XXH64 of N same-length byte strings, given as ``length`` parallel
    uint64 arrays (byte_cols[j][i] = byte j of string i).  length < 32."""
    if length >= 32:
        raise NotImplementedError("xxh64_fixed implements only the <32-byte path")
    with np.errstate(over="ignore"):
        n = len(byte_cols[0]) if byte_cols else 0
        h = np.full(n, _SEED + _P5 + np.uint64(length), dtype=np.uint64)
        j = 0
        # 8-byte chunks
        while length - j >= 8:
            k = np.zeros(n, dtype=np.uint64)
            for b in range(8):
                k |= byte_cols[j + b] << np.uint64(8 * b)
            k = _rotl(k * _P2, 31) * _P1
            h = _rotl(h ^ k, 27) * _P1 + _P4
            j += 8
        # 4-byte chunk
        if length - j >= 4:
            k = np.zeros(n, dtype=np.uint64)
            for b in range(4):
                k |= byte_cols[j + b] << np.uint64(8 * b)
            h = _rotl(h ^ (k * _P1), 23) * _P2 + _P3
            j += 4
        # remaining single bytes
        while j < length:
            h = _rotl(h ^ (byte_cols[j] * _P5), 11) * _P1
            j += 1
        # avalanche
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h


def xxh64_ngrams(strings: list[str], n: int = 3) -> list[np.ndarray]:
    """Per-string arrays of xxh64 values of its distinct character n-grams
    (NUL-padded to length n, matching linking.gram_array).  Vectorized: one
    flat hash pass over all (string, gram) occurrences."""
    if not all(s.isascii() for s in strings):
        # latin-1 encoding below diverges from Spark's UTF-8 hashing for
        # U+0080..U+00FF (silently wrong hashes) and raises confusingly
        # beyond U+00FF — refuse loudly instead, mirroring the >=32-byte
        # guard: a mismatch with the distributed path must never be silent.
        raise NotImplementedError(
            "xxh64_ngrams is ASCII-only (Spark xxhash64 hashes UTF-8 bytes; "
            "the vectorized kernel assumes 1 byte per char) — route non-ASCII "
            "norms through the distributed linking path"
        )
    padded = [s + "\x00" * (n - len(s)) if len(s) < n else s for s in strings]
    counts = np.array([len(s) - n + 1 for s in padded])
    flat = "".join(padded)
    codes = np.frombuffer(flat.encode("latin-1"), dtype=np.uint8).astype(np.uint64)
    # start offset of every gram of every string in the flat buffer
    offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum([len(s) for s in padded])])[:-1]
    starts = np.concatenate(
        [off + np.arange(c) for off, c in zip(offsets, counts)]
    ) if len(strings) else np.zeros(0, dtype=np.int64)
    cols = [codes[starts + b] for b in range(n)]
    hashes = xxh64_fixed(cols, n)
    out: list[np.ndarray] = []
    pos = 0
    for c in counts:
        out.append(np.unique(hashes[pos : pos + c]))
        pos += c
    return out
