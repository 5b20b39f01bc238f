"""Cuckoo filter kernel — the deletable URL-seen-set variant
(SURVEY.md §1.4: Bloom for the append-only path, cuckoo where the
frontier must *unsee* URLs, e.g. recrawl scheduling or robots
retractions).

Standard 2-choice, 4-slot-per-bucket cuckoo filter over 16-bit
fingerprints, stored as one flat numpy uint16 array (0 = empty slot)
so a filter serializes to bytes for the ``seen_cuckoo(bucket, table)``
relation and unions/probes run vectorized inside ``applyInPandas``.

Determinism: builders sort keys before insert, so the serialized
table bytes are identical at any partitioning/parallelism (eviction
paths depend on insert order; membership never does).

All hashing is derived from two caller-provided 64-bit hashes
(h1, h2) — computed JVM-side with xxhash64 in the Spark layer, or any
stable pair in pure-Python use. Partial-key cuckoo indexing:
``i2 = i1 XOR hash(fp)`` so deletes/moves need only the fingerprint.
"""

from __future__ import annotations

import numpy as np

SLOTS = 4
MAX_KICKS = 500
_FP_MASK = np.uint64(0xFFFF)
_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing constant


def _fingerprint(h2: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the second hash."""
    fp = (h2.astype(np.uint64) & _FP_MASK).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _fp_hash(fp: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((fp.astype(np.uint64) * _MIX) >> np.uint64(48)) \
        % np.uint64(n_buckets)


def _index1(h1: np.ndarray, n_buckets: int) -> np.ndarray:
    return h1.astype(np.uint64) % np.uint64(n_buckets)


class CuckooFilter:
    def __init__(self, capacity: int, table: np.ndarray | None = None):
        if table is not None:
            self.n_buckets = len(table) // SLOTS
            self.table = table
            return
        # size to ~²⁄₃ load at `capacity` keys, power-of-two buckets
        self.n_buckets = max(8, int(1 << int(np.ceil(np.log2(
            max(SLOTS, capacity) / (SLOTS * 0.66))))))
        self.table = np.zeros(self.n_buckets * SLOTS, dtype=np.uint16)

    # -- serialization ---------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        table = np.frombuffer(blob, dtype=np.uint16).copy()
        return cls(capacity=0, table=table)

    # -- row helpers -------------------------------------------------------
    def _row(self, idx: int) -> np.ndarray:
        return self.table[idx * SLOTS:(idx + 1) * SLOTS]

    def _indices(self, h1: int, fp: int) -> tuple[int, int]:
        i1 = int(_index1(np.asarray([h1]), self.n_buckets)[0])
        i2 = int((np.uint64(i1) ^ _fp_hash(
            np.asarray([fp], dtype=np.uint16), self.n_buckets)[0])
            % np.uint64(self.n_buckets))
        return i1, i2

    # -- mutation --------------------------------------------------------
    def insert(self, h1: int, h2: int) -> bool:
        fp = int(_fingerprint(np.asarray([h2]))[0])
        i1, i2 = self._indices(h1, fp)
        for idx in (i1, i2):
            row = self._row(idx)
            if fp in row:
                return True  # already present
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = fp
                return True
        # evict: deterministic round-robin kick
        idx, cur = i1, fp
        for kick in range(MAX_KICKS):
            row = self._row(idx)
            slot = kick % SLOTS
            cur, row[slot] = int(row[slot]), cur
            idx = int((np.uint64(idx) ^ _fp_hash(
                np.asarray([cur], dtype=np.uint16), self.n_buckets)[0])
                % np.uint64(self.n_buckets))
            row = self._row(idx)
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = cur
                return True
        return False  # table full

    def delete(self, h1: int, h2: int) -> bool:
        fp = int(_fingerprint(np.asarray([h2]))[0])
        for idx in self._indices(h1, fp):
            row = self._row(idx)
            hits = np.flatnonzero(row == fp)
            if hits.size:
                row[hits[0]] = 0
                return True
        return False

    # -- probe (vectorized) ------------------------------------------------
    def contains_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        fp = _fingerprint(np.asarray(h2))
        i1 = _index1(np.asarray(h1), self.n_buckets).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ _fp_hash(fp, self.n_buckets))
              % np.uint64(self.n_buckets)).astype(np.int64)
        t = self.table.reshape(-1, SLOTS)
        hit1 = (t[i1] == fp[:, None]).any(axis=1)
        hit2 = (t[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def contains(self, h1: int, h2: int) -> bool:
        return bool(self.contains_many(np.asarray([h1]),
                                       np.asarray([h2]))[0])


def build_sorted(h1: np.ndarray, h2: np.ndarray,
                 capacity: int | None = None) -> CuckooFilter:
    """Deterministic build: insert in sorted (h1, h2) order so the
    serialized bytes are independent of input partitioning."""
    order = np.lexsort((np.asarray(h2), np.asarray(h1)))
    filt = CuckooFilter(capacity or len(order) + 1)
    for i in order:
        if not filt.insert(int(np.uint64(np.asarray(h1)[i])),
                           int(np.uint64(np.asarray(h2)[i]))):
            raise RuntimeError("cuckoo filter over capacity")
    return filt
