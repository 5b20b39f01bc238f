"""Cuckoo filter kernel: membership, deletion, determinism, FPP."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from frontier.kernel.cuckoo import CuckooFilter, build_sorted


def _hashes(n, seed=0):
    rng = np.random.RandomState(seed)
    h1 = rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    h2 = rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    return h1, h2


def test_insert_then_contains():
    h1, h2 = _hashes(5000)
    filt = build_sorted(h1, h2)
    assert filt.contains_many(h1, h2).all()


def test_delete_removes_membership():
    h1, h2 = _hashes(1000)
    filt = build_sorted(h1, h2)
    for i in range(0, 1000, 7):
        assert filt.delete(int(h1[i]), int(h2[i]))
    deleted = filt.contains_many(h1[::7], h2[::7])
    # deletion may leave a few phantom hits from fp collisions with
    # OTHER still-present keys, but the vast majority must be gone
    assert deleted.mean() < 0.05
    kept_mask = np.ones(1000, dtype=bool)
    kept_mask[::7] = False
    assert filt.contains_many(h1[kept_mask], h2[kept_mask]).all()


def test_fpp_bounded():
    h1, h2 = _hashes(5000, seed=1)
    filt = build_sorted(h1, h2)
    o1, o2 = _hashes(20000, seed=2)
    fpp = filt.contains_many(o1, o2).mean()
    assert fpp < 0.02  # 16-bit fp, 2x4 slots → ~0.1% expected


def test_build_deterministic_regardless_of_order():
    h1, h2 = _hashes(3000, seed=3)
    perm = np.random.RandomState(9).permutation(3000)
    a = build_sorted(h1, h2)
    b = build_sorted(h1[perm], h2[perm])
    assert a.to_bytes() == b.to_bytes()


def test_serialization_roundtrip():
    h1, h2 = _hashes(500, seed=4)
    filt = build_sorted(h1, h2)
    again = CuckooFilter.from_bytes(filt.to_bytes())
    assert again.contains_many(h1, h2).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**63 - 1), st.integers(0, 2**63 - 1))
def test_single_key_roundtrip(a, b):
    filt = CuckooFilter(16)
    assert filt.insert(a, b)
    assert filt.contains(a, b)
    assert filt.delete(a, b)
    assert not filt.contains(a, b)
