"""Cuckoo filter tests: membership, false-positive bound, delete
support, and the distributed (per-partition build + merge) path
agreeing with a single-process build."""

from __future__ import annotations

import pandas as pd

from webcollector_spark.operators.cuckoo import CuckooFilter, build_cuckoo


def keys(prefix: str, n: int) -> pd.Series:
    return pd.Series([f"{prefix}{i}" for i in range(n)])


class TestLocal:
    def test_no_false_negatives(self):
        c = CuckooFilter(capacity=5000)
        inserted = keys("http://h.test/p/", 4000)
        assert c.add_series(inserted) == 0
        assert c.maybe_contains(inserted).all()

    def test_false_positive_rate(self):
        c = CuckooFilter(capacity=5000)
        c.add_series(keys("in", 4000))
        fp = c.maybe_contains(keys("out", 20000)).mean()
        assert fp < 0.01  # 16-bit fingerprints: ~2*4/2^16 ~ 0.012%

    def test_delete(self):
        c = CuckooFilter(capacity=1000)
        ks = keys("k", 500)
        c.add_series(ks)
        removed = c.delete_series(ks[:100])
        assert removed == 100
        assert not c.maybe_contains(ks[:100]).any()
        assert c.maybe_contains(ks[100:]).all()

    def test_dedup_insert(self):
        c = CuckooFilter(capacity=1000)
        ks = keys("k", 200)
        c.add_series(ks)
        size_before = c.size
        c.add_series(ks)  # re-insert: set semantics, size unchanged
        assert c.size == size_before


class TestDistributed:
    def test_build_matches_local(self, spark):
        ks = [f"http://h{i % 7}.test/p/{i}" for i in range(3000)]
        df = spark.createDataFrame([(k,) for k in ks], "key string").repartition(6)
        dist = build_cuckoo(df, "key", capacity=5000)
        assert dist.maybe_contains(pd.Series(ks)).all()
        fp = dist.maybe_contains(keys("absent", 20000)).mean()
        assert fp < 0.01
