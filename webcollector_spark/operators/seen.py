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
broadcast. `ShardedBloom` / `build_sharded_bloom` / `seen_filter_sharded`
below implement the production layout: S independent bitsets sharded by
key hash, each built by the partitions that own its key range after one
repartition on the shard id; correctness is identical because a key's
shard assignment is a pure function of the key (verified equal to the
exact anti-join in test_seen.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# pandas' SipHash takes EXACTLY 16-byte keys; these must be 16 bytes
# pre-truncation and pairwise distinct AFTER any truncation (a 17-byte
# key silently truncated to 16 once collapsed h1 and h2 into the same
# hash, degenerating double hashing to k copies of one probe — measured
# 2.6% fpp at a configured 1%).
_KEY1 = b"wc-spark-blum-1!"
_KEY2 = b"wc-spark-blum-2!"
_KEY3 = b"wc-spark-shard3!"  # shard routing — independent of bit probes
assert len(_KEY1) == len(_KEY2) == len(_KEY3) == 16 and len({_KEY1, _KEY2, _KEY3}) == 3


def _hash2(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = keys.to_numpy(dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_KEY1.decode("latin1"))
    h2 = pd.util.hash_array(arr, hash_key=_KEY2.decode("latin1"))
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


# ---------------------------------------------------------------------------
# Sharded bloom — the 10^10-key layout. One bitset at 1% fpp over 10^10
# keys is ~12 GB (not broadcastable); S independent bitsets of the same
# total size are, shard-by-shard, each its OWN broadcast. A key's shard
# is a pure function of the key under a THIRD SipHash key, independent
# of the h1/h2 bit probes (shard = h1 % S would correlate: m is a
# multiple of 64, so for power-of-two S the shard residue survives into
# h1 % m and concentrates probe-0 bits at S-fold density — measured
# 1.45% fpp vs 1.0% configured before the fix). Build: route keys to
# their shard partition (one shuffle of just the key column), fold each
# partition's resident shards, OR-merge per shard on the driver
# (S x m/S bytes total — the same volume as the single bitset, arriving
# pre-partitioned). Probe: candidates repartition by shard and each
# task deserializes ONLY its shard's broadcast (Broadcast.value is
# per-handle lazy), so no executor ever materializes the full 12 GB.


class ShardedBloom:
    def __init__(self, capacity: int, fpp: float = 0.01, shards: int = 16):
        self.shards = shards
        self.blooms = [
            Bloom(max(64, capacity // shards), fpp) for _ in range(shards)
        ]

    @staticmethod
    def shard_of(keys: pd.Series, shards: int) -> np.ndarray:
        h3 = pd.util.hash_array(
            keys.to_numpy(dtype=object), hash_key=_KEY3.decode("latin1")
        )
        return (h3 % np.uint64(shards)).astype(np.int64)

    def add_series(self, keys: pd.Series) -> None:
        sh = self.shard_of(keys, self.shards)
        for s in np.unique(sh):
            self.blooms[int(s)].add_series(keys[sh == s])

    def maybe_contains(self, keys: pd.Series) -> np.ndarray:
        sh = self.shard_of(keys, self.shards)
        out = np.zeros(len(keys), dtype=bool)
        for s in np.unique(sh):
            mask = sh == s
            out[mask] = self.blooms[int(s)].maybe_contains(keys[mask])
        return out


def build_sharded_bloom(
    keys_df: DataFrame,
    key_col: str = "key",
    capacity: int = 1_000_000,
    fpp: float = 0.01,
    shards: int = 16,
) -> ShardedBloom:
    """Distributed sharded build: keys shuffle ONCE to their shard's
    partition, each partition folds its resident shards, the driver
    OR-merges per shard (most shards arrive as a single partial)."""

    def shard_udf(keys: pd.Series) -> pd.Series:
        return pd.Series(ShardedBloom.shard_of(keys.astype(str), shards))

    shard_col = F.pandas_udf(shard_udf, T.LongType())(F.col(key_col))
    routed = (
        keys_df.select(F.col(key_col).cast("string").alias(key_col))
        .withColumn("__shard", shard_col)
        .repartition(shards, "__shard")
    )
    cap = max(64, capacity // shards)

    def partial(batches):
        local: dict[int, Bloom] = {}
        for pdf in batches:
            for s, grp in pdf.groupby("__shard"):
                s = int(s)
                if s not in local:  # setdefault would alloc+zero a
                    local[s] = Bloom(cap, fpp)  # bitset per batch
                local[s].add_series(grp[key_col].astype(str))
        for s, b in local.items():
            yield pd.DataFrame({"shard": [s], "bits": [b.bits.tobytes()]})

    out = ShardedBloom(capacity, fpp, shards)
    for row in routed.mapInPandas(partial, schema="shard long, bits binary").collect():
        out.blooms[int(row["shard"])].bits |= np.frombuffer(
            row["bits"], dtype=np.uint8
        )
    return out


def seen_filter_sharded(
    candidates: DataFrame,
    seen_keys: DataFrame,
    key_col: str = "key",
    sharded: ShardedBloom | None = None,
    co_partition: bool = False,
) -> DataFrame:
    """`seen_filter` with a sharded bloom: identical semantics (no false
    negatives — bloom-positives still go through the exact anti-join).

    Each shard ships as its OWN broadcast; the probe UDF deserializes
    only the shards present in its batch (Broadcast.value is lazy per
    handle). `co_partition=True` additionally range-repartitions
    candidates by shard id so a task holds one (or a few contiguous)
    shards — that is what bounds per-executor resident bloom memory
    near m/S instead of m, the property that makes a 12 GB aggregate
    bitset workable on a cluster.
    It costs one extra shuffle of the candidate rows, so enable it only
    when the aggregate bitset actually exceeds executor memory; on a
    single box (or small bitsets) the default leaves candidates where
    they are and lets each worker lazily load the shards it meets."""
    if sharded is None:
        return candidates.join(seen_keys.select(key_col), key_col, "left_anti")

    spark = candidates.sparkSession
    m, k, shards = sharded.blooms[0].m, sharded.blooms[0].k, sharded.shards
    bcs = [spark.sparkContext.broadcast(b.bits.tobytes()) for b in sharded.blooms]

    @F.pandas_udf(T.LongType())
    def shard_id(keys: pd.Series) -> pd.Series:
        return pd.Series(ShardedBloom.shard_of(keys.astype(str), shards))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(keys: pd.Series) -> pd.Series:
        ks = keys.astype(str)
        sh = ShardedBloom.shard_of(ks, shards)
        out = np.zeros(len(ks), dtype=bool)
        for s in np.unique(sh):
            b = Bloom.__new__(Bloom)
            b.bits = np.frombuffer(bcs[int(s)].value, dtype=np.uint8)
            b.m, b.k = m, k
            mask = sh == s
            out[mask] = b.maybe_contains(ks[mask])
        return pd.Series(out)

    probe = candidates
    drop = ["__maybe"]
    if co_partition:
        # repartitionByRange, NOT hash repartition: hash partitioning of
        # S distinct shard ids scatters several shards into one task and
        # leaves ~1/e of partitions empty (murmur3 % N is not identity);
        # range partitioning of the integer ids gives each task one (or
        # a few contiguous) shards, which is what bounds resident bloom
        # memory near m/S per task
        probe = probe.withColumn(
            "__shard", shard_id(F.col(key_col))
        ).repartitionByRange(shards, "__shard")
        drop.append("__shard")
    flagged = probe.withColumn("__maybe", maybe_seen(F.col(key_col)))
    fresh = flagged.filter(~F.col("__maybe")).drop(*drop)
    suspect = (
        flagged.filter(F.col("__maybe"))
        .drop(*drop)
        .join(seen_keys.select(key_col), key_col, "left_anti")
    )
    return fresh.unionByName(suspect)
