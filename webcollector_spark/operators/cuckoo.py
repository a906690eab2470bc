"""Cuckoo filter — the deletable alternative to the bloom URL-seen
filter (north_rule: "bloom/cuckoo URL-seen"). Same distributed build
pattern as operators/seen.py: per-partition partial filters built in
one Arrow pass, merged on the driver, broadcast back for pre-pruning.

Why a cuckoo filter at crawl scale: unlike a bloom it supports DELETE
(needed when frontier rows are retired/re-crawled, e.g. recrawl
scheduling evicts stale keys) and gets better space at low fpp
(~7 bits/key at 3% with 2x4 buckets vs ~10 bits for bloom at 1%).

Standard construction (Fan et al., CoNLL'14 "Cuckoo Filter:
Practically Better Than Bloom"): 4-slot buckets, 16-bit fingerprints,
partial-key cuckoo hashing — alt bucket = bucket XOR hash(fingerprint).
Vectorized numpy inserts/lookups; deterministic hashing via pandas'
keyed SipHash so executor-built partials agree with driver merges.

Merge caveat (documented, enforced): cuckoo filters OR-merge only when
built over DISJOINT key sets into the same table geometry — partition
builds satisfy this (each key lives in exactly one partition). Merge
inserts partials' occupied slots; overflow during merge falls back to
the eviction path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY_BUCKET = "wc-cuckoo-bucket!"[:16]
_HASH_KEY_FP = "wc-cuckoo-fingerp"[:16]
_SLOTS = 4
_MAX_KICKS = 500


def _hash_bucket(keys: pd.Series, n_buckets: int) -> np.ndarray:
    return (
        pd.util.hash_array(keys.to_numpy(dtype=object), hash_key=_HASH_KEY_BUCKET)
        % n_buckets
    ).astype(np.int64)


def _fingerprints(keys: pd.Series) -> np.ndarray:
    fp = pd.util.hash_array(
        keys.to_numpy(dtype=object), hash_key=_HASH_KEY_FP
    ).astype(np.uint64) & np.uint64(0xFFFF)
    # fingerprint 0 means "empty slot"; remap to 1
    fp = fp.astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    # partial-key cuckoo: alt = bucket XOR H(fp)
    h = pd.util.hash_array(fp.astype(np.uint64), hash_key=_HASH_KEY_BUCKET)
    return (bucket.astype(np.uint64) ^ h) % np.uint64(n_buckets)


class CuckooFilter:
    def __init__(self, capacity: int):
        # 4-slot buckets at ~95% target load
        n = max(8, int(capacity / (_SLOTS * 0.95)))
        self.n_buckets = 1 << (n - 1).bit_length()  # power of two
        self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)
        self.size = 0

    # -- single-item path (eviction loop) ------------------------------
    def _insert_one(self, bucket: int, fp: int) -> bool:
        rng_state = (bucket * 0x9E3779B1 + fp) & 0xFFFFFFFF  # deterministic
        b, f = bucket, fp
        for _ in range(_MAX_KICKS):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                self.size += 1
                return True
            # evict a deterministic pseudo-random slot
            rng_state = (rng_state * 1103515245 + 12345) & 0xFFFFFFFF
            slot = rng_state % _SLOTS
            f, row[slot] = int(row[slot]), f
            b = int(
                _alt_bucket(
                    np.array([b], dtype=np.int64),
                    np.array([f], dtype=np.uint16),
                    self.n_buckets,
                )[0]
            )
        return False  # table too full

    # -- vectorized bulk ops -------------------------------------------
    def add_series(self, keys: pd.Series) -> int:
        """Insert all keys; returns number that failed (0 when sized
        correctly). Duplicates of an already-stored fingerprint in the
        same bucket are stored again only if slots remain — lookups are
        unaffected (set semantics)."""
        b1 = _hash_bucket(keys.astype(str), self.n_buckets)
        fp = _fingerprints(keys.astype(str))
        failed = 0
        for b, f in zip(b1.tolist(), fp.tolist()):
            row = self.table[b]
            if (row == f).any():
                continue  # already present
            b2 = int(
                _alt_bucket(
                    np.array([b], dtype=np.int64),
                    np.array([f], dtype=np.uint16),
                    self.n_buckets,
                )[0]
            )
            if (self.table[b2] == f).any():
                continue
            if not self._insert_one(b, f):
                failed += 1
        return failed

    def maybe_contains(self, keys: pd.Series) -> np.ndarray:
        b1 = _hash_bucket(keys.astype(str), self.n_buckets)
        fp = _fingerprints(keys.astype(str))
        b2 = _alt_bucket(b1, fp, self.n_buckets).astype(np.int64)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_series(self, keys: pd.Series) -> int:
        """Remove keys (one stored fingerprint copy each); returns how
        many were found and removed — the capability blooms lack."""
        b1 = _hash_bucket(keys.astype(str), self.n_buckets)
        fp = _fingerprints(keys.astype(str))
        b2 = _alt_bucket(b1, fp, self.n_buckets).astype(np.int64)
        removed = 0
        for a, b, f in zip(b1.tolist(), b2.tolist(), fp.tolist()):
            for bucket in (a, b):
                row = self.table[bucket]
                idx = np.nonzero(row == f)[0]
                if len(idx):
                    row[idx[0]] = 0
                    self.size -= 1
                    removed += 1
                    break
        return removed

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Fold another filter built with the same geometry over a
        disjoint key set (the per-partition build contract)."""
        assert self.n_buckets == other.n_buckets
        occupied = np.nonzero(other.table)
        for b, s in zip(*occupied):
            f = int(other.table[b, s])
            row = self.table[b]
            if (row == f).any():
                continue
            self._insert_one(int(b), f)
        return self


def build_cuckoo(keys_df, key_col: str = "key", capacity: int = 1_000_000):
    """Distributed build: per-partition partial tables, driver merge —
    the treeAggregate pattern (same shape as seen.build_bloom)."""
    proto = CuckooFilter(capacity)
    n_buckets = proto.n_buckets

    def partial(batches):
        c = CuckooFilter(capacity)
        for pdf in batches:
            if len(pdf):
                c.add_series(pdf[key_col].astype(str))
        yield pd.DataFrame({"table": [c.table.tobytes()]})

    parts = (
        keys_df.select(key_col).mapInPandas(partial, schema="table binary").collect()
    )
    out = CuckooFilter(capacity)
    for row in parts:
        other = CuckooFilter(capacity)
        other.table = np.frombuffer(row["table"], dtype=np.uint16).reshape(
            n_buckets, _SLOTS
        ).copy()
        out.merge(other)
    return out
