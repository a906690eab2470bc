"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), built from
JVM expressions only — md5 -> 60-bit hash -> (bucket, leading-zero rank)
-> per-bucket max. One scan, no Python, O(2^b) state.

Why it exists: the register computation is integer-exact (bit ops +
binary-string position, no floats), so the registry twin
`hll_registers` value-checks the full sketch pipeline against DuckDB
bit-for-bit — something Spark's built-in `approx_count_distinct`
(HLL++, opaque binary state) cannot offer an oracle for. Production
call sites that only need the NUMBER — e.g. the LSM store's fold-free
frontier-size estimate (store.py `cheap_count`, `estimate_counts=True`)
— use the built-in aggregate instead (executor-side merge, no
driver-side register fold); this module is the transparent,
cross-engine-checkable formulation of the same estimator at
±~1.04/sqrt(2^b) relative error.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(df: DataFrame, col: str = "key", b: int = 10) -> DataFrame:
    """Occupied HLL registers: (bucket, rho_max). bucket = low b hash
    bits; rho = 1-based position of the first 1-bit in the remaining
    60-b bits (width+1 when they are all zero). Integer-exact end to
    end; the rank width tracks b — a fixed width would inflate or
    deflate every rho as soon as b moved off the default."""
    m = 1 << b
    width = 60 - b
    h = _hash60(F.col(col))
    bucket = h.bitwiseAND(m - 1)
    w = F.shiftright(h, b)
    bits = F.lpad(F.bin(w), width, "0")
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.instr(bits, "1"))
        .cast("int")
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate(df: DataFrame, col: str = "key", b: int = 10) -> int:
    """Distinct-count estimate from the registers (standard HLL with the
    small-range linear-counting correction; the 2^60 hash space makes
    large-range collisions negligible at crawl scales)."""
    m = 1 << b
    regs = {r["bucket"]: r["rho_max"] for r in hll_registers(df, col, b).collect()}
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else 0.709
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    e = alpha * m * m / s
    zeros = m - len(regs)
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return int(round(e))
