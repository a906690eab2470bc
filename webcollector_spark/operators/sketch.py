"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), built from
JVM expressions only — md5 -> 60-bit hash -> (bucket, leading-zero rank)
-> per-bucket max. One scan, no Python, O(2^b) state.

Why it exists here: the LSM frontier store cannot answer count() without
a full merge-on-read precedence fold, so with new-links tracking off it
reports "unknown" and the crawler must skip the bloom-sizing gate. The
number those gates actually need is the DISTINCT KEY count, and that is
computable over the RAW base∪delta union without resolving precedence
(every delta row's key exists in the final state) — exactly what a
one-pass HLL gives at ±~1.04/sqrt(2^b) relative error.

The register computation is integer-exact (bit ops + binary-string
position, no floats), so the registry twin `hll_registers` value-checks
it against DuckDB bit-for-bit; only the final estimate (a tiny
driver-side fold over <= 2^b register rows) uses floats.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_W = 50  # rank width: 60-bit hash minus up to 10 bucket bits


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(df: DataFrame, col: str = "key", b: int = 10) -> DataFrame:
    """Occupied HLL registers: (bucket, rho_max). bucket = low b hash
    bits; rho = 1-based position of the first 1-bit in the remaining
    50 bits (W+1 when they are all zero). Integer-exact end to end."""
    m = 1 << b
    h = _hash60(F.col(col))
    bucket = h.bitwiseAND(m - 1)
    w = F.shiftright(h, b)
    bits = F.lpad(F.bin(w), _W, "0")
    rho = (
        F.when(w == 0, F.lit(_W + 1)).otherwise(F.instr(bits, "1")).cast("int")
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
