"""Skew-defended within-group self-pairing.

The within-cell pair generators (SemDeDup cells, LSH buckets) co-locate
each group on one reducer via the equi-join on the group key — O(n_g^2)
work on ONE task per group. Bounded-average recipes (K ∝ n) keep the
*average* group small, but a real distribution has dense modes: one hot
group becomes one straggler task (VERDICT r4 item 5, SemDeDup).

`salted_self_pairs` makes the pair generation exact AND bounded per
task: groups above `split_target` rows are hash-split into S =
ceil(n_g / split_target) sub-blocks, and the classic triangular
block-pair replication covers every unordered pair exactly once —

* a row with salt r joins the LEFT side under keys (u=r, v=j) for
  j in r..S-1 (the cases where its salt is the pair minimum), and
* the RIGHT side under keys (u=j, v=r) for j in 0..r (salt maximum),

so an unordered pair with salts (r_a <= r_b) meets at exactly the key
(u=r_a, v=r_b); equal-salt pairs surface in both orders and the
id_a < id_b filter keeps one. Per-task work drops from O(n_g^2) to
O(split_target^2) while total pair output is IDENTICAL to the naive
self-join (property-tested in tests/test_pairs.py, and the SemDeDup
registry row still hash-matches its DuckDB oracle).

Cost accounting: every row is replicated S+1 times across the two
sides (the naive a/b self-join already materializes 2 copies), and the
split map broadcast holds ONLY the oversized groups — a handful of hot
keys by construction, never O(groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_self_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    payload_cols: list[str],
    split_target: int = 2048,
    max_splits: int = 64,
) -> DataFrame:
    """All unordered within-group pairs ({id}_a < {id}_b) of `df` rows.

    Output columns: group_col, {id_col}_a, {id_col}_b, and {p}_a/{p}_b
    for each payload column. Groups larger than `split_target` are
    salt-split (capped at `max_splits` sub-blocks) so no single task
    ever pairs more than ~split_target rows against ~split_target."""
    hot = (
        df.groupBy(group_col)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > split_target)
        .select(
            group_col,
            F.least(
                F.lit(max_splits),
                F.ceil(F.col("_n") / F.lit(split_target)),
            )
            .cast("int")
            .alias("_S"),
        )
    )
    salted = (
        df.join(F.broadcast(hot), group_col, "left")
        .withColumn("_S", F.coalesce(F.col("_S"), F.lit(1)))
        .withColumn(
            "_r",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("_S")).cast("int"),
        )
    )
    left = salted.select(
        group_col,
        F.col("_r").alias("_u"),
        F.explode(F.sequence(F.col("_r"), F.col("_S") - 1)).alias("_v"),
        F.col(id_col).alias(f"{id_col}_a"),
        *[F.col(p).alias(f"{p}_a") for p in payload_cols],
    )
    right = salted.select(
        group_col,
        F.explode(F.sequence(F.lit(0), F.col("_r"))).alias("_u"),
        F.col("_r").alias("_v"),
        F.col(id_col).alias(f"{id_col}_b"),
        *[F.col(p).alias(f"{p}_b") for p in payload_cols],
    )
    a, b = f"{id_col}_a", f"{id_col}_b"
    joined = left.join(right, [group_col, "_u", "_v"])
    # same-block pairs (u == v) surface in BOTH orientations — keep
    # id_a < id_b to dedup. Cross-block pairs surface exactly once,
    # with the MIN-SALT row on the left regardless of id order — keep
    # id_a != id_b and canonicalize the orientation below (a plain
    # id_a < id_b filter here silently DROPS the half whose min-salt
    # row has the larger id).
    keep = F.when(
        F.col("_u") == F.col("_v"), F.col(a) < F.col(b)
    ).otherwise(F.col(a) != F.col(b))
    swap = F.col(a) > F.col(b)
    sel = [
        F.col(group_col),
        F.when(swap, F.col(b)).otherwise(F.col(a)).alias(a),
        F.when(swap, F.col(a)).otherwise(F.col(b)).alias(b),
    ]
    for p in payload_cols:
        pa, pb = f"{p}_a", f"{p}_b"
        sel.append(F.when(swap, F.col(pb)).otherwise(F.col(pa)).alias(pa))
        sel.append(F.when(swap, F.col(pa)).otherwise(F.col(pb)).alias(pb))
    return joined.filter(keep).select(*sel)
