"""HyperLogLog sketch (operators/sketch.py): estimate accuracy, register
determinism, and the LSM store's fold-free cheap_count wiring."""

from pyspark.sql import functions as F


def test_hll_estimate_accuracy(spark):
    """±5% at b=10 (theory: 1.04/sqrt(1024) ~ 3.3% std error) on 20k
    distinct keys; duplicates must not move the estimate."""
    from webcollector_spark.operators.sketch import hll_estimate

    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("key")
    )
    est = hll_estimate(df, "key", b=10)
    assert abs(est - n) / n < 0.05, est
    dup = df.unionByName(df.limit(5000))
    assert hll_estimate(dup, "key", b=10) == est


def test_hll_small_range_linear_counting(spark):
    """Far below m the linear-counting correction makes small sets
    near-exact."""
    from webcollector_spark.operators.sketch import hll_estimate

    df = spark.range(37).select(F.col("id").cast("string").alias("key"))
    est = hll_estimate(df, "key", b=10)
    assert abs(est - 37) <= 2, est


def test_lsm_cheap_count_estimates_without_fold(spark, tmp_path):
    """track_new_links=False + estimate_counts=True: cheap_count answers
    from the raw union (no precedence fold) within HLL error; without
    the flag it stays None."""
    from webcollector_spark.crawler import seed_rows
    from webcollector_spark.store import LsmParquetFrontierStore

    urls = [f"http://h{i % 5}.test/p{i}" for i in range(3000)]
    seeds = seed_rows(spark, urls)

    s1 = LsmParquetFrontierStore(
        spark, str(tmp_path / "a"), track_new_links=False
    )
    s1.inject(seeds)
    assert s1.cheap_count() is None

    s2 = LsmParquetFrontierStore(
        spark, str(tmp_path / "b"), track_new_links=False, estimate_counts=True
    )
    s2.inject(seeds)
    # overlapping delta: updates for the first 1000 keys (same keys —
    # distinct count must not double-count across base and delta)
    s2.merge(seeds.limit(1000).withColumn("status", F.lit(5)), None)
    est = s2.cheap_count()
    assert est is not None
    assert abs(est - 3000) / 3000 < 0.08, est
