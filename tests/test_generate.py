"""O2 generate semantics: sorted-key order, topN truncation, strict-`>`
maxExecuteCount boundary (Generator.java:53-78), and salted per-host
top-k equivalence (salting must not change the selected set)."""

from pyspark.sql import functions as F

from webcollector_spark.crawler import seed_rows
from webcollector_spark.operators.generate import generate, generate_per_host
from webcollector_spark.schema import STATUS_DB_SUCCESS


def _frontier(spark):
    urls = [f"http://h{i % 3:03d}.test/p/{i:03d}" for i in range(30)]
    df = seed_rows(spark, urls)
    return df.withColumn(
        "status",
        F.when(F.col("url").endswith("7"), F.lit(STATUS_DB_SUCCESS)).otherwise(
            F.col("status")
        ),
    ).withColumn(
        "execute_count",
        F.when(F.col("url").endswith("3"), F.lit(11)).otherwise(F.col("execute_count")),
    )


def test_generate_order_topn_and_filters(spark):
    df = _frontier(spark)
    out = generate(df, top_n=5, max_execute_count=10).collect()
    keys = [r.key for r in out]
    assert keys == sorted(keys) and len(keys) == 5
    # filtered: no SUCCESS, no execute_count > 10
    all_out = generate(df, top_n=0, max_execute_count=10).collect()
    assert all(r.status != STATUS_DB_SUCCESS for r in all_out)
    assert all(r.execute_count <= 10 for r in all_out)
    # exactly the sorted prefix of the full filtered set
    assert keys == sorted(r.key for r in all_out)[:5]


def test_strict_gt_boundary(spark):
    """execute_count == max is STILL generated (strict `>` drop,
    Generator.java:65) — a task can run max+1 times total."""
    df = seed_rows(spark, ["http://a.test/x"]).withColumn(
        "execute_count", F.lit(10)
    )
    assert generate(df, max_execute_count=10).count() == 1
    assert generate(df.withColumn("execute_count", F.lit(11)),
                    max_execute_count=10).count() == 0


def test_per_host_topk_salting_invariant(spark):
    df = _frontier(spark)
    plain = generate_per_host(df, k_per_host=3, salt_buckets=1)
    salted = generate_per_host(df, k_per_host=3, salt_buckets=8)
    assert {r.key for r in plain.collect()} == {r.key for r in salted.collect()}
    # per-host cap respected
    counts = salted.groupBy("host").count().collect()
    assert all(r["count"] <= 3 for r in counts)


def test_per_host_topk_ordering(spark):
    df = _frontier(spark)
    out = generate_per_host(df, k_per_host=2, salt_buckets=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r.key)
    full = generate(df).collect()
    want = {}
    for r in sorted(full, key=lambda r: (r.priority, r.depth, r.key)):
        want.setdefault(r.host, []).append(r.key)
    for h, keys in by_host.items():
        assert sorted(keys) == sorted(want[h][:2])
