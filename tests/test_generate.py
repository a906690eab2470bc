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


def test_per_host_fit_clamp(spark):
    """fit_k_by_host: a host's effective budget is min(k, fit_k) —
    clamped host keeps its TOP rows, a fit above k is a no-op, and a
    host absent from the table gets the full k. Salting must not
    change any of that (phase 1 keeps the unclamped superset)."""
    df = _frontier(spark)
    fit = spark.createDataFrame(
        [("h000.test", 1), ("h001.test", 99)], "host string, __fit_k long"
    )
    # the row the clamp must keep: h000's true #1 by (priority, depth, key)
    plain = generate_per_host(df, k_per_host=3, salt_buckets=1).collect()
    h0_top = min(
        (r.key for r in plain if r.host == "h000.test"),
    )
    for salt in (1, 4):
        out = generate_per_host(
            df, k_per_host=3, salt_buckets=salt, fit_k_by_host=fit
        )
        rows = out.collect()
        counts = {}
        for r in rows:
            counts[r.host] = counts.get(r.host, 0) + 1
        assert counts["h000.test"] == 1  # clamped below k
        assert counts["h001.test"] == 3  # fit above k -> k wins
        assert counts["h002.test"] == 3  # absent -> full k
        assert [r.key for r in rows if r.host == "h000.test"] == [h0_top]
        assert "__fit_k" not in out.columns


def test_host_budget_plan(spark):
    """host_budget_plan: picks cap at k, drain = picks x delay, the
    binding row IS the global floor, fit_k is exact integer division,
    and a missing crawl_delay_ms column falls back to the default."""
    from webcollector_spark.operators.generate import host_budget_plan

    rows = (
        [("a.test", 500)] * 12      # picks 8 -> drain 4.0 s  (binding)
        + [("b.test", 100)] * 3     # picks 3 -> drain 0.3 s
        + [("c.test", None)] * 9    # default 200 -> picks 8 -> 1.6 s
    )
    cand = spark.createDataFrame(rows, "host string, crawl_delay_ms long")
    plan = {
        r.host: r
        for r in host_budget_plan(
            cand, per_host_top_k=8, default_delay_ms=200, target_round_ms=3000
        ).collect()
    }
    assert plan["a.test"].pending == 12 and plan["a.test"].picks == 8
    assert plan["a.test"].drain_sec == 4.0 and plan["a.test"].binding
    assert plan["b.test"].picks == 3 and plan["b.test"].drain_sec == 0.3
    assert not plan["b.test"].binding
    assert plan["c.test"].delay_ms == 200 and plan["c.test"].drain_sec == 1.6
    assert all(r.round_floor_sec == 4.0 for r in plan.values())
    # fit_k: 3000 DIV delay — the k that keeps each host under target
    assert plan["a.test"].fit_k == 6
    assert plan["b.test"].fit_k == 30
    assert plan["c.test"].fit_k == 15

    # no crawl_delay_ms column at all -> every host priced at default
    bare = host_budget_plan(cand.select("host"), per_host_top_k=8)
    assert {r.delay_ms for r in bare.collect()} == {200}
