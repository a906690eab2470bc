"""Recrawl scheduling: SUCCESS rows re-enter the generate queue through
the standard merge path, stalest-first per host, with execute_count
(the retry budget) preserved."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.operators.generate import generate_per_host
from webcollector_spark.operators.recrawl import schedule_recrawl
from webcollector_spark.schema import STATUS_DB_SUCCESS, STATUS_DB_UNEXECUTED
from webcollector_spark.sources.requester import SyntheticRequester


def test_recrawl_reschedules_success_rows(spark, small_web):
    graph, corpus = small_web
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    crawler = RamCrawler(spark, req, config=CrawlerConfig())
    crawler.add_seed(fixtures.seeds_for(graph, 3))
    crawler.start(3)

    frontier = crawler.store.load()
    n_success = frontier.filter(F.col("status") == STATUS_DB_SUCCESS).count()
    counts_before = {
        r.key: r.execute_count
        for r in frontier.filter(F.col("status") == STATUS_DB_SUCCESS).collect()
    }
    assert n_success > 0

    now = 32_000_000_000_000  # far future epoch ms
    n = schedule_recrawl(crawler.store, now_ms=now, min_age_ms=1000)
    assert n == n_success

    after = crawler.store.load()
    rescheduled = {
        r.key: r
        for r in after.filter(
            (F.col("status") == STATUS_DB_UNEXECUTED)
            & (F.col("priority") >= 1.0)
        ).collect()
    }
    assert set(rescheduled) == set(counts_before)
    for k, r in rescheduled.items():
        assert r.execute_count == counts_before[k]  # retry budget preserved
        assert r.execute_time == now

    # the queue picks them up again (priority > 0 ranks behind fresh
    # priority-0 rows, but here everything pending is a recrawl)
    gen = generate_per_host(after, k_per_host=100)
    gen_keys = {r.key for r in gen.collect()}
    assert set(rescheduled) <= gen_keys


def test_recrawl_age_gate(spark, small_web):
    graph, corpus = small_web
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    crawler = RamCrawler(spark, req, config=CrawlerConfig())
    crawler.add_seed(fixtures.seeds_for(graph, 2))
    crawler.start(2)
    # nothing is old enough yet -> no-op
    import time

    now = int(time.time() * 1000)
    assert schedule_recrawl(crawler.store, now_ms=now, min_age_ms=10**12) == 0


def test_change_rate_intervals_branches(spark):
    """Fast-changing keys hit the min clamp, one-change keys land on
    the raw formula, never-changing keys hit the max clamp, and a
    single-observation key falls back to the clamped base."""
    from webcollector_spark.operators.recrawl import change_rate_intervals

    rows = []
    for r in range(4):
        rows += [
            ("hot", r, 100 + r),          # changes every revisit
            ("warm", r, 200 + (r >= 2)),  # one change
            ("cold", r, 300),             # never changes
        ]
    rows.append(("new", 0, 400))          # no change evidence yet
    log = spark.createDataFrame(rows, "key string, round int, phash long")
    out = {
        r["key"]: r
        for r in change_rate_intervals(
            log, base_ms=3_600_000, min_ms=3_000_000, max_ms=7_200_000
        ).collect()
    }
    assert out["hot"]["n_changes"] == 3
    assert out["hot"]["interval_ms"] == 3_000_000        # min clamp
    assert out["warm"]["interval_ms"] == 5_400_000       # 3.6M*3 DIV 2
    assert out["cold"]["interval_ms"] == 7_200_000       # max clamp
    assert out["new"]["n_obs"] == 1
    assert out["new"]["interval_ms"] == 3_600_000        # clamped base


def test_recrawl_candidates_per_key_intervals(spark):
    """With learned intervals, each key is due on its own clock: the
    hot page recrawls while the cold page (same age) does not; a key
    without history falls back to min_age_ms."""
    from webcollector_spark.operators.recrawl import recrawl_candidates
    from webcollector_spark.schema import FRONTIER_SCHEMA

    now = 10_000_000
    age = 5_000_000  # every row executed 5M ms ago

    def row(key):
        # FRONTIER_SCHEMA order: key url status execute_time
        # execute_count code location meta host depth priority
        return (key, key, STATUS_DB_SUCCESS, now - age, 1, 200,
                None, None, "h.test", 0, 0.0)

    frontier = spark.createDataFrame(
        [row("hot"), row("cold"), row("new")], FRONTIER_SCHEMA
    )
    intervals = spark.createDataFrame(
        [("hot", 3_000_000), ("cold", 7_200_000)],
        "key string, interval_ms long",
    )
    due = {
        r["key"]
        for r in recrawl_candidates(
            frontier, now, min_age_ms=4_000_000, intervals=intervals
        ).collect()
    }
    # hot: 5M >= 3M due; cold: 5M < 7.2M not due; new: fallback 4M due
    assert due == {"hot", "new"}
