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
