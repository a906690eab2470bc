"""Frontier diff + backlog: every change kind classified, null-side
columns correct, summary counts removed rows as 0 successes, and a real
two-depth crawl whose diff shows exactly the round's work."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import BreadthCrawler
from webcollector_spark.operators.delta import (
    delta_summary,
    frontier_backlog,
    frontier_delta,
)
from webcollector_spark.sources.requester import SyntheticRequester

_SCHEMA = "key string, status int, execute_count int"


def test_every_change_kind(spark):
    old = spark.createDataFrame(
        [("gone", 0, 0), ("flips", 0, 1), ("retried", 1, 1), ("same", 5, 2)],
        _SCHEMA,
    )
    new = spark.createDataFrame(
        [("flips", 5, 2), ("retried", 1, 2), ("same", 5, 2), ("fresh", 0, 0)],
        _SCHEMA,
    )
    d = {r.key: r for r in frontier_delta(old, new).collect()}
    assert d["fresh"].change == "added" and d["fresh"].old_status is None
    assert d["gone"].change == "removed" and d["gone"].new_status is None
    assert d["flips"].change == "status_changed"
    assert d["retried"].change == "refetched"
    assert d["same"].change == "unchanged"

    s = {r.change: r for r in delta_summary(frontier_delta(old, new)).collect()}
    assert s["removed"].n == 1 and s["removed"].n_now_success == 0
    assert s["status_changed"].n_now_success == 1
    assert s["unchanged"].n_now_success == 1


def test_backlog_aggregates(spark):
    f = spark.createDataFrame(
        [
            ("h1", "a", 0, 0, 100),
            ("h1", "b", 0, 11, 200),  # exhausted (> max 10)
            ("h1", "c", 5, 1, 300),
            ("h1", "d", 1, 3, 50),  # failed, tried, still pending
        ],
        "host string, key string, status int, execute_count int, execute_time long",
    )
    got = frontier_backlog(f, max_execute_count=10).collect()[0]
    assert got.n_pending == 2  # a + d (b exhausted, c success)
    assert got.n_success == 1
    assert got.n_failed_tried == 2  # b + d tried and not success
    assert got.n_exhausted == 1
    assert got.oldest_pending_ms == 50
    assert got.max_tries == 11


def test_crawl_round_diff_end_to_end(spark, tmp_path):
    corpus = fixtures.make_corpus(40)
    graph = fixtures.make_site_graph(40, n_hosts=4, out_degree=3)
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    path = str(tmp_path / "db")

    c1 = BreadthCrawler(spark, req, crawl_path=path, config=CrawlerConfig())
    c1.add_seed(fixtures.seeds_for(graph, 3))
    c1.start(1)
    snap1 = c1.frontier().toPandas()

    c2 = BreadthCrawler(
        spark, req, crawl_path=path, config=CrawlerConfig(resumable=True)
    )
    c2.start(2)
    snap2 = c2.frontier().toPandas()

    d = frontier_delta(
        spark.createDataFrame(snap1), spark.createDataFrame(snap2)
    )
    counts = {r.change: r.n for r in delta_summary(d).collect()}
    # a BFS round only adds links and executes pending rows — nothing
    # ever leaves the frontier
    assert counts.get("removed", 0) == 0
    assert counts.get("added", 0) > 0  # round-2 discoveries
    assert counts.get("status_changed", 0) > 0  # round-1 links now fetched
    total = sum(counts.values())
    assert total == len(snap2)
