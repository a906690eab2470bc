"""LsmParquetFrontierStore — merge-on-read frontier.

Pins: (1) state equivalence with RamFrontierStore over multi-round
segment sequences (incl. link-first-wins across rounds and fetch
last-wins across rounds), (2) O(round) delta writes with compaction
folding to an identical state, (3) crash safety — an uncommitted delta
dir (written but not in manifest.json) is invisible on resume, and
(4) resume continues from the committed rounds manifest.
"""

from __future__ import annotations

import json
import os

import pytest

from webcollector_spark.schema import FRONTIER_SCHEMA
from webcollector_spark.store import LsmParquetFrontierStore, RamFrontierStore


def row(key, status=0, count=0, etime=None, depth=0, url=None):
    return (
        key, url or f"http://h.test/{key}", status, etime, count, -1, None,
        None, "h.test", depth, 0.0,
    )


def df(spark, rows):
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def state(store):
    return {
        r.key: (r.status, r.execute_count, r.depth)
        for r in store.load().collect()
    }


ROUNDS = [
    # (fetched rows, link rows) per round
    (
        [row("a", 5, 1, 1000)],
        [row("b", depth=1), row("c", depth=1)],
    ),
    (
        [row("b", 1, 1, 2000, depth=1)],
        [row("c", depth=2), row("d", depth=2)],  # c re-discovered deeper -> keeps depth 1
    ),
    (
        [row("b", 5, 2, 3000, depth=1), row("c", 5, 1, 3000, depth=1)],
        [row("a", depth=3)],  # re-discovery of a fetched key loses
    ),
]


@pytest.fixture()
def pair(spark, tmp_path):
    lsm = LsmParquetFrontierStore(spark, str(tmp_path / "lsm"), compact_every=100)
    ram = RamFrontierStore(spark)
    return lsm, ram


def _drive(spark, lsm, ram, rounds=ROUNDS):
    seeds = df(spark, [row("a")])
    lsm.inject(seeds)
    ram.inject(df(spark, [row("a")]))
    for fetched, links in rounds:
        lsm.merge(df(spark, fetched), df(spark, links))
        ram.merge(df(spark, fetched), df(spark, links))


def test_equivalence_with_ram_store(spark, pair):
    lsm, ram = pair
    _drive(spark, lsm, ram)
    assert state(lsm) == state(ram)
    # spot-pin the cross-round rules directly
    s = state(lsm)
    assert s["a"] == (5, 1, 0)   # later link re-discovery lost
    assert s["b"] == (5, 2, 1)   # latest fetch won over older FAILED fetch
    assert s["c"] == (5, 1, 1)   # first-wins kept depth 1, then fetched
    assert s["d"] == (0, 0, 2)


def test_delta_layout_and_compaction(spark, tmp_path):
    lsm = LsmParquetFrontierStore(spark, str(tmp_path / "l"), compact_every=3)
    ram = RamFrontierStore(spark)
    _drive(spark, lsm, ram)
    # inject + 3 merges with compact_every=3 -> at least one compaction
    # happened; state identical and layout holds base + few deltas
    assert state(lsm) == state(ram)
    names = set(os.listdir(lsm.path))
    assert any(n.startswith("base_v") for n in names)
    assert len([n for n in names if n.startswith("delta_")]) < 3
    # counts memoized per commit
    assert lsm.count() == len(state(ram))


def test_uncommitted_delta_invisible_on_resume(spark, tmp_path):
    path = str(tmp_path / "l")
    lsm = LsmParquetFrontierStore(spark, path, compact_every=100)
    lsm.inject(df(spark, [row("a"), row("b")]))
    committed = state(lsm)
    # simulate a crash mid-round: delta dir written, manifest NOT updated
    orphan = os.path.join(path, "delta_000099")
    df(spark, [row("zzz", 5, 1, 1)]).withColumn(
        "__src", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(2)
    ).write.parquet(orphan)
    again = LsmParquetFrontierStore(spark, path, resumable=True)
    assert state(again) == committed  # orphan invisible
    m = json.load(open(os.path.join(path, "manifest.json")))
    assert 99 not in m["deltas"]


def test_resume_continues_rounds(spark, tmp_path):
    path = str(tmp_path / "l")
    lsm = LsmParquetFrontierStore(spark, path)
    lsm.inject(df(spark, [row("a")]))
    lsm.merge(df(spark, [row("a", 5, 1, 1000)]), df(spark, [row("b", depth=1)]))
    lsm.log_round(round=0, generated=1, fetched=1, failed=0, new_links=1, wall_ms=1)
    before = state(lsm)

    again = LsmParquetFrontierStore(spark, path, resumable=True)
    assert again.last_round() == 0
    assert state(again) == before
    # a further round applies on top of the resumed state
    again.merge(df(spark, [row("b", 5, 1, 2000, depth=1)]), None)
    assert state(again)["b"] == (5, 1, 1)


def test_crawler_with_lsm_backend(spark, small_web, tmp_path):
    """End-to-end: BreadthCrawler(store=LSM) equals the RAM backend on
    the same crawl (the DBManager plugin seam)."""
    from webcollector_spark import fixtures
    from webcollector_spark.config import CrawlerConfig
    from webcollector_spark.crawler import BreadthCrawler, RamCrawler
    from webcollector_spark.sources.requester import SyntheticRequester

    graph, corpus = small_web
    seeds = fixtures.seeds_for(graph, 3)

    def req():
        return SyntheticRequester(
            graph.to_dict("records"), corpus.to_dict("records")
        )

    cfg = CrawlerConfig(bloom_capacity=10_000)
    ram = RamCrawler(spark, req(), config=cfg)
    ram.add_seed(list(seeds))
    ram.start(3)

    lsm_store = LsmParquetFrontierStore(spark, str(tmp_path / "db"), compact_every=2)
    lsm = BreadthCrawler(spark, req(), config=cfg, store=lsm_store)
    lsm.add_seed(list(seeds))
    lsm.start(3)

    assert state(lsm.store) == state(ram.store)
