"""FrontierStore contract tests — the reference DBManagerTest shape
(test/.../DBManagerTest.java:18-47: inject N urls -> generate-all
returns exactly that set) plus the merge conflict rules
(RocksDBManager.java:160-197: fetch last-wins, link first-wins)."""

import pytest

from pyspark.sql import functions as F

from webcollector_spark.crawler import seed_rows
from webcollector_spark.operators.generate import generate
from webcollector_spark.schema import STATUS_DB_SUCCESS
from webcollector_spark.store import ParquetFrontierStore, RamFrontierStore

URLS = [f"http://test.example/p/{i}" for i in range(10)]


@pytest.fixture(params=["ram", "parquet"])
def store(request, spark, tmp_path):
    if request.param == "ram":
        return RamFrontierStore(spark)
    return ParquetFrontierStore(spark, str(tmp_path / "crawldb"))


def test_inject_then_generate_returns_set(spark, store):
    store.inject(seed_rows(spark, URLS))
    got = {r.url for r in generate(store.load()).collect()}
    assert got == set(URLS)


def test_inject_skips_existing_unless_force(spark, store):
    store.inject(seed_rows(spark, URLS))
    # re-inject with different depth: must be a no-op without force
    store.inject(seed_rows(spark, URLS[:3], depth=9))
    assert store.load().filter("depth = 9").count() == 0
    store.inject(seed_rows(spark, URLS[:3], depth=9), force=True)
    assert store.load().filter("depth = 9").count() == 3
    assert store.load().count() == len(URLS)


def test_merge_fetch_last_wins_link_first_wins(spark, store):
    store.inject(seed_rows(spark, URLS[:4]))
    # fetch segment: url 0 marked SUCCESS
    fetched = (
        seed_rows(spark, URLS[:1])
        .withColumn("status", F.lit(STATUS_DB_SUCCESS))
        .withColumn("execute_count", F.lit(1))
        .withColumn("execute_time", F.lit(1000).cast("long"))
    )
    # link segment: url 1 rediscovered (must NOT overwrite), url 99 new
    links = seed_rows(spark, [URLS[1], "http://test.example/p/99"], depth=5)
    store.merge(fetched, links)
    out = {r.key: r for r in store.load().collect()}
    assert out[URLS[0]].status == STATUS_DB_SUCCESS  # fetch overwrote
    assert out[URLS[0]].execute_count == 1
    assert out[URLS[1]].depth == 0  # link did NOT overwrite existing row
    assert out["http://test.example/p/99"].depth == 5  # new link inserted
    assert len(out) == 5


def test_merge_intra_round_dedup(spark, store):
    store.inject(seed_rows(spark, URLS[:2]))
    # two fetch rows same key: later execute_time wins
    f1 = (
        seed_rows(spark, URLS[:1])
        .withColumn("status", F.lit(STATUS_DB_SUCCESS))
        .withColumn("execute_time", F.lit(1000).cast("long"))
    )
    f2 = (
        seed_rows(spark, URLS[:1])
        .withColumn("status", F.lit(1))
        .withColumn("execute_time", F.lit(2000).cast("long"))
    )
    store.merge(f1.unionByName(f2), None)
    row = store.load().filter(F.col("key") == URLS[0]).collect()[0]
    assert row.status == 1 and row.execute_time == 2000


def test_parquet_store_ignores_uncommitted_snapshot(spark, tmp_path):
    """Crash-resume: a partially written snapshot (no _SUCCESS marker)
    must be invisible to resume — the store loads the last COMMITTED
    version (Iceberg snapshot-commit semantics on the parquet backend)."""
    import os
    import shutil

    path = str(tmp_path / "db")
    s1 = ParquetFrontierStore(spark, path)
    s1.inject(seed_rows(spark, URLS[:4]))  # commits frontier_v0
    s1.merge(None, seed_rows(spark, URLS[4:6]))  # commits frontier_v1
    s1.log_round(round=0, generated=4, fetched=4, failed=0, new_links=2, wall_ms=1)

    # simulate a crash mid-write of v2: copy v1, drop the marker, add junk
    v1, v2 = os.path.join(path, "frontier_v1"), os.path.join(path, "frontier_v2")
    shutil.copytree(v1, v2)
    os.remove(os.path.join(v2, "_SUCCESS"))

    s2 = ParquetFrontierStore(spark, path, resumable=True)
    assert s2._version == 1  # uncommitted v2 ignored
    assert s2.load().count() == 6
    assert s2.last_round() == 0
    # next commit overwrites the junk cleanly
    s2.merge(None, seed_rows(spark, URLS[6:7]))
    assert s2.load().count() == 7


def test_parquet_store_resume(spark, tmp_path):
    path = str(tmp_path / "db")
    s1 = ParquetFrontierStore(spark, path)
    s1.inject(seed_rows(spark, URLS))
    s1.log_round(round=0, generated=10, fetched=10, failed=0, new_links=0, wall_ms=1)
    # reopen resumable: state + round manifest survive
    s2 = ParquetFrontierStore(spark, path, resumable=True)
    assert s2.last_round() == 0
    assert {r.url for r in s2.load().collect()} == set(URLS)
    # reopen non-resumable: wiped (Crawler.java:104-110)
    s3 = ParquetFrontierStore(spark, path)
    assert s3.is_empty()
