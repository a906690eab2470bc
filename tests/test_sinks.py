"""FileSystemOutput URL->path rules (util/FileSystemOutput.java:44-65),
the path_col Spark expression agreeing with the pure function, the
datum pretty-printer, and the pluggable NextFilter."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from webcollector_spark.sinks import (
    FileSystemOutput,
    datum_to_string,
    path_col,
    url_to_path,
)

CASES = {
    # dir path -> index.html appended
    "http://h.test/a/b/": "h.test/a/b/index.html",
    # empty path -> index.html
    "http://h.test": "h.test/index.html",
    # extensionless last segment -> .html appended
    "http://h.test/a/page": "h.test/a/page.html",
    # extension kept
    "http://h.test/a/img.png": "h.test/a/img.png",
    # query appended with _
    "http://h.test/a/page.php?id=3": "h.test/a/page.php_id=3",
}


def test_url_to_path_rules():
    for url, want in CASES.items():
        assert url_to_path(url) == want, url


def test_path_col_matches_pure_function(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    rows = df.select("url", path_col("url").alias("p")).collect()
    for r in rows:
        assert r["p"] == url_to_path(r["url"]), r["url"]


def test_filesystem_output_writes(spark):
    with tempfile.TemporaryDirectory() as root:
        fso = FileSystemOutput(root)
        p = fso.output("http://h.test/a/page?x=1", b"<html>hi</html>")
        assert os.path.exists(p)
        assert p.endswith("h.test/a/page.html_x=1")
        with open(p, "rb") as fh:
            assert fh.read() == b"<html>hi</html>"


def test_datum_to_string():
    s = datum_to_string(
        {
            "key": "k1", "url": "http://h.test/", "status": 5,
            "execute_time": 0, "execute_count": 2, "code": 200,
            "location": None, "meta": {"s_t": "list"},
        }
    )
    assert "KEY: k1" in s and "STATUS: success" in s
    assert "META[0]: (s_t,list)" in s


def test_next_filter_drops_and_rewrites(spark, small_web):
    from webcollector_spark.config import CrawlerConfig
    from webcollector_spark.crawler import RamCrawler
    from webcollector_spark.sources.requester import SyntheticRequester
    from webcollector_spark import fixtures

    graph, corpus = small_web
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))

    def nf(url: str, referer: str):
        # drop host h001, keep everything else unchanged
        return None if "h001" in url else url

    cfg = CrawlerConfig(next_filter=nf, bloom_capacity=0)
    c = RamCrawler(spark, req, config=cfg)
    c.add_seed(fixtures.seeds_for(graph, 3))
    c.start(3)
    hosts = {
        r["host"]
        for r in c.frontier().filter(F.col("depth") > 0).select("host").collect()
    }
    assert "h001.test" not in hosts
    assert len(hosts) > 0


def test_fetched_history_table(spark, small_web, tmp_path):
    """fetched_history_path: per-round append of executed datums
    (content dropped), partitioned by round — the offline 'fetched'
    table."""
    from pyspark.sql import functions as F

    from webcollector_spark import CrawlerConfig, RamCrawler, fixtures
    from webcollector_spark.sources.requester import SyntheticRequester

    graph, corpus = small_web
    path = str(tmp_path / "fetched_history")
    cfg = CrawlerConfig(bloom_capacity=10_000, fetched_history_path=path)
    crawler = RamCrawler(
        spark,
        SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records")),
        config=cfg,
    )
    crawler.add_seed(fixtures.seeds_for(graph, 3))
    metrics = crawler.start(3)

    hist = spark.read.parquet(path)
    assert "content" not in hist.columns
    per_round = {
        r["round"]: r["n"]
        for r in hist.groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    assert per_round == {m.round: m.generated for m in metrics}
    # history rows carry the executed status/code of that round
    assert hist.filter(F.col("status") == 5).count() > 0
