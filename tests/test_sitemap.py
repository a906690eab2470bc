"""Sitemap ingestion: JVM-regex XML parse, priority mapping into the
scheduler's lower-is-sooner column, robots.txt Sitemap: discovery, and
the end-to-end crawl reaching orphan pages no anchor points at."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.operators.sitemap import (
    render_sitemap,
    render_sitemap_index,
    sitemap_datums,
    sitemap_entries,
    sitemaps_from_robots,
)
from webcollector_spark.schema import STATUS_DB_SUCCESS
from webcollector_spark.sources.requester import SyntheticRequester


def _fetched(spark, rows):
    return spark.createDataFrame(
        rows, "url string, depth int, priority double, content binary"
    )


def test_sitemap_entries_fields_and_defaults(spark):
    xml = render_sitemap(
        [
            {
                "loc": "https://a.test/p1",
                "lastmod": "2026-01-05",
                "changefreq": "Daily",
                "priority": "0.9",
            },
            {"loc": " https://a.test/p2 "},  # whitespace-padded, bare loc
        ]
    )
    got = sitemap_entries(
        _fetched(spark, [("https://a.test/sitemap.xml", 0, 0.0, xml)])
    ).collect()
    by_loc = {r.loc: r for r in got}
    assert set(by_loc) == {"https://a.test/p1", "https://a.test/p2"}
    p1 = by_loc["https://a.test/p1"]
    assert (p1.lastmod, p1.changefreq, p1.sm_priority, p1.is_index) == (
        "2026-01-05",
        "daily",
        0.9,
        False,
    )
    p2 = by_loc["https://a.test/p2"]
    assert (p2.lastmod, p2.changefreq, p2.sm_priority) == (None, None, 0.5)


def test_sitemap_index_and_non_sitemap_pages(spark):
    idx = render_sitemap_index(
        ["https://a.test/sm-1.xml", "https://a.test/sm-2.xml"]
    )
    html = b"<html><body><a href='https://a.test/x'>x</a></body></html>"
    got = sitemap_entries(
        _fetched(
            spark,
            [
                ("https://a.test/sitemap.xml", 0, 0.0, idx),
                ("https://a.test/page", 1, 0.0, html),  # ignored
                ("https://a.test/empty", 1, 0.0, None),  # ignored
            ],
        )
    ).collect()
    assert sorted(r.loc for r in got) == [
        "https://a.test/sm-1.xml",
        "https://a.test/sm-2.xml",
    ]
    assert all(r.is_index for r in got)


def test_sitemap_datums_priority_and_meta(spark):
    xml = render_sitemap(
        [
            {"loc": "https://a.test/hot", "priority": "1.0",
             "lastmod": "2026-02-01", "changefreq": "hourly"},
            {"loc": "https://a.test/cold", "priority": "0.1"},
            {"loc": "https://a.test/default"},
        ]
    )
    rows = sitemap_datums(
        sitemap_entries(
            _fetched(spark, [("https://a.test/sitemap.xml", 2, 1.5, xml)])
        )
    ).collect()
    by_key = {r.key: r for r in rows}
    # lower = sooner: parent 1.5, priority-1.0 entry jumps ahead,
    # default 0.5 inherits the parent's slot exactly
    assert by_key["https://a.test/hot"].priority == 1.0
    assert by_key["https://a.test/default"].priority == 1.5
    assert abs(by_key["https://a.test/cold"].priority - 1.9) < 1e-12
    assert all(r.depth == 3 and r.status == 0 for r in rows)
    hot = by_key["https://a.test/hot"].meta
    assert hot["s_sm"] == "1"
    assert hot["lastmod"] == "2026-02-01"
    assert hot["changefreq"] == "hourly"
    assert "lastmod" not in by_key["https://a.test/cold"].meta


def test_sitemaps_from_robots():
    req = SyntheticRequester(
        [],
        [],
        robots={
            "a.test": "User-agent: *\nDisallow: /tmp\nSitemap: https://a.test/sm.xml\nsitemap: https://a.test/sm2.xml",
            "b.test": "User-agent: *\nAllow: /",
        },
    )
    assert sitemaps_from_robots(req, ["a.test", "b.test", "c.test"]) == [
        "https://a.test/sm.xml",
        "https://a.test/sm2.xml",
    ]


def test_crawl_reaches_orphans_via_sitemap(spark, tmp_path):
    corpus = fixtures.make_corpus(30)
    graph = fixtures.make_site_graph(20, n_hosts=3, out_degree=2)
    seed = sorted(graph["url"])[0]
    # the robots Sitemap: probe covers SEED hosts only — anchor the
    # sitemap (and its orphans) on the seed's host
    from webcollector_spark.schema import host_of

    host = host_of(seed)

    # orphan pages: in the web, never linked by any anchor
    orphans = [f"http://{host}/orphan/{i}" for i in range(3)]
    orphan_rows = pd.DataFrame(
        {
            "url": orphans,
            "host": host,
            "image_id": [f"img{i:08d}" for i in range(3)],
            "out_links": [[], [], []],
            "http_code": 200,
            "location": None,
        }
    )
    graph = pd.concat([graph, orphan_rows], ignore_index=True)

    # robots advertises a sitemapindex -> child sitemap -> orphans
    sm_index = f"http://{host}/sitemap.xml"
    sm_child = f"http://{host}/sitemap-1.xml"
    raw_pages = {
        sm_index: ("application/xml", render_sitemap_index([sm_child])),
        sm_child: (
            "application/xml",
            render_sitemap([{"loc": u, "priority": "0.9"} for u in orphans]),
        ),
    }
    req = SyntheticRequester(
        graph.to_dict("records"),
        corpus.to_dict("records"),
        robots={host: f"User-agent: *\nSitemap: {sm_index}"},
        raw_pages=raw_pages,
    )

    def run(parse_sitemaps):
        c = RamCrawler(
            spark, req, config=CrawlerConfig(parse_sitemaps=parse_sitemaps)
        )
        c.add_seed(seed)
        c.start(4)
        return {
            r.key
            for r in c.frontier()
            .filter(F.col("status") == STATUS_DB_SUCCESS)
            .collect()
        }

    visited_without = run(False)
    assert not set(orphans) & visited_without

    visited_with = run(True)
    assert set(orphans) <= visited_with  # all orphans crawled
    assert sm_index in visited_with and sm_child in visited_with


def test_gz_sitemap_is_gunzipped_and_crawled(spark):
    """sitemap.xml.gz — FILE compression (application/gzip), the form
    large sites actually publish — must gunzip in the fetch pass and
    route the crawl exactly like plain XML."""
    import gzip

    corpus = fixtures.make_corpus(30)
    graph = fixtures.make_site_graph(20, n_hosts=3, out_degree=2)
    seed = sorted(graph["url"])[0]
    from webcollector_spark.schema import host_of

    host = host_of(seed)
    orphans = [f"http://{host}/gzorphan/{i}" for i in range(3)]
    orphan_rows = pd.DataFrame(
        {
            "url": orphans,
            "host": host,
            "image_id": [f"img{i:08d}" for i in range(3)],
            "out_links": [[], [], []],
            "http_code": 200,
            "location": None,
        }
    )
    graph = pd.concat([graph, orphan_rows], ignore_index=True)
    sm = f"http://{host}/sitemap.xml.gz"
    raw_pages = {
        sm: (
            "application/gzip",
            gzip.compress(
                render_sitemap([{"loc": u} for u in orphans]), mtime=0
            ),
        ),
    }
    req = SyntheticRequester(
        graph.to_dict("records"),
        corpus.to_dict("records"),
        robots={host: f"User-agent: *\nSitemap: {sm}"},
        raw_pages=raw_pages,
    )
    c = RamCrawler(spark, req, config=CrawlerConfig(parse_sitemaps=True))
    c.add_seed(seed)
    c.start(4)
    done = {
        r.key
        for r in c.frontier()
        .filter(F.col("status") == STATUS_DB_SUCCESS)
        .collect()
    }
    for u in orphans:
        assert u in done, u
