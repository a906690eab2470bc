"""Crawl-trap defense (operators/traps.py): template derivation twins,
detection discrimination, the broadcast anti-join frontier filter, and
the per-link NextFilter bridge."""

from pyspark.sql import functions as F

from webcollector_spark.functions.urls import url_template, url_template_col
from webcollector_spark.operators.traps import (
    detect_traps,
    make_trap_next_filter,
    trap_filter,
)

URLS = [
    ("http://a.test/cal/2026/08/19?sess=0123456789abcdef0123456789abcdef",
     "/cal/{D}/{D}/{D}?sess={H}"),
    ("http://a.test/page/7", "/page/{D}"),
    ("http://a.test", "/"),                      # empty path -> "/"
    ("https://a.test:8443/x?b=2&a=1", "/x?b={D}&a={D}"),
    # short hex is NOT a session id; digits inside it still collapse
    ("http://a.test/deadbeef/9", "/deadbeef/{D}"),
]


def test_url_template_python_and_column_twins_agree(spark):
    rows = spark.createDataFrame(
        [(u,) for u, _ in URLS], "url string"
    ).select("url", url_template_col(F.col("url")).alias("t")).collect()
    for (u, want), r in zip(URLS, rows):
        assert r["t"] == want, u
        assert url_template(u) == want, u


def _fetch_log(spark, n_trap=30, n_real=30):
    # trap: every fetch a brand-new session URL; real: 3 pages re-fetched
    rows = [
        ("t.test", f"http://t.test/cal/2026/{i % 12}/{i}?sess={'%032x' % (i * 7919)}")
        for i in range(n_trap)
    ] + [
        ("r.test", f"http://r.test/page/{i % 3}") for i in range(n_real)
    ]
    return spark.createDataFrame(rows, "host string, url string")


def test_detect_traps_discriminates(spark):
    out = {
        (r["host"], r["template"]): r
        for r in detect_traps(_fetch_log(spark), min_urls=10).collect()
    }
    trap = out[("t.test", "/cal/{D}/{D}/{D}?sess={H}")]
    real = out[("r.test", "/page/{D}")]
    assert trap["is_trap"] and trap["n_urls"] == trap["n_docs"] == 30
    assert not real["is_trap"] and real["n_urls"] == 3


def test_trap_filter_broadcast_anti_join(spark):
    log = _fetch_log(spark)
    traps = detect_traps(log, min_urls=10)
    frontier = spark.createDataFrame(
        [
            ("t.test", "http://t.test/cal/2026/9/999?sess=" + "f" * 32),
            ("t.test", "http://t.test/about"),     # same host, clean path
            ("r.test", "http://r.test/page/1"),
        ],
        "host string, url string",
    )
    kept = trap_filter(frontier, traps)
    assert sorted(r["url"] for r in kept.collect()) == [
        "http://r.test/page/1",
        "http://t.test/about",
    ]
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    # without any flagged template the frontier passes through whole
    none = trap_filter(frontier, traps.filter("host = 'nope'"))
    assert none.count() == frontier.count()


def test_make_trap_next_filter_drops_at_harvest(spark):
    traps = detect_traps(_fetch_log(spark), min_urls=10).filter("is_trap")
    pairs = [(r["host"], r["template"]) for r in traps.collect()]
    nf = make_trap_next_filter(pairs)
    assert nf("http://t.test/cal/2026/1/31?sess=" + "a" * 32, "ref") is None
    assert nf("http://t.test/about", "ref") == "http://t.test/about"
    assert nf("http://r.test/page/2", "ref") == "http://r.test/page/2"
    import pickle

    assert pickle.loads(pickle.dumps(nf))("http://t.test/about", "") is not None


def test_trap_next_filter_blocks_links_in_crawl(spark, tmp_path):
    """End-to-end through the fetch UDF seam: with the trap filter
    installed for the fixture's /dead/{D} template, no dead-link URL
    ever enters the frontier; without it, the same crawl admits them."""
    from webcollector_spark import fixtures
    from webcollector_spark.config import CrawlerConfig
    from webcollector_spark.crawler import RamCrawler
    from webcollector_spark.sources.requester import SyntheticRequester

    corpus = fixtures.make_corpus(60)
    graph = fixtures.make_site_graph(300, n_hosts=4, out_degree=4)
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    seeds = fixtures.seeds_for(graph, 8)
    hosts = [f"h{h:03d}.test" for h in range(4)]

    def frontier_urls(nf):
        c = RamCrawler(
            spark,
            req,
            config=CrawlerConfig(
                top_n=200, bloom_capacity=20_000, next_filter=nf
            ),
        )
        c.add_seed(seeds)
        c.start(2)
        return [r["url"] for r in c.frontier().select("url").collect()]

    without = frontier_urls(None)
    assert any("/dead/" in u for u in without)  # fixture emits dead links
    blocked = frontier_urls(
        make_trap_next_filter([(h, "/dead/{D}") for h in hosts])
    )
    assert not any("/dead/" in u for u in blocked)
    # the filter is surgical: real pages still got crawled
    assert any("/p/" in u for u in blocked)


def test_url_template_twins_agree_on_combinatorial_corpus(spark):
    """JVM column expression vs Python twin over the full cross product
    of scheme/host/port/path/query shapes (incl. hex-run and digit-run
    edge cases) — the two must never drift, or trap flags collected on
    the driver stop matching templates computed in the scan."""
    from itertools import product

    urls = [
        f"{s}://{h}{p}{path}{q}"
        for s, h, p, path, q in product(
            ["http", "https"],
            ["a.test", "A7.test"],
            ["", ":8080"],
            ["", "/", "/x/9", "/cal/2026/08/19", "/deadbeef",
             "/" + "ab12" * 5, "/x%20y"],
            ["", "?a=1", "?sess=" + "0af" * 11, "?b=2&a=1#frag"],
        )
    ]
    got = (
        spark.createDataFrame([(u,) for u in urls], "url string")
        .select("url", url_template_col(F.col("url")).alias("t"))
        .collect()
    )
    assert len(got) == len(urls)
    for r in got:
        assert r["t"] == url_template(r["url"]), r["url"]
