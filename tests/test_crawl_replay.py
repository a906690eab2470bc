"""Replay-equivalence golden tests (the real correctness bar, SURVEY §5.2):
the Spark engine vs the single-process oracle of the reference loop, on
the same deterministic site graph + seed list + budget. Asserts
per-round generated key sequences (sorted-key mode), final visited set,
statuses and execute_counts, plus the payload invariants (caption
equality; decoded-pixel PSNR >= 40 dB vs recomputed generator pixels)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from webcollector_spark import codecs, fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.operators.fetch import fetch as fetch_op, verify_payload
from webcollector_spark.operators.generate import generate
from webcollector_spark.oracle import OracleCrawler
from webcollector_spark.schema import STATUS_DB_UNEXECUTED
from webcollector_spark.sources.requester import SyntheticRequester


def _requester(small_web, **kw):
    graph, corpus = small_web
    return SyntheticRequester(
        graph.to_dict("records"), corpus.to_dict("records"), **kw
    )


def _run_pair(spark, small_web, cfg, depth, seeds=None, oracle_kw=None, req_kw=None):
    graph, _ = small_web
    seeds = seeds or fixtures.seeds_for(graph, 3)
    req = _requester(small_web, **(req_kw or {}))

    oracle = OracleCrawler(
        _requester(small_web, **(req_kw or {})),
        top_n=cfg.top_n,
        max_execute_count=cfg.max_execute_count,
        regex_rules=list(cfg.regex_rules),
        **(oracle_kw or {}),
    )
    oracle.inject(seeds)
    oracle.start(depth)

    crawler = RamCrawler(spark, req, config=cfg)
    crawler.add_seed(list(seeds))
    crawler.start(depth)
    return oracle, crawler


def _engine_state(crawler):
    rows = crawler.frontier().collect()
    return {r.key: (r.status, r.execute_count, r.code) for r in rows}


@pytest.mark.parametrize("top_n", [0, 7])
def test_visited_set_and_state_equivalence(spark, small_web, top_n):
    cfg = CrawlerConfig(top_n=top_n, bloom_capacity=10_000)
    oracle, crawler = _run_pair(spark, small_web, cfg, depth=4)
    assert _engine_state(crawler) == oracle.state()
    eng_visited = {
        r.key
        for r in crawler.frontier()
        .filter(F.col("status") != STATUS_DB_UNEXECUTED)
        .collect()
    }
    assert eng_visited == oracle.visited_keys()


def test_per_round_generated_sequence(spark, small_web):
    """Sorted-key mode: the generated SEQUENCE each round must match the
    reference's key-lexicographic cursor + topN truncation."""
    cfg = CrawlerConfig(top_n=5, bloom_capacity=10_000)
    graph, _ = small_web
    seeds = fixtures.seeds_for(graph, 3)

    oracle = OracleCrawler(_requester(small_web), top_n=5)
    oracle.inject(seeds)
    oracle.start(3)

    crawler = RamCrawler(spark, _requester(small_web), config=cfg)
    # replicate the loop manually to capture each round's generated keys
    from webcollector_spark.crawler import seed_rows
    from webcollector_spark.operators.parse import discovered_links
    from webcollector_spark.operators.seen import seen_filter
    from webcollector_spark.schema import FRONTIER_SCHEMA

    core_cols = [f.name for f in FRONTIER_SCHEMA.fields]
    crawler.store.inject(seed_rows(spark, seeds))

    got_rounds = []
    for _ in range(3):
        gen = generate(crawler.store.load(), cfg.top_n, cfg.max_execute_count)
        keys = [r.key for r in gen.orderBy("key").collect()]
        if not keys:
            break
        got_rounds.append(keys)
        fetched = fetch_op(gen, crawler.requester, cfg)
        fetched.persist()
        links = seen_filter(
            discovered_links(fetched), crawler.store.load().select("key")
        )
        crawler.store.merge(fetched.select(*core_cols), links)
        fetched.unpersist()

    assert got_rounds == oracle.generated_per_round


def test_retry_and_flaky(spark, small_web):
    """Flaky url fails round 1, succeeds on retry; dead links exhaust
    retries but stay FAILED with incrementing execute_count."""
    graph, _ = small_web
    seeds = fixtures.seeds_for(graph, 2)
    flaky = {seeds[1]: 1}  # first attempt fails
    cfg = CrawlerConfig(max_execute_count=3, bloom_capacity=10_000)
    oracle, crawler = _run_pair(
        spark, small_web, cfg, depth=3, seeds=seeds, req_kw={"flaky_until": flaky}
    )
    assert _engine_state(crawler) == oracle.state()
    st = _engine_state(crawler)[seeds[1]]
    assert st[0] == 5 and st[1] == 2  # succeeded on 2nd attempt


def test_payload_invariants(spark, small_web):
    """Caption equality + phash parity engine-side; PSNR >= 40 dB vs
    recomputed generator pixels test-side (BASELINE.json input_hint)."""
    graph, corpus = small_web
    seeds = fixtures.seeds_for(graph, 5)
    cfg = CrawlerConfig(bloom_capacity=10_000)
    req = _requester(small_web)
    crawler = RamCrawler(spark, req, config=cfg)
    crawler.add_seed(list(seeds))

    from webcollector_spark.crawler import seed_rows

    gen = seed_rows(spark, seeds)
    fetched = fetch_op(gen, req, cfg)
    corpus_df = spark.createDataFrame(corpus)
    checked = verify_payload(fetched, corpus_df).collect()
    ok_rows = [r for r in checked if r.code == 200]
    assert ok_rows, "no 200s among seeds"
    for r in ok_rows:
        assert r.caption_ok and r.phash_ok, r.url
    # PSNR invariant: decode the served bytes, compare with ground truth
    by_id = {c["image_id"]: c for _, c in corpus.iterrows()}
    for r in ok_rows:
        c = by_id[r.image_id]
        px = codecs.decode(bytes(c["bytes"]))
        gt = fixtures.ground_truth_pixels(c["image_id"], c["w"], c["h"])
        if c["fmt"] == "png":
            assert np.array_equal(px, gt)
        else:
            assert codecs.psnr_db(gt, px) >= 40.0


def test_per_host_mode_equivalence(spark, small_web):
    """Graft scheduler (salted per-host top-k) vs the oracle's
    per-host model: identical per-round generated SETS and final state.
    Pins that salting is a pure execution detail (two-phase rank picks
    the same rows as a single global per-host sort)."""
    cfg = CrawlerConfig(per_host_top_k=3, bloom_capacity=10_000)
    graph, _ = small_web
    seeds = fixtures.seeds_for(graph, 3)

    oracle = OracleCrawler(_requester(small_web), per_host_top_k=3)
    oracle.inject(seeds)
    oracle.start(4)

    from webcollector_spark.crawler import seed_rows
    from webcollector_spark.operators.generate import generate_per_host
    from webcollector_spark.operators.parse import discovered_links
    from webcollector_spark.schema import FRONTIER_SCHEMA

    core_cols = [f.name for f in FRONTIER_SCHEMA.fields]
    crawler = RamCrawler(spark, _requester(small_web), config=cfg)
    crawler.store.inject(seed_rows(spark, seeds))

    got_rounds = []
    for _ in range(4):
        gen = generate_per_host(
            crawler.store.load(), 3, cfg.max_execute_count, 0, salt_buckets=4
        )
        keys = sorted(r.key for r in gen.collect())
        if not keys:
            break
        got_rounds.append(keys)
        fetched = fetch_op(gen, crawler.requester, cfg)
        fetched.persist()
        crawler.store.merge(
            fetched.select(*core_cols), discovered_links(fetched)
        )
        fetched.unpersist()

    want_rounds = [sorted(ks) for ks in oracle.generated_per_round]
    assert got_rounds == want_rounds
    assert _engine_state(crawler) == oracle.state()


def test_generator_filter(spark, small_web):
    """Pluggable GeneratorFilter (SQL predicate): depth-bounded
    generation leaves deeper discoveries unexecuted in the frontier."""
    cfg = CrawlerConfig(bloom_capacity=10_000, generator_filter="depth <= 1")
    graph, _ = small_web
    crawler = RamCrawler(spark, _requester(small_web), config=cfg)
    crawler.add_seed(fixtures.seeds_for(graph, 3))
    crawler.start(5)
    rows = crawler.frontier().collect()
    executed = [r for r in rows if r.status != STATUS_DB_UNEXECUTED]
    assert executed and all(r.depth <= 1 for r in executed)
    # depth-2 links were discovered but never generated
    assert any(r.depth >= 2 and r.status == STATUS_DB_UNEXECUTED for r in rows)


def test_host_bucket_rate():
    """Per-host politeness token bucket: N waits at rate r take >=
    (N-1)/r seconds per host, independent hosts don't block each other."""
    import time

    from webcollector_spark.operators.fetch import _HostBucket

    b = _HostBucket(rate_per_s=50.0, fixed_interval_ms=0)
    t0 = time.monotonic()
    for _ in range(5):
        b.wait("h1")
    elapsed = time.monotonic() - t0
    assert elapsed >= 4 / 50.0  # 4 gaps at 20ms
    t0 = time.monotonic()
    b2 = _HostBucket(rate_per_s=1.0, fixed_interval_ms=0)
    for h in ("a", "b", "c", "d"):
        b2.wait(h)  # distinct hosts: no politeness coupling
    assert time.monotonic() - t0 < 0.5


def test_robots_blocking(spark, small_web):
    """Graft extension: robots.txt disallow marks urls FAILED with the
    robots sentinel code; oracle (robots=True) agrees."""
    graph, _ = small_web
    seeds = fixtures.seeds_for(graph, 4)
    # block everything on the host of the first seed
    host = seeds[0].split("://")[1].split("/")[0]
    robots = {host: "User-agent: *\nDisallow: /"}
    cfg = CrawlerConfig(bloom_capacity=10_000, max_execute_count=1)
    oracle, crawler = _run_pair(
        spark, small_web, cfg, depth=2, seeds=seeds,
        oracle_kw={"robots": True}, req_kw={"robots": robots},
    )
    assert _engine_state(crawler) == oracle.state()
    st = _engine_state(crawler)[seeds[0]]
    assert st[0] == 1 and st[2] == -2  # FAILED, robots sentinel
