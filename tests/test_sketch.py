"""HyperLogLog sketch (operators/sketch.py): estimate accuracy, register
determinism, and the LSM store's fold-free cheap_count wiring."""

from pyspark.sql import functions as F


def test_hll_estimate_accuracy(spark):
    """±5% at b=10 (theory: 1.04/sqrt(1024) ~ 3.3% std error) on 20k
    distinct keys; duplicates must not move the estimate."""
    from webcollector_spark.operators.sketch import hll_estimate

    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("http://h/"), F.col("id")).alias("key")
    )
    est = hll_estimate(df, "key", b=10)
    assert abs(est - n) / n < 0.05, est
    dup = df.unionByName(df.limit(5000))
    assert hll_estimate(dup, "key", b=10) == est


def test_hll_small_range_linear_counting(spark):
    """Far below m the linear-counting correction makes small sets
    near-exact."""
    from webcollector_spark.operators.sketch import hll_estimate

    df = spark.range(37).select(F.col("id").cast("string").alias("key"))
    est = hll_estimate(df, "key", b=10)
    assert abs(est - 37) <= 2, est


def test_lsm_cheap_count_estimates_without_fold(spark, tmp_path):
    """track_new_links=False + estimate_counts=True: cheap_count answers
    from the raw union (no precedence fold) within HLL error; with the
    flag explicitly off it stays None (the default is now ON so the
    10^10 configuration keeps the crawler's bloom gate alive)."""
    from webcollector_spark.crawler import seed_rows
    from webcollector_spark.store import LsmParquetFrontierStore

    urls = [f"http://h{i % 5}.test/p{i}" for i in range(3000)]
    seeds = seed_rows(spark, urls)

    s1 = LsmParquetFrontierStore(
        spark, str(tmp_path / "a"), track_new_links=False,
        estimate_counts=False,
    )
    s1.inject(seeds)
    assert s1.cheap_count() is None

    s2 = LsmParquetFrontierStore(
        spark, str(tmp_path / "b"), track_new_links=False, estimate_counts=True
    )
    s2.inject(seeds)
    # overlapping delta: updates for the first 1000 keys (same keys —
    # distinct count must not double-count across base and delta)
    s2.merge(seeds.limit(1000).withColumn("status", F.lit(5)), None)
    est = s2.cheap_count()
    assert est is not None
    assert abs(est - 3000) / 3000 < 0.08, est


def test_hll_width_tracks_b(spark):
    """Regression: a fixed 50-bit rank width made every b != 10 estimate
    wrong by ~4x (b=12) / ~0.25x (b=8); the width must be 60 - b."""
    from webcollector_spark.operators.sketch import hll_estimate

    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    for b in (8, 12):
        est = hll_estimate(df, "key", b=b)
        assert abs(est - n) / n < 0.15, (b, est)


def test_estimate_counts_avoids_fold_with_tracking_on(spark, tmp_path):
    """estimate_counts must take effect regardless of tracking mode —
    with tracking ON and no memoized count, cheap_count should estimate
    rather than run the exact precedence fold."""
    from webcollector_spark.crawler import seed_rows
    from webcollector_spark.store import LsmParquetFrontierStore

    s = LsmParquetFrontierStore(
        spark, str(tmp_path / "c"), track_new_links=True, estimate_counts=True
    )
    s.inject(seed_rows(spark, [f"http://h/p{i}" for i in range(2000)]))
    s._count = None  # simulate a fresh process with no memoized count
    est = s.cheap_count()
    assert est is not None and abs(est - 2000) / 2000 < 0.08
    # the ESTIMATE path must have answered, not the exact fold (an exact
    # count would also satisfy the tolerance, masking a regression)
    assert s._approx is not None and s._count is None
    # memoized: second call returns the identical object without rescan
    assert s.cheap_count() == est


class TestCountMin:
    """Count-min: one-sided error (never undercounts) and hot-item
    detection with zero false negatives."""

    def test_never_undercounts_and_close_on_hot(self, spark):
        from webcollector_spark.operators.sketch import cm_estimate_counts

        # skewed stream: 'hot' appears 5000x, 200 cold items 10x each
        df = spark.range(5000).select(F.lit("hot").alias("host")).unionByName(
            spark.range(2000).select(
                F.concat(F.lit("cold"), (F.col("id") % 200)).alias("host")
            )
        )
        truth = {r["host"]: r["c"] for r in
                 df.groupBy("host").agg(F.count("*").alias("c")).collect()}
        est = {
            r["host"]: r["est_count"]
            for r in cm_estimate_counts(
                df, df.select("host").distinct(), "host"
            ).collect()
        }
        for h, t in truth.items():
            assert est[h] >= t, h  # one-sided
        # hot estimate within the eps*N bound (w=256 -> ~2.7% of N=7000)
        assert est["hot"] - truth["hot"] <= 0.03 * 7000

    def test_hot_items_no_false_negatives(self, spark):
        from webcollector_spark.operators.sketch import hot_items

        df = spark.range(5000).select(F.lit("hot").alias("host")).unionByName(
            spark.range(2000).select(
                F.concat(F.lit("cold"), (F.col("id") % 200)).alias("host")
            )
        )
        hot = {r["host"] for r in hot_items(df, "host", 0.5).collect()}
        assert "hot" in hot
        assert all(h == "hot" or h.startswith("cold") for h in hot)
        # cold items are each 10/7000 = 0.14% -- far below threshold,
        # so at w=256 none should cross 50% even with collisions
        assert hot == {"hot"}


class TestAdaptiveSalt:
    """Measured-skew salting wired through the round loop: last round's
    link hosts probed against the frontier with one exact bounded-output
    scan decide whether the next generate window pays the salted
    two-phase (crawler._frontier_has_hot_host)."""

    @staticmethod
    def _crawl(spark, graph, hot_frac):
        from webcollector_spark.config import CrawlerConfig
        from webcollector_spark.crawler import RamCrawler
        from webcollector_spark.sources.requester import SyntheticRequester

        cfg = CrawlerConfig(
            per_host_top_k=100,
            adaptive_salt=True,
            hot_host_frac=hot_frac,
            host_salt_buckets=8,
        )
        c = RamCrawler(spark, SyntheticRequester(graph, []), config=cfg)
        c.add_seed(graph[0]["url"])
        c.start(2)
        return c

    @staticmethod
    def _graph(seed_host, leaf_hosts, n_leaves):
        def page(url, links):
            return {"url": url, "http_code": 200, "location": None,
                    "image_id": None, "out_links": links}

        leaves = [
            f"http://{leaf_hosts[i % len(leaf_hosts)]}/p{i}"
            for i in range(n_leaves)
        ]
        return [page(f"http://{seed_host}/seed", leaves)] + [
            page(u, []) for u in leaves
        ]

    def test_salted_path_activates_on_skew(self, spark):
        # all 40 discovered links land on ONE host -> it holds ~97% of
        # the round-1 frontier, far above the 20% trigger
        g = self._graph("seed.test", ["hot.test"], 40)
        c = self._crawl(spark, g, hot_frac=0.2)
        # round 0: no candidates yet -> size gate (tiny frontier) -> 1;
        # round 1: hot.test detected -> salted window
        assert c.salt_history == [1, 8], c.salt_history

    def test_stays_unsalted_without_skew(self, spark):
        # links spread over 10 hosts, each ~9% of the frontier -> below
        # the 20% trigger; the salted phase is never paid
        g = self._graph("seed.test", [f"h{i}.test" for i in range(10)], 40)
        c = self._crawl(spark, g, hot_frac=0.2)
        assert c.salt_history == [1, 1], c.salt_history

    def test_candidate_set_is_bounded(self, spark):
        # salt_candidates caps the driver collect: 10 link hosts but
        # only the top 2 receivers are kept as candidates
        from webcollector_spark.config import CrawlerConfig
        from webcollector_spark.crawler import RamCrawler
        from webcollector_spark.sources.requester import SyntheticRequester

        g = self._graph("seed.test", [f"h{i}.test" for i in range(10)], 40)
        cfg = CrawlerConfig(
            per_host_top_k=100,
            adaptive_salt=True,
            hot_host_frac=0.2,
            host_salt_buckets=8,
            salt_candidates=2,
        )
        c = RamCrawler(spark, SyntheticRequester(g, []), config=cfg)
        c.add_seed(g[0]["url"])
        # after round 0 the candidate set reflects the seed's 40 links
        # across 10 hosts — capped to the top 2 receivers
        c.start(1)
        assert len(c._link_hosts) == 2
        c.start(2)
        assert c.salt_history == [1, 1]
