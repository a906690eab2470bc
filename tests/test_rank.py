"""PageRank operator (operators/rank.py): convergence sanity on a known
graph, dangling-node handling, and the priority-wiring helper that
feeds the frontier scheduler."""

from pyspark.sql import functions as F


def test_pagerank_star_graph(spark):
    """Hub-and-spoke: everything links to the hub, so the hub must end
    far above the spokes, and ranks stay positive everywhere."""
    from webcollector_spark.operators.rank import pagerank

    edges = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(9)] + [("hub", "s0")],
        "src string, dst string",
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges, iters=5).collect()}
    assert r["hub"] > 5 * r["s1"]
    assert all(v > 0 for v in r.values())
    # s0 receives the hub's whole outflow -> above the other spokes
    assert r["s0"] > r["s1"]


def test_pagerank_dangling_nodes_keep_teleport_rank(spark):
    from webcollector_spark.operators.rank import pagerank

    # b and c have no out-edges (dangling): they keep base + inflow
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges, iters=3).collect()}
    assert r["b"] == r["c"]          # symmetric inflow
    assert r["a"] < r["b"]           # a only gets teleport mass


def test_pagerank_empty_edges_returns_empty_ranks(spark):
    """A crawl round with no discovered links must not crash a
    scheduler that wires pagerank in unconditionally (no 1/0 at the
    uniform-start division)."""
    from webcollector_spark.operators.rank import pagerank

    edges = spark.createDataFrame([], "src string, dst string")
    out = pagerank(edges, iters=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_pagerank_deep_iterations_checkpoint(spark):
    """iters > checkpoint_every exercises the lineage truncation path;
    ranks must still sum to a sane mass and stay positive."""
    from webcollector_spark.operators.rank import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(edges, iters=12, checkpoint_every=4).collect()
    }
    # a 3-cycle converges to the uniform distribution
    assert all(abs(v - 1 / 3) < 1e-6 for v in r.values()), r


def test_priorities_from_ranks(spark):
    from webcollector_spark.crawler import seed_rows
    from webcollector_spark.operators.rank import (
        pagerank,
        priorities_from_ranks,
    )

    frontier = seed_rows(
        spark, ["http://h/a", "http://h/b", "http://h/unranked"]
    )
    edges = spark.createDataFrame(
        [("http://h/a", "http://h/b"), ("http://h/b", "http://h/a"),
         ("http://h/a", "http://h/b")],
        "src string, dst string",
    )
    ranks = pagerank(edges.distinct(), iters=3)
    out = {
        r["key"]: r["priority"]
        for r in priorities_from_ranks(frontier, ranks).collect()
    }
    assert out["http://h/unranked"] == 0.0   # untouched
    assert out["http://h/a"] < 0 and out["http://h/b"] < 0
    # higher rank -> smaller (more negative) priority -> scheduled sooner
    rk = {r["node"]: r["rank"] for r in ranks.collect()}
    assert (out["http://h/a"] < out["http://h/b"]) == (
        rk["http://h/a"] > rk["http://h/b"]
    )
