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
