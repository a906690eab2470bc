"""PageRank over the crawl link graph — the canonical priority source
for a frontier scheduler (production crawlers schedule by link-graph
importance; the reference has no priority at all, so this is a graft
extension feeding the `priority` column that `generate_per_host` orders
by, operators/generate.py:95-103).

Shape per iteration: one join of ranks to edges on src (contributions =
rank / out_degree) + one groupBy dst sum — O(|E|) shuffle per
iteration, the same BSP pattern as connected components
(operators/components.py). Dangling nodes (no out-edges) keep their
rank from the teleport term only, the common simplification when ranks
order a scheduler rather than normalize to a distribution.

The registry twin `pagerank` unrolls the same fixed iteration count in
DuckDB CTEs, so the whole iterative computation is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ranks after `iters` synchronous iterations from a uniform start.

    Nodes = union of srcs and dsts; returns (node, rank). Deterministic
    up to float-sum order (aggregation), as all parallel PageRanks are.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    out_deg = edges.groupBy(src).agg(F.count("*").alias("odeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", src), src)
            .join(F.broadcast(out_deg), src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("odeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def priorities_from_ranks(frontier: DataFrame, ranks: DataFrame) -> DataFrame:
    """Frontier with `priority` replaced by -rank for ranked keys
    (higher rank -> smaller priority -> scheduled sooner by the
    per-host window); unranked rows keep their current priority. Feed
    the result to `store.merge`/`inject(force=True)` to persist."""
    r = ranks.select(F.col("node").alias("key"), F.col("rank").alias("__rank"))
    return (
        frontier.join(r, "key", "left")
        .withColumn(
            "priority",
            F.when(F.col("__rank").isNotNull(), -F.col("__rank")).otherwise(
                F.col("priority")
            ),
        )
        .drop("__rank")
    )
