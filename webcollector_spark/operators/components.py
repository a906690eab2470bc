"""Connected components over near-duplicate pairs — the dedup
endpoint: pairs (from exact/MinHash/SimHash/phash/cosine detectors)
-> duplicate CLUSTERS -> one canonical keeper per cluster.

Algorithm: iterative min-label propagation (the alternating large-star
shape specialised to undirected edges): every node repeatedly adopts
the smallest component id among itself and its neighbours until a pass
changes nothing. Converges in O(diameter) rounds; near-dup clusters
are tiny and dense (diameter 2-3), so 2-4 Spark rounds in practice.
Each round is one shuffle (groupBy min over the symmetrized edge
list); labels live in a DataFrame, localCheckpointed per round to cut
the iterative lineage — same pattern as the crawl frontier loop.

Scale note: this is the standard BSP connected-components dataflow —
shuffle volume O(|E|) per round, no driver-side state beyond the
convergence counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """-> (node, component) with component = min node id of the
    component. Node ids must be orderable (long/string)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbour labels: for each edge a->b, b's current label
        nbr = (
            edges.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Full dedup decision table: every doc with its cluster id, keeper
    flag (canonical = smallest id in cluster — deterministic), and
    cluster size. Docs with no near-dup edge form singleton clusters."""
    comp = connected_components(pairs, src, dst)
    labelled = (
        docs.select(F.col(id_col).alias("node"))
        .join(comp, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("comp", F.col("node")).alias("cluster"),
        )
    )
    sizes = labelled.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        labelled.join(sizes, "cluster")
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster"))
        .select(id_col, "cluster", "cluster_size", "is_keeper")
    )
