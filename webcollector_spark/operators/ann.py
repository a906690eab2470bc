"""Approximate nearest neighbour over embedding columns.

Three tiers (training-data-pipeline requirement):

1. `cosine_topk_bruteforce` — exact baseline: broadcast the query set,
   JVM-side dot products (`zip_with`/`aggregate`), window top-k.
2. label/centroid blocking — `plans/queries.q_cosine_blocked_neardup`
   (the IVF shape: exact search inside a coarse bucket).
3. `rh_lsh` here — random-hyperplane LSH (SimHash for real vectors,
   Charikar '02): b sign-bits of <v, plane_j> form a bucket key;
   candidates share a bucket in >= 1 of `n_tables` tables; exact
   cosine reranks candidates. Hyperplanes are DETERMINISTIC literals
   (seeded numpy), embedded both in the Spark plan and in the DuckDB
   oracle SQL, so the whole approximate pipeline is still
   column-level cross-checked.

Scale shape: signatures are one narrow map stage; the bucket join
shuffles only (vec_id, bucket) pairs; rerank touches candidate pairs
only. No O(n^2) stage anywhere.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes, identical for Spark + oracle."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).round(6)


def _dot_lit(vec: Column, plane: np.ndarray) -> Column:
    """<vec, literal plane> as a JVM-side expression."""
    arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec, arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a: Column, b: Column) -> Column:
    """<a, b> over two array columns as a JVM expression (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _cos(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def rh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Bucket id = integer of sign bits of the plane projections."""
    bits = [
        F.when(_dot_lit(vec, p) >= 0, F.lit(1 << j)).otherwise(0)
        for j, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def rh_bucket_sql(vec_expr: str, planes: np.ndarray) -> str:
    """The same bucket id as DuckDB SQL (literal plane lists)."""
    terms = []
    for j, p in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in p)
        terms.append(
            f"CASE WHEN list_dot_product({vec_expr}, [{lits}]) >= 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def rh_lsh_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs sharing a bucket in >= 1 of n_tables tables,
    reranked with exact cosine. Returns (vec_a, vec_b, sim)."""
    dim = len(emb.select(vec_col).first()[0])
    tabs = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_bits, seed + t)
        tabs.append(
            emb.select(
                F.col(id_col).alias("vid"),
                F.col(vec_col).alias("v"),
                F.lit(t).alias("tab"),
                rh_bucket(F.col(vec_col), planes).alias("bucket"),
            )
        )
    sigs = tabs[0]
    for t in tabs[1:]:
        sigs = sigs.unionByName(t)
    a = sigs.select("tab", "bucket", F.col("vid").alias("vec_a"), F.col("v").alias("va"))
    b = sigs.select("tab", "bucket", F.col("vid").alias("vec_b"), F.col("v").alias("vb"))

    sim = _cos(F.col("va"), F.col("vb"))
    return (
        a.join(b, ["tab", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
        .join(
            sigs.filter(F.col("tab") == 0).select(
                F.col("vid").alias("vec_a"), F.col("v").alias("va")
            ),
            "vec_a",
        )
        .join(
            sigs.filter(F.col("tab") == 0).select(
                F.col("vid").alias("vec_b"), F.col("v").alias("vb")
            ),
            "vec_b",
        )
        .select("vec_a", "vec_b", sim.alias("sim"))
    )


def rh_lsh_topk(
    emb: DataFrame,
    k: int = 3,
    sim_floor: float = 0.0,
    **kw,
) -> DataFrame:
    """Approximate top-k neighbours per vector from the LSH candidates
    (symmetrized), ranked by exact cosine."""
    pairs = rh_lsh_pairs(emb, **kw)
    sym = pairs.select(
        F.col("vec_a").alias("query_id"),
        F.col("vec_b").alias("neighbor_id"),
        "sim",
    ).unionByName(
        pairs.select(
            F.col("vec_b").alias("query_id"),
            F.col("vec_a").alias("neighbor_id"),
            "sim",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sym.filter(F.col("sim") >= sim_floor)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 4).alias("sim4"))
    )


# ---------------------------------------------------------------------------
# Tier 4: IVF-flat (the index family FAISS/Milvus ship for billion-vector
# search). Train coarse centroids with Lloyd's k-means, assign every vector
# to its nearest cell (a pure map stage: k broadcast distances per row),
# search only the query's `nprobe` nearest cells. Candidate volume is
# ~ nprobe/k of the corpus; the registry twin `ivf_ann_topk` pins the
# seeded-centroid variant against the DuckDB oracle.


def train_ivf_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over the embedding column.

    Deterministic seeding: the k lowest-id vectors (k-means|| would seed
    in production; fixed seeds keep tests reproducible). Each iteration
    is one broadcast-assignment map plus one posexplode/groupBy mean —
    shuffle volume O(n_vectors x dim) of (cluster, pos, value) triples,
    never O(n^2). Centroids (k x dim doubles) round-trip through the
    driver between iterations — they are small by construction; the
    corpus never does. Empty cells keep their previous centroid (the
    standard Lloyd convention).

    Returns a DataFrame (cid int, ce array<double>).
    """
    spark = emb.sparkSession
    vecs = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("ve"),
    )
    seed_rows = vecs.orderBy("vid").limit(k).collect()
    cents = [(i, list(r["ve"])) for i, r in enumerate(seed_rows)]
    for _ in range(iters):
        cdf = spark.createDataFrame(cents, "cid int, ce array<double>")
        assigned = ivf_assign(vecs, cdf, id_col="vid", vec_col="ve")
        means = (
            vecs.join(assigned, "vid")
            .select("cluster", F.posexplode("ve").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("m")))
                    ),
                    lambda s: s["m"],
                ).alias("ce")
            )
            .collect()
        )
        new = {r["cluster"]: list(r["ce"]) for r in means}
        cents = [(cid, new.get(cid, old)) for cid, old in cents]
    return spark.createDataFrame(cents, "cid int, ce array<double>")


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell per vector: (id, cluster). Broadcast the
    centroids; ties break toward the lower cid (deterministic)."""
    w = Window.partitionBy(id_col).orderBy(F.col("d").asc(), F.col("cid").asc())
    return (
        emb.select(id_col, F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(centroids))
        .select(id_col, "cid", _sqdist(F.col("__v"), F.col("ce")).alias("d"))
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(id_col, F.col("cid").alias("cluster"))
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query, searched only inside the query's
    `nprobe` nearest cells. `queries` must be (id_col, vec_col) rows
    (typically a small subset — it is broadcast)."""
    cluster_of = ivf_assign(emb, centroids, id_col, vec_col)
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("cid").asc()
    )
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
        .crossJoin(F.broadcast(centroids))
        .select("query_id", "cid", _sqdist(F.col("qe"), F.col("ce")).alias("d"))
        .withColumn("rk", F.row_number().over(probe_w))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", F.col("cid").alias("cluster"))
    )

    cands = (
        F.broadcast(probes)
        .join(cluster_of, "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"))
    )
    scored = (
        cands.join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
                )
            ),
            "query_id",
        )
        .join(
            emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ne")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            _cos(F.col("qe"), F.col("ne")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 4).alias("sim4"))
    )
