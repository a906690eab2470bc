"""The ANN stack, tier by tier, measured against exact brute force on
the same embeddings: what each tier trades for its scale property.

  tier 0  brute force        exact; O(n) per query (the recall oracle)
  tier 1  RH-LSH             bucket-collision candidates, exact rerank
  tier 2  IVF-flat           nprobe cells of a trained coarse quantizer
  tier 3  PQ/ADC             full scan, but over m int codes + a LUT
  tier 4  IVFADC             IVF candidate bound x PQ per-vector cost

Prints recall@k vs tier 0 and the candidate volume each tier scored —
the two numbers that decide an index config at 10^9 vectors (recall you
keep, corpus fraction you touch).

    python examples/demo_ann_stack.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from webcollector_spark.operators.ann import (
    ivf_assign,
    ivf_topk,
    ivfadc_topk,
    pq_adc_topk,
    rh_lsh_topk,
    train_ivf_centroids,
    train_pq_codebooks,
)
from webcollector_spark.session import get_spark

K = 5
N_QUERIES = 20


def _topk_sets(rows):
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return by_q


def _recall(got, want):
    hits = sum(len(got.get(q, set()) & ns) for q, ns in want.items())
    total = sum(len(ns) for ns in want.values())
    return hits / total if total else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-stack", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    queries = emb.orderBy(F.col("vec_id").desc()).limit(N_QUERIES).cache()

    # tier 0: exact cosine top-k (the oracle) — broadcast queries, scan all
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    sim = dot(F.col("qe"), F.col("ne")) / (
        F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ne"), F.col("ne")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    brute = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
    )
    want = _topk_sets(brute.collect())

    # exact squared-L2 oracle for the PQ tiers: ADC approximates L2, so
    # judging it against the COSINE oracle would conflate quantization
    # loss with metric mismatch (they only coincide on normalized
    # vectors, and these embeddings are unnormalized)
    sqd = dot(F.col("qe"), F.col("qe")) - 2 * dot(F.col("qe"), F.col("ne")) + dot(
        F.col("ne"), F.col("ne")
    )
    wl2 = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc()
    )
    want_l2 = _topk_sets(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sqd.alias("d"))
        .withColumn("rk", F.row_number().over(wl2))
        .filter(F.col("rk") <= K)
        .collect()
    )
    print(f"corpus={n} queries={N_QUERIES} k={K}")
    print(f"tier0 brute-force: recall 1.000, scored {n - 1} vectors/query (all)")

    # tier 1: RH-LSH (bucket candidates, exact rerank). 4 bits x 4
    # tables: on uniform random vectors an 8-bit bucket only collides
    # near-duplicates, so top-k recall needs the coarser/more-tables
    # config (the near-dup PAIR config in rh_lsh_pairs keeps 8 bits)
    lsh = rh_lsh_topk(emb, k=K, n_bits=4, n_tables=4)
    got = _topk_sets(lsh.filter(F.col("query_id").isin(list(want))).collect())
    print(f"tier1 rh-lsh(4 bits x 4 tables): recall {_recall(got, want):.3f} vs cosine oracle")

    # tier 2: IVF-flat — candidates = vectors in the nprobe probed cells
    cents = train_ivf_centroids(emb, k=8, iters=3)
    ivf = ivf_topk(emb, cents, queries, k=K, nprobe=2)
    got = _topk_sets(ivf.collect())
    cell_sizes = {
        r["cluster"]: r["cnt"]
        for r in ivf_assign(emb, cents).groupBy("cluster").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    avg_cell = sum(cell_sizes.values()) / len(cell_sizes)
    print(
        f"tier2 ivf-flat(k=8, nprobe=2): recall {_recall(got, want):.3f} vs cosine oracle, "
        f"~{2 * avg_cell:.0f} vectors/query ({2 * avg_cell / n:.0%} of corpus)"
    )

    # tier 3: PQ/ADC — every vector scored, but each costs m LUT adds;
    # judged against the exact-L2 oracle (ADC approximates L2). NOTE:
    # these synthetic embeddings are ~uniform random — the worst case
    # for quantization (no cluster structure for codebooks to exploit),
    # so PQ recall here is a floor; real text/image embeddings lie on
    # much lower-dimensional manifolds and quantize far better
    cb = train_pq_codebooks(emb, m=8, k=32, iters=3)
    pq = pq_adc_topk(emb, cb, queries, k=K, m=8)  # 8x5 bits/vector
    got = _topk_sets(pq.collect())
    print(
        f"tier3 pq/adc(m=8, k=32): recall {_recall(got, want_l2):.3f} vs L2 oracle, "
        f"{n - 1} codes/query (8 ints each, no raw floats)"
    )

    # tier 4: IVFADC — both bounds at once
    ivfadc = ivfadc_topk(emb, cents, cb, queries, k=K, nprobe=2, m=8)
    got = _topk_sets(ivfadc.collect())
    print(
        f"tier4 ivfadc(nprobe=2, m=8): recall {_recall(got, want_l2):.3f} vs L2 oracle, "
        f"~{2 * avg_cell:.0f} codes/query"
    )
    spark.stop()


if __name__ == "__main__":
    main()
