"""SemDeDup hot-cell A/B (VERDICT r4 item 5): naive one-reducer-per-
cell pairing vs salted_self_pairs on a skewed embedding fixture where
ONE cell holds 30% of all vectors — the dense-mode shape a real
embedding distribution produces and the K ∝ n recipe does not defend.

Writes BENCH_SEMDEDUP_SKEW.json. Both variants compute the IDENTICAL
edge set (asserted); the measurement is the within-cell pair+cosine
stage only (count action), which is where the straggler lives.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from webcollector_spark.operators.pairs import salted_self_pairs  # noqa: E402

N = 20_000
DIM = 16
HOT_FRAC = 0.30
K_CELLS = 32
TAU = 0.38


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def build(spark):
    rng = np.random.default_rng(42)
    cents = rng.normal(size=(K_CELLS, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    n_hot = int(N * HOT_FRAC)
    owner = np.concatenate(
        [np.zeros(n_hot, dtype=int),
         rng.integers(1, K_CELLS, size=N - n_hot)]
    )
    vecs = cents[owner] + rng.normal(scale=0.15, size=(N, DIM))
    rows = [(int(i), [float(v) for v in vecs[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, ve array<double>")
    cdf = spark.createDataFrame(
        [(int(i), [float(v) for v in cents[i]]) for i in range(K_CELLS)],
        "cid long, ce array<double>",
    )
    sqd = (
        _dot(F.col("ve"), F.col("ve"))
        - 2 * _dot(F.col("ve"), F.col("ce"))
        + _dot(F.col("ce"), F.col("ce"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sqd").asc(), F.col("cid").asc())
    cell_of = (
        df.crossJoin(F.broadcast(cdf))
        .withColumn("sqd", sqd)
        .withColumn("crk", F.row_number().over(w))
        .filter(F.col("crk") == 1)
        .select("vec_id", F.col("cid").alias("cell"), "ve")
    )
    return cell_of.persist()


def naive_pairs(cell_of):
    a = cell_of.select("cell", F.col("vec_id").alias("ia"), F.col("ve").alias("va"))
    b = cell_of.select("cell", F.col("vec_id").alias("ib"), F.col("ve").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va")))
        * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        a.join(b, ["cell"])
        .filter(F.col("ia") < F.col("ib"))
        .filter(cos >= TAU)
        .select("ia", "ib")
    )


def salted_pairs(cell_of):
    cand = salted_self_pairs(
        cell_of, "cell", "vec_id", ["ve"], split_target=2048
    )
    cos = _dot(F.col("ve_a"), F.col("ve_b")) / (
        F.sqrt(_dot(F.col("ve_a"), F.col("ve_a")))
        * F.sqrt(_dot(F.col("ve_b"), F.col("ve_b")))
    )
    return cand.filter(cos >= TAU).select(
        F.col("vec_id_a").alias("ia"), F.col("vec_id_b").alias("ib")
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    cell_of = build(spark)
    sizes = {r.cell: r.n for r in cell_of.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    hot = max(sizes.values())
    out = {
        "n_vectors": N,
        "dim": DIM,
        "hot_cell_rows": hot,
        "hot_cell_frac": round(hot / N, 3),
        "n_cells": len(sizes),
    }
    # one timed action per variant doubles as the correctness probe:
    # identical edge sets via order-insensitive aggregates
    def timed(fn, reps):
        times, sig = [], None
        for _ in range(reps):
            t0 = time.time()
            row = (
                fn(cell_of)
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("ia") * 31 + F.col("ib")).alias("s"),
                    F.expr("bit_xor(xxhash64(ia, ib))").alias("h"),
                )
                .collect()[0]
            )
            times.append(round(time.time() - t0, 2))
            sig = (row.n, row.s, row.h)
        return times, sig
    t_naive, sig_naive = timed(naive_pairs, 2)
    t_salted, sig_salted = timed(salted_pairs, 3)
    assert sig_naive == sig_salted, (sig_naive, sig_salted)
    out["edges"] = sig_naive[0]
    out["naive_one_task_per_cell_sec"] = t_naive
    out["salted_split_2048_sec"] = t_salted
    print(json.dumps(out, indent=2))
    with open("/root/repo/BENCH_SEMDEDUP_SKEW.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
