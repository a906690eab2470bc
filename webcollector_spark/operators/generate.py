"""O2 Generate — the frontier scan (reference crawldb/Generator.java:49-78).

Reference semantics (the ONLY ordering in the system — key-lexicographic
KV iteration, RocksGenerator.java:38-53): per round, generate the first
`topN` keys in sorted order with status != SUCCESS and
execute_count <= max_execute_count (STRICT `>` drop, Generator.java:65).

Two modes:

* `generate()` — reference-exact: filter + orderBy(key) + limit. Catalyst
  compiles orderBy+limit into TakeOrderedAndProject (no full sort
  materialization) and pushes both filters into the parquet scan.
* `generate_per_host()` — the graft's scaled scheduler: a partitioned
  priority queue. Top-k per host by (priority, depth, key) via a
  two-phase salted window: phase 1 ranks within (host, salt) buckets so
  a hot host (50% of a 10^10 frontier) never lands in one task; phase 2
  re-ranks the <= salt*k survivors per host — a tiny shuffle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webcollector_spark.schema import STATUS_DB_SUCCESS


def generatable(
    frontier: DataFrame,
    max_execute_count: int = 10,
    generator_filter=None,
) -> DataFrame:
    """The generate predicate: not-yet-successful and retry budget left.

    Both conditions push down to the scan (check .explain for
    PushedFilters on status/execute_count).

    `generator_filter` is the pluggable GeneratorFilter slot (reference
    crawldb/GeneratorFilter.java:6-14, applied Generator.java:58-70),
    in two forms:

    * a SQL boolean expression over the frontier columns, e.g.
      "depth <= 4 AND host LIKE '%.example.com'" — the FAST PATH: stays
      Catalyst-visible (pushdown/pruning/codegen). Prefer it whenever
      the predicate is expressible.
    * an arbitrary Python callable row-dict -> bool (the reference
      accepts any GeneratorFilter implementation) — applied as an
      Arrow-batched pandas UDF inside the generate scan, BEFORE
      orderBy/topN, preserving the reference's filter-then-count
      semantics (Generator.java:53-68). Vectorized batching keeps it
      off the driver and off per-row Python at the Spark boundary;
      it still blocks predicate pushdown, hence the SQL fast path.
    """
    out = frontier.filter(
        (F.col("status") != STATUS_DB_SUCCESS)
        & (F.col("execute_count") <= max_execute_count)
    )
    if generator_filter is None:
        return out
    if callable(generator_filter):
        fn = generator_filter
        cols = out.columns

        @F.pandas_udf("boolean")
        def __keep(batch: pd.DataFrame) -> pd.Series:
            return pd.Series([bool(fn(r)) for r in batch.to_dict("records")])

        return out.filter(__keep(F.struct(*[F.col(c) for c in cols])))
    return out.filter(generator_filter)


def generate(
    frontier: DataFrame,
    top_n: int = 0,
    max_execute_count: int = 10,
    generator_filter=None,
) -> DataFrame:
    """Reference-exact generate: sorted-key order, global topN."""
    out = generatable(frontier, max_execute_count, generator_filter).orderBy("key")
    if top_n and top_n > 0:
        out = out.limit(top_n)
    return out


def generate_per_host(
    frontier: DataFrame,
    k_per_host: int,
    max_execute_count: int = 10,
    top_n: int = 0,
    salt_buckets: int = 8,
    generator_filter=None,
) -> DataFrame:
    """Graft scheduler: per-host top-k (priority asc, depth asc, key asc),
    salted two-phase to defuse host skew, optional global topN on top.

    priority is a double (lower = sooner); the reference has no priority
    so reference-equivalent runs set priority=0 and this degrades to
    per-host key order.
    """
    cand = generatable(frontier, max_execute_count, generator_filter)
    order = [F.col("priority").asc(), F.col("depth").asc(), F.col("key").asc()]

    if salt_buckets > 1:
        # Phase 1: rank inside (host, salt) — salt from key hash so it is
        # deterministic; keep k per bucket (superset of the true top-k).
        salted = cand.withColumn(
            "__salt", F.pmod(F.xxhash64("key"), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy("host", "__salt").orderBy(*order)
        cand = (
            salted.withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k_per_host)
            .drop("__salt", "__r1")
        )

    # Phase 2: exact top-k per host over <= salt_buckets*k survivors.
    w2 = Window.partitionBy("host").orderBy(*order)
    out = (
        cand.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k_per_host)
        .drop("__rk")
    )
    if top_n and top_n > 0:
        # Global budget across hosts: cheapest-first by the same order.
        out = out.orderBy("priority", "depth", "key").limit(top_n)
    return out
