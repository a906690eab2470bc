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
    fit_k_by_host: DataFrame | None = None,
) -> DataFrame:
    """Graft scheduler: per-host top-k (priority asc, depth asc, key asc),
    salted two-phase to defuse host skew, optional global topN on top.

    priority is a double (lower = sooner); the reference has no priority
    so reference-equivalent runs set priority=0 and this degrades to
    per-host key order.

    `fit_k_by_host` (optional, columns `host` + `__fit_k` long): a
    per-host clamp on k — a host's effective budget is
    min(k_per_host, its __fit_k); hosts absent from the table get the
    full k. Fed by `host_budget_plan`-style politeness math in the
    crawler (a Crawl-delay-30 host must not be handed 100 picks it
    would drain for 50 minutes). Left-joined on `host` — the same key
    the ranking windows shuffle on, so AQE co-plans it with phase 2.
    """
    cand = generatable(frontier, max_execute_count, generator_filter)
    order = [F.col("priority").asc(), F.col("depth").asc(), F.col("key").asc()]

    k_eff = F.lit(k_per_host)
    if fit_k_by_host is not None:
        cand = cand.join(
            fit_k_by_host.select("host", "__fit_k"), "host", "left"
        )
        k_eff = F.least(
            F.lit(k_per_host).cast("long"),
            F.coalesce(F.col("__fit_k"), F.lit(k_per_host).cast("long")),
        )

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
    # (Phase 1 keeps the full k per bucket — a superset of any clamped
    # budget — so the per-host clamp only needs to bite here.)
    w2 = Window.partitionBy("host").orderBy(*order)
    out = (
        cand.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k_eff)
        .drop("__rk", "__fit_k")
    )
    if top_n and top_n > 0:
        # Global budget across hosts: cheapest-first by the same order.
        out = out.orderBy("priority", "depth", "key").limit(top_n)
    return out


def host_budget_plan(
    candidates: DataFrame,
    per_host_top_k: int,
    default_delay_ms: int = 200,
    target_round_ms: int | None = None,
) -> DataFrame:
    """Politeness-bound capacity plan for the NEXT crawl round — the
    planning twin of `generate_per_host`. The fetcher serializes
    requests within a host bucket (crawl-delay politeness,
    operators/fetch.py), so a round's wall-time has a hard lower bound
    of max over hosts of picks x delay, no matter how many executors
    exist: adding cores past that point buys nothing. The reference
    tunes this blind (fixed topN + a global executeInterval,
    crawldb/Generator.java:49-78 + util/Config.java); at a 10^10-URL
    frontier the binding host must be FOUND, not guessed.

    Input: one row per generatable candidate with `host` and optionally
    a per-host `crawl_delay_ms` (e.g. from the RobotsCache); missing or
    NULL delay falls back to `default_delay_ms`. Output, one row per
    host:

    * pending          — generatable URLs on the host;
    * delay_ms         — the politeness delay the plan priced;
    * picks            — min(pending, per_host_top_k): what generate
                         would schedule;
    * drain_sec        — picks x delay / 1000: the host bucket's serial
                         drain time;
    * round_floor_sec  — max(drain_sec): the politeness floor on round
                         wall-time (same value every row);
    * binding          — this host IS the floor (the scheduler's skew
                         answer: lower k or raise parallel host count,
                         nothing else moves the needle);
    * fit_k            — only when `target_round_ms` is given: the
                         largest per-host k that keeps this host's
                         drain under the target (integer division, so
                         it is exactly reproducible cross-engine).

    Scale shape: one map-side-combined count per host (#hosts rows out
    of 10^10 inputs), then a 1-row global-max broadcast join — the same
    normalizer pattern as source_mixture_weights. Nothing collects to
    the driver; no window over an unpartitioned set."""
    delay = (
        F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms))
        if "crawl_delay_ms" in candidates.columns
        else F.lit(default_delay_ms)
    )
    per_host = candidates.groupBy("host").agg(
        F.count(F.lit(1)).alias("pending"),
        F.max(delay.cast("long")).alias("delay_ms"),
    )
    plan = per_host.select(
        "host",
        "pending",
        "delay_ms",
        F.least(F.col("pending"), F.lit(per_host_top_k).cast("long")).alias("picks"),
    ).withColumn("drain_sec", F.col("picks") * F.col("delay_ms") / F.lit(1000.0))
    floor_row = plan.agg(F.max("drain_sec").alias("round_floor_sec"))
    out = plan.join(F.broadcast(floor_row)).withColumn(
        "binding", F.col("drain_sec") == F.col("round_floor_sec")
    )
    if target_round_ms is not None:
        out = out.withColumn(
            "fit_k", F.expr(f"CAST({int(target_round_ms)} DIV delay_ms AS BIGINT)")
        )
    return out
