"""Frontier snapshot diff + backlog report — the crawl-ops queries.

The reference exposes its CrawlDB only through a pretty-printer
(`util/CrawlDatumFormater.java`, `crawler/Crawler.java` info logs); an
operated 10^10-row frontier needs two standing questions answered
cheaply: *what changed between two rounds* (did the merge do what the
round metrics claim? what did a resume replay?) and *what's queued where*
(which hosts dominate the backlog; how stale is the oldest pending row).

Shapes:
* `frontier_delta` is ONE full-outer join on `key` — the frontier's
  merge key, so two snapshots of the same store co-partition and the
  join is the cheapest it can be; output is O(keys), classification is
  pure codegen CASE;
* `delta_summary` / `frontier_backlog` are single map-side-combinable
  aggregates over that join / the live snapshot — O(kinds) and O(hosts)
  rows, the dashboard tables.

With the Iceberg deployment (iceberg_store.py) `frontier_delta` is the
engine-agnostic twin of snapshot time travel: diff any two committed
round states without replaying the rounds between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcollector_spark.schema import STATUS_DB_SUCCESS


def frontier_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-key change classification between two frontier snapshots.

    change ∈ added | removed | status_changed | refetched (same status,
    execute_count grew — a retry or recrawl) | unchanged. Returns key,
    change, old/new status and execute_count (nulls on the absent
    side)."""
    o = old.select(
        "key",
        F.col("status").alias("old_status"),
        F.col("execute_count").alias("old_execute_count"),
    )
    n = new.select(
        "key",
        F.col("status").alias("new_status"),
        F.col("execute_count").alias("new_execute_count"),
    )
    j = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("old_status").isNull(), F.lit("added"))
        .when(F.col("new_status").isNull(), F.lit("removed"))
        .when(F.col("old_status") != F.col("new_status"), F.lit("status_changed"))
        .when(
            F.col("new_execute_count") > F.col("old_execute_count"),
            F.lit("refetched"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "key",
        change.alias("change"),
        "old_status",
        "new_status",
        "old_execute_count",
        "new_execute_count",
    )


def delta_summary(delta: DataFrame) -> DataFrame:
    """O(kinds) rollup of a frontier_delta: row count per change kind
    plus how many of them ended SUCCESS — the one-line answer to 'what
    did this round actually do'."""
    now_success = F.coalesce(
        (F.col("new_status") == STATUS_DB_SUCCESS).cast("long"), F.lit(0)
    )
    return delta.groupBy("change").agg(
        F.count("*").alias("n"),
        # null new_status (removed rows) counts as 0, not null-sum
        F.sum(now_success).alias("n_now_success"),
    )


def frontier_backlog(
    frontier: DataFrame, max_execute_count: int = 10
) -> DataFrame:
    """Per-host queue health: pending/succeeded/failed/exhausted counts,
    the oldest pending row's last-execute time (staleness), and the
    worst retry depth. One map-side-combinable aggregate, O(hosts)
    output — the table a scheduler dashboard polls every round."""
    s = F.col("status")
    pending = (s != STATUS_DB_SUCCESS) & (
        F.col("execute_count") <= max_execute_count
    )
    return frontier.groupBy("host").agg(
        F.sum(pending.cast("long")).alias("n_pending"),
        F.sum((s == STATUS_DB_SUCCESS).cast("long")).alias("n_success"),
        F.sum(
            ((s != STATUS_DB_SUCCESS) & (F.col("execute_count") > 0)).cast(
                "long"
            )
        ).alias("n_failed_tried"),
        F.sum(
            (
                (s != STATUS_DB_SUCCESS)
                & (F.col("execute_count") > max_execute_count)
            ).cast("long")
        ).alias("n_exhausted"),
        F.min(F.when(pending, F.col("execute_time"))).alias(
            "oldest_pending_ms"
        ),
        F.max("execute_count").alias("max_tries"),
    )


def revalidation_savings(fetch_log: DataFrame) -> DataFrame:
    """Per-host conditional-revalidation telemetry: how much of a
    recrawl round the 304 path actually saved (the operations view of
    CrawlerConfig.revalidate).

    Input: one row per fetch with `host`, `code` (200 or 304), and
    `size_bytes` — for a 200 the transferred payload size, for a 304
    the size the stored validator's payload had (what WOULD have been
    re-transferred; the fetched history carries it). Output one row per
    host: fetch count, 304 count, integer not-modified percent (`div`,
    bit-reproducible cross-engine), bytes actually transferred, and
    bytes saved. One map-side-combinable aggregate, O(hosts) output —
    feeds the same scheduler dashboard as frontier_backlog; a host
    whose save-rate collapses is churning content and belongs on a
    shorter recrawl interval (change_rate_intervals)."""
    is_304 = (F.col("code") == 304).cast("long")
    return (
        fetch_log.groupBy("host")
        .agg(
            F.count("*").alias("fetches"),
            F.sum(is_304).alias("n_not_modified"),
            F.sum(
                F.when(F.col("code") == 200, F.col("size_bytes")).otherwise(
                    F.lit(0)
                )
            ).alias("bytes_transferred"),
            F.sum(
                F.when(F.col("code") == 304, F.col("size_bytes")).otherwise(
                    F.lit(0)
                )
            ).alias("bytes_saved"),
        )
        .withColumn(
            "not_modified_pct",
            F.expr("n_not_modified * 100 div fetches").cast("long"),
        )
        .select(
            "host", "fetches", "n_not_modified", "not_modified_pct",
            "bytes_transferred", "bytes_saved",
        )
    )
