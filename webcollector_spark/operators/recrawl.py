"""Recrawl scheduling — the priority-queue side of the frontier.

The reference never revisits a SUCCESS page (status 5 is terminal,
crawldb/StatusGeneratorFilter.java:7-14); a production crawler must.
Recrawl here is expressed entirely through the existing merge
machinery: select stale rows, reset them to UNEXECUTED with a fresh
priority, and fold them through `store.merge` as a fetch-side segment
(last-wins update — the same row-level op as a fetch result). No new
write path, no snapshot semantics to re-prove.

Priority model (generate_per_host orders by priority ASC): a recrawled
row re-enters the queue with `priority = base + age_rank`, so the
stalest pages of each host surface first without starving fresh
discoveries (which carry priority 0.0 by default — set `base` > 0 to
de-prioritize recrawls, < 0 to prefer them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcollector_spark.schema import STATUS_DB_SUCCESS, STATUS_DB_UNEXECUTED


def recrawl_candidates(
    frontier: DataFrame,
    now_ms: int,
    min_age_ms: int,
    base_priority: float = 1.0,
    only_success: bool = True,
) -> DataFrame:
    """Rows due for recrawl, reset to UNEXECUTED.

    Selection: executed longer than `min_age_ms` ago (execute_time is
    recorded on every execution, Fetcher.java:266). `only_success`
    limits to status SUCCESS (FAILED rows are already retried by the
    normal generate path while execute_count budget remains).

    The returned rows merge as a fetch-side segment: execute_time is
    restamped to `now_ms` so the update wins the last-wins window, and
    execute_count is preserved (a recrawl is a new visit of a known
    page, not a retry of a failed one — the retry budget still applies
    on top).
    """
    cand = frontier.filter(
        F.col("execute_time").isNotNull()
        & (F.col("execute_time") <= F.lit(now_ms - min_age_ms))
    )
    if only_success:
        cand = cand.filter(F.col("status") == STATUS_DB_SUCCESS)
    # stalest-first within host: rank by execute_time ascending
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.col("execute_time").asc(), "key")
    return (
        cand.withColumn("__age_rank", F.row_number().over(w))
        .withColumn("status", F.lit(STATUS_DB_UNEXECUTED))
        .withColumn(
            "priority",
            F.lit(base_priority) + F.col("__age_rank").cast("double") / 1e6,
        )
        .withColumn("execute_time", F.lit(now_ms).cast("long"))
        .drop("__age_rank")
    )


def schedule_recrawl(
    store,
    now_ms: int,
    min_age_ms: int,
    base_priority: float = 1.0,
    only_success: bool = True,
) -> int:
    """Apply recrawl to a FrontierStore: merge the candidates as a
    fetch-side (update) segment. Returns number of rows rescheduled."""
    cand = recrawl_candidates(
        store.load(), now_ms, min_age_ms, base_priority, only_success
    )
    n = cand.count()
    if n:
        store.merge(cand, None)
    return n
