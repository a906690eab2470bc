"""Structured Streaming pipelines.

The reference is strictly batch (bulk-synchronous BFS rounds — SURVEY
§2.5 "Streaming: none"); these pipelines are the graft's forward path:
the same frontier/event dataflow expressed incrementally so a crawl's
fetched-page/metrics stream can be consumed continuously at cluster
scale (readStream -> watermarked windowed aggs -> writeStream, plus an
applyInPandasWithState sessionizer for custom stateful logic).

All pipelines take DataFrames or paths and return unstarted streaming
DataFrames/queries — callers pick sink + trigger (tests use
format("memory") + trigger(availableNow=True) for determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_windowed_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    the batch `events_hourly` registry query; late rows beyond the
    watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_rate(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding-window event rate (10 min window, 5 min slide) — the
    crawl-metrics shape (URLs/sec gauges) as a stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


SESSION_STATE_SCHEMA = "last_ts long, n_sessions long"
SESSION_OUT_SCHEMA = "user_id long, n_sessions long, n_events long"


def sessionize_with_state(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    session counting with a `gap_s` inactivity gap — the streaming
    equivalent of the batch `sessionize` registry query. Demonstrates
    the engine's escape hatch for semantics no built-in stateful op
    covers (the reference's per-host crawl state would use this shape).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(
                int(t.timestamp()) for t in pd.to_datetime(pdf["ts"]).tolist()
            )
        ts_list.sort()
        if state.exists:
            last_ts, n_sessions = state.get
        else:
            last_ts, n_sessions = None, 0
        n_events = len(ts_list)
        for t in ts_list:
            if last_ts is None or t - last_ts > gap_s:
                n_sessions += 1
            last_ts = t
        state.update((last_ts, n_sessions))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    stream: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drain a stream deterministically into an in-memory table
    (tests/bench): availableNow processes the full backlog then stops."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
