"""Deterministic training-shard packing via distributed prefix-sum.

A training-data export (WebDataset-style tar shards, TFRecord files,
Iceberg file groups) needs every row assigned a shard so that shards
come out approximately `target_bytes` each, the assignment is
DETERMINISTIC under rerun (resume/backfill must re-derive identical
manifests), and nothing is ordered through a single global window.

The classic trap is `sum(size) OVER (ORDER BY key)` with no partition:
Spark plans that as a single-partition window — one task owns all
10^10 rows. The scale-correct shape is the textbook two-level scan:

  1. bucket every row deterministically (pmod(key, B) — pure
     expression, no shuffle beyond the window's own),
  2. per-bucket byte totals: ONE tiny aggregate (B rows, map-side
     combined) collected to the driver,
  3. exclusive cumulative offsets over the B totals — O(B) driver
     work, broadcast back as a B-row join,
  4. within-bucket running sum (Window partitionBy bucket) + offset
     = the row's global byte offset in the (bucket, key) total order;
     shard = floor(offset / target_bytes).

Every row's offset equals what the forbidden global window would have
produced, but the only serial state is the B-element offset table.
B is a tunable: at 10^10 rows, B=10k buckets keeps each window sort at
~10^6 rows while the driver-side table stays trivially small.

Reference anchor: WebCollector's `segmentWriter` rotates fetch-segment
files by count on one node (`fetcher/Fetcher.java`, `WriterAndReader`);
this is the same "pack a stream into bounded files" contract made
deterministic and cluster-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    key: str,
    size: str,
    target_bytes: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign each row a shard id so consecutive rows (in (bucket, key)
    order) pack into ~target_bytes shards. Returns the input's key plus
    (bucket, start_offset, shard). Deterministic: same input -> same
    manifest, independent of partitioning and cluster size.

    Works with any orderable key: numeric keys bucket by `key mod B`
    (cheap, and the form the DuckDB oracle mirrors); non-numeric keys
    (image_id strings, URLs) bucket by `xxhash64(key) mod B` — still a
    pure deterministic expression, no extra shuffle."""
    spark = df.sparkSession
    key_type = df.schema[key].dataType.typeName()
    key_num = key_type in {"byte", "short", "integer", "long", "decimal"}
    bucket_src = F.col(key) if key_num else F.xxhash64(F.col(key))
    b = df.withColumn("bucket", F.pmod(bucket_src, F.lit(n_buckets)))

    # (2) + (3): per-bucket totals -> exclusive prefix offsets. The
    # collect is HARD-BOUNDED at n_buckets rows (driver holds B longs).
    totals = {
        r["bucket"]: r["tot"]
        for r in b.groupBy("bucket").agg(F.sum(size).alias("tot")).collect()
    }
    off, acc = [], 0
    for bucket in sorted(totals):
        off.append((bucket, acc))
        acc += int(totals[bucket])
    offsets = spark.createDataFrame(off, schema="bucket bigint, bucket_off bigint")

    # (4): within-bucket exclusive running sum + bucket offset.
    w = (
        Window.partitionBy("bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "start_offset",
            F.coalesce(F.sum(size).over(w), F.lit(0)) + F.col("bucket_off"),
        )
        .select(
            key,
            "bucket",
            "start_offset",
            F.floor(F.col("start_offset") / F.lit(target_bytes)).alias("shard"),
        )
    )


def shard_manifest(assigned: DataFrame) -> DataFrame:
    """Per-shard manifest over a pack_shards result: row count and the
    [min, max] offset span — what the export job hands each writer
    task. One small hash-aggregate."""
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("start_offset").alias("first_offset"),
        F.max("start_offset").alias("last_offset"),
    )
