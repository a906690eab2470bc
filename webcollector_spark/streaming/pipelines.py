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


DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _minhash_bands(docs: DataFrame) -> DataFrame:
    """Same MinHash band signature as the batch registry (plans/queries
    _minhash_sig: one md5 per shingle, h1+i*h2 permutations), computed
    ROW-LOCALLY with array expressions — no aggregation, so it chains
    into the stateful operator without tripping the
    no-unwatermarked-aggregation streaming rule."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    t = F.col("t")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        )
    )
    hs = F.transform(F.col("sh"), lambda w: F.md5(w))
    h1 = F.transform(F.col("hs"), lambda h: F.conv(h.substr(1, 15), 16, 10).cast("long"))
    h2 = F.transform(
        F.col("hs"),
        lambda h: F.expr("0L") + F.conv(h.substr(17, 15), 16, 10).cast("long"),
    )
    h2 = F.transform(h2, lambda v: v.bitwiseOR(F.lit(1)))

    def mh(i: int):
        return F.array_min(
            F.zip_with(F.col("h1"), F.col("h2"), lambda a, b: a + F.lit(i) * b)
        ).cast("string")

    sig = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", sh.alias("sh"))
        .select("doc_id", F.col("sh"), hs.alias("hs"))
        .select("doc_id", h1.alias("h1"), h2.alias("h2"))
        .select(
            "doc_id",
            F.concat_ws("_", mh(0), mh(1)).alias("band0"),
            F.concat_ws("_", mh(2), mh(3)).alias("band1"),
        )
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("0:"), "band0"), F.concat(F.lit("1:"), "band1")
            )
        ).alias("band_key"),
    )


NEARDUP_STATE_SCHEMA = "doc_ids array<long>"
NEARDUP_OUT_SCHEMA = "doc_a long, doc_b long, band_key string"


def neardup_stream(docs: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Streaming near-dup detection: LSH band bucket as the state key,
    per-bucket doc-id list as state (capped at `max_bucket`); every
    incoming doc pairs with all prior docs in its bucket. Within a
    micro-batch, docs pair among themselves too, so draining a static
    directory in one availableNow batch reproduces the batch
    `lsh_candidate_pairs` result exactly (modulo the cap) — the
    streaming/batch equivalence test pins this.

    Requires complete-mode-free sinks: output is append-style pairs.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    bands = _minhash_bands(docs)

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        seen: list[int] = list(state.get[0]) if state.exists else []
        new_ids: list[int] = []
        for pdf in pdfs:
            new_ids.extend(int(x) for x in pdf["doc_id"].tolist())
        new_ids.sort()
        rows = []
        for d in new_ids:
            for s in seen:
                if s != d:
                    a, b = (s, d) if s < d else (d, s)
                    rows.append({"doc_a": a, "doc_b": b, "band_key": key[0]})
            if len(seen) < max_bucket:
                seen.append(d)
        state.update((seen,))
        yield pd.DataFrame(rows, columns=["doc_a", "doc_b", "band_key"])

    return bands.groupBy("band_key").applyInPandasWithState(
        fn,
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CAPTION_SPAM_STATE_SCHEMA = "phashes array<long>, flagged boolean"
CAPTION_SPAM_OUT_SCHEMA = "caption_norm string, n_phashes int"

CAPTION_META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("caption", T.StringType()),
    ]
)


def read_caption_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over fetched image metadata (the columns the
    crawl's fetched_history table carries for caption curation)."""
    reader = spark.readStream.schema(CAPTION_META_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def caption_spam_stream(
    rows: DataFrame, min_phashes: int = 3, max_track: int = 64
) -> DataFrame:
    """Streaming boilerplate-alt-text detector: the incremental twin of
    batch `captions.caption_spam`. State key = normalized caption;
    state = the distinct phashes seen so far (capped at `max_track` —
    past the flag threshold exact counts stop mattering) + a flagged
    bit. Emits ONE row per caption, at the micro-batch where its
    distinct-picture count first reaches `min_phashes` — so a crawl can
    blocklist a spam caption mid-flight instead of at end-of-crawl.

    NULL captions (missing alt text) fold into the "" group: both are
    the same pathology and state keys must be non-null.

    One-batch drain of a static directory flags exactly the captions
    batch `caption_spam` flags (equivalence test pins this)."""
    from webcollector_spark.operators.captions import caption_norm

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = rows.select(
        F.coalesce(caption_norm(), F.lit("")).alias("caption_norm"), "phash"
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            seen, flagged = set(state.get[0]), bool(state.get[1])
        else:
            seen, flagged = set(), False
        for pdf in pdfs:
            for ph in pdf["phash"]:
                if ph is not None and not pd.isna(ph) and len(seen) < max_track:
                    seen.add(int(ph))
        out = []
        if not flagged and len(seen) >= min_phashes:
            flagged = True
            out.append({"caption_norm": key[0], "n_phashes": len(seen)})
        state.update((sorted(seen), flagged))
        yield pd.DataFrame(out, columns=["caption_norm", "n_phashes"])

    return keyed.groupBy("caption_norm").applyInPandasWithState(
        fn,
        outputStructType=CAPTION_SPAM_OUT_SCHEMA,
        stateStructType=CAPTION_SPAM_STATE_SCHEMA,
        outputMode="append",
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


CAPTION_CONFLICT_STATE_SCHEMA = "cap0 string, conflicted boolean"
CAPTION_CONFLICT_OUT_SCHEMA = "phash long, cap0 string, cap_other string"


def caption_conflict_stream(rows: DataFrame) -> DataFrame:
    """Streaming label-noise detector at the CLUSTER level: the
    incremental twin of the hamming-0 core of batch
    `captions.caption_conflict_flags`. State key = phash (the exact-dup
    cluster identity); state = (first non-null normalized caption seen,
    flagged bit) — BOUNDED per cluster, so a 10^7-member boilerplate
    mega-cluster costs the same state as a pair, where a pair-emitting
    stream would hold members and emit C(g,2) rows. Emits ONE row per
    cluster at the micro-batch where a disagreeing caption first
    arrives, carrying both captions (the label-noise evidence a crawl
    can route to curation mid-flight).

    NULL/missing alt text never conflicts (matches the batch SQL
    semantics: cap != NULL is never true) and cannot seed cap0.

    Scope: hamming-0 clusters only — the cross-hash (hamming 1..k)
    component needs the blocked candidate join over distinct hashes,
    which is a batch shape; run it per checkpoint over the accumulated
    cluster summaries instead. One-batch drain of a static directory
    flags exactly the multi-caption clusters batch `caption_dedup`
    reports with n_caps >= 2 (equivalence test pins this)."""
    from webcollector_spark.operators.captions import caption_norm

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = rows.select("phash", caption_norm().alias("cap"))

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            cap0, conflicted = state.get[0], bool(state.get[1])
        else:
            cap0, conflicted = None, False
        out = []
        for pdf in pdfs:
            for cap in pdf["cap"]:
                if cap is None or (isinstance(cap, float) and pd.isna(cap)):
                    continue
                if cap0 is None:
                    cap0 = cap
                elif cap != cap0 and not conflicted:
                    conflicted = True
                    out.append(
                        {"phash": key[0], "cap0": cap0, "cap_other": cap}
                    )
        state.update((cap0, conflicted))
        yield pd.DataFrame(out, columns=["phash", "cap0", "cap_other"])

    return keyed.groupBy("phash").applyInPandasWithState(
        fn,
        outputStructType=CAPTION_CONFLICT_OUT_SCHEMA,
        stateStructType=CAPTION_CONFLICT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Cross-hash streaming caption conflict (hamming 1..k) — foreachBatch
# ---------------------------------------------------------------------------

CROSSHASH_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("phash", T.LongType()),
        T.StructField("multi", T.BooleanType()),
        T.StructField("cap0", T.StringType()),
    ]
)
CROSSHASH_FLAGS_SCHEMA = T.StructType(
    [
        T.StructField("phash", T.LongType()),
        T.StructField("batch_id", T.LongType()),
    ]
)


def _read_parquet_or_empty(spark, path, schema):
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def caption_conflict_crosshash_stream(
    rows: DataFrame,
    work_dir: str,
    max_hamming: int = 4,
    query_name: str = "caption_conflict_crosshash",
):
    """Full-radius streaming caption-conflict detector: the incremental
    twin of batch `captions.caption_conflict_flags` at the CLUSTER
    level, covering hamming 0..max_hamming — not just the hamming-0
    core that `caption_conflict_stream` handles with per-key state.

    Shape: the cross-hash component is a JOIN across state keys
    (cluster A's flag depends on neighbor cluster B's captions), which
    `applyInPandasWithState` cannot express — state there is strictly
    per-key. So this runs as a `foreachBatch` step over ACCUMULATED
    per-cluster summaries, exactly as the batch docstring prescribes:

    * per micro-batch, fold the batch into a persistent per-cluster
      summary store (`{work_dir}/summary/v{batch}` + CURRENT pointer):
      one row per distinct phash with a SATURATING distinct-caption
      bit (`multi` — past 2 the exact count stops mattering) and
      cap0 = min non-null normalized caption. Bounded state: O(distinct
      hashes), never O(images), the same reason the batch flag operator
      survives a Zipfian corpus.
    * run the blocked candidate stage (images._block_combo_keys —
      Manku block-combination keys, pigeonhole-complete at
      hamming <= k) INCREMENTALLY: only hashes touched this batch key
      the probe side; the full store keys the build side with the same
      `shuffle_hash` hint as batch (the explode-then-broadcast planner
      trap applies here identically). New flags can only involve a
      touched cluster or its neighbors, and both appear in the
      touched x all candidate set, so per-batch join work is
      O(touched x C(m, m-k)) probe fan-out.
    * conflict flags are MONOTONE (captions only accumulate; a
      conflicting pair never un-conflicts), so newly-flagged clusters
      are appended once to `{work_dir}/flags` (anti-join against the
      already-emitted set) with the batch id where the evidence first
      completed — the mid-flight signal a crawl routes to curation.

    All-NULL-caption clusters are never flagged (no captioned member
    exists to be conflicted — matches the batch per-image
    `cap IS NOT NULL` mask at cluster granularity).

    At production scale the summary store and flag log live in a table
    format with MERGE (store.py's LSM / Iceberg seam); the versioned
    parquet + pointer here is the same last-wins contract with only
    stdlib dependencies. The build-side key table is recomputed per
    batch — a deployment would persist it bucketed by (combo, bkey)
    and append only touched hashes' keys.

    Returns the STARTED StreamingQuery (availableNow trigger drains the
    backlog in maxFilesPerTrigger-sized micro-batches, then stops);
    flags accumulate at `{work_dir}/flags` as (phash, batch_id).
    """
    import os

    from webcollector_spark.operators.captions import caption_norm
    from webcollector_spark.operators.images import (
        _block_combo_keys,
        _min_intact_combo,
    )

    m = 8
    t = m - max_hamming
    summary_root = os.path.join(work_dir, "summary")
    pointer = os.path.join(summary_root, "CURRENT")
    flags_dir = os.path.join(work_dir, "flags")
    os.makedirs(summary_root, exist_ok=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bsum = (
            batch_df.select("phash", caption_norm("caption").alias("cap"))
            .groupBy("phash")
            .agg(
                (F.countDistinct("cap") >= 2).alias("multi"),
                F.min("cap").alias("cap0"),
            )
        )
        touched = bsum.select("phash")
        if os.path.exists(pointer):
            with open(pointer) as fh:
                cur = spark.read.schema(CROSSHASH_SUMMARY_SCHEMA).parquet(
                    os.path.join(summary_root, fh.read().strip())
                )
            # saturating merge: multi sticks; two unanimous sides with
            # different non-null captions become multi (countDistinct
            # ignores NULLs, so an all-NULL side never manufactures a
            # second caption)
            merged = (
                cur.unionByName(bsum)
                .groupBy("phash")
                .agg(
                    (
                        F.max(F.col("multi").cast("int")).cast("boolean")
                        | (F.countDistinct("cap0") >= 2)
                    ).alias("multi"),
                    F.min("cap0").alias("cap0"),
                )
            )
        else:
            merged = bsum
        vdir = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(summary_root, vdir)
        )
        merged = spark.read.schema(CROSSHASH_SUMMARY_SCHEMA).parquet(
            os.path.join(summary_root, vdir)
        )

        # incremental blocked candidate stage: touched (probe) x all
        probe = _block_combo_keys(
            merged.join(touched, "phash", "left_semi").select(
                F.col("phash").alias("ph")
            ),
            "_a", "ph_c", max_hamming, m, "ph", "ph",
        ).drop("_a")
        build = _block_combo_keys(
            merged.select(F.col("phash").alias("ph")),
            "_b", "ph_o", max_hamming, m, "ph", "ph",
        ).drop("_b")
        xor = F.col("ph_c").bitwiseXOR(F.col("ph_o"))
        cand = (
            probe.hint("shuffle_hash")
            .join(build, ["combo", "bkey"])
            .filter(F.col("ph_c") != F.col("ph_o"))
            .filter(F.bit_count(xor) <= max_hamming)
            .filter(F.col("combo") == _min_intact_combo(xor, m, t))
            .select("ph_c", "ph_o")
            .join(
                merged.select(
                    F.col("phash").alias("ph_c"),
                    F.col("multi").alias("multi_c"),
                    F.col("cap0").alias("cap0_c"),
                ),
                "ph_c",
            )
            .join(
                merged.select(
                    F.col("phash").alias("ph_o"),
                    F.col("multi").alias("multi_o"),
                    F.col("cap0").alias("cap0_o"),
                ),
                "ph_o",
            )
        )
        differ = F.col("cap0_c") != F.col("cap0_o")  # NULL-false
        nbr_flag = (
            cand.filter(F.col("multi_o") | differ)
            .select(F.col("ph_c").alias("phash"))
            .unionAll(
                cand.filter(F.col("multi_c") | differ).select(
                    F.col("ph_o").alias("phash")
                )
            )
        )
        self_flag = (
            merged.join(touched, "phash", "left_semi")
            .filter("multi")
            .select("phash")
        )
        flagged_now = (
            self_flag.unionAll(nbr_flag)
            .distinct()
            # a cluster with no captioned member has nothing to mislabel
            .join(merged.filter(F.col("cap0").isNotNull()), "phash", "left_semi")
        )
        emitted = _read_parquet_or_empty(
            spark, flags_dir, CROSSHASH_FLAGS_SCHEMA
        ).select("phash")
        new_flags = flagged_now.join(emitted, "phash", "left_anti").select(
            "phash", F.lit(batch_id).cast("long").alias("batch_id")
        )
        new_flags.write.mode("append").parquet(flags_dir)
        with open(pointer, "w") as fh:
            fh.write(vdir)

    return (
        rows.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(work_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming training-data export — foreachBatch over the tar sink
# ---------------------------------------------------------------------------


def read_corpus_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over curated image+caption corpus rows
    (input_hint shape) — what a continuous crawl's curation stage
    appends for export."""
    from webcollector_spark.schema import CORPUS_SCHEMA

    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def export_stream(
    rows: DataFrame,
    out_dir: str,
    *,
    target_bytes: int = 64 * 1024 * 1024,
    n_buckets: int = 32,
    query_name: str = "wds_export",
):
    """Incremental twin of the batch export sink: a continuous crawl's
    curated rows land as WebDataset tar shards as they arrive, so
    training data is consumable mid-crawl instead of after a terminal
    batch export.

    Per micro-batch: `pack_shards` packs THIS batch's rows (payloads
    ride the packer's own shuffle via carry= — no second corpus
    shuffle), then `write_webdataset` writes them under
    `{out_dir}/shards`. Batch-local shard ids are offset by
    `batch_id << 20`, which makes ids globally unique with ZERO
    cross-batch state — no high-water-mark pointer to persist, fsync,
    or race on (a batch would need > 2^20 shards ≈ 64 TiB at the
    default target_bytes to collide).

    Exactly-once story: Structured Streaming's checkpoint fixes each
    batch's source offsets, so a replayed batch re-derives the SAME
    rows -> same pack -> same shard ids -> bit-identical tars; the
    writer's skip-existing + atomic-rename then makes the replay a
    no-op (written=false), and the per-batch manifest parquet is
    overwritten in place (`.../manifest/batch_id=N`) — idempotent, not
    append-duplicated. The batch sink's global-determinism contract
    narrows to per-batch determinism: WHICH batch a row lands in
    depends on arrival, but every emitted tar is reproducible from its
    batch's offsets, and `read_webdataset` over `{out_dir}/shards`
    sees the union either way.

    Returns the started query (availableNow drains the backlog in
    micro-batches, then stops).
    """
    import os

    from webcollector_spark.operators.shards import pack_shards, write_webdataset

    shards_dir = os.path.join(out_dir, "shards")
    manifest_root = os.path.join(out_dir, "manifest")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sized = batch_df.withColumn("n_bytes", F.length("bytes").cast("long"))
        assigned = pack_shards(
            sized,
            key="image_id",
            size="n_bytes",
            target_bytes=target_bytes,
            n_buckets=n_buckets,
            carry=("bytes", "caption", "fmt"),
        ).withColumn("shard", F.col("shard") + F.lit(int(batch_id) << 20))
        # the Hive-style dir name supplies batch_id on read-back;
        # writing it as a data column too would collide with partition
        # inference (COLUMN_ALREADY_EXISTS)
        write_webdataset(assigned, shards_dir).write.mode("overwrite").parquet(
            os.path.join(manifest_root, f"batch_id={batch_id}")
        )

    return (
        rows.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(out_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


CHUNK_DEDUP_STATE_SCHEMA = "owner long"
CHUNK_DEDUP_OUT_SCHEMA = "doc_id long, pos int, kept boolean"


def chunk_dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of the batch `chunk_dedup_exact` registry query:
    row-local 10-token chunking (no aggregation before the stateful
    operator), then per-chunk-md5 state holding the first owner
    (doc_id*1e6 + pos). A chunk row is `kept` iff it IS the owner.
    Within a micro-batch the minimum identity wins — so draining a
    static directory in one availableNow batch reproduces the batch
    query's keep set exactly; across batches the earlier batch wins
    (arrival order), the streaming-native contract. State is one long
    per distinct chunk — the smallest possible footprint for exact
    first-occurrence dedup."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    n_chunks = F.ceil(F.size(F.col("t")) / F.lit(10.0)).cast("int")
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    chunks = (
        docs.select("doc_id", toks.alias("t"))
        .select("doc_id", "t", F.explode(idx).alias("pos"))
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.array_join(
                    F.slice(F.col("t"), F.col("pos") * 10 + 1, 10), " "
                )
            ).alias("h"),
        )
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        owner = int(state.get[0]) if state.exists else None
        rows = []
        batch = []
        for pdf in pdfs:
            batch.extend(
                (int(r["doc_id"]), int(r["pos"]))
                for r in pdf.to_dict("records")
            )
        # min identity wins within the batch (batch-equivalence)
        batch.sort(key=lambda t: t[0] * 1_000_000 + t[1])
        for doc_id, pos in batch:
            ident = doc_id * 1_000_000 + pos
            if owner is None:
                owner = ident
            rows.append(
                {"doc_id": doc_id, "pos": pos, "kept": ident == owner}
            )
        state.update((owner,))
        yield pd.DataFrame(rows, columns=["doc_id", "pos", "kept"])

    return chunks.groupBy("h").applyInPandasWithState(
        fn,
        outputStructType=CHUNK_DEDUP_OUT_SCHEMA,
        stateStructType=CHUNK_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRAP_STATE_SCHEMA = "n_docs long, regs array<int>"
TRAP_OUT_SCHEMA = (
    "host string, template string, n_docs long, n_urls_est long, "
    "is_trap boolean"
)


def url_trap_stream(docs: DataFrame, b: int = 10) -> DataFrame:
    """Streaming crawl-trap detector — the stateful twin of the batch
    `url_trap_templates` / `url_trap_hll` pair: per (host, template)
    state is the fetch count plus 2^b HLL registers, so distinct-URL
    growth is tracked in BOUNDED state (a calendar trap emitting 10^9
    unique URLs still costs exactly 2^b ints of state — an exact
    distinct set would BE the trap's memory blow-up, relocated into the
    state store). Each micro-batch emits the key's updated
    (n_docs, n_urls_est, is_trap) row; the trap rule is the same
    scale-free integer comparison as batch (est >= 5 and
    est*10 >= 9*n_docs).

    Equivalence contract (pinned in test_streaming.py): registers are
    an order-free max-fold and the estimate is a deterministic
    fixed-order fold of them (sketch.estimate_from_registers), so the
    final per-key row is IDENTICAL however the input is micro-batched —
    a one-batch drain and a file-at-a-time drain agree bit-for-bit with
    the batch `url_trap_hll` registers' estimate. The 60-bit hash is
    computed JVM-side (same expression as the batch scan); the Python
    state fold touches integers only."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from webcollector_spark.operators.sketch import (
        _hash60,
        estimate_from_registers,
        py_bucket_rho,
    )
    from webcollector_spark.plans.queries import trap_url_rows

    rows = trap_url_rows(docs).select(
        "host", "template", _hash60(F.col("url")).alias("hv")
    )
    m = 1 << b

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        host, template = key
        if state.exists:
            n_docs, regs_state = state.get
            regs = list(regs_state)
        else:
            n_docs, regs = 0, [0] * m
        for pdf in pdfs:
            for hv in pdf["hv"]:
                n_docs += 1
                bkt, rho = py_bucket_rho(int(hv), b)
                if rho > regs[bkt]:
                    regs[bkt] = rho
        state.update((n_docs, regs))
        est = estimate_from_registers(
            {j: v for j, v in enumerate(regs) if v}, b
        )
        yield pd.DataFrame(
            [
                {
                    "host": host,
                    "template": template,
                    "n_docs": n_docs,
                    "n_urls_est": est,
                    "is_trap": bool(est >= 5 and est * 10 >= 9 * n_docs),
                }
            ]
        )

    return rows.groupBy("host", "template").applyInPandasWithState(
        fn,
        outputStructType=TRAP_OUT_SCHEMA,
        stateStructType=TRAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SOFT404_STATE_SCHEMA = (
    "fps array<long>, counts array<long>, total long, flagged boolean"
)
SOFT404_OUT_SCHEMA = (
    "host string, modal_fp long, modal_pages long, total_pages long, "
    "share_pct long"
)


def soft404_stream(
    rows: DataFrame,
    min_pages: int = 5,
    min_share_pct: int = 60,
    k: int = 16,
) -> DataFrame:
    """Streaming soft-404 detector: the incremental twin of batch
    `traps.soft404_hosts`, with BOUNDED per-host state.

    An exact modal count needs one counter per distinct fingerprint —
    on a healthy host that is one counter per PAGE, which is the blow-up
    relocated into the state store (the same argument as
    `url_trap_stream`'s HLL registers). Instead each host keeps a
    Misra-Gries summary of k (fp, count) pairs plus the exact non-null
    total. MG counts are LOWER bounds (undercount <= total/(k+1)), so a
    flag raised from them never overstates the share — no false
    positives against the threshold, and any true majority fingerprint
    is guaranteed to be tracked; with k >= the host's distinct-fp count
    the summary is exact and the one-batch drain equals batch
    `soft404_hosts`' flag set (pinned in test_streaming.py).

    Emits ONE row per host at the micro-batch where the lower-bound
    share first crosses (min_pages, min_share_pct) — a crawler can stop
    paying politeness budget for a parked domain mid-crawl.

    NULL fingerprints (undecodable payloads) are excluded from both the
    vote and the denominator, matching batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = rows.select("host", "phash")

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            fps, counts, total, flagged = state.get
            mg = dict(zip(fps, counts))
            total, flagged = int(total), bool(flagged)
        else:
            mg, total, flagged = {}, 0, False
        for pdf in pdfs:
            for ph in pdf["phash"]:
                if ph is None or pd.isna(ph):
                    continue
                fp = int(ph)
                total += 1
                if fp in mg:
                    mg[fp] += 1
                elif len(mg) < k:
                    mg[fp] = 1
                else:  # Misra-Gries decrement step
                    mg = {f: c - 1 for f, c in mg.items() if c > 1}
        out = []
        if not flagged and mg and total > 0:
            # deterministic candidate: count desc, fp asc
            fp, cnt = min(mg.items(), key=lambda it: (-it[1], it[0]))
            share = cnt * 100 // total
            if cnt >= min_pages and share >= min_share_pct:
                flagged = True
                out.append(
                    {
                        "host": key[0],
                        "modal_fp": fp,
                        "modal_pages": cnt,
                        "total_pages": total,
                        "share_pct": share,
                    }
                )
        items = sorted(mg.items())
        state.update(
            ([f for f, _ in items], [c for _, c in items], total, flagged)
        )
        yield pd.DataFrame(
            out,
            columns=["host", "modal_fp", "modal_pages", "total_pages", "share_pct"],
        )

    return keyed.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=SOFT404_OUT_SCHEMA,
        stateStructType=SOFT404_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming conditional revalidation — foreachBatch (r5, VERDICT r4
# item 7): the incremental twin of the batch recrawl-due ->
# conditional-fetch -> 304 path (operators/fetch.py + recrawl.py,
# tests/test_revalidate.py). A due-URL stream drains in micro-batches;
# each batch sends stored validators (If-None-Match / If-Modified-
# Since), logs 200-vs-304 outcomes with the byte savings, and folds
# rotated validators back into a persistent store — so the savings
# telemetry (operators/delta.revalidation_savings, the SAME operator
# the batch dashboard uses) accrues continuously instead of per-round.

REVAL_DUE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
    ]
)
REVAL_STORE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("etag", T.StringType()),
        T.StructField("last_modified", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)
REVAL_LOG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("etag", T.StringType()),
        T.StructField("last_modified", T.StringType()),
        T.StructField("batch_id", T.LongType()),
    ]
)


def read_due_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of recrawl-due URLs (what
    recrawl.schedule_recrawl emits per round in batch)."""
    reader = spark.readStream.schema(REVAL_DUE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def revalidation_stream(
    rows: DataFrame,
    requester,
    work_dir: str,
    query_name: str = "revalidation",
):
    """Start the conditional-refetch drain. State layout (the
    crosshash versioned-parquet + CURRENT-pointer contract — an
    Iceberg/LSM MERGE seam at production scale):

    * `{work_dir}/validators/v{batch}` + CURRENT — url -> (etag,
      last_modified, size_bytes), last-wins by url;
    * `{work_dir}/fetched` — append-only fetch log, one row per
      conditional fetch with the outcome code and `size_bytes` in the
      revalidation_savings convention (200: bytes transferred; 304:
      the stored size a full refetch WOULD have moved).

    Validator persistence spans query restarts: a second availableNow
    drain over the same work_dir resumes from the checkpoint (new due
    files only) and sends the validators the first drain stored —
    the cross-batch 304/refetch test shape. The requester ships to
    executors per batch; fetches run in an Arrow map stage partitioned
    by the incoming due rows."""
    import os

    import pandas as pd

    summary_root = os.path.join(work_dir, "validators")
    pointer = os.path.join(summary_root, "CURRENT")
    fetched_dir = os.path.join(work_dir, "fetched")
    os.makedirs(summary_root, exist_ok=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        store = _read_parquet_or_empty(
            spark,
            os.path.join(summary_root, "__none__"),
            REVAL_STORE_SCHEMA,
        )
        if os.path.exists(pointer):
            with open(pointer) as fh:
                store = spark.read.schema(REVAL_STORE_SCHEMA).parquet(
                    os.path.join(summary_root, fh.read().strip())
                )
        due = batch_df.select("url", "host").join(
            store.select(
                "url",
                F.col("etag").alias("prev_etag"),
                F.col("last_modified").alias("prev_lm"),
                F.col("size_bytes").alias("prev_size"),
            ),
            "url",
            "left",
        )
        bc = spark.sparkContext.broadcast(requester)

        def run(pdfs):
            req = bc.value
            for pdf in pdfs:
                out = []
                for r in pdf.itertuples(index=False):
                    p_etag = r.prev_etag if isinstance(r.prev_etag, str) else None
                    p_lm = r.prev_lm if isinstance(r.prev_lm, str) else None
                    resp = req.fetch(
                        r.url, etag=p_etag, last_modified=p_lm
                    )
                    if resp.code == 304:
                        # validators still match: zero payload moved;
                        # size records what a full refetch would cost
                        out.append(
                            (
                                r.url, r.host, 304,
                                int(r.prev_size) if pd.notna(r.prev_size) else 0,
                                resp.etag or p_etag,
                                resp.last_modified or p_lm,
                            )
                        )
                    elif resp.code == 200:
                        body = resp.content or b""
                        out.append(
                            (
                                r.url, r.host, 200, len(body),
                                resp.etag, resp.last_modified,
                            )
                        )
                    else:
                        out.append(
                            (r.url, r.host, int(resp.code), 0, None, None)
                        )
                yield pd.DataFrame(
                    out,
                    columns=[
                        "url", "host", "code", "size_bytes",
                        "etag", "last_modified",
                    ],
                )

        fetched = due.mapInPandas(
            run,
            schema=(
                "url string, host string, code int, size_bytes long, "
                "etag string, last_modified string"
            ),
        ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        # materialize ONCE (mapInPandas re-fetches per action otherwise)
        fetched.write.mode("append").parquet(fetched_dir)
        fetched = (
            spark.read.schema(REVAL_LOG_SCHEMA)
            .parquet(fetched_dir)
            .filter(F.col("batch_id") == batch_id)
        )
        # last-wins validator merge: fetched urls overwrite, rest kept
        upd = fetched.filter(F.col("code").isin(200, 304)).select(
            "url", "host", "etag", "last_modified", "size_bytes"
        )
        merged = store.join(
            upd.select("url"), "url", "left_anti"
        ).unionByName(upd)
        vdir = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(summary_root, vdir)
        )
        with open(pointer, "w") as fh:
            fh.write(vdir)

    return (
        rows.writeStream.foreachBatch(_process)
        .queryName(query_name)
        .option(
            "checkpointLocation", os.path.join(work_dir, "checkpoint")
        )
        .trigger(availableNow=True)
        .start()
    )


def revalidation_summary(spark: SparkSession, work_dir: str) -> DataFrame:
    """Per-host savings over everything the stream has fetched so far —
    the SAME batch operator (delta.revalidation_savings) the round
    dashboard uses, fed by the streaming log: twin consistency is by
    construction."""
    import os

    from webcollector_spark.operators.delta import revalidation_savings

    log = _read_parquet_or_empty(
        spark, os.path.join(work_dir, "fetched"), REVAL_LOG_SCHEMA
    )
    return revalidation_savings(log.select("host", "code", "size_bytes"))
