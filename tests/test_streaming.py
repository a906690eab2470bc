"""Structured Streaming tests: watermarked windowed aggregation and the
applyInPandasWithState sessionizer, each checked against its batch twin
on the same events data (streaming/batch equivalence is the correctness
bar — same input, same answer)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from webcollector_spark.streaming import pipelines as P

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark):
    """Copy of the events table in a streaming-friendly directory."""
    d = tempfile.mkdtemp(prefix="wc_stream_")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_hourly_windowed_counts_match_batch(spark, events_dir):
    stream = P.hourly_windowed_counts(P.read_events_stream(spark, events_dir))
    P.run_to_memory(stream, "hourly_test", output_mode="complete")
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["total"])
        for r in spark.table("hourly_test").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["total"]) for r in batch.collect()
    }
    assert got == want


def test_sessionize_with_state_matches_batch(spark, events_dir):
    from pyspark.sql import Window

    stream = P.sessionize_with_state(
        P.read_events_stream(spark, events_dir), gap_s=3600
    )
    P.run_to_memory(stream, "sessions_test", output_mode="update")
    # update mode appends one row per user per micro-batch; n_sessions
    # is monotonically increasing, so the final state is the max
    got: dict[int, int] = {}
    for r in spark.table("sessions_test").collect():
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["n_sessions"])

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 3600), 1
    ).otherwise(0)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
    )
    want = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert got == want


def test_streaming_neardup_matches_batch_lsh(spark):
    """Drain the documents table through the stateful near-dup stream
    in one availableNow batch: emitted (doc_a, doc_b) pairs must equal
    the batch lsh_candidate_pairs result on the same data."""
    import shutil
    import tempfile

    from webcollector_spark.plans import queries as q

    d = tempfile.mkdtemp(prefix="wc_docs_")
    try:
        spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        stream = P.neardup_stream(P.read_docs_stream(spark, d), max_bucket=10_000)
        P.run_to_memory(stream, "neardup_test", output_mode="append")
        got = {
            (r["doc_a"], r["doc_b"])
            for r in spark.table("neardup_test").collect()
        }
        want = {
            (r["doc_a"], r["doc_b"])
            for r in q.queries()["lsh_candidate_pairs"](spark, SF_DIR).collect()
        }
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_neardup_cross_batch_state(spark):
    """Two micro-batches: a doc arriving in batch 2 must pair with its
    band-mate from batch 1 via state."""
    import shutil
    import tempfile

    docs = [
        (1, "alpha beta gamma delta", "en", "s", 20),
        (2, "alpha beta gamma delta", "en", "s", 20),  # exact dup of 1
    ]
    d = tempfile.mkdtemp(prefix="wc_docs2_")
    try:
        for i, row in enumerate(docs):
            spark.createDataFrame([row], P.DOCS_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(d)
        stream = P.read_docs_stream(spark, d, max_files_per_trigger=1)
        q2 = (
            P.neardup_stream(stream)
            .writeStream.format("memory")
            .queryName("neardup_xbatch")
            .outputMode("append")
            .trigger(availableNow=True)  # one file per micro-batch
            .start()
        )
        q2.awaitTermination()
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in spark.table("neardup_xbatch").collect()
        }
        assert (1, 2) in pairs
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sliding_rate_runs(spark, events_dir):
    stream = P.sliding_rate(P.read_events_stream(spark, events_dir))
    P.run_to_memory(stream, "rate_test", output_mode="complete")
    rows = spark.table("rate_test").collect()
    assert len(rows) > 0
    total_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # sliding windows double-count by design (10m window / 5m slide ~ 2x)
    assert sum(r["n"] for r in rows) >= total_events


def test_streaming_caption_spam_matches_batch(spark):
    """One-batch drain of the noisy caption corpus must flag exactly the
    captions the batch detector flags (NULL folded into "" — the stream
    twin's documented key normalization)."""
    from webcollector_spark.operators import captions, images

    corpus = images.caption_corpus_df(spark, 120, 24)
    d = tempfile.mkdtemp(prefix="wc_caps_")
    try:
        corpus.select("image_id", "phash", "caption").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        stream = P.caption_spam_stream(
            P.read_caption_stream(spark, d), min_phashes=3
        )
        P.run_to_memory(stream, "caption_spam_stream", output_mode="append")
        got = {
            r["caption_norm"]
            for r in spark.table("caption_spam_stream").collect()
        }
        want = {
            r["caption_norm"] or ""
            for r in captions.caption_spam(corpus, min_phashes=3).collect()
        }
        assert got == want and len(want) >= 2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_caption_spam_cross_batch_state(spark):
    """A caption reaching the distinct-phash threshold only via a later
    micro-batch must flag then (state carries the earlier phashes),
    and must flag only ONCE."""
    rows_b1 = [("a", 1, "image"), ("b", 2, "image")]
    rows_b2 = [("c", 3, "image"), ("d", 4, "image")]
    d = tempfile.mkdtemp(prefix="wc_caps2_")
    try:
        for batch in (rows_b1, rows_b2):
            spark.createDataFrame(
                batch, P.CAPTION_META_SCHEMA
            ).coalesce(1).write.mode("append").parquet(d)
        stream = P.caption_spam_stream(
            P.read_caption_stream(spark, d, max_files_per_trigger=1),
            min_phashes=3,
        )
        P.run_to_memory(stream, "caption_spam_xbatch", output_mode="append")
        rows = spark.table("caption_spam_xbatch").collect()
        assert len(rows) == 1
        assert rows[0]["caption_norm"] == "image"
        assert rows[0]["n_phashes"] >= 3
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_caption_conflict_matches_batch_clusters(spark):
    """One-batch drain of the noisy caption corpus must flag exactly the
    exact-dup clusters (phashes) whose members carry >= 2 distinct
    non-null normalized captions — the hamming-0 core of the batch
    conflict operators (caption_dedup's n_caps >= 2 clusters)."""
    from pyspark.sql import functions as F

    from webcollector_spark.operators import captions, images

    corpus = images.caption_corpus_df(spark, 120, 24)
    d = tempfile.mkdtemp(prefix="wc_conf_")
    try:
        corpus.select("image_id", "phash", "caption").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        stream = P.caption_conflict_stream(P.read_caption_stream(spark, d))
        P.run_to_memory(stream, "caption_conflict_stream", output_mode="append")
        got = {
            r["phash"] for r in spark.table("caption_conflict_stream").collect()
        }
        want = {
            r["phash"]
            for r in corpus.select(
                "phash", captions.caption_norm().alias("cap")
            )
            .filter(F.col("cap").isNotNull())
            .groupBy("phash")
            .agg(F.countDistinct("cap").alias("n_caps"))
            .filter(F.col("n_caps") >= 2)
            .collect()
        }
        assert got == want and len(want) >= 1
        # evidence columns: each emitted row carries two DISTINCT caps
        for r in spark.table("caption_conflict_stream").collect():
            assert r["cap0"] != r["cap_other"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_caption_conflict_cross_batch_once(spark):
    """A cluster unanimous in batch 1 that receives a disagreeing
    caption in batch 2 must flag THEN, exactly once; NULL alt text
    neither seeds nor triggers a conflict."""
    rows_b1 = [("a", 7, "a cat"), ("b", 7, "a cat"), ("n", 7, None)]
    rows_b2 = [("c", 7, "a dog"), ("d", 7, "a bird"), ("e", 9, None)]
    d = tempfile.mkdtemp(prefix="wc_conf2_")
    try:
        for batch in (rows_b1, rows_b2):
            spark.createDataFrame(
                batch, P.CAPTION_META_SCHEMA
            ).coalesce(1).write.mode("append").parquet(d)
        stream = P.caption_conflict_stream(
            P.read_caption_stream(spark, d, max_files_per_trigger=1)
        )
        P.run_to_memory(stream, "caption_conflict_xbatch", output_mode="append")
        rows = spark.table("caption_conflict_xbatch").collect()
        assert len(rows) == 1
        assert rows[0]["phash"] == 7
        assert rows[0]["cap0"] == "a cat"
        assert rows[0]["cap_other"] in ("a dog", "a bird")
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_caption_crosshash_matches_batch_flags(spark):
    """One-batch drain of the noisy caption corpus through the
    foreachBatch cross-hash pipeline must flag exactly the clusters the
    batch `caption_conflict_flags` operator flags (distinct phash of
    conflicted=True images) — the FULL hamming 0..4 radius, strictly
    more than the hamming-0 stream covers on this corpus."""
    from pyspark.sql import functions as F

    from webcollector_spark.operators import captions, images

    corpus = images.caption_corpus_df(spark, 120, 24)
    d = tempfile.mkdtemp(prefix="wc_xh_")
    try:
        corpus.select("image_id", "phash", "caption").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/in")
        q = P.caption_conflict_crosshash_stream(
            P.read_caption_stream(spark, f"{d}/in"), f"{d}/work"
        )
        q.awaitTermination()
        got = {
            r["phash"]
            for r in spark.read.schema(P.CROSSHASH_FLAGS_SCHEMA)
            .parquet(f"{d}/work/flags")
            .collect()
        }
        want = {
            r["phash"]
            for r in captions.caption_conflict_flags(corpus)
            .filter("conflicted")
            .join(
                corpus.select("image_id", "phash"), "image_id"
            )
            .select("phash")
            .distinct()
            .collect()
        }
        assert got == want and len(want) >= 1
        # strictly wider than the hamming-0 core: some flagged cluster
        # is unanimous internally and conflicts only with a neighbor
        h0 = {
            r["phash"]
            for r in corpus.select(
                "phash", captions.caption_norm().alias("cap")
            )
            .filter(F.col("cap").isNotNull())
            .groupBy("phash")
            .agg(F.countDistinct("cap").alias("n_caps"))
            .filter(F.col("n_caps") >= 2)
            .collect()
        }
        assert h0 < got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_caption_crosshash_cross_batch_hamming2(spark):
    """A cluster unanimous in batch 1 must flag at the micro-batch
    where a hamming-2 neighbor with a DISAGREEING caption arrives —
    both clusters, exactly once, carrying that batch's id. An adjacent
    all-NULL-caption cluster never flags (nothing to mislabel)."""
    P_HASH, Q_HASH, R_HASH = 80, 80 ^ 0b11, 80 ^ 0b1  # ham(P,Q)=2, ham(P,R)=1
    rows_b1 = [("a", P_HASH, "a cat"), ("b", P_HASH, "a cat"), ("n", R_HASH, None)]
    rows_b2 = [("c", Q_HASH, "a dog")]
    d = tempfile.mkdtemp(prefix="wc_xh2_")
    try:
        for batch in (rows_b1, rows_b2):
            spark.createDataFrame(batch, P.CAPTION_META_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(f"{d}/in")
        q = P.caption_conflict_crosshash_stream(
            P.read_caption_stream(spark, f"{d}/in", max_files_per_trigger=1),
            f"{d}/work",
            max_hamming=2,
        )
        q.awaitTermination()
        flags = {
            r["phash"]: r["batch_id"]
            for r in spark.read.schema(P.CROSSHASH_FLAGS_SCHEMA)
            .parquet(f"{d}/work/flags")
            .collect()
        }
        assert flags == {P_HASH: 1, Q_HASH: 1}
        n_rows = (
            spark.read.schema(P.CROSSHASH_FLAGS_SCHEMA)
            .parquet(f"{d}/work/flags")
            .count()
        )
        assert n_rows == 2  # exactly once, no dupes across batches
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_export_stream_roundtrip_and_batch_isolation(spark):
    """Draining a curated corpus through the streaming export must land
    every row in a tar shard exactly once (read_webdataset union ==
    input), with shard ids disjoint across micro-batches (the
    batch_id << 20 offset) and one manifest partition per batch."""
    from pyspark.sql import functions as F

    from webcollector_spark.operators import images, shards

    corpus = images.corpus_df(spark, 48)
    d = tempfile.mkdtemp(prefix="wc_exp_")
    try:
        # two deterministic micro-batches: one file each, sorted names
        half = corpus.filter(F.crc32("image_id") % 2 == 0)
        other = corpus.exceptAll(half)
        half.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/aaa")
        other.coalesce(1).write.mode("overwrite").parquet(f"{d}/in/bbb")
        src = spark.read.parquet(f"{d}/in/*").cache()

        q = P.export_stream(
            P.read_corpus_stream(spark, f"{d}/in/*", max_files_per_trigger=1),
            f"{d}/out",
            target_bytes=20_000,
            n_buckets=8,
        )
        q.awaitTermination()

        back = shards.read_webdataset(spark, f"{d}/out/shards")
        got = {r["image_id"]: r for r in back.collect()}
        want = {r["image_id"]: r for r in corpus.collect()}
        assert got.keys() == want.keys()
        for k, r in got.items():
            assert bytes(r["data"]) == bytes(want[k]["bytes"])
            assert r["caption"] == (want[k]["caption"] or "")

        man = spark.read.parquet(f"{d}/out/manifest")
        batches = {r["batch_id"] for r in man.select("batch_id").collect()}
        assert len(batches) >= 2
        # shard ids carry their batch in the high bits -> disjoint
        for r in man.collect():
            assert r["shard"] >> 20 == r["batch_id"]
            assert r["written"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_export_stream_replay_is_noop(spark):
    """Replaying the same backlog with a fresh checkpoint (the
    worst-case recovery: all offsets forgotten) re-derives the same
    batches -> same shard ids -> the writer skips every existing tar
    (written=false) and the read-back is unchanged — no duplicated or
    truncated samples."""
    from webcollector_spark.operators import images, shards

    corpus = images.corpus_df(spark, 30)
    d = tempfile.mkdtemp(prefix="wc_exp2_")
    try:
        corpus.coalesce(1).write.mode("overwrite").parquet(f"{d}/in")

        def drain(tag):
            q = P.export_stream(
                P.read_corpus_stream(spark, f"{d}/in"),
                f"{d}/out",
                target_bytes=20_000,
                n_buckets=8,
                query_name=f"wds_export_{tag}",
            )
            q.awaitTermination()

        drain("first")
        first = {
            r["shard"]: r["sha256"]
            for r in spark.read.parquet(f"{d}/out/manifest").collect()
        }
        shutil.rmtree(f"{d}/out/checkpoint")
        drain("replay")
        man2 = spark.read.parquet(f"{d}/out/manifest").collect()
        assert {r["shard"]: r["sha256"] for r in man2} == first
        assert not any(r["written"] for r in man2)
        back = shards.read_webdataset(spark, f"{d}/out/shards")
        assert back.count() == corpus.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_chunk_dedup_matches_batch(spark):
    """Drain documents through the stateful chunk-dedup stream in one
    availableNow batch: per-doc kept counts must equal the batch
    chunk_dedup_exact registry result."""
    import shutil
    import tempfile

    from webcollector_spark.plans import queries as q

    d = tempfile.mkdtemp(prefix="wc_docs3_")
    try:
        spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        stream = P.chunk_dedup_stream(P.read_docs_stream(spark, d))
        P.run_to_memory(stream, "chunkdedup_test", output_mode="append")
        got = {}
        for r in spark.table("chunkdedup_test").collect():
            n, k = got.get(r["doc_id"], (0, 0))
            got[r["doc_id"]] = (n + 1, k + int(r["kept"]))
        want = {
            r["doc_id"]: (r["n_chunks"], r["kept_chunks"])
            for r in q.queries()["chunk_dedup_exact"](spark, SF_DIR).collect()
        }
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_chunk_dedup_cross_batch_state(spark):
    """A chunk arriving in batch 2 that batch 1 already owns must come
    back kept=False — first-arrival wins across micro-batches."""
    import shutil
    import tempfile

    text = " ".join(f"w{i}" for i in range(10))  # exactly one chunk
    docs = [
        (7, text, "en", "s", 60),
        (3, text, "en", "s", 60),  # lower id, but arrives LATER
    ]
    d = tempfile.mkdtemp(prefix="wc_docs4_")
    try:
        import time as _t

        for row in docs:
            spark.createDataFrame([row], P.DOCS_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            _t.sleep(0.2)  # distinct mtimes -> deterministic batch order
        stream = P.read_docs_stream(spark, d, max_files_per_trigger=1)
        q2 = (
            P.chunk_dedup_stream(stream)
            .writeStream.format("memory")
            .queryName("chunkdedup_xbatch")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        got = {
            r["doc_id"]: r["kept"]
            for r in spark.table("chunkdedup_xbatch").collect()
        }
        assert got == {7: True, 3: False}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _drain_trap_stream(spark, src_dir, table, max_files=None):
    stream = P.url_trap_stream(P.read_docs_stream(spark, src_dir, max_files))
    q = (
        stream.writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per touched key per micro-batch;
    # n_docs is monotone, so the max-n_docs row is the final state
    rows = {}
    for r in spark.table(table).collect():
        k = (r["host"], r["template"])
        if k not in rows or r["n_docs"] > rows[k]["n_docs"]:
            rows[k] = r
    return rows


def test_url_trap_stream_matches_batch(spark):
    """One-batch drain: per-key fetch counts equal the batch
    url_trap_templates counts, and the bounded-state HLL estimate
    equals the deterministic fold of the batch url_trap_hll registers
    bit-for-bit."""
    import shutil
    import tempfile

    from webcollector_spark.operators.sketch import estimate_from_registers
    from webcollector_spark.plans import queries as q

    d = tempfile.mkdtemp(prefix="wc_trap1_")
    try:
        spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(2).write.mode(
            "overwrite"
        ).parquet(d)
        got = _drain_trap_stream(spark, d, "trap_one_batch")

        batch = {
            (r["host"], r["template"]): r
            for r in q.queries()["url_trap_templates"](spark, SF_DIR).collect()
        }
        regs = {}
        for r in q.queries()["url_trap_hll"](spark, SF_DIR).collect():
            regs.setdefault((r["host"], r["template"]), {})[r["bucket"]] = r[
                "rho_max"
            ]
        assert set(got) == set(batch) and len(got) > 0
        for k, row in got.items():
            assert row["n_docs"] == batch[k]["n_docs"]
            est = estimate_from_registers(regs[k], b=10)
            assert row["n_urls_est"] == est
            assert row["is_trap"] == (est >= 5 and est * 10 >= 9 * row["n_docs"])
        # the synthetic corpus must actually discriminate
        assert any(r["is_trap"] for r in got.values())
        assert any(not r["is_trap"] for r in got.values())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_url_trap_stream_microbatch_invariance(spark):
    """File-at-a-time drain ends in the same per-key rows as the
    one-batch drain: registers max-merge, so the final state cannot
    depend on how the input was micro-batched."""
    import shutil
    import tempfile
    import time as _t

    d1 = tempfile.mkdtemp(prefix="wc_trap2_")
    d2 = tempfile.mkdtemp(prefix="wc_trap3_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        docs.coalesce(1).write.mode("overwrite").parquet(d1)
        # two files with distinct mtimes -> two deterministic batches
        a, b = docs.randomSplit([0.5, 0.5], seed=7)
        a.coalesce(1).write.mode("append").parquet(d2)
        _t.sleep(0.2)
        b.coalesce(1).write.mode("append").parquet(d2)

        one = _drain_trap_stream(spark, d1, "trap_whole")
        split = _drain_trap_stream(spark, d2, "trap_split", max_files=1)
        assert set(one) == set(split)
        for k in one:
            for c in ("n_docs", "n_urls_est", "is_trap"):
                assert one[k][c] == split[k][c], (k, c)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def _soft404_rows():
    rows = []
    rows += [("parked", f"p{i}", 111) for i in range(8)]
    rows += [("parked", "r1", 5), ("parked", "r2", 6)]
    rows += [("parked", "x1", None), ("parked", "x2", None)]
    rows += [("healthy", f"h{i}", 1000 + i) for i in range(10)]
    rows += [("small", f"s{i}", 42) for i in range(3)]
    return rows


_SOFT404_SCHEMA = "host string, key string, phash long"


def test_streaming_soft404_matches_batch(spark):
    """One-batch drain (k >= distinct fps, MG exact) flags exactly the
    hosts batch soft404_hosts flags, with the same modal fingerprint."""
    from webcollector_spark.operators.traps import soft404_hosts

    df = spark.createDataFrame(_soft404_rows(), _SOFT404_SCHEMA)
    d = tempfile.mkdtemp(prefix="wc_404_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(d)
        src = spark.readStream.schema(_SOFT404_SCHEMA).parquet(d)
        stream = P.soft404_stream(src, min_pages=5, min_share_pct=60, k=32)
        P.run_to_memory(stream, "soft404_stream", output_mode="append")
        got = {
            r["host"]: r for r in spark.table("soft404_stream").collect()
        }
        want = {
            r["host"]: r
            for r in soft404_hosts(df, min_pages=5, min_share_pct=60)
            .filter("is_soft404")
            .collect()
        }
        assert set(got) == set(want) == {"parked"}
        g, w = got["parked"], want["parked"]
        assert g["modal_fp"] == w["modal_fp"] == 111
        assert g["modal_pages"] == 8 and g["total_pages"] == 10
        assert g["share_pct"] == 80
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_soft404_cross_batch_and_bounded_state(spark):
    """A host crossing the threshold only with batch-2 evidence flags
    then, exactly once — and a k=2 summary still catches an 80%
    majority on a host with 10 distinct fingerprints (MG lower bound),
    while state stays at <= 2 tracked pairs."""
    b1 = [("h", f"a{i}", 9) for i in range(4)] + [("h", "u1", 101)]
    b2 = [("h", f"b{i}", 9) for i in range(12)] + [
        ("h", f"u{i}", 100 + i) for i in range(2, 5)
    ]
    d = tempfile.mkdtemp(prefix="wc_4042_")
    try:
        for batch in (b1, b2):
            spark.createDataFrame(batch, _SOFT404_SCHEMA).coalesce(
                1
            ).write.mode("append").parquet(d)
        src = spark.readStream.schema(_SOFT404_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(d)
        stream = P.soft404_stream(src, min_pages=5, min_share_pct=60, k=2)
        P.run_to_memory(stream, "soft404_xbatch", output_mode="append")
        rows = spark.table("soft404_xbatch").collect()
        assert len(rows) == 1  # flagged once, despite both batches
        r = rows[0]
        assert r["host"] == "h" and r["modal_fp"] == 9
        # MG count is a lower bound: never overstates the share
        assert r["modal_pages"] <= 16
        assert r["share_pct"] >= 60
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_revalidation_cross_batch_304_and_refetch(spark):
    """VERDICT r4 item 7 done-criterion: drain 1 cold-fetches every due
    URL (all 200, validators stored); the page BUMPS between drains;
    drain 2 (same work_dir — checkpoint resumes, validator store
    persists) must refetch the bumped page (200, validator rotated) and
    304 every unchanged one with the stored size recorded as saved.
    The summary view is the batch revalidation_savings operator over
    the streamed log."""
    from pyspark.sql import functions as F

    from webcollector_spark import fixtures
    from webcollector_spark.sources.requester import SyntheticRequester

    graph = fixtures.make_site_graph(12, n_hosts=3, out_degree=2)
    corpus = fixtures.make_corpus(12)
    req = SyntheticRequester(
        graph.to_dict("records"), corpus.to_dict("records")
    )
    urls = sorted(graph[graph["http_code"] == 200]["url"].tolist())
    due = [(u, u.split("/")[2]) for u in urls]
    d = tempfile.mkdtemp(prefix="wc_reval_")
    try:
        spark.createDataFrame(due, P.REVAL_DUE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/in")
        q = P.revalidation_stream(
            P.read_due_stream(spark, f"{d}/in"), req, f"{d}/work"
        )
        q.awaitTermination()
        log1 = (
            spark.read.schema(P.REVAL_LOG_SCHEMA)
            .parquet(f"{d}/work/fetched")
            .collect()
        )
        assert len(log1) == len(urls)
        assert all(r.code == 200 and r.etag for r in log1)
        sizes = {r.url: r.size_bytes for r in log1}
        assert all(s > 0 for s in sizes.values())

        bumped = urls[0]
        req.bump_page(bumped)

        # second drain: same work_dir, new due file, RE-pickled requester
        spark.createDataFrame(due, P.REVAL_DUE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{d}/in")
        q2 = P.revalidation_stream(
            P.read_due_stream(spark, f"{d}/in"), req, f"{d}/work"
        )
        q2.awaitTermination()
        log2 = {
            r.url: r
            for r in spark.read.schema(P.REVAL_LOG_SCHEMA)
            .parquet(f"{d}/work/fetched")
            .filter(F.col("batch_id") >= 1)
            .collect()
        }
        assert set(log2) == set(urls)
        etag1 = {r.url: r.etag for r in log1}
        for u, r in log2.items():
            if u == bumped:
                assert r.code == 200 and r.etag != etag1[u]
            else:
                assert r.code == 304, u
                assert r.size_bytes == sizes[u]  # saved = stored size
                assert r.etag == etag1[u]
        # validator store rotated only for the bumped page
        with open(f"{d}/work/validators/CURRENT") as fh:
            cur = fh.read().strip()
        store = {
            r.url: r
            for r in spark.read.schema(P.REVAL_STORE_SCHEMA)
            .parquet(f"{d}/work/validators/{cur}")
            .collect()
        }
        assert store[bumped].etag == log2[bumped].etag != etag1[bumped]
        assert all(store[u].etag == etag1[u] for u in urls if u != bumped)
        # summary == batch operator over the same log, and the 304s
        # show up as saved bytes
        summ = {r.host: r for r in P.revalidation_summary(spark, f"{d}/work").collect()}
        n_hosts = len({h for _, h in due})
        assert len(summ) == n_hosts
        assert sum(r.n_not_modified for r in summ.values()) == len(urls) - 1
        assert sum(r.bytes_saved for r in summ.values()) == sum(
            sizes[u] for u in urls if u != bumped
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
