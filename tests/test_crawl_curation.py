"""End-to-end graft story: crawl -> fetch+decode image payloads ->
offline fetched-history table -> caption curation. The synthetic web
serves the NOISY corpus (fixtures.corpus_with_caption_noise), so the
curation operators must surface the planted label pathologies from
rows the crawl loop itself produced — not from a hand-built corpus.

Identity note: boilerplate captions ("image", "") defeat the
caption-convention image_id extraction on purpose, so curation keys on
the crawl's own identity (`key` = URL), exactly what a production
pipeline would do."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from webcollector_spark import fixtures
from webcollector_spark.config import CrawlerConfig
from webcollector_spark.crawler import RamCrawler
from webcollector_spark.operators import captions
from webcollector_spark.sources.requester import SyntheticRequester


def _noisy_web(n=60, dupes=12):
    """One page per noisy-corpus row (dup rows included), all 200s with
    no out-links: injecting every URL as a seed makes round 1 fetch the
    whole web, so the history is exactly the corpus — no reachability
    luck involved."""
    corpus = fixtures.corpus_with_caption_noise(n, dupes)
    rows = [
        {
            "url": f"http://h{i % 5:03d}.test/p/{i}",
            "host": f"h{i % 5:03d}.test",
            "image_id": image_id,
            "out_links": [],
            "http_code": 200,
            "location": None,
        }
        for i, image_id in enumerate(corpus["image_id"])
    ]
    return pd.DataFrame(rows), corpus


def test_crawl_then_caption_curation(spark, tmp_path):
    graph, corpus = _noisy_web()
    hist = str(tmp_path / "fetched_history")
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    crawler = RamCrawler(
        spark,
        req,
        config=CrawlerConfig(
            top_n=0, bloom_capacity=10_000, fetched_history_path=hist
        ),
    )
    crawler.add_seed(sorted(graph["url"].tolist()))
    metrics = crawler.start(1)
    assert metrics[0].fetched == len(graph)

    fetched = (
        spark.read.parquet(hist)
        .filter(F.col("phash").isNotNull())
        .select(F.col("key").alias("image_id"), "phash", "caption")
    )
    assert fetched.count() == len(graph)

    # boilerplate spam: "image" (every 13th source row) labels many
    # distinct crawled pictures; the empty-caption rows (every 17th,
    # offset 3) serve NO <p class=caption> at all, so the crawl records
    # caption NULL — the missing-alt-text group — and the detector must
    # flag that group too (NULLs aggregate to one group in Spark and
    # DuckDB alike)
    spam = {
        r["caption_norm"]: r
        for r in captions.caption_spam(fetched, min_phashes=3).collect()
    }
    assert "image" in spam and spam["image"]["n_phashes"] >= 3
    assert None in spam

    # label conflict: the crawl fetched both img_i and its lossy dup;
    # odd dup indices carry a fresh "alternate view" caption -> a
    # near-identical pixel pair (phash hamming <= 4) with disagreeing
    # labels must surface from crawled rows
    conflicts = captions.caption_conflict(fetched, max_hamming=4).collect()
    assert conflicts
    assert all(r["hamming"] <= 4 and r["cap_a"] != r["cap_b"] for r in conflicts)
    assert any("alternate view" in (r["cap_a"] + r["cap_b"]) for r in conflicts)

    # dedup bookkeeping is complete: every crawled row lands in exactly
    # one normalized-caption group
    total = (
        captions.caption_dedup(fetched).agg(F.sum("n_images")).collect()[0][0]
    )
    assert total == len(graph)


def test_crawl_to_training_manifest_funnel(spark, tmp_path):
    """The whole round-4 curation funnel over rows the crawl itself
    produced: crawl -> fetched history (identity, caption, phash) JOIN
    the payload table (the input_hint-shaped image+caption store the
    crawl writes) -> header-sniff triage -> image+text gate -> ensemble
    near-dup keepers -> aspect buckets -> deterministic split. Every
    stage's output is cross-checked against a straight-line pandas
    recompute, so the funnel numbers are asserted, not eyeballed."""
    from webcollector_spark import codecs
    from webcollector_spark.operators import images, sniff
    from webcollector_spark.operators.captions import (
        ASPECT_BUCKETS,
        aspect_bucket_assign,
        imagetext_filter,
    )
    from webcollector_spark.schema import CORPUS_SCHEMA

    graph, corpus = _noisy_web(60, 12)
    hist = str(tmp_path / "fetched_history")
    req = SyntheticRequester(graph.to_dict("records"), corpus.to_dict("records"))
    crawler = RamCrawler(
        spark,
        req,
        config=CrawlerConfig(
            top_n=0, bloom_capacity=10_000, fetched_history_path=hist
        ),
    )
    crawler.add_seed(sorted(graph["url"].tolist()))
    crawler.start(1)

    # production shape: the history carries crawl identity (key=URL) +
    # label + phash; payload bytes live in the image table the crawl
    # populated, reached through the crawl's OWN url->image mapping
    # (boilerplate captions defeat caption-derived ids on purpose —
    # see module docstring)
    payloads = spark.createDataFrame(corpus, schema=CORPUS_SCHEMA).drop(
        "caption", "phash"
    )
    url_to_img = spark.createDataFrame(graph[["url", "image_id"]])
    crawled = (
        spark.read.parquet(hist)
        .filter(F.col("phash").isNotNull())
        .select(F.col("key").alias("url"), "phash", "caption")
        .join(url_to_img, "url")
        .drop("url")
        .join(payloads, "image_id")
    )
    n0 = crawled.count()
    assert n0 == len(graph)

    # 1. header triage: every crawled payload is intact and correctly
    # declared, and the sniffed dims equal the table's metadata
    sniffed = sniff.sniff_meta(crawled)
    assert sniffed.filter(~F.col("header_ok")).count() == 0

    # 2. metadata gate, recomputed row-by-row in pandas
    kept = imagetext_filter(crawled).filter(F.col("keep"))
    survivors = {r["image_id"] for r in kept.select("image_id").collect()}

    def py_gate(r):
        cap = r["caption"]
        if cap is None:
            return False
        norm = " ".join(str(cap).lower().split())
        return (
            r["w"] >= 64
            and r["h"] >= 64
            and max(r["w"], r["h"]) <= 2 * min(r["w"], r["h"])
            and len(norm.split()) >= 2
            and len(norm) >= 8
        )

    want_survivors = {
        r["image_id"] for r in corpus.to_dict("records") if py_gate(r)
    }
    assert survivors == want_survivors
    assert 0 < len(survivors) < n0  # the gate genuinely fires

    # 3. ensemble dedup over the survivor payloads
    surv_corpus = crawled.filter(F.col("image_id").isin(list(survivors)))
    decided = images.image_neardup_keepers(surv_corpus, max_hamming=4)
    keepers = {
        r["image_id"] for r in decided.filter(F.col("is_keeper")).collect()
    }

    sc = [r for r in corpus.to_dict("records") if r["image_id"] in survivors]
    mask = (1 << 64) - 1
    hashes = []
    for r in sc:
        px = codecs.decode(bytes(r["bytes"]))
        hashes.append((r["image_id"], int(r["phash"]), codecs.dhash64(px)))
    parent = {i: i for i, _, _ in hashes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, (ia, pa, da) in enumerate(hashes):
        for ib, pb, db in hashes[i + 1 :]:
            if (
                bin((pa ^ pb) & mask).count("1") <= 4
                or bin((da ^ db) & mask).count("1") <= 4
            ):
                ra, rb = find(ia), find(ib)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i, _, _ in hashes:
        comps.setdefault(find(i), []).append(i)
    want_keepers = {min(m) for m in comps.values()}
    assert keepers == want_keepers
    assert len(keepers) < len(survivors)  # planted near-dups collapsed

    # 4. aspect buckets over the keepers: total preserved, square rows
    # (the fixture's w==h cases) land in square_1_1
    bucketed = aspect_bucket_assign(
        surv_corpus.filter(F.col("image_id").isin(list(keepers)))
    )
    by_bucket = {r["bucket"]: r["n"] for r in
                 bucketed.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert sum(by_bucket.values()) == len(keepers)
    assert set(by_bucket) <= {b[0] for b in ASPECT_BUCKETS}

    # 5. deterministic identity-hash split: partition, leakage-free,
    # stable across reruns
    b = F.pmod(F.xxhash64("image_id"), F.lit(1000))
    split = F.when(b < 800, "train").when(b < 900, "val").otherwise("test")
    manifest = bucketed.select("image_id", split.alias("split"))
    counts1 = sorted(manifest.groupBy("split").count().collect())
    counts2 = sorted(manifest.groupBy("split").count().collect())
    assert counts1 == counts2
    assert manifest.count() == len(keepers)
    assert manifest.select("image_id").distinct().count() == len(keepers)

    # 6. shard packing: the kept payloads stream into byte-bounded
    # export shards; the manifest accounts for every byte the crawl
    # kept, and the whole chain is rerun-deterministic
    from webcollector_spark.operators import shards

    export = surv_corpus.filter(F.col("image_id").isin(list(keepers))).withColumn(
        "n_bytes", F.length("bytes").cast("long")
    )
    target = 16 * 1024
    # string key: pack_shards buckets by xxhash64(image_id) internally
    packed = shards.pack_shards(
        export, key="image_id", size="n_bytes", target_bytes=target, n_buckets=8
    )
    rows = packed.collect()
    assert len(rows) == len(keepers)
    # offsets are the exact global running sum in (bucket, image_id) order
    sizes = {
        r["image_id"]: r["n_bytes"]
        for r in export.select("image_id", "n_bytes").collect()
    }
    acc = 0
    for r in sorted(rows, key=lambda r: (r["bucket"], r["image_id"])):
        assert r["start_offset"] == acc
        assert r["shard"] == acc // target
        acc += sizes[r["image_id"]]
    assert acc == sum(sizes.values())
    man = {r["shard"]: r for r in shards.shard_manifest(packed).collect()}
    assert sum(r["n_rows"] for r in man.values()) == len(keepers)
    # shard ids ascend with the byte stream; a GAP in ids is legal only
    # when the preceding row alone overflows the target (an image bigger
    # than one shard consumes several shard-widths of offset space)
    ordered = sorted(rows, key=lambda r: r["start_offset"])
    for prev, cur in zip(ordered, ordered[1:]):
        jump = cur["shard"] - prev["shard"]
        assert jump >= 0
        if jump > 1:
            assert sizes[prev["image_id"]] > target

    # 7. the byte sink: every kept payload lands in a tar shard, and
    # reading the export back returns exactly the kept bytes+captions —
    # the funnel now ends in training-ready files, not just a manifest
    out = str(tmp_path / "wds")
    assigned = export.join(packed.select("image_id", "shard"), "image_id")
    wrote = shards.write_webdataset(assigned, out).collect()
    assert sum(r["n_rows"] for r in wrote) == len(keepers)
    back = {
        r["image_id"]: (r["data"], r["caption"])
        for r in shards.read_webdataset(spark, out).collect()
    }
    orig = {
        r["image_id"]: (bytes(r["bytes"]), r["caption"] or "")
        for r in export.select("image_id", "bytes", "caption").collect()
    }
    assert back == orig

    # 8. trust the export before training: the deep audit must certify
    # every shard against the lineage manifest
    man_df = spark.createDataFrame(
        [(r["shard"], r["n_rows"], r["tar_bytes"], r["sha256"]) for r in wrote],
        "shard bigint, n_rows bigint, tar_bytes bigint, sha256 string",
    )
    audit = {
        r["shard"]: r["status"]
        for r in shards.verify_export(spark, out, man_df).collect()
    }
    assert set(audit.values()) == {"ok"}

    # 9. the resume loop end-to-end: lose one shard + corrupt another,
    # audit names exactly those, rewriting ONLY the flagged shards
    # restores the export to its original byte-identical state
    import os as _os

    sids = sorted(audit)
    assert len(sids) >= 2
    _os.remove(_os.path.join(out, f"shard-{sids[0]:06d}.tar"))
    p1 = _os.path.join(out, f"shard-{sids[1]:06d}.tar")
    with open(p1, "r+b") as f:
        f.seek(520)
        c = f.read(1)
        f.seek(520)
        f.write(bytes([c[0] ^ 0x5A]))
    audit2 = {
        r["shard"]: r["status"]
        for r in shards.verify_export(spark, out, man_df).collect()
    }
    bad = sorted(s for s, st in audit2.items() if st != "ok")
    assert bad == [sids[0], sids[1]]
    rewrote = shards.write_webdataset(
        assigned.filter(F.col("shard").isin(bad)), out, overwrite=True
    ).collect()
    assert sorted(r["shard"] for r in rewrote) == bad
    # bit-reproducibility closes the loop: rewritten shards carry the
    # ORIGINAL manifest digests, so the audit is green again
    audit3 = {
        r["shard"]: r["status"]
        for r in shards.verify_export(spark, out, man_df).collect()
    }
    assert set(audit3.values()) == {"ok"}
