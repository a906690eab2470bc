"""WebDataset tar shard writer: the byte sink of the crawl->training
funnel. Pins the three contracts the 100 TB export job leans on:
round-trip fidelity (every byte and caption back out), bit-reproducible
shards (sha256-stable across reruns -> lineage digests mean something),
and idempotent resume (a killed export rewrites only missing shards).
"""

from __future__ import annotations

import os
import tarfile

from pyspark.sql import functions as F

from webcollector_spark.operators import images, shards


def _assigned_corpus(spark, n=60, target=12_000):
    corpus = images.corpus_df(spark, n)
    sized = corpus.withColumn("nbytes", F.length("bytes"))
    assignment = shards.pack_shards(
        sized, key="image_id", size="nbytes", target_bytes=target, n_buckets=8
    )
    return corpus.join(assignment.select("image_id", "shard"), "image_id")


def test_webdataset_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    assigned = _assigned_corpus(spark)
    manifest = shards.write_webdataset(assigned, out).collect()
    assert all(r["written"] for r in manifest)
    assert sum(r["n_rows"] for r in manifest) == assigned.count()
    # no in-progress litter, one file per manifest row
    names = sorted(os.listdir(out))
    assert names == sorted(os.path.basename(r["path"]) for r in manifest)
    assert not any(".inprogress" in n for n in names)

    back = (
        shards.read_webdataset(spark, out)
        .withColumnRenamed("caption", "got_caption")
        .withColumnRenamed("shard", "got_shard")
    )
    joined = (
        assigned.select("image_id", "bytes", "caption", "shard")
        .join(back, "image_id", "full_outer")
        .collect()
    )
    assert len(joined) == assigned.count()
    for r in joined:
        assert r["data"] == bytes(r["bytes"])
        assert r["got_caption"] == r["caption"]
        assert r["got_shard"] == r["shard"]


def test_webdataset_bit_reproducible(spark, tmp_path):
    assigned = _assigned_corpus(spark, n=40)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = {r["shard"]: r["sha256"] for r in shards.write_webdataset(assigned, out1).collect()}
    # second run at different parallelism on a differently-partitioned input
    m2 = {
        r["shard"]: r["sha256"]
        for r in shards.write_webdataset(assigned.repartition(3), out2).collect()
    }
    assert m1 == m2
    # and the files themselves are byte-identical
    for name in os.listdir(out1):
        with open(os.path.join(out1, name), "rb") as f1, open(
            os.path.join(out2, name), "rb"
        ) as f2:
            assert f1.read() == f2.read()


def test_webdataset_resume_skips_existing(spark, tmp_path):
    out = str(tmp_path / "wds")
    assigned = _assigned_corpus(spark, n=40)
    first = {r["shard"]: r for r in shards.write_webdataset(assigned, out).collect()}
    victim = sorted(first)[0]
    os.remove(first[victim]["path"])

    second = {r["shard"]: r for r in shards.write_webdataset(assigned, out).collect()}
    assert second[victim]["written"] is True
    for s, row in second.items():
        if s != victim:
            assert row["written"] is False
        assert row["sha256"] == first[s]["sha256"]
        assert row["n_rows"] == first[s]["n_rows"]


def test_webdataset_member_layout(spark, tmp_path):
    out = str(tmp_path / "wds")
    assigned = _assigned_corpus(spark, n=30)
    manifest = {r["shard"]: r for r in shards.write_webdataset(assigned, out).collect()}
    for shard, row in manifest.items():
        with tarfile.open(row["path"], "r:") as tar:
            members = tar.getmembers()
        # two members per sample, paired basenames, sorted sample order
        assert len(members) == 2 * row["n_rows"]
        stems = [m.name.rpartition(".")[0] for m in members]
        pair_stems = stems[0::2]
        assert pair_stems == sorted(pair_stems)
        assert stems[1::2] == pair_stems  # .txt follows its payload
        for m in members:
            assert m.mtime == 0 and m.uid == 0 and m.gid == 0


def test_member_index_matches_real_tar_bytes(spark, tmp_path):
    """The byte-offset index is pure arithmetic over member sizes; this
    pins that arithmetic (512-byte headers, 512-padded data, two
    members per sample in key order) against the bytes tarfile actually
    wrote: seek to each indexed offset, check the preceding header
    names the member, and read back exactly the original payload and
    caption."""
    out = str(tmp_path / "wds")
    assigned = _assigned_corpus(spark, n=45)
    shards.write_webdataset(assigned, out).collect()

    sized = assigned.select(
        "image_id",
        "shard",
        "fmt",
        F.length("bytes").cast("long").alias("n_bytes"),
        F.coalesce(F.octet_length("caption"), F.lit(0))
        .cast("long")
        .alias("cap_bytes"),
    )
    idx = {
        r["image_id"]: r
        for r in shards.member_index(sized, key="image_id").collect()
    }
    orig = {
        r["image_id"]: r
        for r in assigned.select("image_id", "bytes", "caption", "fmt").collect()
    }
    assert idx.keys() == orig.keys()
    for k, r in idx.items():
        with open(os.path.join(out, f"shard-{r['shard']:06d}.tar"), "rb") as f:
            f.seek(r["payload_offset"] - 512)
            hdr = f.read(512)
            assert hdr[:100].rstrip(b"\0").decode() == f"{k}.{orig[k]['fmt']}"
            assert f.read(r["payload_len"]) == bytes(orig[k]["bytes"])
            f.seek(r["caption_offset"] - 512)
            assert f.read(512)[:100].rstrip(b"\0").decode() == f"{k}.txt"
            got_cap = f.read(r["caption_len"]).decode("utf-8")
            assert got_cap == (orig[k]["caption"] or "")


def test_fetch_samples_random_access(spark, tmp_path):
    """Sparse ranged reads via the index return exactly the original
    bytes+captions for an arbitrary subset, without read_webdataset's
    whole-shard streaming."""
    out = str(tmp_path / "wds")
    assigned = _assigned_corpus(spark, n=45)
    shards.write_webdataset(assigned, out).collect()

    sized = assigned.select(
        "image_id",
        "shard",
        F.length("bytes").cast("long").alias("n_bytes"),
        F.coalesce(F.octet_length("caption"), F.lit(0))
        .cast("long")
        .alias("cap_bytes"),
    )
    idx = shards.member_index(sized, key="image_id")
    subset = idx.filter(F.crc32(F.col("image_id")) % 3 == 0)
    got = {
        r["image_id"]: r for r in shards.fetch_samples(subset, out).collect()
    }
    want = {
        r["image_id"]: r
        for r in assigned.select("image_id", "bytes", "caption", "shard").collect()
        if r["image_id"] in got
    }
    assert len(got) == subset.count() > 0
    for k, r in got.items():
        assert bytes(r["data"]) == bytes(want[k]["bytes"])
        assert r["caption"] == (want[k]["caption"] or "")
        assert r["shard"] == want[k]["shard"]
