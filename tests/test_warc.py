"""WARC sink/source: round-trip fidelity + per-record digest check,
byte-identical re-export across parallelism, idempotent resume, and the
standard per-record-gzip member layout readable by plain stdlib gzip."""

from __future__ import annotations

import glob
import gzip
import os

from pyspark.sql import functions as F

from webcollector_spark.operators.shards import pack_shards
from webcollector_spark.operators.warc import read_warc, record_id_for, write_warc


def _fetched(spark, n=60):
    rows = [
        (
            f"http://h{i % 5:03d}.test/p/{i:04d}",
            f"http://h{i % 5:03d}.test/p/{i:04d}",
            bytes([i % 251]) * (50 + 137 * (i % 7)),
            "text/html" if i % 3 else "image/png",
            1_700_000_000_000 + i * 1000,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "key string, url string, content binary, content_type string, "
        "execute_time long",
    )


def _export(spark, df, out, parallelism=None):
    if parallelism:
        df = df.repartition(parallelism)
    assigned = pack_shards(
        df.withColumn("sz", F.octet_length("content")),
        key="key",
        size="sz",
        target_bytes=2000,
        carry=("url", "content", "content_type", "execute_time"),
    )
    return write_warc(assigned, out).collect()


def test_warc_round_trip_and_digests(spark, tmp_path):
    out = str(tmp_path / "warc")
    df = _fetched(spark)
    manifest = _export(spark, df, out)
    assert sum(m.n_records for m in manifest) == 60
    assert all(m.written for m in manifest)
    assert len(manifest) > 1  # target_bytes forces multiple shards

    back = read_warc(spark, out)
    recs = back.filter("record_type = 'resource'").collect()
    infos = back.filter("record_type = 'warcinfo'").collect()
    assert len(infos) == len(manifest)  # one warcinfo per file
    assert all(r.digest_ok for r in recs + infos)

    want = {r.key: r for r in df.collect()}
    assert len(recs) == 60
    for r in recs:
        src = want[r.url]
        assert bytes(r.payload) == bytes(src.content)
        assert r.content_type == src.content_type
        assert r.record_id == record_id_for(src.key)
        assert r.warc_date.endswith("Z") and r.warc_date[:4] == "2023"


def test_byte_identical_across_parallelism(spark, tmp_path):
    df = _fetched(spark)
    m1 = _export(spark, df, str(tmp_path / "a"), parallelism=2)
    m2 = _export(spark, df, str(tmp_path / "b"), parallelism=13)
    d1 = {m.shard: m.sha256 for m in m1}
    d2 = {m.shard: m.sha256 for m in m2}
    assert d1 == d2
    for m in m1:
        with open(m.path, "rb") as f1, open(
            m.path.replace("/a/", "/b/"), "rb"
        ) as f2:
            assert f1.read() == f2.read()


def test_resume_rewrites_only_missing(spark, tmp_path):
    out = str(tmp_path / "warc")
    df = _fetched(spark)
    m1 = {m.shard: m for m in _export(spark, df, out)}
    victim = sorted(m1)[1]
    os.remove(m1[victim].path)

    m2 = {m.shard: m for m in _export(spark, df, out)}
    assert m2[victim].written and m2[victim].sha256 == m1[victim].sha256
    for s, m in m2.items():
        if s != victim:
            assert not m.written and m.sha256 == m1[s].sha256


def test_index_covers_every_byte_and_fetch_is_exact(spark, tmp_path):
    from webcollector_spark.operators.warc import fetch_warc_records, index_warc

    out = str(tmp_path / "warc")
    df = _fetched(spark, 40)
    _export(spark, df, out)

    idx = index_warc(spark, out)
    rows = idx.collect()
    # members tile each file exactly: contiguous offsets, lengths sum to
    # the file size
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    for path, members in by_path.items():
        members.sort(key=lambda r: r.offset)
        pos = 0
        for m in members:
            assert m.offset == pos
            pos += m.length
        local = path[len("file:") :] if path.startswith("file:") else path
        assert pos == os.path.getsize(local)
        assert members[0].record_type == "warcinfo"

    # random access: fetch a sparse sample, payloads must equal source
    want = {r.key: bytes(r.content) for r in df.collect()}
    sample = idx.filter("record_type = 'resource'").orderBy("url").limit(7)
    got = fetch_warc_records(sample).collect()
    assert len(got) == 7
    for g in got:
        assert bytes(g.payload) == want[g.url]
        assert g.record_id == record_id_for(g.url)


def test_stdlib_gzip_reads_members(spark, tmp_path):
    """The .warc.gz layout must be plain concatenated gzip members —
    consumable by tooling that knows nothing of our writer."""
    out = str(tmp_path / "warc")
    _export(spark, _fetched(spark, 10), out)
    path = sorted(glob.glob(f"{out}/*.warc.gz"))[0]
    with gzip.open(path, "rb") as f:
        raw = f.read()
    assert raw.startswith(b"WARC/1.1\r\n")
    assert b"WARC-Type: warcinfo" in raw
    assert b"WARC-Type: resource" in raw
