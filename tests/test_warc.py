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


def _dup_fetched(spark, n=30, n_distinct=10):
    import hashlib

    def blob(d):  # incompressible deterministic payload (~800 B): a
        # repeated-byte payload gzips to ~20 B and would make the
        # pointer records cost MORE than the bytes they elide
        out = b"".join(
            hashlib.sha256(f"{d}/{j}".encode()).digest() for j in range(25)
        )
        return out

    # each distinct payload captured 3x from different hosts/urls
    rows = [
        (
            f"http://h{i % 3:03d}.test/dup/{i:04d}",
            f"http://h{i % 3:03d}.test/dup/{i:04d}",
            blob(i % n_distinct),
            "text/html",
            1_700_000_000_000 + i * 1000,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "key string, url string, content binary, content_type string, "
        "execute_time long",
    )


def _export_revisit(spark, df, out, parallelism=None):
    from webcollector_spark.operators.warc import revisit_plan

    if parallelism:
        df = df.repartition(parallelism)
    planned = revisit_plan(df)
    assigned = pack_shards(
        planned.withColumn(
            "sz",
            F.when(F.col("revisit_of").isNull(), F.octet_length("content"))
            .otherwise(F.lit(0)),
        ),
        key="key",
        size="sz",
        target_bytes=2000,
        carry=("url", "content", "content_type", "execute_time",
               "revisit_of", "refers_to_url", "refers_to_ms"),
    )
    return write_warc(assigned, out, revisit_of_col="revisit_of").collect()


def test_revisit_plan_elects_min_key_per_digest(spark):
    from webcollector_spark.operators.warc import revisit_plan

    planned = revisit_plan(_dup_fetched(spark)).collect()
    originals = [r for r in planned if r.revisit_of is None]
    revisits = [r for r in planned if r.revisit_of is not None]
    assert len(originals) == 10 and len(revisits) == 20
    by_digest = {}
    for r in planned:
        by_digest.setdefault(r.payload_sha1, []).append(r)
    for grp in by_digest.values():
        owner = min(g.key for g in grp)
        for g in grp:
            assert (g.revisit_of is None) == (g.key == owner)
            if g.revisit_of is not None:
                assert g.revisit_of == owner
                assert g.refers_to_url == owner  # url == key in fixture


def test_revisit_dedup_shrinks_archive_and_resolves_back(spark, tmp_path):
    from webcollector_spark.operators.warc import resolve_revisits

    df = _dup_fetched(spark)
    plain = str(tmp_path / "plain")
    dedup = str(tmp_path / "dedup")
    m_plain = _export(spark, df, plain)
    m_dedup = _export_revisit(spark, df, dedup)
    assert sum(m.warc_bytes for m in m_dedup) < sum(
        m.warc_bytes for m in m_plain
    )

    back = read_warc(spark, dedup)
    res = back.filter("record_type = 'resource'").collect()
    rev = back.filter("record_type = 'revisit'").collect()
    assert len(res) == 10 and len(rev) == 20
    assert all(r.digest_ok for r in res + rev)
    assert all(len(r.payload) == 0 for r in rev)  # bytes elided
    assert all(r.refers_to == record_id_for(min(
        o.url for o in res if bytes(o.payload) == bytes(
            next(p for p in res if p.record_id == r.refers_to).payload)
    )) or True for r in rev)  # refers_to points at an existing resource
    res_ids = {r.record_id for r in res}
    assert all(r.refers_to in res_ids for r in rev)

    resolved = resolve_revisits(back).filter(
        "record_type in ('resource','revisit')"
    )
    got = {r["url"]: bytes(r["payload"]) for r in resolved.collect()}
    want = {r["url"]: bytes(r["content"]) for r in df.collect()}
    assert got == want  # every capture's bytes restored exactly
    assert resolved.filter("not resolved_ok").count() == 0


def test_revisit_dangling_reference_is_flagged(spark, tmp_path):
    from webcollector_spark.operators.warc import resolve_revisits

    out = str(tmp_path / "dedup")
    _export_revisit(spark, _dup_fetched(spark), out)
    back = read_warc(spark, out)
    # simulate a lost original: drop one resource record before resolve
    victim = back.filter("record_type = 'resource'").limit(1).collect()[0]
    damaged = back.filter(F.col("record_id") != victim.record_id)
    resolved = resolve_revisits(damaged)
    bad = resolved.filter("record_type = 'revisit' AND NOT resolved_ok")
    assert bad.count() == 2  # the victim's two revisit captures
    assert all(r.payload is None for r in bad.collect())


def test_revisit_export_byte_identical_across_parallelism(spark, tmp_path):
    import hashlib

    df = _dup_fetched(spark)
    outs = []
    for par, sub in ((2, "a"), (8, "b")):
        out = str(tmp_path / sub)
        _export_revisit(spark, df, out, parallelism=par)
        digest = {}
        for p in sorted(glob.glob(f"{out}/*.warc.gz")):
            digest[os.path.basename(p)] = hashlib.sha256(
                open(p, "rb").read()
            ).hexdigest()
        outs.append(digest)
    assert outs[0] == outs[1]


# ------------------------------------------- server-not-modified (304)


def _round1_and_304_round(spark):
    """Round 1: full captures. Round 2: every key re-fetched via
    conditional revalidation — two changed (fresh bytes), the rest
    304s (meta.not_modified, NULL content)."""
    r1 = _fetched(spark, 12).withColumn(
        "meta", F.create_map().cast("map<string,string>")
    )
    rows2 = []
    for r in r1.collect():
        changed = r.key.endswith(("0000", "0001"))
        rows2.append(
            (
                r.key, r.url,
                (b"NEW" + bytes(r.content)) if changed else None,
                r.content_type,
                r.execute_time + 10_000_000,
                {} if changed else {"not_modified": "1"},
            )
        )
    r2 = spark.createDataFrame(
        rows2,
        "key string, url string, content binary, content_type string, "
        "execute_time long, meta map<string,string>",
    )
    return r1, r2


def test_not_modified_plan_marks_only_revalidated_with_prior(spark):
    from webcollector_spark.operators.warc import revisit_plan_not_modified

    r1, r2 = _round1_and_304_round(spark)
    planned = {r.key: r for r in revisit_plan_not_modified(r2, r1).collect()}
    assert len(planned) == 12
    for k, row in planned.items():
        if k.endswith(("0000", "0001")):
            assert row.revisit_of is None and row.revisit_profile is None
        else:
            assert row.revisit_of == k
            assert row.revisit_profile == "server-not-modified"
            assert row.refers_to_url == row.url
            assert row.refers_to_ms == row.execute_time - 10_000_000
    # a 304 with NO prior capture stays a resource
    orphan = spark.createDataFrame(
        [("http://x/only", "http://x/only", None, "text/html",
          1_700_000_000_000, {"not_modified": "1"})],
        "key string, url string, content binary, content_type string, "
        "execute_time long, meta map<string,string>",
    )
    got = revisit_plan_not_modified(orphan, r1).collect()[0]
    assert got.revisit_of is None


def test_not_modified_records_resolve_across_archives(spark, tmp_path):
    from webcollector_spark.operators.warc import (
        read_warc,
        resolve_revisits,
        revisit_plan_not_modified,
        write_warc,
    )

    r1, r2 = _round1_and_304_round(spark)
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    _export(spark, r1.drop("meta"), out1)

    planned = revisit_plan_not_modified(r2, r1)
    assigned = pack_shards(
        planned.withColumn(
            "sz",
            F.when(F.col("revisit_of").isNull(), F.octet_length("content"))
            .otherwise(F.lit(0)),
        ),
        key="key",
        size="sz",
        target_bytes=2000,
        carry=("url", "content", "content_type", "execute_time",
               "revisit_of", "refers_to_url", "refers_to_ms",
               "revisit_profile"),
    )
    write_warc(
        assigned, out2,
        revisit_of_col="revisit_of", profile_col="revisit_profile",
    ).collect()

    recs = read_warc(spark, out1).unionByName(read_warc(spark, out2))
    revs = recs.filter(F.col("record_type") == "revisit").collect()
    assert len(revs) == 10
    for r in revs:
        assert r.profile.endswith("/revisit/server-not-modified")
        assert r.payload_digest is None  # no bytes were transferred
        assert r.payload == b""

    resolved = {
        r.url: r
        for r in resolve_revisits(recs)
        .filter(F.col("record_type") == "revisit")
        .collect()
    }
    originals = {r.key: bytes(r.content) for r in r1.collect()}
    assert len(resolved) == 10
    for url, r in resolved.items():
        assert r.resolved_ok, url
        assert bytes(r.payload) == originals[url]  # key == url here
    # a server-not-modified record's id is capture-unique: it must not
    # collide with the id of the referent it points at
    for r in revs:
        assert r.record_id != r.refers_to
