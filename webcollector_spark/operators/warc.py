"""WARC archive sink + source — the standard web-archive byte format.

WebCollector persists fetched pages only as CrawlDatum metadata in its
KV store (content is transient, model/Page.java:43-61); real crawl
infrastructure archives the payload bytes as WARC (ISO 28500), the
format Common Crawl / Internet Archive tooling consumes. This is the
archive-side twin of the WebDataset training sink (operators/shards.py):
same shard assignment (`pack_shards`), same determinism + resume
contract, different container.

Format (WARC/1.1):
* a file is a sequence of records: `WARC/1.1\\r\\n` + named headers +
  `\\r\\n` + Content-Length payload bytes + `\\r\\n\\r\\n`;
* each file opens with one `warcinfo` record describing the writer;
  fetched pages are `resource` records (we archive the payload we
  fetched, not a raw HTTP transaction capture);
* `.warc.gz` is PER-RECORD gzip members concatenated — the standard's
  own random-access trick: a (offset, length) index seeks straight to a
  record and inflates just it, which is what makes a 10^10-record
  archive on an object store usable with Range GETs.

Determinism contract (same stance as write_webdataset):
* record order within a shard is sorted by key; WARC-Record-ID is
  UUIDv5 of the record key (content-derived, not random); WARC-Date
  comes from the row's own fetch timestamp; gzip members are written
  with mtime=0 and a fixed level — so re-exporting the same frontier
  yields BYTE-IDENTICAL .warc.gz shards at any parallelism, and the
  manifest's sha256 column is stable lineage;
* resume is idempotent: existing final files are skipped, in-flight
  files use attempt-unique `.inprogress` names + atomic os.replace.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GZ_LEVEL = 6


def _warc_path(out_dir: str, shard: int) -> str:
    return f"{out_dir}/part-{shard:06d}.warc.gz"


def record_id_for(key: str) -> str:
    """Deterministic WARC-Record-ID: UUIDv5 over the record key."""
    return f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, key)}>"


def _iso_date(ms) -> str:
    from datetime import datetime, timezone

    if ms is None:
        ms = 0
    return datetime.fromtimestamp(int(ms) / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _payload_digest(data: bytes) -> str:
    import base64
    import hashlib

    return "sha1:" + base64.b32encode(hashlib.sha1(data).digest()).decode(
        "ascii"
    )


def _record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        b"WARC/1.1\r\n"
        + head.encode("utf-8")
        + f"Content-Length: {len(payload)}\r\n\r\n".encode("ascii")
        + payload
        + b"\r\n\r\n"
    )


def _gzip_member(raw: bytes) -> bytes:
    import gzip
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(
        fileobj=buf, mode="wb", compresslevel=_GZ_LEVEL, mtime=0
    ) as gz:
        gz.write(raw)
    return buf.getvalue()


def _warcinfo(shard: int, software: str) -> bytes:
    body = (
        f"software: {software}\r\nformat: WARC File Format 1.1\r\n"
    ).encode("utf-8")
    return _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", record_id_for(f"warcinfo/{shard}")),
            ("WARC-Date", _iso_date(0)),
            ("WARC-Filename", f"part-{shard:06d}.warc.gz"),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def revisit_plan(
    df: DataFrame,
    *,
    key: str = "key",
    bytes_col: str = "content",
    url_col: str = "url",
    date_ms_col: str = "execute_time",
) -> DataFrame:
    """Archive-side dedup plan: WARC 1.1 `revisit` records
    (identical-payload-digest profile) — the Internet Archive / Common
    Crawl mechanism that stores a duplicate payload ONCE and writes
    every other capture as a tiny pointer record. On a crawl where 30%
    of fetches are byte-identical (mirrors, soft-404 templates, CDN
    copies) this is the difference between archiving the bytes once or
    N times.

    Adds columns: `payload_sha1` (hex), `revisit_of` (the ORIGINAL's
    key, null when this row IS the original), `refers_to_url` /
    `refers_to_ms` (the original's capture for the WARC-Refers-To-*
    headers). Original election is deterministic: min key per digest
    (min_by for its url/date), so re-planning the same frontier yields
    the same records at any parallelism — the byte-identical-export
    contract extends through dedup. NULL payloads hash as empty and
    dedup together (they carry no bytes either way).

    Shape: one groupBy(payload_sha1) to O(distinct payloads) rows +
    one shuffle join back on the digest — no window over raw rows, no
    broadcast of anything unbounded. Feed the result to `write_warc`
    with revisit_of_col='revisit_of'.
    """
    digest = F.sha1(F.coalesce(F.col(bytes_col), F.lit(b"")))
    with_digest = df.withColumn("payload_sha1", digest)
    owners = with_digest.groupBy("payload_sha1").agg(
        F.min(key).alias("__owner_key"),
        F.min_by(F.col(url_col), F.col(key)).alias("refers_to_url"),
        F.min_by(F.col(date_ms_col), F.col(key)).alias("refers_to_ms"),
    )
    return (
        with_digest.join(owners, "payload_sha1")
        .withColumn(
            "revisit_of",
            F.when(F.col("__owner_key") != F.col(key), F.col("__owner_key")),
        )
        .drop("__owner_key")
    )


def revisit_plan_not_modified(
    current: DataFrame,
    prior: DataFrame,
    *,
    key: str = "key",
    url_col: str = "url",
    date_ms_col: str = "execute_time",
) -> DataFrame:
    """The 304 twin of `revisit_plan`: rows this round's fetch marked
    `meta['not_modified']` (conditional revalidation, RFC 9110) become
    WARC 1.1 `revisit` records with the **server-not-modified**
    profile, referring to the SAME key's prior capture — the archive
    records that a capture happened without re-storing (or even
    re-transferring) the bytes.

    `prior` is the earlier capture set (typically the rows previously
    archived); its latest capture per key supplies WARC-Refers-To-*.
    A not-modified row with no prior capture stays a plain resource
    (nothing to refer to). Adds `revisit_of` / `refers_to_url` /
    `refers_to_ms` / `revisit_profile` — feed to `write_warc` with
    revisit_of_col='revisit_of', profile_col='revisit_profile'.

    Shape: one groupBy(key) of the prior set to O(keys), one key join
    — both sides O(rows), nothing unbounded broadcast."""
    latest = prior.groupBy(F.col(key).alias("__pk")).agg(
        F.max_by(F.col(url_col), F.col(date_ms_col)).alias("__p_url"),
        F.max(date_ms_col).alias("__p_ms"),
    )
    flag = F.col("meta").getItem("not_modified") == F.lit("1")
    is_rev = flag & F.col("__pk").isNotNull()
    return (
        current.join(latest, F.col(key) == F.col("__pk"), "left")
        .withColumn("revisit_of", F.when(is_rev, F.col(key)))
        .withColumn("refers_to_url", F.when(is_rev, F.col("__p_url")))
        .withColumn("refers_to_ms", F.when(is_rev, F.col("__p_ms")))
        .withColumn(
            "revisit_profile", F.when(is_rev, F.lit("server-not-modified"))
        )
        .drop("__pk", "__p_url", "__p_ms")
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    *,
    key: str = "key",
    url_col: str = "url",
    bytes_col: str = "content",
    content_type_col: str = "content_type",
    date_ms_col: str = "execute_time",
    shard_col: str = "shard",
    software: str = "webcollector-spark",
    overwrite: bool = False,
    revisit_of_col: str | None = None,
    profile_col: str | None = None,
) -> DataFrame:
    """Write shard-assigned fetched rows as .warc.gz files; returns the
    per-shard lineage manifest (shard, n_records, warc_bytes, sha256,
    path, written). One repartition(shard) — no shard spans writers —
    then per-row Python is header assembly around an I/O-bound copy
    (the sink seam, not an expression hot path).

    With `revisit_of_col` (from `revisit_plan`): rows whose value is
    non-null are written as `revisit` records — identical-payload-
    digest profile, empty body, WARC-Refers-To pointing at the
    original's deterministic record id, WARC-Refers-To-Target-URI /
    -Date from the plan's refers_to_url/refers_to_ms columns — so the
    duplicate's BYTES never hit the archive while its capture event
    stays fully recorded and resolvable (`resolve_revisits`).

    With `profile_col` (from `revisit_plan_not_modified`): a revisit
    row whose profile is `server-not-modified` uses that WARC 1.1
    profile URI, records NO payload digest (the bytes were never
    transferred — a 304 is the server's word, not a hash we computed),
    and takes a capture-unique record id (`key@date`) so it cannot
    collide with the prior capture of the same key it refers to."""
    import pandas as pd

    out_schema = (
        "shard bigint, n_records bigint, warc_bytes bigint, "
        "sha256 string, path string, written boolean"
    )

    def write_partition(batches):
        import hashlib
        import os

        os.makedirs(out_dir, exist_ok=True)
        results = []

        def start(shard):
            final = _warc_path(out_dir, shard)
            if os.path.exists(final) and not overwrite:
                return {"shard": shard, "skip": True, "final": final, "rows": 0}
            tmp = f"{final}.inprogress.{os.getpid()}"
            f = open(tmp, "wb")
            sha = hashlib.sha256()
            head = _gzip_member(_warcinfo(shard, software))
            f.write(head)
            sha.update(head)
            return {
                "shard": shard, "skip": False, "final": final, "tmp": tmp,
                "f": f, "sha": sha, "n": len(head), "rows": 0,
            }

        def finish(st):
            import hashlib as hl

            if st["skip"]:
                h = hl.sha256()
                with open(st["final"], "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                results.append(
                    (st["shard"], st["rows"], os.path.getsize(st["final"]),
                     h.hexdigest(), st["final"], False)
                )
                return
            st["f"].close()
            os.replace(st["tmp"], st["final"])
            results.append(
                (st["shard"], st["rows"], st["n"],
                 st["sha"].hexdigest(), st["final"], True)
            )

        cur = None
        for pdf in batches:
            rev = pdf[revisit_of_col] if revisit_of_col else [None] * len(pdf)
            r_url = pdf["refers_to_url"] if revisit_of_col else rev
            r_ms = pdf["refers_to_ms"] if revisit_of_col else rev
            prof = pdf[profile_col] if profile_col else [None] * len(pdf)
            for sid, k, url, data, ct, ms, rof, ruri, rms, pr in zip(
                pdf[shard_col], pdf[key], pdf[url_col],
                pdf[bytes_col], pdf[content_type_col], pdf[date_ms_col],
                rev, r_url, r_ms, prof,
            ):
                sid = int(sid)
                if cur is None or cur["shard"] != sid:
                    if cur is not None:
                        finish(cur)
                    cur = start(sid)
                cur["rows"] += 1
                if cur["skip"]:
                    continue
                payload = bytes(data) if data is not None else b""
                if rof is not None:
                    # duplicate capture: bytes elided either way; the
                    # identical-payload profile records OUR digest of
                    # the bytes, server-not-modified records none (a
                    # 304 transferred no bytes to hash) and takes a
                    # capture-unique id so it can refer to the same
                    # key's earlier record without colliding
                    snm = pr == "server-not-modified"
                    headers = [
                        ("WARC-Type", "revisit"),
                        ("WARC-Record-ID",
                         record_id_for(f"{k}@{int(ms)}" if snm else str(k))),
                        ("WARC-Date", _iso_date(ms)),
                        ("WARC-Target-URI", str(url)),
                        ("WARC-Profile",
                         "http://netpreserve.org/warc/1.1/revisit/"
                         + ("server-not-modified" if snm
                            else "identical-payload-digest")),
                        ("WARC-Refers-To", record_id_for(str(rof))),
                        ("WARC-Refers-To-Target-URI", str(ruri)),
                        ("WARC-Refers-To-Date", _iso_date(rms)),
                    ]
                    if not snm:
                        headers.append(
                            ("WARC-Payload-Digest", _payload_digest(payload))
                        )
                    headers.append(
                        ("Content-Type",
                         str(ct) if ct else "application/octet-stream")
                    )
                    rec = _record(headers, b"")
                else:
                    rec = _record(
                        [
                            ("WARC-Type", "resource"),
                            ("WARC-Record-ID", record_id_for(str(k))),
                            ("WARC-Date", _iso_date(ms)),
                            ("WARC-Target-URI", str(url)),
                            ("WARC-Payload-Digest", _payload_digest(payload)),
                            ("Content-Type",
                             str(ct) if ct else "application/octet-stream"),
                        ],
                        payload,
                    )
                member = _gzip_member(rec)
                cur["f"].write(member)
                cur["sha"].update(member)
                cur["n"] += len(member)
        if cur is not None:
            finish(cur)
        if results:
            yield pd.DataFrame(
                results,
                columns=["shard", "n_records", "warc_bytes", "sha256", "path", "written"],
            )

    cols = [shard_col, key, url_col, bytes_col, content_type_col, date_ms_col]
    if revisit_of_col:
        cols += [revisit_of_col, "refers_to_url", "refers_to_ms"]
    if profile_col:
        cols.append(profile_col)
    return (
        df.select(*cols)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, key)
        .mapInPandas(write_partition, schema=out_schema)
    )


def index_warc(spark, out_dir: str) -> DataFrame:
    """Per-record random-access index over an export: (path, shard,
    offset, length, record_type, record_id, url) where offset/length
    bound the record's own GZIP MEMBER — the WARC convention (CDX-style)
    that turns a 10^10-record archive into one Range GET per record.
    Offsets come from the member boundaries the gzip stream itself
    declares; one task per file, headers parsed from the inflated
    member, payload bytes never retained."""
    out_schema = (
        "path string, offset bigint, length bigint, record_type string, "
        "record_id string, url string"
    )

    def index_partition(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                pos = 0
                while pos < len(data):
                    # inflate exactly ONE gzip member: decompressobj(31)
                    # stops at the member trailer and hands back the
                    # remainder in unused_data — gzip.GzipFile would run
                    # through every member in the stream
                    d = zlib.decompressobj(31)
                    raw = d.decompress(data[pos:])
                    member_len = len(data) - pos - len(d.unused_data)
                    hdr_end = raw.index(b"\r\n\r\n")
                    headers = {}
                    for line in raw[:hdr_end].split(b"\r\n")[1:]:
                        hk, _, hv = line.decode("utf-8").partition(":")
                        headers[hk.strip()] = hv.strip()
                    rows.append(
                        {
                            "path": path,
                            "offset": pos,
                            "length": member_len,
                            "record_type": headers.get("WARC-Type"),
                            "record_id": headers.get("WARC-Record-ID"),
                            "url": headers.get("WARC-Target-URI"),
                        }
                    )
                    pos += member_len
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "offset", "length",
                    "record_type", "record_id", "url",
                ],
            )

    files = spark.read.format("binaryFile").load(f"{out_dir}/*.warc.gz")
    return files.select("path", "content").mapInPandas(
        index_partition, schema=out_schema
    )


def fetch_warc_records(index: DataFrame) -> DataFrame:
    """Random access: inflate exactly the indexed members — one seek +
    bounded read per record (≙ object-store Range GET), reads grouped
    per file within a partition. The sparse complement of read_warc's
    whole-file streaming, for spot-checks and backfills that touch a
    tiny fraction of the archive."""
    out_schema = (
        "record_id string, url string, content_type string, payload binary"
    )

    def read_partition(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, grp in pdf.groupby("path", sort=True):
                local = path[len("file:") :] if path.startswith("file:") else path
                with open(local, "rb") as f:
                    for off, ln in zip(grp["offset"], grp["length"]):
                        f.seek(int(off))
                        raw = zlib.decompressobj(31).decompress(
                            f.read(int(ln))
                        )
                        hdr_end = raw.index(b"\r\n\r\n")
                        headers = {}
                        for line in raw[:hdr_end].split(b"\r\n")[1:]:
                            hk, _, hv = line.decode("utf-8").partition(":")
                            headers[hk.strip()] = hv.strip()
                        n = int(headers["Content-Length"])
                        rows.append(
                            {
                                "record_id": headers.get("WARC-Record-ID"),
                                "url": headers.get("WARC-Target-URI"),
                                "content_type": headers.get("Content-Type"),
                                "payload": raw[hdr_end + 4 : hdr_end + 4 + n],
                            }
                        )
            yield pd.DataFrame(
                rows, columns=["record_id", "url", "content_type", "payload"]
            )

    return index.select("path", "offset", "length").mapInPandas(
        read_partition, schema=out_schema
    )


def read_warc(spark, out_dir: str) -> DataFrame:
    """Distributed read-back: one task per .warc.gz file (binaryFile
    source), per-record gzip members inflated in sequence; warcinfo
    records are surfaced with record_type='warcinfo' so audits see the
    whole file. digest_ok re-verifies WARC-Payload-Digest per record."""
    out_schema = (
        "path string, record_type string, record_id string, url string, "
        "warc_date string, content_type string, payload binary, "
        "digest_ok boolean, refers_to string, payload_digest string, "
        "profile string"
    )

    def parse_partition(batches):
        import gzip
        import io

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                stream = io.BytesIO(bytes(blob))
                # multi-member gzip: GzipFile reads members back-to-back
                raw = gzip.GzipFile(fileobj=stream).read()
                pos = 0
                while pos < len(raw):
                    if raw[pos : pos + 5] != b"WARC/":
                        raise ValueError(f"bad record start at {pos} in {path}")
                    hdr_end = raw.index(b"\r\n\r\n", pos)
                    headers = {}
                    for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
                        hk, _, hv = line.decode("utf-8").partition(":")
                        headers[hk.strip()] = hv.strip()
                    n = int(headers["Content-Length"])
                    payload = raw[hdr_end + 4 : hdr_end + 4 + n]
                    pos = hdr_end + 4 + n + 4  # skip \r\n\r\n
                    digest = headers.get("WARC-Payload-Digest")
                    rtype = headers.get("WARC-Type")
                    rows.append(
                        {
                            "path": path,
                            "record_type": rtype,
                            "record_id": headers.get("WARC-Record-ID"),
                            "url": headers.get("WARC-Target-URI"),
                            "warc_date": headers.get("WARC-Date"),
                            "content_type": headers.get("Content-Type"),
                            "payload": payload,
                            # a revisit's digest describes the ORIGINAL
                            # payload (its own body is empty by design);
                            # it is re-verified against the original at
                            # resolve time (resolve_revisits), not here
                            "digest_ok": (
                                digest is None
                                or rtype == "revisit"
                                or digest == _payload_digest(payload)
                            ),
                            "refers_to": headers.get("WARC-Refers-To"),
                            "payload_digest": digest,
                            "profile": headers.get("WARC-Profile"),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_type", "record_id", "url",
                    "warc_date", "content_type", "payload", "digest_ok",
                    "refers_to", "payload_digest", "profile",
                ],
            )

    files = spark.read.format("binaryFile").load(f"{out_dir}/*.warc.gz")
    return files.select("path", "content").mapInPandas(
        parse_partition, schema=out_schema
    )


def resolve_revisits(records: DataFrame) -> DataFrame:
    """Materialize a deduped archive back to full rows: every `revisit`
    record takes its payload from the `resource` record its
    WARC-Refers-To names, and `resolved_ok` re-verifies that the
    original's bytes still hash to the digest the revisit recorded at
    capture time (the integrity contract of the identical-payload-
    digest profile — a mutated or missing original is surfaced, never
    silently substituted; dangling revisits keep a NULL payload and
    resolved_ok=false).

    Shape: one shuffle join revisits⋈originals on the record id —
    O(revisits) against O(originals), no broadcast of either unbounded
    side. Input is `read_warc`/`fetch_warc_records` output; resources
    pass through untouched with resolved_ok=true."""
    originals = records.filter(F.col("record_type") == "resource").select(
        F.col("record_id").alias("refers_to"),
        F.col("payload").alias("__orig_payload"),
        F.col("payload_digest").alias("__orig_digest"),
        F.col("digest_ok").alias("__orig_ok"),
    )
    resolved = (
        records.filter(F.col("record_type") == "revisit")
        .join(originals, "refers_to", "left")
        .withColumn(
            "resolved_ok",
            # transitively verified, pure JVM: the original's digest_ok
            # (read_warc recomputed sha1-base32 over its actual bytes)
            # proves recorded == computed; equal recorded digests then
            # prove the original's bytes hash to the revisit's digest.
            # A server-not-modified revisit recorded NO digest (a 304
            # transferred no bytes) — there the original's self-check
            # is the whole integrity claim.
            F.col("__orig_payload").isNotNull()
            & F.col("__orig_ok")
            & (
                F.col("payload_digest").isNull()
                | (F.col("payload_digest") == F.col("__orig_digest"))
            ),
        )
        .withColumn("payload", F.col("__orig_payload"))
        .drop("__orig_payload", "__orig_digest", "__orig_ok")
    )
    passthrough = records.filter(
        F.col("record_type") != "revisit"
    ).withColumn("resolved_ok", F.lit(True))
    return passthrough.unionByName(resolved.select(*passthrough.columns))
