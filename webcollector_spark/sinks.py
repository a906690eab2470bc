"""Sinks + inspection helpers.

* `url_to_path` / `FileSystemOutput` — mirror-a-site-on-disk sink
  (reference util/FileSystemOutput.java:43-72). The URL->path rules are
  a pure function so they double as a Spark column expression via
  `path_col`; the writer itself is a driver-side utility (at cluster
  scale the fetched table IS the sink — this exists for reference
  parity and local exports).
* `datum_to_string` — pretty printer (util/CrawlDatumFormater.java:39-77).
* `describe_frontier` — offline CrawlDB scan helper (the
  RocksDBReader/list() analogue, plugin/rocks/RocksDBReader.java:42-67).
"""

from __future__ import annotations

import os
from datetime import datetime
from urllib.parse import urlsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcollector_spark.schema import (
    STATUS_DB_FAILED,
    STATUS_DB_SUCCESS,
    STATUS_DB_UNEXECUTED,
)


def url_to_path(url: str) -> str:
    """URL -> relative mirror path (FileSystemOutput.java:44-65):
    host prefix; empty or trailing-slash path -> index.html;
    extensionless final segment -> '.html' appended; '?query' appended
    as '_query'."""
    parts = urlsplit(url)
    query = f"_{parts.query}" if parts.query else ""
    path = parts.path
    if len(path) == 0:
        path = "index.html"
    elif path.endswith("/"):
        path = path + "index.html"
    else:
        last_slash = path.rfind("/")
        last_point = path.rfind(".")
        if last_point < last_slash:
            path = path + ".html"
    if not path.startswith("/"):
        path = "/" + path  # File(domain, path) join semantics
    return parts.hostname + path + query


def path_col(url: Column | str) -> Column:
    """`url_to_path` as a JVM-side column expression (host || rules)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(u, r"^[a-z]+://([^/:?#]+)", 1)
    rest = F.regexp_extract(u, r"^[a-z]+://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    path = (
        F.when(rest == "", "/index.html")
        .when(rest.endswith("/"), F.concat(rest, F.lit("index.html")))
        .when(
            ~F.element_at(F.split(rest, "/"), -1).contains("."),
            F.concat(rest, F.lit(".html")),
        )
        .otherwise(rest)
    )
    return F.concat(
        host, path, F.when(query != "", F.concat(F.lit("_"), query)).otherwise("")
    )


class FileSystemOutput:
    """Driver-side mirror writer (reference util/FileSystemOutput)."""

    def __init__(self, root: str):
        self.root = root

    def output(self, url: str, content: bytes | None) -> str:
        path = os.path.join(self.root, url_to_path(url))
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(content or b"")
        return path

    def output_fetched(self, fetched: DataFrame, limit: int | None = None) -> int:
        """Write fetched rows' content to disk (requires
        keep_content=True on the fetch config)."""
        rows = fetched.select("url", "content").filter(
            F.col("content").isNotNull()
        )
        if limit:
            rows = rows.limit(limit)
        n = 0
        for r in rows.toLocalIterator():
            self.output(r["url"], bytes(r["content"]))
            n += 1
        return n


_STATUS_NAMES = {
    STATUS_DB_SUCCESS: "success",
    STATUS_DB_FAILED: "failed",
    STATUS_DB_UNEXECUTED: "unexecuted",
}


def datum_to_string(row) -> str:
    """Pretty-print one frontier row (CrawlDatumFormater.java:39-77)."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    ts = d.get("execute_time") or 0
    out = [
        "",
        f"KEY: {d.get('key')}",
        f"URL: {d.get('url')}",
        f"STATUS: {_STATUS_NAMES.get(d.get('status'), d.get('status'))}",
        "ExecuteTime: "
        + datetime.fromtimestamp(ts / 1000).strftime("%Y-%m-%d %H:%M:%S"),
        f"ExecuteCount: {d.get('execute_count')}",
        f"Code: {d.get('code')}",
    ]
    if d.get("location"):
        out.append(f"Location: {d['location']}")
    for i, (k, v) in enumerate((d.get("meta") or {}).items()):
        out.append(f"META[{i}]: ({k},{v})")
    return "\n".join(out) + "\n"


def describe_frontier(frontier: DataFrame, n: int = 20) -> str:
    """Offline CrawlDB scan pretty-printer (RocksDBReader analogue)."""
    return "".join(datum_to_string(r) for r in frontier.orderBy("key").limit(n).collect())


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict | None = None,
    batch_size: int = 1000,
) -> None:
    """JDBC sink (reference util/MysqlHelper.java:36-67 — a c3p0 pool +
    JdbcTemplate batch insert). Spark-native form: df.write.jdbc handles
    pooling/batching per partition; `batch_size` maps to the JDBC
    batchsize option (MysqlHelper's template batches likewise).

    Example:
        write_jdbc(fetched, "jdbc:mysql://db:3306/crawl", "fetched",
                   properties={"user": "u", "password": "p",
                               "driver": "com.mysql.cj.jdbc.Driver"})

    Requires the JDBC driver jar on the Spark classpath
    (spark.jars / --packages); not runnable in this sandbox.
    """
    props = {"batchsize": str(batch_size)}
    props.update(properties or {})
    df.write.jdbc(url=url, table=table, mode=mode, properties=props)
