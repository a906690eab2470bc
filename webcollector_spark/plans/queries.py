"""Driver-contract query registry: every SQL-expressible operator from
SURVEY.md §2 (and the training-data-pipeline extensions) expressed twice —
as a PySpark DataFrame plan and as ANSI SQL for the DuckDB oracle.

Mapping of engine operators onto the driver's tables (FIXTURES.md §B):
events is the frontier analog (key ≙ event_id, status ≙ event_type,
host ≙ user_id), documents drives the text/dedup operators, embeddings
drives similarity search.

Column-name contract: every computed column is aliased identically in
the DataFrame plan and the SQL (the driver sorts columns by name before
value-hashing). Float aggregates are rounded in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcollector_spark.functions.regex_rule import rule_column

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
SQL: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register(name: str, sql: str | None):
    def deco(fn):
        Q[name] = fn
        if sql is not None:
            SQL[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# O2 generate: filter + key-order + topN (Generator.java:49-78)
@register(
    "generate_topn",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type <> 'purchase' AND value <= 400
    ORDER BY event_id LIMIT 500
    """,
)
def q_generate_topn(spark, sf):
    return (
        _t(spark, sf, "events")
        .filter((F.col("event_type") != "purchase") & (F.col("value") <= 400))
        .orderBy("event_id")
        .limit(500)
        .select("event_id", "event_type", "value")
    )


# O1 inject presence-check = left-anti join (RocksDBManager.java:76-79)
@register(
    "inject_antijoin",
    """
    SELECT e.event_id FROM events e
    WHERE e.event_id % 7 = 0
      AND e.event_id NOT IN (SELECT event_id FROM events WHERE event_id % 3 = 0)
    """,
)
def q_inject_antijoin(spark, sf):
    ev = _t(spark, sf, "events")
    seeds = ev.filter(F.col("event_id") % 7 == 0).select("event_id")
    existing = ev.filter(F.col("event_id") % 3 == 0).select("event_id")
    return seeds.join(existing, "event_id", "left_anti")


# O9 merge fetch-side last-wins = windowed dedup (RocksDBManager.java:167-171)
@register(
    "merge_lastwins",
    """
    SELECT user_id, event_id AS last_event_id FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'view') t
    WHERE rn = 1
    """,
)
def q_merge_lastwins(spark, sf):
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", F.col("event_id").alias("last_event_id"))
    )


# graft scheduler: per-host top-k window rank (SURVEY §2.1 O2 scaled mode)
@register(
    "perhost_topk",
    """
    SELECT user_id, event_id, rk FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rk
      FROM events WHERE event_type <> 'error') t
    WHERE rk <= 3
    """,
)
def q_perhost_topk(spark, sf):
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        _t(spark, sf, "events")
        .filter(F.col("event_type") != "error")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "rk")
    )


# RegexRule positive/negative (util/RegexRule.java:112-133) via rule_column
@register(
    "regex_rule_filter",
    """
    SELECT doc_id FROM documents
    WHERE regexp_matches(text, '^(?:.*join.*)$')
      AND NOT regexp_matches(text, '^(?:.*slow.*)$')
    """,
)
def q_regex_rule(spark, sf):
    docs = _t(spark, sf, "documents")
    return docs.filter(
        rule_column(F.col("text"), ["+.*join.*", "-.*slow.*"])
    ).select("doc_id")


# O4 visitor dispatch precedence = CASE routing (VisitorMethodDispatcher.java:199-230)
@register(
    "dispatch_routing",
    """
    SELECT CASE WHEN event_type IN ('click','view') THEN 'success'
                WHEN event_type = 'error' THEN 'failed'
                ELSE 'other' END AS route,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY route
    """,
)
def q_dispatch_routing(spark, sf):
    route = (
        F.when(F.col("event_type").isin("click", "view"), "success")
        .when(F.col("event_type") == "error", "failed")
        .otherwise("other")
    )
    return (
        _t(spark, sf, "events")
        .groupBy(route.alias("route"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# retry gate: strict `>` boundary (Generator.java:65) — value as execute_count
@register(
    "retry_boundary",
    """
    SELECT count(*) AS n_generatable FROM events
    WHERE floor(value) <= 10
    """,
)
def q_retry_boundary(spark, sf):
    # floor, not cast: Spark truncates double->int, DuckDB rounds
    return (
        _t(spark, sf, "events")
        .filter(F.floor("value") <= 10)
        .agg(F.count("*").alias("n_generatable"))
    )


# ---------------------------------------------------------------------------
# Relational coverage: aggregation + join shapes Spark gives us free (§2.5)
@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "broadcast_dim_join",
    """
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_broadcast_dim_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# sessionization (gap > 1h) — lag window + conditional sum
@register(
    "sessionize",
    """
    SELECT user_id, sum(new_session) AS n_sessions FROM (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 3600
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
    GROUP BY user_id
    """,
)
def q_sessionize(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 3600),
        1,
    ).otherwise(0)
    return (
        _t(spark, sf, "events")
        .withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
    )


# hourly tumbling-window agg (batch analog of the streaming path)
@register(
    "events_hourly",
    """
    SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY hour, event_type
    """,
)
def q_events_hourly(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis + dedup (graft first-class ops)
@register(
    "token_count",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def q_token_count(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))).alias(
            "n_tokens"
        ),
        "n_chars",
    )


@register(
    "quality_score",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\S+')) AS n_tokens,
           len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS n_stop,
           round(CAST(len(regexp_extract_all(text, '\b(the|a|of|and)\b')) AS DOUBLE)
                 / len(regexp_extract_all(text, '\S+')), 4) AS stop_ratio
    FROM documents
    """,
)
def q_quality_score(spark, sf):
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0)))
    stops = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"\b(the|a|of|and)\b"), F.lit(0))
    )
    return _t(spark, sf, "documents").select(
        "doc_id",
        toks.alias("n_tokens"),
        stops.alias("n_stop"),
        F.round(stops.cast("double") / toks, 4).alias("stop_ratio"),
    )


@register(
    "doc_fingerprint",
    r"""
    SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp"),
    )


@register(
    "dedup_exact",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS copies
    FROM corpus GROUP BY fp HAVING count(*) > 1
    """,
)
def q_dedup_exact(spark, sf):
    d = _t(spark, sf, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return (
        corpus.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("copies"))
        .filter(F.col("copies") > 1)
    )


@register(
    "lang_guess",
    r"""
    SELECT doc_id, lang,
           CASE WHEN len(regexp_extract_all(text, '\b(the|of|and|is)\b')) >= 2 THEN 'en'
                WHEN regexp_matches(text, '[äöüß]') THEN 'de'
                WHEN regexp_matches(text, '[àâêé]') THEN 'fr'
                WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
                ELSE 'unk' END AS lang_guess
    FROM documents
    """,
)
def q_lang_guess(spark, sf):
    en_hits = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"\b(the|of|and|is)\b"), F.lit(0))
    )
    guess = (
        F.when(en_hits >= 2, "en")
        .when(F.col("text").rlike("[äöüß]"), "de")
        .when(F.col("text").rlike("[àâêé]"), "fr")
        .when(F.col("text").rlike("[ñ¿¡]"), "es")
        .otherwise("unk")
    )
    return _t(spark, sf, "documents").select(
        "doc_id", "lang", guess.alias("lang_guess")
    )


# n-gram (token) overlap join — the Jaccard building block
@register(
    "ngram_overlap",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\S+'))) AS w
      FROM documents WHERE doc_id < 20)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
    GROUP BY doc_a, doc_b
    """,
)
def q_ngram_overlap(spark, sf):
    toks = (
        _t(spark, sf, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
                )
            ).alias("w"),
        )
    )
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup detection (shingle -> minhash -> band -> bucket join)
_SHINGLE_SQL = r"""
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])
              ELSE [] END AS sh
  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents)
"""

_SIG_SQL = f"""
  SELECT doc_id,
         md5(list_min(list_transform(sh, w -> md5('0:' || w))) ||
             list_min(list_transform(sh, w -> md5('1:' || w)))) AS band0,
         md5(list_min(list_transform(sh, w -> md5('2:' || w))) ||
             list_min(list_transform(sh, w -> md5('3:' || w)))) AS band1
  FROM ({_SHINGLE_SQL})
"""


def _shingles(spark, sf):
    docs = _t(spark, sf, "documents")
    t = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    sh = F.when(
        F.size(t) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(t, i), F.element_at(t, i + 1)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", sh.alias("sh"))


def _minhash_sig(spark, sf):
    def mh(seed: int):
        return F.array_min(
            F.transform(F.col("sh"), lambda w: F.md5(F.concat(F.lit(f"{seed}:"), w)))
        )

    return _shingles(spark, sf).select(
        "doc_id",
        F.md5(F.concat(mh(0), mh(1))).alias("band0"),
        F.md5(F.concat(mh(2), mh(3))).alias("band1"),
    )


@register("minhash_band", _SIG_SQL)
def q_minhash_band(spark, sf):
    return _minhash_sig(spark, sf)


@register(
    "lsh_candidate_pairs",
    f"""
    WITH sig AS ({_SIG_SQL}),
    bands AS (
      SELECT doc_id, 0 AS bi, band0 AS b FROM sig
      UNION ALL
      SELECT doc_id, 1 AS bi, band1 AS b FROM sig)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.bi = b.bi AND a.b = b.b AND a.doc_id < b.doc_id
    """,
)
def q_lsh_pairs(spark, sf):
    sig = _minhash_sig(spark, sf)
    bands = sig.select(
        "doc_id", F.lit(0).alias("bi"), F.col("band0").alias("b")
    ).unionByName(
        sig.select("doc_id", F.lit(1).alias("bi"), F.col("band1").alias("b"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# SimHash (16-bit here; 64-bit in production) — bit votes over word hashes.
# Identical arithmetic on both engines: hv = first 8 md5 hex digits as int,
# bit j extracted via floor(hv / 2^j) % 2 (no engine-specific shift ops).
@register(
    "simhash",
    r"""
    WITH words AS (
      SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\S+'))) AS w
      FROM documents),
    h AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS hv
          FROM words),
    votes AS (
      SELECT doc_id, j,
             sum(CASE WHEN CAST(floor(hv / pow(2, j)) AS BIGINT) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM h, range(16) t(j) GROUP BY doc_id, j)
    SELECT doc_id,
           sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q_simhash(spark, sf):
    docs = _t(spark, sf, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
            )
        ).alias("w"),
    )
    h = words.select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long").alias("hv"),
    )
    bits = h.select(
        "doc_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j")
    )
    votes = (
        bits.withColumn(
            "vote",
            F.when(
                (F.floor(F.col("hv") / F.pow(F.lit(2.0), F.col("j"))).cast("long") % 2)
                == 1,
                1,
            ).otherwise(-1),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long")).otherwise(
                0
            )
        ).alias("simhash")
    )


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (the exact baseline; the scale
# path is the LSH/IVF bucketing above applied to embedding sketches)
@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qe, CAST(e.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(q.qe, q.qe))
                * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))) AS sim
      FROM q, embeddings e WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, rk, round(sim, 4) AS sim4 FROM (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id ASC) AS rk
      FROM pairs) t
    WHERE rk <= 3
    """,
)
def q_ann_cosine_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot(F.col("qe"), F.col("embedding"))
                / (
                    F.sqrt(dot(F.col("qe"), F.col("qe")))
                    * F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                )
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "rk", F.round("sim", 4).alias("sim4"))
    )


@register(
    "embedding_norm",
    """
    SELECT vec_id, label,
           round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))), 4) AS l2
    FROM embeddings
    """,
)
def q_embedding_norm(spark, sf):
    e = F.col("embedding")
    dot = F.aggregate(
        F.zip_with(e, e, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return _t(spark, sf, "embeddings").select(
        "vec_id", "label", F.round(F.sqrt(dot), 4).alias("l2")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q)


def oracle_sql() -> dict[str, str]:
    return dict(SQL)
