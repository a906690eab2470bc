"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — the graft's per-host top-k frontier
scheduler shape over the sf0.001 events table.
queries()/oracle_sql(): operator registry, implemented in
webcollector_spark/plans/queries.py (DataFrame plan + DuckDB SQL pairs).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from webcollector_spark.plans import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: salted per-host top-k generate (SURVEY §2.1 O2 scaled
    mode) expressed on the sf0.001 events table (host ≙ user_id)."""
    return _q.q_perhost_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
