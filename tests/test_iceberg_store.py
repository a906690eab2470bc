"""IcebergFrontierStore: the guard must refuse cleanly without Iceberg
jars (this sandbox), and the class must share the FrontierStore
contract surface with the tested parquet backend. Full MERGE execution
is exercised only in Iceberg-enabled deployments; the SEMANTICS are the
same single-source-of-truth rules pinned by test_store/test_property on
RamFrontierStore/ParquetFrontierStore."""

from __future__ import annotations

import pytest

from webcollector_spark.iceberg_store import IcebergFrontierStore, iceberg_available
from webcollector_spark.store import ParquetFrontierStore


def test_guard_refuses_without_iceberg(spark):
    assert not iceberg_available(spark, "wc")
    with pytest.raises(RuntimeError, match="not an Iceberg catalog"):
        IcebergFrontierStore(spark, "wc.db.frontier")


def test_contract_surface_matches_parquet_backend():
    for name in (
        "inject", "merge", "load", "is_empty", "count",
        "log_round", "last_round", "rounds_df", "destroy",
    ):
        assert hasattr(IcebergFrontierStore, name), name
        assert hasattr(ParquetFrontierStore, name), name
