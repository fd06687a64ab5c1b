"""Driver-contract sanity: every registered query runs at sf0.001 and the
oracle SQL strings parse in DuckDB (full value-level comparison is
tools/check_oracle.py — this is the fast structural gate)."""

from __future__ import annotations

import duckdb
import pytest

from osmdatapy_spark.suite import QUERY_REGISTRY
from osmdatapy_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


def test_registry_complete():
    assert len(QUERY_REGISTRY) >= 43
    missing_oracle = [n for n, qd in QUERY_REGISTRY.items() if qd.oracle is None]
    assert missing_oracle == [], f"queries without oracle: {missing_oracle}"


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_query_runs(spark, name):
    df = QUERY_REGISTRY[name].fn(spark, SF_DIR)
    assert df.columns  # schema resolves
    df.limit(1).collect()  # plan executes


def test_oracles_parse_in_duckdb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for name, qd in QUERY_REGISTRY.items():
        if qd.oracle:
            con.execute(f"SELECT * FROM ({qd.oracle}) LIMIT 0")
