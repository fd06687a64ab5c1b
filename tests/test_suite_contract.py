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
    # every registered query is value-oracled — approximate-by-design
    # sketches (suite/core.py::approx_sketches) stay OUT of the registry
    # and are accuracy-pinned by test_approx_sketches_accuracy instead
    missing_oracle = [n for n, qd in QUERY_REGISTRY.items() if qd.oracle is None]
    assert not missing_oracle, f"queries without oracle: {missing_oracle}"


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


def test_approx_sketches_accuracy(spark):
    """The unregistered approximate face must still be NEAR-correct: HLL++
    within its 2% rsd (5x margin), t-digest median within 1% of exact."""
    from osmdatapy_spark.suite.core import approx_sketches
    from osmdatapy_spark.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    approx = {
        r["l_returnflag"]: r for r in approx_sketches(spark, sf).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.percentile("l_extendedprice", 0.5).alias("median_price"),
        )
        .collect()
    }
    for k, e in exact.items():
        a = approx[k]
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.10
        assert abs(a["approx_median_price"] - e["median_price"]) / e["median_price"] < 0.01


def test_geojson_features_parse_as_json(spark):
    """Every exported Feature string must be valid RFC 7946 JSON with the
    coordinates in [lon, lat] order."""
    import json

    from osmdatapy_spark.suite import QUERY_REGISTRY

    rows = (
        QUERY_REGISTRY["osm_geojson_points"]
        .fn(spark, "/root/testdata/sf0.001")
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        f = json.loads(r["feature"])
        assert f["type"] == "Feature"
        assert f["geometry"]["type"] == "Point"
        lon, lat = f["geometry"]["coordinates"]
        assert -180 <= lon <= 180 and -90 <= lat <= 90
        assert f["properties"]["osmid"] == r["osmid"]
