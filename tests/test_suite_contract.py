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


def test_oracles_are_timezone_independent():
    """No oracle may read differently under a different DuckDB session
    TimeZone: to_timestamp()/TIMESTAMPTZ/AT TIME ZONE convert through the
    session zone (host-dependent — the driver pins nothing), which is how
    round 8's one red row happened and how round 9's first fix would have
    re-broken on a non-UTC host.  Window starts must be stated with the
    TZ-independent make_timestamp(epoch_micros); this lint blocks the
    class at authoring time (check_oracle/driver_mimic additionally pin
    SET TimeZone='UTC' as defense in depth)."""
    banned = ("to_timestamp(", "AT TIME ZONE", "TIMESTAMPTZ", "current_timestamp", "now()")
    offenders = {
        name: [b for b in banned if b.lower() in qd.oracle.lower()]
        for name, qd in QUERY_REGISTRY.items()
        if qd.oracle and any(b.lower() in qd.oracle.lower() for b in banned)
    }
    assert not offenders, f"TZ-sensitive oracle constructs: {offenders}"


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


def test_data_contract_audit_on_dirty_data(spark, tmp_path):
    """Adversarial fixture for rel_data_contract_audit: planted duplicate
    keys in the FK TARGET tables (a dup c_custkey and a dup o_orderkey —
    the very violations an audit exists to catch).  Round 5's
    implementation joined the raw key projections, so those dups fanned
    out the fact rows and corrupted n_checked / pk / orphan counts; the
    fix joins DISTINCT key sets.  Every expected value below is what the
    registered DuckDB oracle (EXISTS semantics, unjoined counts) returns
    on the same tables."""
    from osmdatapy_spark.suite.core import rel_data_contract_audit

    spark.createDataFrame(
        [(1,), (1,), (2,)], "c_custkey long"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 1, "O"), (10, 1, None), (11, 2, "F"), (12, 99, "O")],
        "o_orderkey long, o_custkey long, o_orderstatus string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 5.0), (11, -1.0), (13, 2.0)],
        "l_orderkey long, l_quantity double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        r["check_name"]: (r["n_violations"], r["n_checked"])
        for r in rel_data_contract_audit(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orders_pk_unique": (1, 4),       # dup o_orderkey=10
        "lineitem_fk_orders": (1, 3),     # l_orderkey=13 orphan; dup 10 must NOT fan
        "orders_fk_customer": (1, 4),     # o_custkey=99 orphan; dup c_custkey=1 must NOT fan
        "orderstatus_not_null": (1, 4),
        "quantity_positive": (1, 3),
    }


def test_dup_span_coverage_non_ascii_oracle_parity(spark, tmp_path):
    """Round-5 defect: the llm_dup_span_coverage oracle used DuckDB
    strlen() (BYTE length) against Spark char_length() — identical only
    on ASCII corpora, which is all the driver testdata contains.  This
    fixture plants multibyte docs (2- and 3-byte UTF-8) with a shared
    25-char span, so byte semantics would yield different doc_len,
    n_grams, and gram positions; the swapped length() oracle must agree
    with the Spark result exactly."""
    import duckdb
    import pandas as pd

    from osmdatapy_spark.suite import QUERY_REGISTRY

    shared = "é" * 10 + "字" * 10 + "x" * 5  # 25 chars, 45 bytes
    docs = [
        (1, "aaa" + shared + "bbb"),
        (2, "ccc" + shared + "ddd"),
        # long, multibyte, all-distinct chars — no duplicated 20-gram
        # (a repeated single char like "ü"*30 self-duplicates: every
        # 20-gram is identical, legitimately 100% covered)
        (3, "".join(chr(0x3B1 + i) for i in range(15)) + "東京都渋谷区左右中外内"),
        (4, "short 字"),         # < span length
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    qd = QUERY_REGISTRY["llm_dup_span_coverage"]
    got = (
        qd.fn(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    want = con.execute(qd.oracle).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # and the values themselves are the char-semantics ones
    by_id = {int(r.doc_id): r for r in got.itertuples()}
    assert by_id[1].doc_len == 31          # chars, not 51 bytes
    assert by_id[1].dup_covered_chars == 25
    assert by_id[3].dup_covered_chars == 0
