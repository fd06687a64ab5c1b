"""WKB output surface: byte-exact layout fixtures, WKT↔WKB round-trips
over all five geometry types, and the engine's geometry_wkb path.

The expected bytes are hand-assembled from the public WKB spec
(little-endian ISO: byte order 0x01, uint32 type, float64 coords) — an
independent fixture, not produced by the encoder under test."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from osmdatapy_spark.operators.wkb import (
    CRS_METADATA,
    attach_wkb,
    linestring_wkb,
    point_wkb,
    polygon_wkb,
    wkb_info,
    wkt_to_wkb,
)


def _le(gtype: int) -> bytes:
    return b"\x01" + struct.pack("<I", gtype)


def test_point_wkb_byte_exact(spark):
    df = spark.createDataFrame([(1.5, 2.5)], "lon double, lat double")
    got = df.select(point_wkb(col("lon"), col("lat")).alias("b")).first()["b"]
    assert bytes(got) == _le(1) + struct.pack("<2d", 1.5, 2.5)
    # spec hex spelled out: independent of struct.pack's own correctness
    assert bytes(got).hex() == "0101000000000000000000f83f0000000000000440"


def test_linestring_polygon_wkb_byte_exact(spark):
    df = spark.createDataFrame(
        [
            (
                [{"lon": 0.0, "lat": 0.0}, {"lon": 1.0, "lat": 2.0}],
                [
                    [
                        {"lon": 0.0, "lat": 0.0},
                        {"lon": 4.0, "lat": 0.0},
                        {"lon": 4.0, "lat": 4.0},
                        {"lon": 0.0, "lat": 0.0},
                    ]
                ],
            )
        ],
        "coords array<struct<lon:double,lat:double>>, "
        "rings array<array<struct<lon:double,lat:double>>>",
    )
    row = df.select(
        linestring_wkb(col("coords")).alias("ls"), polygon_wkb(col("rings")).alias("pg")
    ).first()
    assert bytes(row["ls"]) == _le(2) + struct.pack("<I", 2) + struct.pack(
        "<4d", 0.0, 0.0, 1.0, 2.0
    )
    assert bytes(row["pg"]) == _le(3) + struct.pack("<I", 1) + struct.pack(
        "<I", 4
    ) + struct.pack("<8d", 0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 0.0)


def test_wkt_to_wkb_all_types_roundtrip(spark):
    wkts = [
        ("POINT (12.5000000 -3.2500000)", 1, 1, 12.5, -3.25),
        ("LINESTRING (0.0000000 0.0000000, 1.0000000 2.0000000, 3.0000000 4.0000000)", 2, 3, 0.0, 0.0),
        ("POLYGON ((0.5 0.5, 4.0 0.0, 4.0 4.0, 0.5 0.5), (1.0 1.0, 2.0 1.0, 1.0 2.0, 1.0 1.0))", 3, 8, 0.5, 0.5),
        ("MULTILINESTRING ((7.0 8.0, 9.0 10.0), (1.0 1.0, 2.0 2.0, 3.0 3.0))", 5, 5, 7.0, 8.0),
        ("MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), ((5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 5.0)))", 6, 8, 0.0, 0.0),
        (None, None, None, None, None),
    ]
    df = spark.createDataFrame([(w,) for w, *_ in wkts], "wkt string")
    out = df.select(
        "wkt", wkb_info(wkt_to_wkb(col("wkt"))).alias("i")
    ).select("wkt", "i.gtype", "i.n_points", "i.x1", "i.y1")
    got = {r["wkt"]: (r["gtype"], r["n_points"], r["x1"], r["y1"]) for r in out.collect()}
    for wkt, gtype, n, x1, y1 in wkts:
        assert got[wkt] == (gtype, n, x1, y1)


def test_engine_query_wkb(spark):
    from osmdatapy_spark.engine import OSM
    from osmdatapy_spark.query import Query

    elements = spark.createDataFrame(
        [(1, 0, {"amenity": "cafe"}), (7, 1, {"highway": "path"})],
        "osmid long, osmtype tinyint, tags map<string,string>",
    )
    nodes = spark.createDataFrame(
        [(1, 10.5, 20.25), (2, 11.0, 21.0), (3, 12.0, 22.0)],
        "osmid long, lon double, lat double",
    )
    refs = spark.createDataFrame(
        [(7, 1, 2), (7, 2, 3)], "way_id long, pos int, node_id long"
    )
    osm = OSM(elements, nodes, way_refs=refs)
    out = osm.query(Query(nodes=True, ways=True, geometry=True), wkb=True)
    rows = {r["osmid"]: r for r in out.collect()}
    # WKT and WKB agree structurally
    info = {
        r["osmid"]: r
        for r in osm.query(Query(nodes=True, ways=True, geometry=True), wkb=True)
        .select("osmid", wkb_info(col("geometry_wkb")).alias("i"))
        .select("osmid", "i.*")
        .collect()
    }
    assert rows[1]["geometry"].startswith("POINT")
    assert (info[1]["gtype"], info[1]["n_points"], info[1]["x1"], info[1]["y1"]) == (1, 1, 10.5, 20.25)
    assert rows[7]["geometry"].startswith("LINESTRING")
    assert (info[7]["gtype"], info[7]["n_points"], info[7]["x1"]) == (2, 2, 11.0)
    # CRS convention travels as column metadata
    meta = {f.name: f.metadata for f in out.schema.fields}
    assert meta["geometry"]["crs"] == "EPSG:4326"
    assert meta["geometry_wkb"] == CRS_METADATA


def test_attach_wkb_nulls_pass_through(spark):
    df = spark.createDataFrame([("POINT (1.0 2.0)",), (None,)], "geometry string")
    got = attach_wkb(df).collect()
    assert sum(r["geometry_wkb"] is None for r in got) == 1
