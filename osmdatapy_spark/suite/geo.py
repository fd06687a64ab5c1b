"""Geometric-measure query suite (operators/measures.py) over the derived
OSM-shaped tables of suite/osm.py: polyline length, ring area, centroid,
and the grid-cell nearest-neighbor spatial join.

The reference computes measures downstream in geopandas after
materializing shapely objects (reference _frame.py:54-56 returns a
GeoDataFrame); here they are Column algebra directly over the gathered
``array<struct<lon,lat>>`` — same coordinate-gather shuffle as the WKT
constructors, zero extra passes.

Determinism: see operators/measures.py — exactly-rounded ops for
planar/area/centroid (no rounding guard), round-4 guard on haversine
(sin/cos are 1-ulp libraries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from osmdatapy_spark.operators.measures import (
    centroid,
    haversine_length_km,
    nearest_in_grid,
    planar_length_deg,
    shoelace_area_deg2,
)
from osmdatapy_spark.suite.osm import NODES_CTE, WAYS_CTE, derived_nodes, derived_way_refs
from osmdatapy_spark.suite.registry import register

# shared coordinate gather: way_id -> array<struct<lon,lat>> in pos order
COORDS_CTE = f"""
{WAYS_CTE.strip()}, {NODES_CTE.strip()},
coords AS (
  SELECT w.way_id,
         list(struct_pack(lon := n.lon, lat := n.lat) ORDER BY w.pos) AS c
  FROM ways w JOIN nodes n ON w.node_id = n.osmid
  GROUP BY w.way_id
)
"""


def _way_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    ways = derived_way_refs(spark, sf_dir)
    nodes = derived_nodes(spark, sf_dir).withColumnRenamed("osmid", "node_id")
    joined = ways.join(broadcast(nodes), "node_id")
    return joined.groupBy("way_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))),
            lambda s: F.struct(s["lon"].alias("lon"), s["lat"].alias("lat")),
        ).alias("c")
    )


@register(
    "osm_way_length",
    oracle=f"""
    WITH {COORDS_CTE}
    SELECT way_id,
           coalesce(list_sum(list_transform(generate_series(1, len(c) - 1),
             i -> sqrt((c[i+1].lon - c[i].lon) * (c[i+1].lon - c[i].lon)
                     + (c[i+1].lat - c[i].lat) * (c[i+1].lat - c[i].lat)))), 0.0)
             AS len_deg,
           round(coalesce(list_sum(list_transform(generate_series(1, len(c) - 1),
             i -> 2 * 6371.0 * asin(sqrt(
                    sin(radians(c[i+1].lat - c[i].lat) / 2) * sin(radians(c[i+1].lat - c[i].lat) / 2)
                  + cos(radians(c[i].lat)) * cos(radians(c[i+1].lat))
                    * sin(radians(c[i+1].lon - c[i].lon) / 2) * sin(radians(c[i+1].lon - c[i].lon) / 2)
             )))), 0.0), 4) AS len_km
    FROM coords
    """,
    bench=True,
    doc="Per-way polyline length: planar degree-space (exactly-rounded ops, "
    "bit-identical cross-engine) next to great-circle haversine km "
    "(round-4 guard). Ordered left-fold over the gathered coordinate "
    "array — pipelines inside the same shuffle as WKT assembly; no UDF.",
)
def osm_way_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _way_coords(spark, sf_dir).select(
        "way_id",
        planar_length_deg(col("c")).alias("len_deg"),
        haversine_length_km(col("c")).alias("len_km"),
    )


@register(
    "osm_way_area",
    oracle=f"""
    WITH {COORDS_CTE}
    SELECT way_id,
           abs(coalesce(list_sum(list_transform(generate_series(1, len(list_append(c, c[1])) - 1),
             i -> list_append(c, c[1])[i].lon * list_append(c, c[1])[i+1].lat
                - list_append(c, c[1])[i+1].lon * list_append(c, c[1])[i].lat)), 0.0)) / 2
             AS area_deg2
    FROM coords
    """,
    doc="Shoelace ring area (squared degrees) with implicit closure — the "
    "measure the reference gets from geopandas .area after shapely "
    "materialization; here a pure ordered fold over the coordinate array "
    "(exactly-rounded ops, no rounding guard needed). Degenerate <3-vertex "
    "ways yield 0.",
)
def osm_way_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _way_coords(spark, sf_dir).select(
        "way_id", shoelace_area_deg2(col("c")).alias("area_deg2")
    )


@register(
    "osm_way_centroid",
    oracle=f"""
    WITH {COORDS_CTE}
    SELECT way_id,
           list_sum(list_transform(c, x -> x.lon)) / len(c) AS c_lon,
           list_sum(list_transform(c, x -> x.lat)) / len(c) AS c_lat
    FROM coords
    """,
    doc="Vertex centroid per way (mean of the coordinate sequence, "
    "duplicates counted). The synthetic grid coordinates are exactly "
    "representable (x.5 / x.25), so the sums are exact in any order and "
    "the division is exactly rounded — deterministic with no guard.",
)
def osm_way_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = _way_coords(spark, sf_dir)
    cx, cy = centroid(col("c"))
    return wc.select("way_id", cx.alias("c_lon"), cy.alias("c_lat"))


@register(
    "osm_nearest_node",
    oracle=f"""
    WITH {NODES_CTE.strip()},
    pois AS (
      SELECT osmid AS poi_id, lon, lat,
             CAST(floor(lon / 30.0) AS BIGINT) AS cx, CAST(floor(lat / 30.0) AS BIGINT) AS cy
      FROM nodes WHERE osmid % 97 = 0
    ),
    cands AS (
      SELECT osmid AS cand_id, lon, lat,
             CAST(floor(lon / 30.0) AS BIGINT) AS cx, CAST(floor(lat / 30.0) AS BIGINT) AS cy
      FROM nodes WHERE osmid % 53 = 0
    ),
    scored AS (
      SELECT p.poi_id, c.cand_id,
             (p.lon - c.lon) * (p.lon - c.lon) + (p.lat - c.lat) * (p.lat - c.lat) AS d2
      FROM pois p JOIN cands c
        ON c.cx BETWEEN p.cx - 1 AND p.cx + 1
       AND c.cy BETWEEN p.cy - 1 AND p.cy + 1
    ),
    ranked AS (
      SELECT poi_id, cand_id, d2,
             row_number() OVER (PARTITION BY poi_id ORDER BY d2, cand_id) AS rn
      FROM scored
    )
    SELECT poi_id, cand_id AS nearest_id, d2 AS dist_sq FROM ranked WHERE rn = 1
    """,
    doc="Grid-cell nearest-neighbor spatial join: POI nodes (osmid%97=0) "
    "to their nearest candidate node (osmid%53=0) within a 3×3 "
    "neighborhood of 30° cells. Probes explode ×9 and equi-join on the "
    "cell key — shuffle by cell, never probe × corpus; winner via "
    "min(struct(d2,id)), squared planar distance (exactly-rounded). "
    "POIs with an empty neighborhood drop (inner semantics); a probe "
    "that is also a candidate matches itself at d2=0.",
)
def osm_nearest_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = derived_nodes(spark, sf_dir)
    pois = nodes.filter(col("osmid") % 97 == 0).select(col("osmid").alias("poi_id"), "lon", "lat")
    cands = nodes.filter(col("osmid") % 53 == 0).select(
        col("osmid").alias("nearest_id"), "lon", "lat"
    )
    return nearest_in_grid(pois, cands, 30.0, probe_id="poi_id", cand_id="nearest_id")
