"""``OSM`` facade — the engine entry point (reference ``osmdatapy/osmdata.py``).

The reference's ``OSM(filepath)`` builds three driver-resident caches
(block offsets, string dictionary, node coords — ``osmdata.py:29-39``);
none of those exist here because Spark's scan machinery replaces them
(SURVEY.md §1.5): elements live in a DataFrame with a ``tags`` map,
node coordinates are just the ``nodes`` table, and "querying" is a
filter/projection pipeline Catalyst optimizes.

Construction paths:
- ``OSM.from_tables(elements, nodes, ...)`` — any DataFrames in the §1.5
  data model (bronze parquet/Delta tables at scale);
- ``OSM(path)`` with a ``.pbf`` file — reads through the custom PBF data
  source (``osmdatapy_spark.sources.pbf``).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from osmdatapy_spark.operators.rings import reorder_rings, ring_node_sequence
from osmdatapy_spark.operators.topology import topology_segments, way_endpoints
from osmdatapy_spark.operators.geometry import (
    linestring_wkt,
    point_wkt,
    way_geom_type,
    GEOM_LINESTRING,
    GEOM_POINT,
)
from osmdatapy_spark.query import OSMTYPE_RELATION, OSMTYPE_WAY, Query


class OSM:
    """Query driver over the element data model (reference ``osmdata.py:16-39``)."""

    def __init__(
        self,
        elements: DataFrame,
        nodes: DataFrame,
        way_refs: Optional[DataFrame] = None,
        rel_members: Optional[DataFrame] = None,
    ):
        self.elements = elements
        self.nodes = nodes
        self.way_refs = way_refs
        self.rel_members = rel_members

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_tables(
        cls,
        elements: DataFrame,
        nodes: DataFrame,
        way_refs: Optional[DataFrame] = None,
        rel_members: Optional[DataFrame] = None,
    ) -> "OSM":
        return cls(elements, nodes, way_refs, rel_members)

    @classmethod
    def from_pbf(cls, spark: SparkSession, path: str) -> "OSM":
        """Open a ``.osm.pbf`` through the custom data source
        (reference entry point ``OSM(filepath)``, osmdata.py:29-39)."""
        from osmdatapy_spark.sources.pbf import read_pbf_tables

        tables = read_pbf_tables(spark, path)
        return cls(
            tables["elements"], tables["nodes"], tables["way_refs"], tables["rel_members"]
        )

    # -- introspection (reference osmdata.py:41-84) ------------------------

    def info(self) -> DataFrame:
        """Engine statistics (reference ``OSM.info()``, osmdata.py:41-73):
        element counts per kind + tag cardinality, as a DataFrame."""
        return self.elements.groupBy("osmtype").agg(
            F.count("*").alias("n_elements"),
            F.sum(F.size("tags")).alias("n_tag_pairs"),
            F.countDistinct("osmid").alias("n_distinct_ids"),
        )

    def geometry(self) -> DataFrame:
        """The full coordinate table (reference ``osm.geometry()``,
        osmdata.py:75-79)."""
        return self.nodes.select("osmid", "lon", "lat")

    def coords(self, ids: DataFrame | Iterable[int]) -> DataFrame:
        """Point lookup (reference ``osm.coords``, osmdata.py:81-84 —
        searchsorted on a driver array).  Here: a join, broadcast when the
        probe side is a literal list."""
        if isinstance(ids, DataFrame):
            probe = ids
        else:
            spark = self.nodes.sparkSession
            probe = spark.createDataFrame([(int(i),) for i in ids], "osmid long")
        return broadcast(probe).join(self.nodes, "osmid", "left").select("osmid", "lon", "lat")

    # -- the main query path (reference osmdata.py:183-206) ----------------

    def query(self, q: Query) -> DataFrame:
        """Execute a composable Query → element DataFrame.

        Pipeline parity with reference ``osm.query``/``to_dataframe``
        (osmdata.py:183-206, _frame.py:8-57): filter+project elements; for
        ways attach refs; for relations attach members; geometry mode adds
        WKT for points and linestrings (area assembly via
        ``relation_areas``)."""
        out = q.apply(self.elements)

        if q.geometry:
            out = self._with_geometry(out, q)
        if q.topology:
            segs = self.topology(q)
            out = out.drop("refs").join(segs, out.osmid == segs.way_id, "inner").drop("way_id")
        return out

    def _with_geometry(self, out: DataFrame, q: Query) -> DataFrame:
        nodes = self.nodes
        pts = nodes.select(col("osmid").alias("_nid"), "lon", "lat")
        # node points (reference J6/G1, _frame.py:44-52)
        out = out.join(pts, out.osmid == pts["_nid"], "left").drop("_nid")
        point = point_wkt(col("lon"), col("lat"))
        out = out.withColumn(
            "geom_type",
            F.when(col("osmtype") == 0, GEOM_POINT).when(
                (col("osmtype") == OSMTYPE_WAY) & col("refs").isNotNull(),
                way_geom_type(col("refs"), col("tags")),
            ),
        )
        if "refs" in out.columns:
            coords = self._refs_coords(out.filter(col("osmtype") == OSMTYPE_WAY))
            out = out.join(coords, "osmid", "left")
            line = linestring_wkt(col("coords"))
            out = out.withColumn(
                "geometry",
                F.when(col("osmtype") == 0, point).when(
                    (col("osmtype") == OSMTYPE_WAY) & (col("geom_type") >= GEOM_LINESTRING), line
                ),
            ).drop("coords")
        else:
            out = out.withColumn("geometry", F.when(col("osmtype") == 0, point))
        return out.drop("lon", "lat")

    def _refs_coords(self, ways: DataFrame) -> DataFrame:
        """refs ARRAY<LONG> → ordered ARRAY<STRUCT<lon,lat>> via posexplode +
        coordinate join + re-collect (reference G2's coords gather,
        _frame.py:103-105). One shuffle by node id, one by way id."""
        exploded = ways.select("osmid", F.posexplode("refs").alias("pos", "node_id"))
        joined = exploded.join(
            self.nodes.select(col("osmid").alias("node_id"), "lon", "lat"), "node_id", "left"
        )
        return joined.groupBy("osmid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))),
                lambda s: F.struct(s["lon"].alias("lon"), s["lat"].alias("lat")),
            ).alias("coords")
        )

    # -- composite pipelines ----------------------------------------------

    def topology(self, q: Optional[Query] = None) -> DataFrame:
        """Way topology segmentation (reference G10; see operators.topology)."""
        refs = self.way_refs
        if q is not None:
            kept = q.apply(self.elements).filter(col("osmtype") == OSMTYPE_WAY).select("osmid")
            refs = refs.join(kept, refs.way_id == kept.osmid, "left_semi")
        return topology_segments(refs)

    def relation_rings(self) -> DataFrame:
        """Multipolygon ring assembly (reference G6-G9; operators.rings)."""
        ways = way_endpoints(self.way_refs)
        members = (
            self.rel_members.filter(col("member_type") == OSMTYPE_WAY)
            .select("rel_id", col("member_id").alias("way_id"), col("pos").alias("member_pos"))
            .join(ways, "way_id")
        )
        ordered = reorder_rings(members)
        return ring_node_sequence(ordered, self.way_refs)
