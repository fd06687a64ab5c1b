"""Geometric measures over gathered coordinate sequences: polyline length
(planar + haversine), shoelace ring area, centroid, and a grid-cell
nearest-neighbor spatial join.

The reference delegates measures to geopandas after materializing shapely
geometries (reference _frame.py:54-56); Spark-first they are pure Column
algebra over the same ``array<struct<lon,lat>>`` the WKT constructors
(``operators/geometry.py``) consume — no geometry objects, no UDFs, and
they pipeline inside the coordinate-gather stage.

Cross-engine determinism: multiplication, addition, and sqrt are
exactly-rounded IEEE-754 ops, so segment/shoelace terms are bit-identical
in Spark and DuckDB; per-array sums run as ordered left folds
(``F.aggregate`` / ``list_sum`` over the list) on both sides.  Haversine
additionally uses sin/cos (1-ulp libraries, not exactly rounded) — its
output is rounded to 4 decimals, the same guard the cosine-similarity
oracles use.

The spatial join is the classic uniform-grid formulation: each probe
explodes to its 3×3 cell neighborhood, candidates join on the cell key,
the winner is a ``min(struct(dist, id))`` — shuffle is by cell, never
probe × corpus, and skewed cells are ordinary AQE skew territory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

EARTH_RADIUS_KM = 6371.0


def _fold_sum(arr: Column) -> Column:
    """Ordered left-fold sum of an array<double> — the order-deterministic
    summation both engines can reproduce (DuckDB: list_sum)."""
    return F.aggregate(arr, lit(0.0), lambda acc, x: acc + x)


def _segments(coords: Column) -> Column:
    """array of (a, b) consecutive coordinate pairs along the polyline."""
    n = F.size(coords) - 1
    return F.arrays_zip(F.slice(coords, 1, n).alias("a"), F.slice(coords, 2, n).alias("b"))


def planar_length_deg(coords: Column) -> Column:
    """Polyline length in degree units (planar): Σ sqrt(dx² + dy²).
    Every term is exactly-rounded arithmetic — bit-identical across
    engines with no rounding guard needed."""
    seg = F.transform(
        _segments(coords),
        lambda s: F.sqrt(
            (s["b"]["lon"] - s["a"]["lon"]) * (s["b"]["lon"] - s["a"]["lon"])
            + (s["b"]["lat"] - s["a"]["lat"]) * (s["b"]["lat"] - s["a"]["lat"])
        ),
    )
    return _fold_sum(seg)


def _hav_km(a: Column, b: Column) -> Column:
    """Great-circle distance of one segment (haversine), km."""
    dlat = F.radians(b["lat"] - a["lat"])
    dlon = F.radians(b["lon"] - a["lon"])
    h = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(a["lat"])) * F.cos(F.radians(b["lat"])) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def haversine_length_km(coords: Column, decimals: int = 4) -> Column:
    """Great-circle polyline length in km, rounded to ``decimals`` (sin/cos
    are 1-ulp, not exactly rounded — the round absorbs engine drift)."""
    return F.round(_fold_sum(F.transform(_segments(coords), lambda s: _hav_km(s["a"], s["b"]))), decimals)


def shoelace_area_deg2(coords: Column) -> Column:
    """Ring area in squared degrees by the shoelace formula with implicit
    closure (last→first edge added automatically): |Σ xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ|/2.
    Exactly-rounded ops only — no rounding guard."""
    closed = F.concat(coords, F.slice(coords, 1, 1))
    terms = F.transform(
        _segments(closed),
        lambda s: s["a"]["lon"] * s["b"]["lat"] - s["b"]["lon"] * s["a"]["lat"],
    )
    return F.abs(_fold_sum(terms)) / 2


def centroid(coords: Column) -> tuple[Column, Column]:
    """(lon, lat) vertex centroid — ordered-fold mean of the coordinate
    sequence (duplicate vertices count, matching the reference's
    GeoDataFrame .centroid on the vertex multiset only for simple
    geometries; documented as the vertex mean, not the area centroid)."""
    n = F.size(coords)
    cx = _fold_sum(F.transform(coords, lambda c: c["lon"])) / n
    cy = _fold_sum(F.transform(coords, lambda c: c["lat"])) / n
    return cx, cy


# ---------------------------------------------------------------------------
# Grid-cell nearest-neighbor join
# ---------------------------------------------------------------------------


def grid_cell(lon: Column, lat: Column, cell_deg: float) -> Column:
    """(cx, cy) integer grid cell of a point.  floor of an exactly-rounded
    division — deterministic across engines."""
    return F.struct(
        F.floor(lon / lit(cell_deg)).cast("long").alias("cx"),
        F.floor(lat / lit(cell_deg)).cast("long").alias("cy"),
    )


def nearest_in_grid(
    probes: DataFrame,
    candidates: DataFrame,
    cell_deg: float,
    probe_id: str = "probe_id",
    cand_id: str = "cand_id",
) -> DataFrame:
    """For each probe point, the nearest candidate point found in the
    probe's 3×3 grid-cell neighborhood (inner semantics: probes with an
    empty neighborhood drop out; widen ``cell_deg`` to bound the miss
    rate — the standard grid-ANN trade).

    Both inputs need (id, lon, lat).  Distance is squared planar degrees
    (exactly-rounded, engine-portable); ties break on candidate id via
    the struct ordering of ``min(struct(d2, id))``.

    Shape: probes explode ×9 (cell neighborhood), equi-join on the cell
    key against candidates keyed by their own cell, one partial-aggregated
    min per probe.  The join shuffles by cell — never probe × corpus; a
    hot cell (urban cluster) is ordinary AQE skew-join territory, and
    ``cell_deg`` is the knob that bounds per-cell candidate counts.
    """
    offsets = F.array(*[F.struct(lit(dx).alias("dx"), lit(dy).alias("dy")) for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    p = probes.select(
        col(probe_id),
        col("lon").alias("p_lon"),
        col("lat").alias("p_lat"),
        grid_cell(col("lon"), col("lat"), cell_deg).alias("pc"),
    ).select(
        probe_id,
        "p_lon",
        "p_lat",
        F.explode(
            F.transform(
                offsets,
                lambda o: F.struct(
                    (col("pc.cx") + o["dx"]).alias("cx"), (col("pc.cy") + o["dy"]).alias("cy")
                ),
            )
        ).alias("cell"),
    )
    c = candidates.select(
        col(cand_id),
        col("lon").alias("c_lon"),
        col("lat").alias("c_lat"),
        grid_cell(col("lon"), col("lat"), cell_deg).alias("cell"),
    )
    d2 = (col("p_lon") - col("c_lon")) * (col("p_lon") - col("c_lon")) + (
        col("p_lat") - col("c_lat")
    ) * (col("p_lat") - col("c_lat"))
    best = F.min(F.struct(d2.alias("d2"), col(cand_id).alias("id"))).alias("best")
    return (
        p.join(c, "cell")
        .groupBy(probe_id)
        .agg(best)
        .select(
            probe_id,
            col("best.id").alias(cand_id),
            col("best.d2").alias("dist_sq"),
        )
    )
