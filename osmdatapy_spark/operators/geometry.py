"""Geometry scalar operators (reference §2.7 G1-G5, G7) as pure Column algebra.

The reference builds shapely objects (``osmdatapy/_geometry.py``); here
geometries are WKT/WKB-ready strings built JVM-side — no Python UDF in the
hot path.  Coordinates are DOUBLE (deliberate divergence from the
reference's float32, which loses ~cm precision at |lon|≈180 —
``README.md:13``, SURVEY.md §4.2) and are printf-formatted to a fixed
number of decimals so text output is engine-portable.

Scale: every function here is a narrow projection over already-joined
coordinate arrays — no shuffle of its own.  The expensive part (refs →
coords) is the join in ``osmdatapy_spark.operators.topology.attach_coords``,
which at 100 TB runs as a sort-merge join on osmid-bucketed nodes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from osmdatapy_spark.defaults import IS_AREA, IS_AREA_KEY_ANY_VALUE, NOT_AREA

GEOM_NONE = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_AREA = 3


def point_wkt(lon: Column, lat: Column, decimals: int = 7) -> Column:
    """POINT WKT from lon/lat (reference G1, _geometry.py:8-22)."""
    fmt = f"%.{decimals}f"
    return F.format_string(f"POINT ({fmt} {fmt})", lon, lat)


def linestring_wkt(coords: Column, decimals: int = 7) -> Column:
    """LINESTRING WKT from an ordered ARRAY<STRUCT<lon,lat>> (reference G2,
    _geometry.py:25-41).  Pure `transform` + `array_join` — stays in codegen."""
    fmt = f"%.{decimals}f"
    pts = F.transform(coords, lambda c: F.format_string(f"{fmt} {fmt}", c["lon"], c["lat"]))
    return F.concat(lit("LINESTRING ("), F.array_join(pts, ", "), lit(")"))


def polygon_wkt(rings: Column, decimals: int = 7) -> Column:
    """POLYGON WKT from ARRAY<ARRAY<STRUCT<lon,lat>>> (outer ring first;
    reference G3, _geometry.py:44-65)."""
    fmt = f"%.{decimals}f"
    ring_txt = F.transform(
        rings,
        lambda ring: F.concat(
            lit("("),
            F.array_join(
                F.transform(ring, lambda c: F.format_string(f"{fmt} {fmt}", c["lon"], c["lat"])), ", "
            ),
            lit(")"),
        ),
    )
    return F.concat(lit("POLYGON ("), F.array_join(ring_txt, ", "), lit(")"))


def _pair_match(tags_col: Column, rules: dict[str, list[str]]) -> Column:
    """True iff tags contains any (key,value) pair of the rule table.

    The reference packs pairs into int64s for set membership
    (``primitives.py:240``); with a map column this is direct value tests —
    Catalyst folds the rule table into the plan as literals."""
    parts = [tags_col.getItem(k).isin(vs) for k, vs in rules.items()]
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


def area_rule_predicate(tags_col: Column = None) -> Column:
    """Overpass polygon-features decision for a *closed* way's tags
    (reference G4 ``_is_area``, primitives.py:234-253 — implemented with the
    documented semantics, not the reference's inverted guards, SURVEY §2.12):

    1. ``area=no``            → not an area
    2. (k,v) ∈ IS_AREA        → area
    3. (k,v) ∈ NOT_AREA       → not an area
    4. any key ∈ IS_AREA_KEY_ANY_VALUE present → area
    5. otherwise              → not an area
    """
    t = tags_col if tags_col is not None else col("tags")
    any_area_key = F.exists(F.map_keys(t), lambda k: k.isin(list(IS_AREA_KEY_ANY_VALUE)))
    return (
        F.when(t.getItem("area") == "no", lit(False))
        .when(_pair_match(t, IS_AREA), lit(True))
        .when(_pair_match(t, NOT_AREA), lit(False))
        .otherwise(any_area_key)
    )


# way_geom_type's Column over the default (refs, tags) names, memoized per
# py4j gateway: building the Overpass rule predicate costs ~1000 driver
# py4j round trips (~0.65 s — measured as 40% of pbf_query's wall time at
# sf0.1), and the expression tree is immutable + plan-independent, so one
# build per JVM serves every query.  Keyed by gateway identity so a
# restarted JVM never sees a stale JavaObject.  This caches an EXPRESSION,
# not data — every run still computes from its inputs.
_CANONICAL_WAY_GEOM_TYPE: dict[int, Column] = {}


def way_geom_type(refs: Column = None, tags_col: Column = None) -> Column:
    """Way line-vs-area heuristic (reference ``_way_geotype``,
    primitives.py:260-285): 0 if degenerate, 2 if open/short, 3 if closed
    with ≥4 points and the area rules fire.

    Pure expression over the refs array — `element_at(refs,1) ==
    element_at(refs,-1)` replaces the reference's first/last compare."""
    canonical = refs is None and tags_col is None
    key = None
    if canonical:
        from pyspark import SparkContext

        gw = getattr(SparkContext, "_gateway", None)
        key = id(gw) if gw is not None else None
        cached = _CANONICAL_WAY_GEOM_TYPE.get(key) if key is not None else None
        if cached is not None:
            return cached
    r = refs if refs is not None else col("refs")
    closed = F.element_at(r, 1) == F.element_at(r, -1)
    n = F.size(r)
    out = (
        F.when(n <= 1, lit(GEOM_NONE))
        .when(n < 4, lit(GEOM_LINESTRING))
        .when(~closed, lit(GEOM_LINESTRING))
        .when(area_rule_predicate(tags_col), lit(GEOM_AREA))
        .otherwise(lit(GEOM_LINESTRING))
    )
    if canonical and key is not None:
        _CANONICAL_WAY_GEOM_TYPE[key] = out
    return out


def rel_geom_type(tags_col: Column = None, member_types: Column = None) -> Column:
    """Relation geometry dispatch (reference ``_rel_geotype``,
    primitives.py:288-305): node/relation members ⇒ unsupported (0);
    ``type=route`` ⇒ linestring; ``type`` ∈ {multipolygon, boundary} ⇒ area."""
    from osmdatapy_spark.defaults import RELATION_AREA, RELATION_LINESTRING

    t = tags_col if tags_col is not None else col("tags")
    mt = member_types if member_types is not None else col("members.type")
    unsupported = F.array_contains(mt, GEOM_NONE) | F.array_contains(mt, 2)
    tval = t.getItem("type")
    return (
        F.when(unsupported, lit(GEOM_NONE))
        .when(tval.isin(RELATION_LINESTRING), lit(GEOM_LINESTRING))
        .when(tval.isin(RELATION_AREA), lit(GEOM_AREA))
        .otherwise(lit(GEOM_NONE))
    )


def close_rings(refs: Column = None) -> Column:
    """Ring closing (reference G7 ``_close_rings``, _frame.py:217-232):
    append the first node when first != last — array op, no shuffle."""
    r = refs if refs is not None else col("refs")
    return F.when(
        F.element_at(r, 1) != F.element_at(r, -1),
        F.concat(r, F.array(F.element_at(r, 1))),
    ).otherwise(r)
