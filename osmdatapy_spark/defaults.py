"""Default query vocabularies and area-rule tables.

Re-derived from the reference's rule tables (reference
``osmdatapy/defaults.py:5-62`` — themselves sourced from the public
Overpass polygon-features table,
https://wiki.openstreetmap.org/wiki/Overpass_turbo/Polygon_Features)
and default queries (``defaults.py:67-206``).  Values are the documented
Overpass semantics, not the reference's buggy ``_is_area`` guards
(SURVEY.md §2.12).
"""

from __future__ import annotations

# way (key, value) pairs that force NOT-area even when the way is closed
NOT_AREA: dict[str, list[str]] = {
    "area:highway": ["no"],
    "aeroway": ["no", "taxiway"],
    "amenity": ["no"],
    "boundary": ["no"],
    "building:part": ["no"],
    "building": ["no"],
    "craft": ["no"],
    "golf": ["no"],
    "historic": ["no"],
    "indoor": ["no"],
    "landuse": ["no"],
    "leisure": ["no"],
    "man_made": ["no", "cutline", "embankment", "pipeline"],
    "natural": ["no", "coastline", "cliff", "ridge", "arete", "tree_row"],
    "office": ["no"],
    "place": ["no"],
    "public_transport": ["no"],
    "ruins": ["no"],
    "shops": ["no"],
    "tourism": ["no"],
}

# (key, value) pairs that force area for keys that are normally linear
IS_AREA: dict[str, list[str]] = {
    "barrier": ["city_wall", "ditch", "hedge", "retaining_wall", "wall", "spikes"],
    "highway": ["services", "rest_area", "escape", "elevator"],
    "power": ["plant", "substation", "generator", "transformer"],
    "railway": ["station", "turntable", "roundhouse", "platform"],
    "waterway": ["riverbank", "dock", "boatyard", "dam"],
}

# keys whose mere presence (any value) marks a closed way as an area
IS_AREA_KEY_ANY_VALUE: list[str] = [
    "area",
    "area:highway",
    "aeroway",
    "amenity",
    "boundary",
    "building",
    "building:part",
    "craft",
    "golf",
    "historic",
    "indoor",
    "landuse",
    "leisure",
    "man_made",
    "natural",
    "office",
    "place",
    "public_transport",
    "ruins",
    "shop",
    "tourism",
]

# relation `type=` values mapping to linestring / area geometries
RELATION_LINESTRING: list[str] = ["route"]
RELATION_AREA: list[str] = ["multipolygon", "boundary"]

# Default composable queries (reference defaults.py:67-206). Dicts of Query
# constructor kwargs; merged into a Query via Query(defaults="highways").
DEFAULT_QUERIES: dict[str, dict] = {
    "highways": {
        "ways": True,
        "must_tags": ["highway"],
        "keep_first": False,
        "exclude": {
            "highway": [
                "corridor",
                "proposed",
                "construction",
                "elevator",
                "abandoned",
                "platform",
                "raceway",
            ],
            "area": ["yes"],
        },
        "keep": None,
        "tags": ["highway", "name", "oneway", "maxspeed", "lanes", "surface"],
    },
    "buildings": {
        "ways": True,
        "relations": True,
        "must_tags": ["building"],
        "keep_first": False,
        "exclude": {"building": ["no"]},
        "keep": None,
        "tags": ["building", "name", "height", "building:levels", "addr:street", "addr:housenumber"],
    },
    "pois": {
        "nodes": True,
        "ways": True,
        "relations": True,
        "keep_first": True,
        "keep": {"amenity": [], "shop": [], "tourism": [], "leisure": []},
        "tags": ["amenity", "shop", "tourism", "leisure", "name"],
    },
}
