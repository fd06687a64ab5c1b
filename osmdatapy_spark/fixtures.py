"""Deterministic OSM-shaped fixture tables (FIXTURES.md §B).

Every corner case the star-schema derivations cannot express is staged
here explicitly: tag-precedence collisions, each Overpass area-rule
branch, degenerate/closed/3-point ways, shared topology nodes, and the
full catalog of relation shapes (reversed-way multipolygon, holed
polygon, dropped-inner complex case, unclosed ring, route, unsupported
member kinds, dangling member refs).  Used by tests/test_fixtures.py to
pin golden outputs of the engine pipelines (FIXTURES.md §B5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- B2 nodes: jittered grid ------------------------------------------------


def _node_coords(osmid: int) -> tuple[float, float]:
    lon = -180.0 + (osmid % 40) * 9.0 + 0.25
    lat = -85.0 + ((osmid // 40) % 17) * 10.0 + 0.5
    return lon, lat


# --- B3 way_refs ------------------------------------------------------------

WAY_REFS: dict[int, list[int]] = {
    1: [1, 2, 3, 4],  # open way
    2: [10, 11, 12, 13, 10],  # closed >=4 pts: area candidate
    3: [30, 31, 30],  # closed 3-pt: forced linestring (primitives.py:273-274)
    4: [40],  # degenerate 1-pt: dropped in geometry mode (primitives.py:76-78)
    5: [50, 51, 52],  # shares node 52 with way 6 (topology split)
    6: [52, 53],
    # r1 simple multipolygon ring 100-101-102-103-100; way 8 stored reversed
    7: [100, 101, 102],
    8: [100, 103, 102],  # chains only via direction flip
    # r2 outer + inner
    9: [110, 111, 112, 113, 110],
    10: [120, 121, 122, 120],
    # r3 complex: two outers, two inners (inners dropped, _frame.py:234-244)
    11: [130, 131, 132, 133, 130],
    12: [140, 141, 142, 143, 140],
    13: [150, 151, 152, 150],
    14: [160, 161, 162, 160],
    # r4 unclosed ring: single open way 170-171-172 (closure appends 170)
    15: [170, 171, 172],
    # r8 complex multipolygon with TRUE nesting: two outer squares, each
    # geometrically containing one inner square (grid rows 5-8, cols 0-8;
    # the reference drops both inners here — _frame.py:234-244 — the
    # engine's containment-based nesting keeps them as holes)
    16: [200, 203, 323, 320, 200],  # outer A: cols 0-3 × rows 5-8
    17: [205, 208, 328, 325, 205],  # outer B: cols 5-8 × rows 5-8
    18: [241, 242, 282, 281, 241],  # inner A: inside outer A
    19: [246, 247, 287, 286, 246],  # inner B: inside outer B
}

# --- B1 element tags --------------------------------------------------------

WAY_TAGS: dict[int, dict[str, str]] = {
    1: {"highway": "primary", "name": "open way"},
    2: {"building": "yes"},
    3: {"building": "yes"},  # tags say area, geometry says 3 points: linestring
    4: {"highway": "service"},
    5: {"highway": "residential"},
    6: {"highway": "residential", "access": "private"},  # keep+exclude collision
    7: {}, 8: {}, 9: {}, 10: {}, 11: {}, 12: {}, 13: {}, 14: {}, 15: {},
    16: {}, 17: {}, 18: {}, 19: {},
}

NODE_TAGS: dict[int, dict[str, str]] = {
    1: {"amenity": "cafe"},
    2: {"amenity": "cafe", "access": "private"},  # keep+exclude collision
    3: {"shop": "bakery", "name": "n3"},
    4: {},  # no tags: must_tags miss
    10: {"area": "no", "leisure": "park"},  # area=no overrides any-key rule
    11: {"area": "yes"},
    12: {"man_made": "pipeline"},  # NOT_AREA pair
    13: {"highway": "services"},  # IS_AREA pair on a normally-linear key
}

REL_TAGS: dict[int, dict[str, str]] = {
    1: {"type": "multipolygon", "landuse": "forest"},
    2: {"type": "multipolygon", "natural": "water"},
    3: {"type": "multipolygon"},
    4: {"type": "multipolygon"},
    5: {"type": "route", "route": "bus"},
    6: {"type": "multipolygon"},  # node member ignored; relation member
    # FLATTENS to its ways (relation-of-relations geometry, round 7)
    7: {"type": "multipolygon"},  # dangling member way 999
    8: {"type": "multipolygon", "natural": "water"},  # nested 2-outer/2-inner
}

# --- B4 rel_members: (rel_id, pos, member_id, member_type, role) ------------

REL_MEMBERS: list[tuple[int, int, int, int, str]] = [
    (1, 0, 7, 1, "outer"), (1, 1, 8, 1, "outer"),
    (2, 0, 9, 1, "outer"), (2, 1, 10, 1, "inner"),
    (3, 0, 11, 1, "outer"), (3, 1, 12, 1, "outer"),
    (3, 2, 13, 1, "inner"), (3, 3, 14, 1, "inner"),
    (4, 0, 15, 1, "outer"),
    (5, 0, 1, 1, ""), (5, 1, 5, 1, ""),
    (6, 0, 1, 0, ""), (6, 1, 1, 2, ""),
    (7, 0, 999, 1, "outer"),
    # r8: member order outer,outer,inner,inner — positional G9 attachment
    # would hang inner A on outer B; containment nesting assigns correctly
    (8, 0, 16, 1, "outer"), (8, 1, 17, 1, "outer"),
    (8, 2, 18, 1, "inner"), (8, 3, 19, 1, "inner"),
]


def fixture_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """Materialize B1-B4 as DataFrames (write to parquet for a bronze tier)."""
    node_ids = sorted(
        {n for refs in WAY_REFS.values() for n in refs} | set(NODE_TAGS) | {1, 2, 3, 4}
    )
    nodes = spark.createDataFrame(
        [(i, *_node_coords(i)) for i in node_ids], "osmid long, lon double, lat double"
    )
    elements = spark.createDataFrame(
        [(i, 0, NODE_TAGS.get(i, {})) for i in node_ids]
        + [(w, 1, WAY_TAGS.get(w, {})) for w in WAY_REFS]
        + [(r, 2, REL_TAGS[r]) for r in REL_TAGS],
        "osmid long, osmtype int, tags map<string,string>",
    )
    way_refs = spark.createDataFrame(
        [(w, p, n) for w, refs in WAY_REFS.items() for p, n in enumerate(refs)],
        "way_id long, pos int, node_id long",
    )
    rel_members = spark.createDataFrame(
        REL_MEMBERS, "rel_id long, pos int, member_id long, member_type int, role string"
    )
    return {
        "elements": elements,
        "nodes": nodes,
        "way_refs": way_refs,
        "rel_members": rel_members,
    }
