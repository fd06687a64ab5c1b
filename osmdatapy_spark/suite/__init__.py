"""Registered query suite — the driver-facing operator inventory.

Every operator claimed in SURVEY.md §2 has (at least) one entry here:
a PySpark implementation ``fn(spark, sf_dir) -> DataFrame`` and, where
ANSI-SQL-expressible, a DuckDB oracle string producing the identical
result (same column names, same values).  ``__spark_entry__.py`` exposes
this registry to the driver.
"""

from osmdatapy_spark.suite.registry import QUERY_REGISTRY, QueryDef, register

# Importing the modules populates the registry.
from osmdatapy_spark.suite import core  # noqa: F401,E402
from osmdatapy_spark.suite import osm  # noqa: F401,E402
from osmdatapy_spark.suite import llm  # noqa: F401,E402
from osmdatapy_spark.suite import ext  # noqa: F401,E402
from osmdatapy_spark.suite import curation  # noqa: F401,E402
from osmdatapy_spark.suite import geo  # noqa: F401,E402
from osmdatapy_spark.suite import analytics  # noqa: F401,E402

# Driver-facing ordering.  The driver's correctness gate samples the FIRST
# 50 entries of ``queries()`` in dict order, so raw registration order
# (all rel_* first) meant the externally recorded record never contained a
# geometry, dedup, or streaming result.  The interleave below guarantees
# any prefix sample spans all four families — a 10-slot cycle of
# 3 osm / 3 llm / 3 rel / 1 stream allocates 15/15/15/5 HEAD SLOTS in the
# first 50.  Queue membership controls SAMPLE ORDER only; the names
# filling a queue's slots may cross family prefixes — the actual first-50
# prefix mix is whatever the head lists hold; verify with
# ``list(ordered_registry())[:50]``, not this comment.  Within each queue
# the curated head goes first; the rest keep registration order.  The
# ordering is presentation-only: the registry itself (and every test
# keyed on it) is unchanged.
#
# The heads ROTATE each round (round-7 verdict ask #7): rounds 1-9
# recorded 188 distinct queries; after round 9 exactly 54 registered
# names had never appeared in a driver-recorded CORRECTNESS_r*.json.
# Round 10's head carries 46 of those plus this round's 4 additions
# (the TPC-H Q12/Q16/Q19 SQL faces and osm_pbf_cdc_roundtrip) — every
# name below is a first-time record; the 8 left over (5 llm + 3 osm
# variants whose siblings are already recorded) rotate in next round.
# The stream family has no unrecorded names left (all recorded r01-r09),
# so its 5 slots carry unrecorded osm graph/encoding queries; the rel
# queue likewise carries 11 unrecorded osm names after its 4.
_FAMILY_HEADS: dict[str, list[str]] = {
    "osm": [
        "osm_pbf_cdc_roundtrip", "osm_geojson_points", "osm_geojson_lines",
        "osm_geojson_polygons", "osm_apply_changes",
        "osm_element_history_scd2", "osm_default_query_buildings",
        "osm_default_query_pois", "osm_bbox_filter", "osm_bbox_clip",
        "osm_integrity_report", "osm_tag_key_stats", "osm_renumber",
        "osm_polygon_extract", "osm_maxspeed_parse",
    ],
    "llm": [
        "llm_feature_extract", "llm_repetition_score", "llm_corpus_summary",
        "llm_label_outliers", "llm_bpe_merge_candidates", "llm_dedup_audit",
        "llm_char_entropy", "llm_hard_negative_mine",
        "llm_dup_ngram_fraction", "llm_rouge_overlap",
        "llm_dup_span_coverage", "llm_training_order", "llm_domain_cap",
        "llm_ngram_novelty", "llm_dsir_weight",
    ],
    "stream": [
        "osm_node_degree_histogram", "osm_geohash_encode", "osm_kcore",
        "osm_triangle_count", "osm_network_components",
    ],
    "rel": [
        # the round-10 SQL-face batch (Q12/Q16/Q19) + the last
        # never-recorded rel name, then unrecorded osm analytics
        "rel_sql_tpch_q12", "rel_sql_tpch_q16", "rel_sql_tpch_q19",
        "rel_benford_digits", "osm_opening_hours_parse", "osm_way_centroid",
        "osm_bfs_hops", "osm_hex_binning", "osm_hex_density_smooth",
        "osm_way_compactness", "osm_bearing_rose", "osm_length_by_class",
        "osm_tile_pyramid", "osm_grid_clusters", "osm_settlement_clusters",
    ],
}
# 10-slot cycle → 15/15/15/5 head SLOTS per queue in the first 50 (the
# names inside may cross family prefixes — see the note above)
_CYCLE = ["osm", "llm", "rel", "osm", "llm", "rel", "osm", "llm", "rel", "stream"]


def ordered_registry() -> dict[str, QueryDef]:
    """QUERY_REGISTRY re-keyed in family-interleaved showcase order."""
    from collections import deque

    fams: dict[str, deque[str]] = {f: deque() for f in _FAMILY_HEADS}
    for fam, heads in _FAMILY_HEADS.items():
        for h in heads:
            if h not in QUERY_REGISTRY:
                raise KeyError(f"showcase head {h!r} not registered")
            fams[fam].append(h)
    head_set = {h for hs in _FAMILY_HEADS.values() for h in hs}
    for name in QUERY_REGISTRY:
        fam = name.split("_", 1)[0]
        if fam not in fams:
            fam = "rel"
        if name not in head_set:
            fams[fam].append(name)
    out: dict[str, QueryDef] = {}
    i = 0
    while any(fams.values()):
        fam = _CYCLE[i % len(_CYCLE)]
        i += 1
        if fams[fam]:
            name = fams[fam].popleft()
            out[name] = QUERY_REGISTRY[name]
        # an exhausted family's slots are skipped; the loop drains the rest
    assert len(out) == len(QUERY_REGISTRY)
    return out


__all__ = ["QUERY_REGISTRY", "QueryDef", "register", "ordered_registry"]
