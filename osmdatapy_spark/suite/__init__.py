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
# The heads ROTATE each round (round-7 verdict ask #7).  Round 11 closed
# the catch-up phase: every registered name holds an external green
# record (cumulative r01+).  From round 12 on the head's job is AGING
# OUT STALE EVIDENCE (round-11 verdict ask #1): lead with the round's
# new registrations, then fill the remaining slots with the registered
# names whose most recent green record is OLDEST — computed by unioning
# every CORRECTNESS_r*.json into a latest-green-round map.  After r12:
# 1 name at r06 (rel_funnel_stages, rolled from the r12 queue as
# promised), 11 at r07, 49 at r08 — so the r13 head is the 2 new
# registrations (llm_substring_dedup_hashed, llm_curate_decontaminate)
# + the r06 name + all 11 r07 names + the first 36 r08 names in
# lexicographic order (15 llm + 15 osm + rel_ab_test..rel_interval_
# overlap); the remaining 13 r08 names lead the r14 refresh.
# Queue membership controls SAMPLE ORDER only — names cross family
# prefixes freely; each list holds exactly its slot allocation
# (15/15/15/5), so the first-50 prefix IS the union of these lists —
# verify with ``list(ordered_registry())[:50]``.
_FAMILY_HEADS: dict[str, list[str]] = {
    "osm": [
        # r08-evidence refresh
        "osm_admin_hierarchy", "osm_geoparquet_roundtrip", "osm_map_match",
        "osm_multipolygon_area", "osm_nearest_node", "osm_osc_apply",
        "osm_pagerank", "osm_point_in_admin", "osm_point_in_polygon",
        "osm_shortest_path", "osm_tile_binning", "osm_turn_restrictions",
        "osm_way_length", "osm_wkb_roundtrip", "osm_xml_roundtrip",
    ],
    "llm": [
        # round-13 additions (hashed-key ExactSubstr mode, facade
        # decontamination step)
        "llm_substring_dedup_hashed", "llm_curate_decontaminate",
        # r08-evidence refresh
        "llm_ann_ivfpq_topk", "llm_bm25_topk", "llm_contamination",
        "llm_domain_mixture", "llm_frame_sample", "llm_fuzzy_edit_pairs",
        "llm_gopher_rules", "llm_lm_score", "llm_multimodal_meta",
        "llm_paragraph_dedup", "llm_retrieval_recall", "llm_sequence_pack",
        "llm_simhash",
    ],
    "stream": [
        # stream rows are r11-fresh; these slots carry r08 backlog
        "rel_asof_join", "rel_bitmap_flags", "rel_cusum_drift",
        "rel_intersect_except", "rel_interval_overlap",
    ],
    "rel": [
        # r06-evidence refresh (the single oldest record; rolled from the
        # r12 queue exactly as that round's head comment promised)
        "rel_funnel_stages",
        # r07-evidence refresh (the whole r07 cohort)
        "rel_dropdup_keep_first", "rel_idset_filter",
        "rel_join_revenue_by_nation", "rel_left_join_coalesce",
        "rel_pivot_returnflag", "rel_pricing_summary",
        "rel_scan_project_filter", "rel_semi_join", "rel_window_dup_mask",
        "rel_window_lag_delta", "rel_window_running_sum",
        # r08-evidence refresh (llm overflow into rel slots)
        "llm_url_dedup", "llm_winnow_fingerprint", "rel_ab_test",
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
