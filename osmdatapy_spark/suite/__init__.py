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
# the catch-up phase: all 258 then-registered names hold an external
# green record (r01-r11 cumulative).  From round 12 on the head's job is
# AGING OUT STALE EVIDENCE (round-11 verdict ask #1): lead with the
# round's new registrations, then fill the remaining slots with the 49
# registered names whose most recent green record is OLDEST — computed
# by unioning every CORRECTNESS_r*.json into a latest-green-round map
# (after r11: 1 name at r01, 29 at r06, 30 at r07; the 19 r07 names
# taken in lexicographic order; the rest of r07 leads the r13 refresh).
# Queue membership controls SAMPLE ORDER only — names cross family
# prefixes freely (the rel backlog is 30 of the 50 oldest, so rel names
# fill llm/osm/stream slots); each list holds exactly its slot
# allocation (15/15/15/5), so the first-50 prefix IS the union of these
# lists — verify with ``list(ordered_registry())[:50]``.
_FAMILY_HEADS: dict[str, list[str]] = {
    "osm": [
        # r07-evidence refresh
        "osm_boundary_nested", "osm_pbf_roundtrip", "osm_polygon_rings",
        "osm_polygon_wkt", "osm_ring_nesting", "osm_route_linestring",
        "osm_tag_pivot", "osm_topology_segments", "osm_way_endpoints",
        # r06-evidence refresh (rel backlog overflow)
        "rel_basket_pairs", "rel_bloom_filter", "rel_cms_heavy_hitters",
        "rel_compaction_plan", "rel_corr_stats", "rel_daily_counts",
    ],
    "llm": [
        # round-12 additions (exact duplicated-span removal, benchmark
        # decontamination)
        "llm_substring_dedup", "llm_decontaminate",
        # r01-evidence refresh (the single oldest record in the registry)
        "llm_stratified_sample",
        # r07-evidence refresh
        "llm_ann_ivf_topk", "llm_cosine_topk", "llm_curation_recipe",
        "llm_embed_neardup", "llm_hybrid_rrf", "llm_semantic_dedup",
        "llm_tfidf_pairs", "llm_token_stats", "llm_vocab_tokenize",
        # r06-evidence refresh (rel backlog overflow; rel_funnel_stages
        # rolled to the r13 queue to make room for llm_decontaminate)
        "rel_data_contract_audit", "rel_ewma_per_user",
        "rel_first_last_per_group",
    ],
    "stream": [
        # stream rows are all r11-fresh; these slots carry r06 backlog
        "rel_gaps_islands", "rel_grouping_sets", "rel_hierarchy_rollup",
        "rel_hilbert_layout", "rel_histogram",
    ],
    "rel": [
        # r06-evidence refresh
        "rel_hll_registers", "rel_json_extract", "rel_k_anonymity",
        "rel_partial_agg_merge", "rel_quantiles", "rel_ratio_to_report",
        "rel_retention_cohorts", "rel_skew_salted_agg",
        "rel_time_weighted_avg", "rel_topk_orders", "rel_union_branches",
        "rel_unpivot", "rel_window_range_frame", "rel_zorder_layout",
        # r07-evidence refresh
        "rel_distinct",
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
