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
# first 50; the names filling them may cross family prefixes (round 9
# carries never-recorded osm/llm names in rel slots because only 10 rel
# names lacked an external record), so the actual first-50 prefix mix is
# whatever the head lists hold — verify with
# ``list(ordered_registry())[:50]``, not this comment.  Within each queue
# the curated head goes first; the rest keep registration order.  The
# ordering is presentation-only: the registry itself (and every test
# keyed on it) is unchanged.
#
# The heads ROTATE each round (round-7 verdict ask #7, round-8 ask #3):
# rounds 1-8 recorded 140 distinct queries; every query below except
# stream_sliding_counts has never appeared in a driver-recorded
# CORRECTNESS_r*.json, so this round's first-50 accumulates ~48 more
# first-time records.  stream_sliding_counts STAYS in the head per the
# round-8 verdict (its r08 red row was an oracle TIMESTAMPTZ type bug,
# fixed this round — it must show green in an external record before it
# rotates out), and stream_enrich_join (same latent bug, same fix)
# rotates IN.  The rel family has only 10 never-recorded names left, so
# its last 5 slots carry never-recorded osm/llm queries (head placement
# controls sample order only; family labels are presentation).
_FAMILY_HEADS: dict[str, list[str]] = {
    "osm": [
        "osm_metadata", "osm_multipoint_collect", "osm_pbf_tag_query",
        "osm_relation_expand_depth2", "osm_relation_expand_depth3",
        "osm_point_in_lake", "osm_way_member_dedup", "osm_info",
        "osm_extract_diff", "osm_name_search", "osm_simplify_dp",
        "osm_way_area", "osm_diff_by_region", "osm_history_asof",
        "osm_pbf_epoch_fold",
    ],
    "llm": [
        "llm_text_normalize", "llm_bpe_train", "llm_dedup_pipeline",
        "llm_incremental_dedup", "llm_ngram_counts", "llm_minhash_estimate",
        "llm_quality_classifier", "llm_chunk_windows", "llm_knn_label",
        "llm_ann_grid_topk", "llm_ann_pq_topk", "llm_embed_quantize",
        "llm_containment_pairs", "llm_boilerplate_strip", "llm_zipf_fit",
    ],
    "stream": [
        "stream_sliding_counts", "stream_enrich_join",
        "stream_interval_join", "stream_user_totals",
    ],
    "rel": [
        "rel_sql_tpch_q7", "rel_skyline_frontier", "rel_hll_distinct",
        "rel_bloom_semijoin", "rel_cms_heavy_freq", "rel_funnel_conversion",
        "rel_market_share", "rel_attribution_position",
        "rel_key_skew_profile",
        # the round-9 SQL-face batch (Q4/Q6/Q10/Q13/Q14/Q18)
        "rel_sql_tpch_q10", "rel_sql_tpch_q18", "rel_sql_tpch_q4",
        "rel_sql_tpch_q14", "rel_sql_tpch_q6", "rel_sql_tpch_q13",
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
