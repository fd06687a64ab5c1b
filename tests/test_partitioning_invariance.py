"""Partitioning invariance: the engine's cross-engine determinism story
(exact DECIMAL aggregation, integer state, round guards, total orders)
implies a stronger property — results must be BIT-IDENTICAL under any
partitioning of the same input.  This is the claim the 100 TB design
rests on (a 1000-executor cluster is just a different partitioning), so
it gets a direct test: run determinism-critical queries over inputs
re-partitioned several ways and compare collected results exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osmdatapy_spark.suite import QUERY_REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# queries whose determinism story is most at risk from partial
# aggregation order: float-adjacent aggs, iterative integer state,
# window linearization, top-k with tiebreaks, candidate-pair expansion
CRITICAL = [
    "rel_pricing_summary",      # DECIMAL partial aggregation
    "rel_cusum_drift",          # prefix-sum/min linearization
    "osm_pagerank",             # iterative BIGINT relaxation
    "osm_shortest_path",        # Bellman-Ford relaxation
    "llm_cosine_topk",          # rounded cosine + id tiebreak top-k
    "llm_jaccard_pairs",        # inverted-index candidates + verify
    "llm_bm25_topk",            # idf/length-norm under round guards
    "rel_hilbert_layout",       # integer curve fold + bucket agg
    "llm_mixture_epochs",       # md5-mod integer sampling
    "osm_triangle_count",       # oriented wedge join
    "llm_embed_neardup",        # chunk-spread pair expansion + shuffled verify (r4)
    "osm_grid_clusters",        # driver union-find over the collected cell grid (r4)
    "osm_network_components",   # pointer-jumping min-label propagation (r4)
    "osm_bearing_rose",         # length-weighted DECIMAL bins (r4, unshadowed)
    "osm_renumber",             # bucketed global enumeration + remap joins (r4)
    "llm_dup_span_coverage",    # gram-key marking + interval-union fold (r4)
    "osm_ring_nesting",         # chain + polygon-assignment kernels (r7)
    "osm_boundary_nested",      # nested-member flatten + same kernels (r7)
    "llm_hybrid_rrf",           # two ranked legs + RRF fusion (r7)
    "osm_kcore",                # bounded peel loop, set semantics (r7)
    "osm_admin_hierarchy",      # cross-relation containment join (r7)
    "osm_multipolygon_area",    # holed-area shoelace aggregation (r7)
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CRITICAL)
def test_result_identical_across_partitionings(spark, name):
    fn = QUERY_REGISTRY[name].fn
    spark.catalog.clearCache()
    base = _rows(fn(spark, SF_DIR))
    for parts in (1, 7):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            spark.catalog.clearCache()
            got = _rows(fn(spark, SF_DIR))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        assert got == base, f"{name} differs at shuffle.partitions={parts}"
