"""Print the SortAggregate / ObjectHashAggregate function lines for the
given queries (default: every query the pathology sweep flagged with a
SortAggregate) so the election-key packing treatment can be targeted.

Usage: python tools/sortagg_detail.py [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmdatapy_spark.session import get_spark  # noqa: E402
from osmdatapy_spark.plans.audit import explain_text  # noqa: E402
from osmdatapy_spark.suite import QUERY_REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

DEFAULT = [
    "llm_curate_decontaminate", "osm_apply_changes", "osm_osc_apply",
    "llm_paragraph_dedup", "osm_diff_by_region", "osm_point_in_lake",
    "llm_curation_recipe", "llm_dedup_pipeline", "osm_history_asof",
    "osm_map_match", "rel_interval_overlap", "stream_upsert_latest",
    "osm_nearest_node", "osm_pbf_epoch_fold", "osm_way_interpolate",
    "osm_admin_hierarchy", "osm_point_in_admin",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("sortagg-detail")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        text = explain_text(QUERY_REGISTRY[name].fn(spark, SF_DIR))
        lines = text.splitlines()
        print(f"\n=== {name}")
        for i, line in enumerate(lines):
            m = re.match(r"\((\d+)\)\s+(SortAggregate|ObjectHashAggregate)", line.strip())
            if not m:
                continue
            fn = ""
            for j in range(i + 1, min(i + 8, len(lines))):
                st = lines[j].strip()
                if st.startswith(("Functions", "Aggregate Attributes")):
                    if st.startswith("Functions"):
                        fn = st[:240]
                    break
            print(f"  {m.group(2)} ({m.group(1)}): {fn}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
