"""Capture `.explain("formatted")` for headline (bench) queries into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence files the
optimization rounds commit alongside code changes.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  e.g. python tools/capture_plans.py r13 before            (all bench queries)
       python tools/capture_plans.py r13 after llm_lm_score osm_map_match
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmdatapy_spark.session import get_spark  # noqa: E402
from osmdatapy_spark.suite import QUERY_REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [n for n, qd in sorted(QUERY_REGISTRY.items()) if qd.bench]
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERY_REGISTRY[name].fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
