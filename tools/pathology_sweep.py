"""Registry-wide plan-pathology sweep (optimization rounds): for every
registered query at sf0.001, count the plan shapes the optimization guide
names as suspect — SortAggregate (sorts both sides of an agg exchange),
ObjectHashAggregate (non-codegen agg with fallback-to-sort risk),
row-at-a-time BatchEvalPython, CartesianProduct, and raw Sort / Exchange
node counts.  Output: TSV to stdout, worst offenders first.

Usage: python tools/pathology_sweep.py [sf_dir] [out_tsv]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pathology_sweep.tsv"
    spark = get_spark("pathology-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(QUERY_REGISTRY):
        qd = QUERY_REGISTRY[name]
        try:
            text = explain_text(qd.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover
            rows.append((name, -1, -1, -1, -1, -1, -1, f"ERR {str(e)[:50]}"))
            continue

        def n(pat: str) -> int:
            return len(re.findall(pat, text))

        rows.append(
            (
                name,
                n(r"\(\d+\)\s+SortAggregate"),
                n(r"\(\d+\)\s+ObjectHashAggregate"),
                n(r"\(\d+\)\s+BatchEvalPython"),
                n(r"\(\d+\)\s+CartesianProduct"),
                n(r"\(\d+\)\s+Sort\b"),
                n(r"\(\d+\)\s+Exchange\b"),
                "",
            )
        )
        spark.catalog.clearCache()
    rows.sort(key=lambda r: (-(r[1] + r[2] + r[3] + r[4]), -r[5], r[0]))
    hdr = "query\tsortagg\tobjhashagg\tbatcheval\tcartesian\tsorts\texchanges\tnote"
    lines = [hdr] + ["\t".join(str(x) for x in r) for r in rows]
    Path(out_path).write_text("\n".join(lines) + "\n")
    flagged = [r for r in rows if r[1] > 0 or r[2] > 0 or r[3] > 0 or r[4] > 0]
    print(f"{len(rows)} queries swept; {len(flagged)} flagged -> {out_path}")
    for r in flagged[:40]:
        print("\t".join(str(x) for x in r))


if __name__ == "__main__":
    main()
