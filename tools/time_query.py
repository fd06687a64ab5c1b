"""Isolated per-query timing: run one (or more) registry queries N times
to the noop sink in a fresh session and print each pass + best — the
focused A/B instrument for optimization work (bench.py stays the
cross-round artifact; this is for before/after reads on one query).

Usage: python tools/time_query.py QUERY [QUERY ...]  [-n PASSES]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmdatapy_spark.session import get_spark  # noqa: E402
from osmdatapy_spark.suite import QUERY_REGISTRY  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args:
        fn = QUERY_REGISTRY[name].fn
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: passes={ts} best={min(ts)}")


if __name__ == "__main__":
    main()
