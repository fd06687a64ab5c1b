"""Larger-scale end-to-end check: generate a few-hundred-thousand-element
.osm.pbf, open it through the data source, and run the engine's headline
pipelines with wall-clock + plan-shape reporting.

Not a unit test (minutes, not seconds) — run manually or per-round:

    python tools/scale_check.py [n_nodes] [n_ways]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from osmdatapy_spark.engine import OSM  # noqa: E402
from osmdatapy_spark.plans.audit import plan_summary  # noqa: E402
from osmdatapy_spark.query import Query  # noqa: E402
from osmdatapy_spark.session import get_spark  # noqa: E402
from osmdatapy_spark.sources.pbf_codec import PbfWriter  # noqa: E402


def build_pbf(path: str, n_nodes: int, n_ways: int) -> None:
    w = PbfWriter()
    for start in range(0, n_nodes, 8000):
        w.add_dense_nodes(
            [
                (
                    i + 1,
                    (i % 3600) * 0.1 - 180,
                    (i % 1700) * 0.1 - 85,
                    {"amenity": "cafe"} if i % 97 == 0 else {},
                )
                for i in range(start, min(start + 8000, n_nodes))
            ]
        )
    nodes_per_way = 8
    for start in range(0, n_ways, 8000):
        w.add_ways(
            [
                (
                    n_nodes + wid,
                    # consecutive ways share an endpoint node → topology splits
                    [(wid * (nodes_per_way - 1) + j) % n_nodes + 1 for j in range(nodes_per_way)],
                    {"highway": "residential"} if wid % 3 == 0 else {"building": "yes"},
                )
                for wid in range(start, min(start + 8000, n_ways))
            ]
        )
    w.write(path, groups_per_block=1)


def timed(label: str, df) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    s = plan_summary(df)
    print(
        f"{label:28s} {time.time() - t0:6.1f}s  shuffles={s.n_exchanges} "
        f"broadcasts={s.n_broadcasts} python={s.n_python_evals}"
    )


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_ways = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    path = f"/tmp/scale_{n_nodes}_{n_ways}.osm.pbf"
    if not Path(path).exists():
        t0 = time.time()
        build_pbf(path, n_nodes, n_ways)
        print(f"built {path} ({Path(path).stat().st_size/1e6:.1f} MB) in {time.time()-t0:.0f}s")

    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    osm = OSM.from_pbf(spark, path)
    print(f"open (plan only)             {time.time()-t0:6.1f}s")

    timed("full scan", osm.elements)
    timed("tag filter + project", osm.query(Query(ways=True, keep={"highway": []}, tags=["highway"])))
    timed("geometry (points+lines)", osm.query(Query(nodes=True, ways=True, must_tags=["amenity", "highway"], geometry=True)))
    timed("topology segments", osm.topology())
    timed("info aggregate", osm.info())


if __name__ == "__main__":
    main()
